package graft.conformance

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.json4s._

/** Shared JSON-fixture plumbing for the reference-conformance suites:
  * json4s → plain Scala values, the canonical comparison form (null ⇔
  * absent, whole doubles widen to longs — see ConformanceSpec's scaladoc
  * for why), and explicit schema construction from JSON values (instead of
  * `read.json` inference: an explicit null key becomes a NullType column,
  * and empty arrays keep a concrete element type).
  */
object JsonFixture {

  /** json4s → plain Scala (Map/Seq/Long/Double/String/Boolean/null). */
  def plain(j: JValue): Any = j match {
    case JObject(fs) => scala.collection.immutable.ListMap(
      fs.map { case (k, v) => k -> plain(v) }: _*)
    case JArray(xs) => xs.map(plain)
    case JString(s) => s
    case JInt(i) => i.toLong
    case JLong(i) => i
    case JDouble(d) => d
    case JDecimal(d) => d.toDouble
    case JBool(b) => b
    case _ => null
  }

  /** Canonical comparison form: strip nulls, widen whole doubles to longs. */
  def canon(v: Any): Any = v match {
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]]
        .map { case (k, x) => k -> canon(x) }
        .filter { case (_, x) => x != null && x != Map.empty }
    case s: Seq[_] => s.map(canon)
    case d: Double if d.isWhole && math.abs(d) < 1e15 => d.toLong
    case i: Int => i.toLong
    case other => other
  }

  /** Show values with their runtime types so `"0.01"` vs `0.01` and
    * `1L` vs `true` mismatches are visible in the failure output.
    */
  def show(v: Any): String = v match {
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      .map { case (k, x) => s"$k=${show(x)}" }.mkString("{", ", ", "}")
    case s: Seq[_] => s.map(show).mkString("[", ", ", "]")
    case s: String => "\"" + s + "\""
    case d: Double => s"${d}d"
    case l: Long => s"${l}L"
    case b: Boolean => b.toString
    case null => "null"
    case other => s"$other:${other.getClass.getSimpleName}"
  }

  def renderDiff(got: Any, want: Any): String =
    s"\n  got:      ${show(got)}\n  expected: ${show(want)}"

  /** Dotted path of the first difference between two canon'd values, with
    * both sides rendered — keeps failure output readable on 150-field
    * events where a whole-map diff is noise.
    */
  def firstDiff(got: Any, want: Any, at: String = ""): Option[String] =
    (got, want) match {
      case (g: Map[_, _], w: Map[_, _]) =>
        val gm = g.asInstanceOf[Map[String, Any]]
        val wm = w.asInstanceOf[Map[String, Any]]
        (gm.keySet ++ wm.keySet).toSeq.sorted.iterator.flatMap { k =>
          firstDiff(gm.getOrElse(k, null), wm.getOrElse(k, null),
            if (at.isEmpty) k else s"$at.$k")
        }.nextOption()
      case (g: Seq[_], w: Seq[_]) if g.length == w.length =>
        g.zip(w).zipWithIndex.iterator.flatMap { case ((gi, wi), i) =>
          firstDiff(gi, wi, s"$at[$i]")
        }.nextOption()
      case (g, w) if g == w => None
      case (g, w) => Some(s"at $at:${renderDiff(g, w)}")
    }

  def typeOf(j: JValue): DataType = j match {
    case _: JString => StringType
    case _: JInt | _: JLong => LongType
    case _: JDouble | _: JDecimal => DoubleType
    case _: JBool => BooleanType
    case JObject(fs) =>
      StructType(fs.map { case (k, v) => StructField(k, typeOf(v)) })
    case JArray(xs) =>
      ArrayType(xs.map(typeOf).reduceOption(mergeTypes).getOrElse(StringType))
    case _ => NullType
  }

  /** Unify element types across an array: structs merge field-wise,
    * numerics widen, anything else falls back to string.
    */
  def mergeTypes(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (NullType, y) => y
    case (x, NullType) => x
    case (x: StructType, y: StructType) =>
      val yOnly = y.fields.filterNot(f => x.fieldNames.contains(f.name))
      StructType(x.fields.map { f =>
        y.fields.find(_.name == f.name)
          .map(g => StructField(f.name, mergeTypes(f.dataType, g.dataType)))
          .getOrElse(f)
      } ++ yOnly)
    case (ArrayType(x, _), ArrayType(y, _)) => ArrayType(mergeTypes(x, y))
    case (_: NumericType, _: NumericType) => DoubleType
    case _ => StringType
  }

  def valueOf(j: JValue, dt: DataType): Any = (j, dt) match {
    case (JInt(i), DoubleType) => i.toDouble
    case (JLong(i), DoubleType) => i.toDouble
    case (v, StringType) => v match {
      case JString(s) => s
      case JInt(i) => i.toString
      case JLong(i) => i.toString
      case JDouble(d) => d.toString
      case JBool(b) => if (b) "true" else "false"
      case _ => null
    }
    case (JString(s), _) => s
    case (JInt(i), _) => i.toLong
    case (JLong(i), _) => i
    case (JDouble(d), _) => d
    case (JDecimal(d), _) => d.toDouble
    case (JBool(b), _) => b
    case (JObject(fs), st: StructType) =>
      Row.fromSeq(st.fields.map(f =>
        fs.find(_._1 == f.name).map(x => valueOf(x._2, f.dataType)).orNull).toSeq)
    case (JArray(xs), ArrayType(et, _)) => xs.map(valueOf(_, et))
    case _ => null
  }

  def dfFromJson(spark: SparkSession, input: JValue): DataFrame = {
    val st = typeOf(input).asInstanceOf[StructType]
    spark.createDataFrame(
      java.util.Arrays.asList(valueOf(input, st).asInstanceOf[Row]), st)
  }

  /** Many events → one DataFrame under the merged union schema, with an
    * extra Long `idxCol` carrying the input line number so callers can
    * restore input order after a pipeline run.
    */
  def dfFromJsonLines(spark: SparkSession, events: Seq[JValue],
      idxCol: String): DataFrame = {
    val st = events.map(typeOf).map(_.asInstanceOf[DataType])
      .reduce(mergeTypes).asInstanceOf[StructType]
    val full = st.add(StructField(idxCol, LongType, nullable = false))
    val rows = events.zipWithIndex.map { case (e, i) =>
      Row.fromSeq(valueOf(e, st).asInstanceOf[Row].toSeq :+ i.toLong)
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, full)
  }
}
