package graft.filter

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalacheck.Gen.Parameters

/** Property-based conformance (SURVEY §5): random filter ASTs evaluated by
  * the compiled Catalyst predicate over random events must agree with an
  * independent reference interpreter implementing the documented
  * semantics (missing ⇒ false, Not flips missing to true, list
  * membership, anchored wildcards). Deterministic seed — no flaky CI.
  */
class FilterPropertySpec extends SparkSpec {
  import FilterAst._

  // ---- reference interpreter over Map events --------------------------

  private def evalRef(ast: FilterAst, ev: Map[String, Any]): Boolean = ast match {
    case Always(v) => v
    case Not(c) => !evalRef(c, ev)
    case And(cs) => cs.forall(evalRef(_, ev))
    case Or(cs) => cs.exists(evalRef(_, ev))
    case StringEq(f, v) => ev.get(f) match {
      case Some(l: Seq[_]) => l.exists(x => x != null && x.toString == v)
      case Some(null) => false
      case Some(x) => x.toString == v
      case None => false
    }
    case IntEq(f, v) => ev.get(f) match {
      case Some(x: Long) => x == v
      case Some(x: Int) => x == v
      case Some(x: Double) => x == v
      case _ => false
    }
    case FloatEq(f, v) => ev.get(f) match {
      case Some(x: Double) => x == v
      case Some(x: Long) => x.toDouble == v
      case _ => false
    }
    case IntRange(f, lo, hi, li, hi2) => numIn(ev.get(f),
      lo.map(_.toDouble), hi.map(_.toDouble), li, hi2)
    case FloatRange(f, lo, hi, li, hi2) => numIn(ev.get(f), lo, hi, li, hi2)
    case StringRange(f, lo, hi, li, hi2) => ev.get(f) match {
      case Some(s) if s != null && !s.isInstanceOf[Seq[_]] =>
        val x = s.toString
        lo.forall(l => if (li) x >= l else x > l) &&
          hi.forall(h => if (hi2) x <= h else x < h)
      case _ => false
    }
    case Wildcard(f, p) => ev.get(f) match {
      case Some(s) if s != null && !s.isInstanceOf[Seq[_]] =>
        s.toString.matches(FilterCompiler.wildcardToRegex(p))
      case _ => false
    }
    case SigmaWildcard(f, p) => ev.get(f) match {
      case Some(s) if s != null && !s.isInstanceOf[Seq[_]] =>
        s.toString.matches("(?i)" + FilterCompiler.wildcardToRegex(p))
      case _ => false
    }
    case Regex(f, p) => ev.get(f) match {
      case Some(s) if s != null && !s.isInstanceOf[Seq[_]] =>
        java.util.regex.Pattern.compile(FilterCompiler.anchorRegex(p))
          .matcher(s.toString).find()
      case _ => false
    }
    case Exists(f) => ev.get(f).exists(_ != null)
    // STATIC-path semantics: with a declared schema, an absent key IS a
    // SQL NULL (parquet absent = null), so missing-or-null ⇒ IsNull true
    // for in-schema fields. The reference's MISSING-vs-null distinction
    // exists only on the dynamic/variant path — see DynamicOpsSpec.
    case IsNull(f) => schemaFields.contains(f) && ev.get(f).forall(_ == null)
  }

  private val schemaFields = Set("id", "s", "n", "d", "tags", "opt")

  private def numIn(v: Option[Any], lo: Option[Double], hi: Option[Double],
                    li: Boolean, hi2: Boolean): Boolean = v match {
    case Some(x: Long) => numOk(x.toDouble, lo, hi, li, hi2)
    case Some(x: Int) => numOk(x.toDouble, lo, hi, li, hi2)
    case Some(x: Double) => numOk(x, lo, hi, li, hi2)
    case _ => false
  }
  private def numOk(x: Double, lo: Option[Double], hi: Option[Double],
                    li: Boolean, hi2: Boolean): Boolean =
    lo.forall(l => if (li) x >= l else x > l) &&
      hi.forall(h => if (hi2) x <= h else x < h)

  // ---- generators ------------------------------------------------------

  private val strings = Seq("alpha", "beta", "Gamma", "x", "")
  private val genLeaf: Gen[FilterAst] = Gen.oneOf(
    Gen.oneOf(strings).map(StringEq("s", _)),
    Gen.choose(-5L, 5L).map(IntEq("n", _)),
    Gen.choose(-2.0, 2.0).map(v => FloatEq("d", math.rint(v * 4) / 4)),
    for { a <- Gen.choose(-5L, 5L); b <- Gen.choose(-5L, 5L)
          li <- Gen.oneOf(true, false); hi <- Gen.oneOf(true, false) }
      yield IntRange("n", Some(math.min(a, b)), Some(math.max(a, b)), li, hi),
    Gen.oneOf("al*", "?eta", "G*a", "*", "a?p*a").map(Wildcard("s", _)),
    Gen.oneOf("al.*", "[Gg]amma", ".{1,3}").map(Regex("s", _)),
    Gen.oneOf(Seq("s", "n", "d", "opt", "ghost")).map(Exists(_)),
    Gen.oneOf(Seq("opt", "s", "ghost")).map(IsNull(_)),
    Gen.oneOf(strings).map(StringEq("tags", _)))

  private def genAst(depth: Int): Gen[FilterAst] =
    if (depth == 0) genLeaf
    else Gen.frequency(
      3 -> genLeaf,
      1 -> genAst(depth - 1).map(Not(_)),
      1 -> Gen.listOfN(2, genAst(depth - 1)).map(And(_)),
      1 -> Gen.listOfN(2, genAst(depth - 1)).map(Or(_)))

  // ---- fixed random event corpus --------------------------------------

  private val rnd = new scala.util.Random(42)
  private val events: Seq[Map[String, Any]] = (0 until 200).map { i =>
    val base = Map[String, Any](
      "id" -> i.toLong,
      "s" -> strings(rnd.nextInt(strings.size)),
      "n" -> (rnd.nextInt(13) - 6).toLong,
      "d" -> math.rint((rnd.nextDouble() * 4 - 2) * 4) / 4,
      "tags" -> Seq.fill(rnd.nextInt(3))(strings(rnd.nextInt(strings.size))))
    if (rnd.nextBoolean()) base + ("opt" -> (if (rnd.nextBoolean()) null else "present"))
    else base
  }

  test("compiled predicates agree with the reference interpreter on 300 random filters x 200 events") {
    val s = spark
    import s.implicits._
    val df = s.read.json(events.map { m =>
      val fields = m.map {
        case (k, null) => s""""$k":null"""
        case (k, v: Seq[_]) => s""""$k":[${v.map(x => s""""$x"""").mkString(",")}]"""
        case (k, v: String) => s""""$k":"$v""""
        case (k, v) => s""""$k":$v"""
      }
      "{" + fields.mkString(",") + "}"
    }.toDS).cache()
    val schema = df.schema

    val seed0 = rng.Seed(7L)
    var seed = seed0
    var checked = 0
    (0 until 300).foreach { _ =>
      val ast = genAst(2).pureApply(Parameters.default, seed)
      seed = seed.next
      val expectedIds = events.filter(e => evalRef(ast, e))
        .map(_("id").asInstanceOf[Long]).toSet
      val gotIds = df.filter(FilterCompiler.compile(ast, schema))
        .select("id").collect().map(_.getLong(0)).toSet
      assert(gotIds == expectedIds, s"AST mismatch: $ast\n" +
        s"only-spark=${gotIds -- expectedIds} only-ref=${expectedIds -- gotIds}")
      checked += 1
    }
    assert(checked == 300)
  }

  test("renderParseable round-trips 300 random ASTs through the parser") {
    val s = spark
    import s.implicits._
    val df = s.read.json(events.map { m =>
      val fields = m.map {
        case (k, null) => s""""$k":null"""
        case (k, v: Seq[_]) => s""""$k":[${v.map(x => s""""$x"""").mkString(",")}]"""
        case (k, v: String) => s""""$k":"$v""""
        case (k, v) => s""""$k":$v"""
      }
      "{" + fields.mkString(",") + "}"
    }.toDS).cache()
    val schema = df.schema

    var seed = rng.Seed(21L)
    (0 until 300).foreach { _ =>
      val ast = genAst(2).pureApply(Parameters.default, seed)
      seed = seed.next
      val rendered = FilterAst.renderParseable(ast)
      val reparsed = LuceneParser.parse(rendered).fold(
        e => fail(s"unparseable render: $rendered\n  from $ast\n  $e"),
        identity)
      val direct = df.filter(FilterCompiler.compile(ast, schema))
        .select("id").collect().map(_.getLong(0)).toSet
      val roundtrip = df.filter(FilterCompiler.compile(reparsed, schema))
        .select("id").collect().map(_.getLong(0)).toSet
      assert(roundtrip == direct,
        s"roundtrip drift: $ast\n  rendered: $rendered\n  reparsed: $reparsed")
    }
  }
}
