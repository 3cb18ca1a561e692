package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All random-hyperplane LSH band keys of an `array<double>` vector in
  * one native pass: key b = the sign bits of the vector's dot products
  * with band b's planes, as a '0'/'1' string.
  *
  * Replaces the Scala UDF in [[graft.ml.Similarity.lshBandKeys]]: the
  * UDF paid a Row→Seq[Double] conversion and boxing per vector; this
  * expression reads the ArrayData directly and keeps the projection in
  * whole-stage codegen. Index-ordered multiply-add, so every sum (and
  * thus every key) is bit-identical to the UDF and to the DuckDB
  * oracle's `list_aggregate(list_transform(...))` formulation.
  */
case class LshBandKeysExpr(child: Expression,
                           planes: Array[Array[Array[Double]]])
    extends UnaryExpression {

  // the replaced UDF's Seq[Double] signature coerced any numeric array;
  // the Column wrapper casts, and this rejects a raw mis-typed input at
  // analysis instead of misreading 4-byte elements as doubles
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_band_keys requires array<double>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    LshBandKeysExpr.compute(a.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshPlanes", planes, "double[][][]")
    defineCodeGen(ctx, ev,
      a => s"graft.functions.LshBandKeysExpr.compute($a, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBandKeysExpr =
    copy(child = newChild)
}

object LshBandKeysExpr {
  def compute(v: ArrayData, planes: Array[Array[Array[Double]]]): ArrayData = {
    val nv = v.numElements()
    val out = new Array[AnyRef](planes.length)
    var b = 0
    while (b < planes.length) {
      val band = planes(b)
      val sb = new java.lang.StringBuilder(band.length)
      var j = 0
      while (j < band.length) {
        val p = band(j)
        var s = 0.0
        var i = 0
        val n = math.min(p.length, nv)
        while (i < n) { s += v.getDouble(i) * p(i); i += 1 }
        sb.append(if (s >= 0) '1' else '0')
        j += 1
      }
      out(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(out)
  }
}
