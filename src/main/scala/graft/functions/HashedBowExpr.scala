package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Hashed bag-of-words featurization kernel: `array<int>` of token bucket
  * ids → `array<double>` of length `dim + 1` holding the l2-normalized
  * per-bucket counts plus a trailing bias component fixed at 1.0 — the
  * whole [[graft.ml.Classifier.features]] body in ONE native pass.
  *
  * Why a fused kernel and not Column algebra:
  *  - the r7 histogram (`transform(sequence(0, dim-1), i ->
  *    size(filter(bkts, b == i)))`) walked the bucket array once per
  *    output slot — O(dim·tokens) per row;
  *  - worse, any norm expression referenced from inside a `transform`
  *    lambda is re-evaluated PER ELEMENT (no CSE inside lambda bodies —
  *    the same pitfall documented at [[graft.ml.Similarity.cosineNearDupPairs]]),
  *    so the "fixed" one-pass histogram + lambda normalize was O(dim²)
  *    per row — measured minutes at dim 8192 where this kernel takes ms.
  *
  * This pass is O(tokens + dim) per row and stays inside whole-stage
  * codegen. Bit-identity with the per-slot formulation holds by
  * construction: counts are exact small integers (order-free sums), the
  * norm is the index-ordered sum of squares of exact integers (exact up
  * to 2^53), and each slot divides by the same IEEE sqrt.
  *
  * Out-of-range or null bucket ids are ignored (the producer —
  * [[graft.ml.Curation.hashBucket]] over non-null tokens — emits neither,
  * but a kernel must not misbehave on adversarial input).
  */
case class HashedBowExpr(child: Expression, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    HashedBowExpr.featurize(a.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.HashedBowExpr.featurize($a, $dim)")

  override protected def withNewChildInternal(newChild: Expression): HashedBowExpr =
    copy(child = newChild)
}

object HashedBowExpr {
  /** Shared by interpreted eval and generated code. */
  def featurize(bkts: ArrayData, dim: Int): ArrayData = {
    val out = new Array[Double](dim + 1)
    val n = bkts.numElements()
    var i = 0
    while (i < n) {
      if (!bkts.isNullAt(i)) {
        val b = bkts.getInt(i)
        if (b >= 0 && b < dim) out(b) += 1.0
      }
      i += 1
    }
    var ss = 0.0
    i = 0
    while (i < dim) { ss += out(i) * out(i); i += 1 }
    if (ss > 0) {
      val nrm = math.sqrt(ss)
      i = 0
      while (i < dim) { out(i) /= nrm; i += 1 }
    }
    out(dim) = 1.0 // bias
    new GenericArrayData(out)
  }
}
