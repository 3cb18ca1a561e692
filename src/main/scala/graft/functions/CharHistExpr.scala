package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Packed 16-bucket character histogram of a string: each code point
  * hashes to one of 16 buckets whose saturating 4-bit count occupies
  * one nibble of the returned long. The fuzzy-dedup candidate
  * PREFILTER signature (VERDICT r16 next #2): evaluated inside the
  * candidate join on the strings its output already carries, it
  * kills most false candidates at ~0.4× the cost of a banded
  * levenshtein ([[NibbleL1Expr]] compares the two longs), before the
  * distinct's string-carrying shuffle and the verify. (Carrying a
  * per-row signature through the emit shuffle instead was measured
  * SLOWER at the 10M tier — emits outnumber candidates, so widening
  * every emit by 8 bytes cost more than the per-candidate recompute
  * saves; PLANS r17.)
  *
  * The bound that makes the filter LOSSLESS: one unit edit changes
  * the true histogram's L1 norm by at most 2 (insert/delete touch one
  * bucket by 1; a substitution −1/+1 across two buckets), so
  * editDistance(a, b) ≥ L1(hist(a), hist(b)) / 2. Saturation at 15
  * only shrinks per-bucket differences (min(c, 15) is 1-Lipschitz in
  * c), so the packed L1 is a further lower bound — a candidate with
  * nibbleL1 > 2·maxDist can NEVER verify and is safe to drop; one
  * within the bound still goes to the verifier. Buckets come from a
  * multiplicative hash of the CODE POINT (the unit Spark's
  * levenshtein edits count), so the ≤2-per-edit argument holds for
  * non-BMP text too.
  */
case class CharHistExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    CharHistExpr.hist(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.CharHistExpr.hist($a)")

  override protected def withNewChildInternal(
      newChild: Expression): CharHistExpr = copy(child = newChild)
}

object CharHistExpr {
  def hist(s: UTF8String): Long = {
    val str = s.toString
    var sig = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      // top 4 bits of a multiplicative hash (murmur3 C1): spreads the
      // dense hex/ascii alphabets across buckets far better than
      // `cp & 15`, whose low bits collide '0'..'9' with 'a'..'f'
      val b = (cp * 0x85ebca6b) >>> 28
      val sh = b << 2
      if (((sig >>> sh) & 15L) != 15L) sig += 1L << sh
    }
    sig
  }
}

/** L1 distance between two [[CharHistExpr]] packed histograms — 16
  * nibble subtractions on two longs, no string access. The candidate
  * join's prefilter predicate: `NibbleL1Expr(sigA, sigB) ≤ 2·maxDist`
  * keeps every true pair (see the bound on [[CharHistExpr]]) and
  * kills random collisions whose character content differs in more
  * than 2·maxDist bucket units.
  */
case class NibbleL1Expr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    NibbleL1Expr.l1(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.NibbleL1Expr.l1($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NibbleL1Expr =
    copy(left = newLeft, right = newRight)
}

object NibbleL1Expr {
  def l1(a: Long, b: Long): Int = {
    var sum = 0
    var i = 0
    while (i < 64) {
      val d = (((a >>> i) & 15L) - ((b >>> i) & 15L)).toInt
      sum += (if (d < 0) -d else d)
      i += 4
    }
    sum
  }
}
