package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One 32-bit half of md5(input) as an unsigned long — bit-identical to
  * `conv(substring(md5(s), 1+8·half, 8), 16, 10)` but without building
  * the 32-char hex string, substring-ing it, and re-parsing base 16
  * (three string allocations per shingle, measured ~20% of the MinHash
  * signature job). `half` 0 = digest bytes 0-3, 1 = bytes 4-7.
  */
case class Md5HalfExpr(child: Expression, half: Int) extends UnaryExpression {
  // fail at construction (analysis time for SQL callers), not with an
  // ArrayIndexOutOfBounds from generated code mid-query
  require(half >= 0 && half <= 3, s"half must be 0..3 (got $half)")

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    Md5HalfExpr.md5half(a.asInstanceOf[UTF8String], half)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.Md5HalfExpr.md5half($a, $half)")

  override protected def withNewChildInternal(newChild: Expression): Md5HalfExpr =
    copy(child = newChild)
}

object Md5HalfExpr {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def md5half(s: UTF8String, half: Int): Long = {
    val digest = md.get()
    digest.reset()
    val d = digest.digest(s.getBytes)
    val off = half * 4
    ((d(off) & 0xffL) << 24) | ((d(off + 1) & 0xffL) << 16) |
      ((d(off + 2) & 0xffL) << 8) | (d(off + 3) & 0xffL)
  }
}
