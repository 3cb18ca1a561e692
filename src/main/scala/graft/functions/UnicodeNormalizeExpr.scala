package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native codegen
  * expression — Spark SQL has no normalization builtin, and a Scala UDF
  * here would break whole-stage codegen in the text-cleanup hot path.
  * The already-normalized fast path (the overwhelming majority of real
  * text) returns the input UTF8String without allocating.
  */
case class UnicodeNormalizeExpr(child: Expression, form: String)
    extends UnaryExpression {
  // fail at construction (analysis time), not from generated code
  require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"normalization form must be NFC|NFD|NFKC|NFKD (got $form)")

  override def dataType: DataType = StringType

  // the Form is fixed at analysis time — resolve the enum ONCE, not
  // per row in the kernel (interpreted path caches here; generated
  // code references the enum constant directly)
  @transient private lazy val resolvedForm = java.text.Normalizer.Form.valueOf(form)

  override def nullSafeEval(a: Any): Any =
    UnicodeNormalizeExpr.normalize(a.asInstanceOf[UTF8String], resolvedForm)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.UnicodeNormalizeExpr.normalize($a, " +
        s"java.text.Normalizer.Form.$form)")

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNormalizeExpr = copy(child = newChild)
}

object UnicodeNormalizeExpr {
  def normalize(s: UTF8String, f: java.text.Normalizer.Form): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }
}
