package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode NFC normalization as a native codegen expression — the
 * canonical-composition step text dedup needs BEFORE hashing (a
 * decomposed "Café" and a composed "Café" are byte-different,
 * hash-different, and therefore dedup-invisible to every exact and
 * shingle-based operator until normalized). Spark has no built-in
 * Unicode normalizer; a UDF would break whole-stage codegen around
 * every normalization site, so this delegates to the JDK's
 * `java.text.Normalizer` (Unicode-standard NFC, the same canonical
 * composition other engines' `nfc_normalize` implements) inside the
 * generated projection. Registered as SQL function `nfc` by
 * [[graft.functions.Registry]].
 */
case class NfcNormalize(child: Expression, form: String = "NFC") extends UnaryExpression {

  require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unknown Unicode normalization form: $form")

  override def dataType: DataType = StringType

  private def javaForm = java.text.Normalizer.Form.valueOf(form)

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, javaForm))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), java.text.Normalizer.Form.$form))")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = if (form == "NFC") "nfc" else form.toLowerCase
}
