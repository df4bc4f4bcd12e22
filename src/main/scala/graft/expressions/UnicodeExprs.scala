package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization — the step every serious text-dedup pipeline
  * runs FIRST: "é" as one code point and "e"+COMBINING ACUTE are
  * byte-different strings that md5/minhash/jaccard all treat as
  * unrelated, so a corpus mixing input methods silently under-dedups
  * until the text is brought to one canonical form. Spark has no
  * built-in for this; the JDK's java.text.Normalizer (ICU-equivalent
  * for the standard forms) does the real work.
  *
  * NFC is DuckDB-replayable (`nfc_normalize`) → gate-oracled; NFKC/NFD/
  * NFKD are spec-pinned (UnicodeSpec) against known decompositions.
  */
object UnicodeExprs {

  private val Forms = Map(
    "NFC" -> Normalizer.Form.NFC,
    "NFD" -> Normalizer.Form.NFD,
    "NFKC" -> Normalizer.Form.NFKC,
    "NFKD" -> Normalizer.Form.NFKD)

  def formOf(name: String): Normalizer.Form =
    Forms.getOrElse(name.toUpperCase(java.util.Locale.ROOT),
      throw new IllegalArgumentException(
        s"unknown normalization form '$name' — one of ${Forms.keys.mkString("/")}"))

  /** Shared kernel (interpreted eval AND codegen call this). Already-
    * normalized text (the overwhelmingly common case for NFC over
    * ASCII-heavy corpora) short-circuits through the quick check
    * without allocating a new string.
    */
  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}

/** unicode_normalize(text, 'NFC'|'NFD'|'NFKC'|'NFKD') → normalized text.
  * The form is a foldable literal (resolved once, not per row).
  */
case class UnicodeNormalize(text: Expression, form: Expression)
    extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = form

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"text must be string, got ${text.dataType.sql}")
    else if (!form.foldable || form.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("form must be a foldable string literal")
    else {
      // resolve the form at analysis time so a typo fails the QUERY,
      // not the first task that touches a row; a foldable NULL form
      // (lit(null).cast("string")) folds to null and must fail the same
      // clean way, not NPE
      form.eval(null) match {
        case null =>
          TypeCheckResult.TypeCheckFailure("form must be a non-null literal")
        case v =>
          try { UnicodeExprs.formOf(v.toString); TypeCheckResult.TypeCheckSuccess }
          catch { case e: IllegalArgumentException =>
            TypeCheckResult.TypeCheckFailure(e.getMessage) }
      }
    }

  @transient private lazy val resolvedForm: java.text.Normalizer.Form =
    UnicodeExprs.formOf(form.eval(null).toString)

  override def nullSafeEval(t: Any, f: Any): Any =
    UnicodeExprs.normalize(t.asInstanceOf[UTF8String], resolvedForm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("nfForm", resolvedForm,
      "java.text.Normalizer.Form")
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.expressions.UnicodeExprs.normalize($t, $formRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UnicodeNormalize =
    copy(text = newLeft, form = newRight)
}
