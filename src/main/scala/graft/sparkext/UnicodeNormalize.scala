package graft.sparkext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode normalization (+ optional accent stripping) over a
  * string column — the first step of every multilingual curation recipe
  * (CCNet/fastText preprocess NFC/NFKC before tokenizing; dedup
  * fingerprints must not split on composed-vs-decomposed spellings of
  * the same text).
  *
  * Spark has no normalization builtin, and the UDF spelling would drop
  * the whole containing projection out of whole-stage codegen (the
  * DotProduct lesson). This expression generates a static call to
  * [[UnicodeNormalize.run]] — `java.text.Normalizer` plus a tight
  * combining-mark filter loop, no regex, no boxing — so cleaning
  * pipelines stay codegen'd end to end. Pure per-row projection: no
  * shuffle, embarrassingly parallel at 100 TB.
  *
  * Accent stripping decomposes (NFD) after the requested normalization
  * and drops NON_SPACING_MARK chars — the same Mn-stripping contract as
  * DuckDB's `strip_accents` (verified on composed, decomposed, `ø`
  * (non-decomposable, kept) and the `ﬁ` ligature (compatibility-only,
  * kept under NFC/NFD), which is what makes a FULL hash oracle possible
  * for q154).
  */
case class UnicodeNormalize(child: Expression, form: String, stripAccents: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if UnicodeNormalize.Forms.contains(form) =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize form must be one of ${UnicodeNormalize.Forms.mkString("/")}, got '$form'")
    case other => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize expects a string column, got ${other.simpleString}")
  }

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(
      UnicodeNormalize.run(s.asInstanceOf[UTF8String].toString, form, stripAccents))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // `form` is validated against the closed Forms set at analysis time,
    // so splicing it as a literal is safe
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.sparkext.UnicodeNormalize.run($s.toString(), "$form", $stripAccents));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)

  override def prettyName: String = "unicode_normalize"
}

object UnicodeNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Normalize to `form`; with `strip`, decompose (NFD) and drop
    * combining marks (Unicode category Mn). Static — called from
    * generated code. */
  def run(s: String, form: String, strip: Boolean): String = {
    val n = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.valueOf(form))
    if (!strip) n
    else {
      val d =
        if (form == "NFD" || form == "NFKD") n
        else java.text.Normalizer.normalize(n, java.text.Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(d.length)
      var i = 0
      while (i < d.length) {
        // iterate by code point: supplementary-plane combining marks
        // (e.g. Adlam U+1E944) are surrogate pairs whose per-char type is
        // SURROGATE, so a char loop would keep them — utf8proc (DuckDB's
        // strip_accents) strips at codepoint level
        val cp = d.codePointAt(i)
        if (Character.getType(cp) != Character.NON_SPACING_MARK) sb.appendCodePoint(cp)
        i += Character.charCount(cp)
      }
      sb.toString
    }
  }

  def apply(col: Column, form: String = "NFC", stripAccents: Boolean = false): Column = {
    require(Forms.contains(form),
      s"unicode_normalize form must be one of ${Forms.mkString("/")}, got '$form'")
    ColumnBridge.column(
      UnicodeNormalize(ColumnBridge.expression(col.cast("string")), form, stripAccents))
  }
}
