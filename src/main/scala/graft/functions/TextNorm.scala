package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for multilingual corpora.
  *
  * Exact dedup, fingerprinting and grouping keys break on Unicode unless
  * text is normalized first: "école" composed (U+00E9) and decomposed
  * (e + U+0301) are different byte strings that render identically, so an
  * unnormalized fingerprint treats equal documents as distinct — at 100 TB
  * that silently inflates a dedup pass's "unique" count. The reference
  * pipeline never normalizes (its producer emits ASCII-only amounts —
  * src/main/scala/com/example/kafka/KafkaProducerApp.scala:32); this is
  * extension-tier capability for real multilingual corpora.
  *
  * Both expressions are Catalyst-native (no UDF registration, usable in
  * any plan position); the per-row cost is the JDK normalizer itself, with
  * an is-normalized fast path that makes the overwhelmingly-common ASCII /
  * already-NFC row allocation-free. Engine-portable: NFC is the Unicode
  * standard algorithm (DuckDB `nfc_normalize`), and accent stripping is
  * NFD → drop non-spacing marks → NFC, which agrees with utf8proc-based
  * `strip_accents` (spec-pinned on composed, decomposed, ligature and
  * non-decomposable fixtures — ß, ﬁ, ø stay).
  */
object TextNorm {

  import org.apache.spark.sql.graft.ColumnBridge

  /** Canonical composition (NFC) of a string column. */
  def nfc(c: Column): Column =
    ColumnBridge.column(UnicodeNfc(ColumnBridge.expression(c)))

  /** Accent-stripped form: NFD, drop Mn (non-spacing marks), recompose. */
  def stripAccents(c: Column): Column =
    ColumnBridge.column(StripAccentsExpr(ColumnBridge.expression(c)))

  /** Case/accent/composition-insensitive match key: lower(strip(nfc)).
    * Built-in `lower` runs last so the whole key stays one projection. */
  def foldKey(c: Column): Column =
    org.apache.spark.sql.functions.lower(stripAccents(nfc(c)))

  private[functions] def stripMarks(s: String): String = {
    val nfd = Normalizer.normalize(s, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    Normalizer.normalize(sb, Normalizer.Form.NFC)
  }
}

/** NFC canonical composition (see [[TextNorm]]). */
case class UnicodeNfc(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"unicode_nfc needs string, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) input
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(c: Expression): UnicodeNfc =
    copy(child = c)
}

/** NFD → drop non-spacing marks → NFC (see [[TextNorm]]). */
case class StripAccentsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"strip_accents needs string, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // fast path: an NFC string with no marks after decomposition is
    // unchanged only if it was pure ASCII — cheaper to test directly
    var ascii = true
    var i = 0
    while (ascii && i < s.length) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) input
    else UTF8String.fromString(TextNorm.stripMarks(s))
  }

  override protected def withNewChildInternal(c: Expression): StripAccentsExpr =
    copy(child = c)
}
