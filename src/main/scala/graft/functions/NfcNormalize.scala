package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Full-Unicode dedup-key normalization: NFC composition → Root-locale
  * lowercase → whitespace collapse → trim, as ONE native expression.
  *
  * [[graft.operators.Dedup.normalizeKey]] (the oracle-checked q127 core)
  * covers the ASCII casefold + whitespace subset both engines express
  * bit-identically; real multilingual corpora also need canonical
  * COMPOSITION — "é" arrives both precomposed (U+00E9) and decomposed
  * (e + U+0301) depending on the source keyboard/normalizer, and a
  * byte-hash dedup treats those as different documents. NFC (java.text
  * .Normalizer, the JVM's implementation of UAX #15) collapses every
  * canonical-equivalent sequence to one spelling; singleton compatibility
  * points with canonical decompositions (U+212B ANGSTROM → Å) fold too.
  *
  * Casefold is `String.toLowerCase(Locale.ROOT)` applied AFTER
  * composition — a documented approximation of full UCD case folding
  * (ß stays ß, the Turkish dotted/dotless-i rule is NOT applied; both
  * choices match utf8proc-based engines closer than locale-sensitive
  * lowercasing would). Greek final sigma is the one known divergence from
  * context-insensitive folders: Java lowercases Σ position-sensitively
  * (ς word-finally), utf8proc does not — documented, not hidden.
  *
  * Whitespace collapse matches normalizeKey's `\s+` → single space on the
  * JAVA definition of \s (ASCII tab/LF/VT/FF/CR/space): Unicode spaces
  * (U+00A0 etc.) are NOT collapsed, same as the regexp_replace the ASCII
  * core uses, so the two operators agree exactly on ASCII input — the
  * property NfcNormalizeSpec pins.
  *
  * Scale shape: per-row, allocation-light (the common already-NFC ASCII
  * row takes the `Normalizer.isNormalized` fast path and one lowercase
  * scan), no shuffle, codegen'd via a static call — the same pattern as
  * every other hot-path expression here.
  */
case class NfcNormalizeKey(child: Expression) extends TextExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize_key"

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeKey.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"${ev.value} = graft.functions.NfcNormalizeKey.normalize($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeKey =
    copy(child = newChild)
}

object NfcNormalizeKey {
  import java.text.Normalizer

  /** NFC → lowercase(Root) → collapse ASCII whitespace runs → trim.
    * Idempotent: NFC is idempotent, lowercase-after-NFC output is itself
    * NFC-stable for every case pair in the UCD (lowercasing never
    * decomposes), and collapsed-trimmed whitespace is a fixed point. */
  def normalize(s: UTF8String): UTF8String = {
    val raw = s.toString
    val nfc =
      if (Normalizer.isNormalized(raw, Normalizer.Form.NFC)) raw
      else Normalizer.normalize(raw, Normalizer.Form.NFC)
    val lower = nfc.toLowerCase(java.util.Locale.ROOT)
    // single-pass \s+ collapse + trim (java \s = [ \t\n\x0B\f\r])
    val n = lower.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var pendingSpace = false
    while (i < n) {
      val c = lower.charAt(i)
      val isWs = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
        c == '\f' || c == '\r'
      if (isWs) { if (sb.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
