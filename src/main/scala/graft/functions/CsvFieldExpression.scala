package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One COPY-ready CSV field as a native codegen expression: NULL → `\N`,
  * NUL bytes scrubbed, minimal RFC-4180 quoting with `""` doubling, a
  * literal `\N` value quoted so it survives as a string. One byte-scan per
  * field with a zero-copy fast path for clean fields (the overwhelming
  * majority) — replaces a 4×contains + regexp_replace Column chain that
  * made CSV formatting ~10× slower than the parquet write path.
  */
case class CsvField(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = false // NULL input → the \N marker
  override def prettyName: String = "csv_field"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) CsvUtils.NULL_MARKER
    else CsvUtils.format(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        UTF8String ${ev.value} = ${c.isNull}
          ? graft.functions.CsvUtils.NULL_MARKER()
          : graft.functions.CsvUtils.format(${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): CsvField =
    copy(child = newChild)
}

/** Static helpers callable from generated code (Janino resolves the
  * forwarder class, not MODULE$). */
object CsvUtils {

  private val NullMarkerStr = UTF8String.fromString("\\N")

  /** Java-style accessor for codegen. */
  def NULL_MARKER(): UTF8String = NullMarkerStr

  /** Format one non-null field. Fast path: no NUL/comma/quote/CR/LF and
    * not the literal `\N` → return the input unchanged (no allocation). */
  def format(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val n = bytes.length
    var needsQuote = false
    var hasNul = false
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if (b == 0) hasNul = true
      else if (b == ',' || b == '"' || b == '\n' || b == '\r') needsQuote = true
      i += 1
    }
    if (!needsQuote && !hasNul && !(n == 2 && bytes(0) == '\\' && bytes(1) == 'N'))
      return s

    // scrub NULs first; the literal-\N test MUST run on the scrubbed value
    // (a NUL byte then backslash-N scrubs down to exactly backslash-N and
    // would otherwise ship unquoted, collapsing to SQL NULL under COPY)
    val clean =
      if (!hasNul) bytes
      else {
        val out = new Array[Byte](n)
        var o = 0
        var j = 0
        while (j < n) { if (bytes(j) != 0) { out(o) = bytes(j); o += 1 }; j += 1 }
        java.util.Arrays.copyOf(out, o)
      }
    val isLiteralNullMarker =
      clean.length == 2 && clean(0) == '\\' && clean(1) == 'N'
    if (!needsQuote && !isLiteralNullMarker) return UTF8String.fromBytes(clean)

    var quotes = 0
    var k = 0
    while (k < clean.length) { if (clean(k) == '"') quotes += 1; k += 1 }
    val out = new Array[Byte](clean.length + quotes + 2)
    var o = 0
    out(o) = '"'; o += 1
    var m = 0
    while (m < clean.length) {
      val b = clean(m)
      if (b == '"') { out(o) = '"'; o += 1 }
      out(o) = b; o += 1
      m += 1
    }
    out(o) = '"'
    UTF8String.fromBytes(out)
  }
}
