package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.operators.Dedup

/** [[NfcNormalizeKey]] — the full-Unicode dedup-key normalizer (round-9:
  * the "documented gap" COVERAGE row, now implemented). Unicode inputs are
  * built from explicit \u escapes so no editor/tool normalization can
  * silently turn a decomposed test literal into its precomposed twin. */
class NfcNormalizeSpec extends SparkSpec {

  private def norm(s: String): String =
    NfcNormalizeKey.normalize(UTF8String.fromString(s)).toString

  // decomposed / precomposed / singleton spellings, by code point
  private val ePrecomposed = "\u00e9cole"         // e-acute precomposed
  private val eDecomposed = "e\u0301cole"         // e + COMBINING ACUTE
  private val aRingPre = "\u00c5"                 // A-ring precomposed
  private val aRingDecomp = "A\u030a"             // A + COMBINING RING ABOVE
  private val angstrom = "\u212b"                 // ANGSTROM SIGN (NFC → U+00C5)

  test("idempotence: normalize(normalize(x)) == normalize(x)") {
    val inputs = Seq(
      "Hello  World", ePrecomposed, eDecomposed, angstrom,
      angstrom + " units", "  MiXeD \t Case \n text ", "",
      "\u0130stanbul" /* dotted capital I: lowercases to i + U+0307 */)
    inputs.foreach { s =>
      val once = norm(s)
      assert(norm(once) === once, s"not idempotent on ${s.getBytes("UTF-8").toSeq}")
    }
  }

  test("canonical-equivalent spellings collapse: combining marks compose") {
    assert(eDecomposed !== ePrecomposed) // genuinely different byte strings
    assert(norm(eDecomposed) === norm(ePrecomposed))
    assert(norm(aRingDecomp) === norm(aRingPre))
    // ANGSTROM SIGN canonically decomposes to A-ring → same key
    assert(norm(angstrom) === norm(aRingPre))
    assert(norm(angstrom) === "\u00e5")
  }

  test("casefold + whitespace collapse match the ASCII core") {
    assert(norm("  Foo\t\tBAR \r\n baz ") === "foo bar baz")
  }

  test("agrees exactly with Dedup.normalizeKey on ASCII input") {
    import spark.implicits._
    val docs = Seq("Hello  World", "  MiXeD \t Case \n text ", "a b c",
      "UPPER lower 123 !@#", "trailing   ", "   leading").toDF("text")
    val both = docs.select(
      Dedup.normalizeKey(col("text")).as("ascii"),
      Dedup.normalizeKeyUnicode(col("text")).as("unicode")).collect()
    both.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("unicode keys collapse rows the ASCII core treats as distinct") {
    import spark.implicits._
    val docs = Seq((1L, "\u00c9cole Normale"),
      (2L, "E\u0301cole \t Normale"),
      (3L, "unrelated")).toDF("doc_id", "text")
    val asciiKeys = docs.select(Dedup.normalizeKey(col("text"))).distinct().count()
    val nfcKeys = docs.select(Dedup.normalizeKeyUnicode(col("text"))).distinct().count()
    assert(asciiKeys === 3L) // byte-distinct spellings stay distinct
    assert(nfcKeys === 2L)   // NFC collapses the two spellings
  }

  test("codegen and interpreted paths agree (expression registers via SQL)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq("E\u0301cole  FRAN\u00c7AISE", "plain ascii").toDF("text")
    val viaSql = df.selectExpr("nfc_normalize_key(text) AS k").as[String].collect()
    val expected = Seq("\u00e9cole fran\u00e7aise", "plain ascii")
    assert(viaSql.toSeq === expected)
    // null propagates
    val n = Seq[Option[String]](None).toDF("text")
      .selectExpr("nfc_normalize_key(text)").collect().head
    assert(n.isNullAt(0))
  }
}
