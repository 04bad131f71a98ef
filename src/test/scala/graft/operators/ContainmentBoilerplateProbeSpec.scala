package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Adversarial probe for the capped containment census: a corpus whose
  * duplication noise is MID-FREQUENCY boilerplate — shingles with document
  * frequency ~800, under the exact census's heavyCap (1000) so they are
  * not dropped, over its rare-blocking maxDf (20) so they never bless a
  * pair, yet each one streams C(800,2) ≈ 320k candidate pairs through the
  * exact census's aggregate. This is the df band real corpora grow into
  * as crawls re-collect the same templates, and the band where
  * [[Dedup.containmentPairsCapped]]'s bounded lists pay off: the capped
  * stream is ≤ C(64,2) ≈ 2k pairs per shingle, a ~160× reduction here,
  * with ZERO loss on the planted doc-in-doc pairs (their defining
  * shingles have df=2 and are never truncated; the worst-case retained
  * denominator still clears the 0.8 threshold by construction — 38
  * always-retained shared shingles over at most 46 retained).
  *
  * Assertions are work-proportional (stream sizes computed from the df
  * distribution — deterministic data math) plus exact recall parity, not
  * wall-clock: this host throttles intermittently (see ScaleProbeSpec).
  */
class ContainmentBoilerplateProbeSpec extends SparkSpec {

  test("capped census: ~160x smaller pair stream on mid-df boilerplate, full planted recall") {
    import spark.implicits._

    val groups = 5
    val perGroup = 800
    val uniqueToks = 40
    val bpToks = 8
    def bp(g: Int): String = (1 to bpToks).map(j => s"bp${g}w$j").mkString(" ")
    // 4000 base docs: 40 doc-unique tokens + this group's boilerplate
    val base = (0 until groups * perGroup).map { i =>
      val uniq = (1 to uniqueToks).map(j => s"u${i}t$j").mkString(" ")
      (i.toLong, s"$uniq ${bp(i / perGroup)}")
    }
    // 20 planted containers: doc 8000+i embeds doc i's unique block
    // verbatim, then 8 container-specific tokens, then group-0 boilerplate
    val planted = (0 until 20).map { i =>
      val uniq = (1 to uniqueToks).map(j => s"u${i}t$j").mkString(" ")
      val extras = (1 to 8).map(j => s"e${i}x$j").mkString(" ")
      (8000L + i, s"$uniq $extras ${bp(0)}")
    }
    val docs = (base ++ planted).toDF("doc_id", "text").repartition(16)

    // work-proportional invariant: pair-stream sizes from the df
    // distribution — Sigma C(df,2) for the exact census (df <= heavyCap)
    // vs Sigma C(min(df,64),2) for the capped one
    val dfDist = docs
      .select(explode(Dedup.shingles("text", 3)).as("s"))
      .groupBy("s").agg(count(lit(1)).as("df"))
      .filter($"df" >= 2)
    val streams = dfDist.agg(
      sum(when($"df" <= 1000, $"df" * ($"df" - 1)).otherwise(0L)).as("exact2"),
      sum(expr("least(df, 64L) * (least(df, 64L) - 1)")).as("capped2"),
      sum(when($"df" <= 20, $"df" * ($"df" - 1)).otherwise(0L)).as("rare2")
    ).select(($"exact2" / 2).cast("long"), ($"capped2" / 2).cast("long"),
        ($"rare2" / 2).cast("long"))
      .collect().head
    val (exactStream, cappedStream, rareStream) =
      (streams.getLong(0), streams.getLong(1), streams.getLong(2))
    assert(exactStream > 5000000L,
      s"probe corpus must actually stress the exact stream (got $exactStream)")
    assert(cappedStream * 50 < exactStream,
      s"capped stream ($cappedStream) must be far below exact ($exactStream)")
    // the rare-only census excludes the df-800 band entirely: its stream
    // is just the planted pairs' df-2 shingles — orders below even capped
    assert(rareStream < cappedStream,
      s"rare stream ($rareStream) must be below capped ($cappedStream)")

    val expected = (0 until 20).map(i => (i.toLong, 8000L + i)).toSet

    val capped = Dedup.containmentPairsCapped(docs, "doc_id", "text",
      k = 3, listCap = 64, maxDf = 20, minContainment = 0.8)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === expected,
      "capped census must surface exactly the planted pairs — boilerplate-" +
        "only co-occurrence stays blocked (retained df > maxDf), planted " +
        "pairs stay above threshold (their df-2 shingles are never truncated)")

    val exact = Dedup.containmentPairs(docs, "doc_id", "text",
      k = 3, maxDf = 20, minContainment = 0.8)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact === expected, "recall parity: both modes find the planted pairs")

    // third regime: rare-only containment drops the boilerplate band from
    // BOTH numerator and denominator — full recall at the smallest stream,
    // and the contained doc's rare-only containment here is exactly 1.0
    // (every rare shingle it has is shared with its container)
    val rare = Dedup.containmentPairsRare(docs, "doc_id", "text",
      k = 3, maxDf = 20, minContainment = 0.8)
    val rarePairs = rare.select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rarePairs === expected, "rare-only census must find the planted pairs")
    val minCont = rare.agg(min($"containment")).collect().head.getDouble(0)
    assert(minCont >= 38.0 / 42.0,
      s"rare-only containment should be near 1 for planted pairs (got $minCont)")
  }
}
