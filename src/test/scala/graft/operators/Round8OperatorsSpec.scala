package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-8 operators: BPE pair census, Zipf rank-frequency slope, PMI
  * collocations, ANN recall audit. */
class Round8OperatorsSpec extends SparkSpec {

  test("bpePairCensus: pair counts weight by occurrence, distinct words dedupe") {
    import spark.implicits._
    // each "abab" carries ab,ba,ab; "ab" carries ab; single-char "a"
    // contributes nothing → ab: 5 occurrences in 2 distinct words, ba: 2 in 1
    val docs = Seq("abab ab a", "abab").toDF("text")
    val out = TextAnalysis.bpePairCensus(docs, "text", topN = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("ab", 5L, 2L), ("ba", 2L, 1L)))
  }

  test("zipfSlope: an exact power law recovers its exponent") {
    import spark.implicits._
    // frequencies 64,32,16,8,4,2,1 over ranks 1..7: ln f = ln 64 - ln 2 · ln r / ... not
    // linear in ln r — instead use f(r) = floor(C / r) with C chosen so the
    // fit is exactly slope -1: f = 720/r for r=1..6 (720,360,240,180,144,120)
    val words = (1 to 6).flatMap(r => Seq.fill(720 / r)(s"w$r"))
    val docs = Seq(words.mkString(" ")).toDF("text").withColumn("lang", lit("en"))
    val row = TextAnalysis.zipfSlope(docs, "lang", "text", topN = 10).collect().head
    assert(row.getLong(1) === 6L)
    assert(math.abs(row.getDouble(2) - (-1.0)) < 1e-6,
      s"slope ${row.getDouble(2)} should be -1 for f = C/r")
  }

  test("pmiCollocations: a fused pair outranks independent co-occurrence") {
    import spark.implicits._
    // "new york" always adjacent (5x); "the cat" adjacent but both words
    // also appear apart → lower PMI
    val docs = Seq(
      Seq.fill(5)("new york").mkString(" "),
      "the cat the dog the cat the dog the cat",
      "cat alone the end the end the end the fin"
    ).toDF("text")
    val out = TextAnalysis.pmiCollocations(docs, "text", minCount = 3, topN = 5)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(3))).toMap
    assert(out.contains(("new", "york")))
    val pmiNy = out(("new", "york"))
    assert(out.filterNot(_._1 == (("new", "york"))).values.forall(_ < pmiNy),
      s"'new york' should carry the top PMI: $out")
  }

  test("noveltyCensus: a source repeating earlier content scores zero novelty") {
    import spark.implicits._
    // doc 1 (src_a) introduces everything; doc 2 (src_b) repeats doc 1
    // verbatim; doc 3 (src_b) is entirely new → src_b novelty = new/(old+new)
    val docs = Seq(
      (1L, "src_a", "a b c d"),
      (2L, "src_b", "a b c d"),
      (3L, "src_b", "p q r s")
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.noveltyCensus(docs, "doc_id", "text", "source", k = 3)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // k=3 over 4 tokens → 2 distinct shingles per doc
    assert(out.toSeq === Seq(
      ("src_a", 1L, 2L, 2L, 1.0),
      ("src_b", 2L, 4L, 2L, 0.5)))
  }

  test("annRecall: recall is 1 exactly for truth neighbors sharing the query's bucket") {
    val e = graft.sources.Tables.load(spark, sfDir, "embeddings")
    val out = Similarity.annRecall(e, e.filter(col("vec_id") < 10), k = 5)
      .orderBy(col("qid")).collect()
    assert(out.length === 10)
    out.foreach { r =>
      assert(r.getLong(1) === 5L) // n_truth = k
      val recall = r.getDouble(3)
      assert(recall >= 0.0 && recall <= 1.0)
      assert(recall === r.getLong(2).toDouble / 5.0)
    }
  }

  test("annRecall broadcasts the truth set, not the corpus") {
    val e = graft.sources.Tables.load(spark, sfDir, "embeddings")
    val plan = Similarity.annRecall(e, e.filter(col("vec_id") < 10), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"bucket joins not broadcast:\n$plan")
  }
}
