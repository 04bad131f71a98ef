package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-7 operators: vocabulary coverage, padding-waste census, DSIR
  * importance weights, embedding-space decontamination. */
class Round7OperatorsSpec extends SparkSpec {

  test("vocabCoverage: words outside the top-V count as OOV") {
    import spark.implicits._
    // "a" appears 4x, "b" 3x, "x"/"y" once each → top-2 vocab = {a, b}
    val docs = Seq(
      ("g1", "a a b x"), ("g1", "a b"), ("g2", "a b y")
    ).toDF("lang", "text")
    val out = TextAnalysis.vocabCoverage(docs, "lang", "text", topV = 2)
      .orderBy("lang").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      === Seq(("g1", 6L, 1L), ("g2", 3L, 1L)))
    assert(out.head.getDouble(3) === 1.0 / 6.0)
  }

  test("vocabCoverage broadcasts the vocabulary") {
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val plan = TextAnalysis.vocabCoverage(docs, "lang", "text", 500)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"vocab join not broadcast:\n$plan")
  }

  test("paddingWaste: power-of-two buckets, exact pad accounting") {
    import spark.implicits._
    // 1 token → clamps to 32 (bucket 32, pad 0); 33 tokens → bucket 64
    val docs = Seq(
      "solo",
      Seq.fill(33)("w").mkString(" "),
      Seq.fill(64)("w").mkString(" ")
    ).toDF("text")
    val out = TextAnalysis.paddingWaste(docs, "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((32L, 1L, 32L, 0L), (64L, 2L, 97L, 31L)))
  }

  test("dsirWeights: target-like docs outscore off-target docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, true, "alpha beta gamma alpha beta"),
      (2L, true, "alpha beta beta gamma gamma"),
      (3L, false, "omega psi chi omega psi"),
      (4L, false, "alpha beta gamma beta alpha") // target-like content, raw split
    ).toDF("doc_id", "is_en", "text")
    val w = TextAnalysis.dsirWeights(docs, "doc_id", "text", col("is_en"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doc 4 shares the target vocabulary → importance weight above doc 3
    assert(w(4L) > w(3L))
    assert(w(1L) > w(3L))
  }

  test("semanticDecontaminate: an exact eval copy is flagged at cosine 1") {
    import spark.implicits._
    val base = Array.tabulate(8)(i => (i + 1).toFloat)
    val ortho = Array.tabulate(8)(i => if (i % 2 == 0) 1f else -1f)
    val eval = Seq((100L, base)).toDF("vec_id", "embedding")
    val train = Seq((1L, base), (2L, ortho)).toDF("vec_id", "embedding")
    val out = Similarity.semanticDecontaminate(train, eval, "vec_id", "embedding", 0.9)
      .orderBy("train_id").collect()
    assert(out.length === 2)
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(math.abs(byId(1L).getDouble(1) - 1.0) < 1e-9)
    assert(byId(1L).getBoolean(3))
    assert(!byId(2L).getBoolean(3))
  }

  test("semanticDecontaminate stays shuffle-free until the final aggregate") {
    val e = graft.sources.Tables.load(spark, sfDir, "embeddings")
    val plan = Similarity.semanticDecontaminate(
      e.filter(col("vec_id") % 499 =!= 0), e.filter(col("vec_id") % 499 === 0),
      "vec_id", "embedding", 0.2).queryExecution.executedPlan.toString
    // eval side rides as a broadcast nested-loop join, never a shuffled one
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
