package graft.operators

import graft.SparkSpec

class LineDedupSpec extends SparkSpec {

  import spark.implicits._

  private val tenA = (1 to 10).map(i => s"a$i").mkString(" ")
  private val tenB = (1 to 10).map(i => s"b$i").mkString(" ")
  private val tenC = (1 to 10).map(i => s"c$i").mkString(" ")

  test("first global occurrence survives; later copies are dropped") {
    val docs = Seq(
      (1L, s"$tenA $tenB"),       // keeps both lines
      (2L, s"$tenA $tenC"),       // loses line 0 (dup of doc 1), keeps c-line
      (3L, tenA)                  // all lines are dups -> empty
    ).toDF("doc_id", "text")
    val out = LineDedup.dedupLines(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(out(0) === ((1L, 2L, 2L, s"$tenA $tenB")))
    assert(out(1) === ((2L, 2L, 1L, tenC)))
    assert(out(2) === ((3L, 1L, 0L, "")))
  }

  test("reassembly preserves original line order, not dedup order") {
    val docs = Seq(
      (1L, tenB),                 // b-line first by doc order
      (2L, s"$tenC $tenB $tenA")  // b-line dropped from the middle
    ).toDF("doc_id", "text")
    val out = LineDedup.dedupLines(docs, "doc_id", "text")
      .filter($"doc_id" === 2L).select("clean_text").as[String].head()
    assert(out === s"$tenC $tenA")
  }

  test("partial trailing lines dedup like full ones") {
    val docs = Seq(
      (1L, s"$tenA x y"),         // trailing 2-token line "x y"
      (2L, "x y")                 // duplicate of doc 1's trailing line
    ).toDF("doc_id", "text")
    val out = LineDedup.dedupLines(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(out(0)._3 === 2L)
    assert(out(1) === ((2L, 1L, 0L, "")))
  }
}
