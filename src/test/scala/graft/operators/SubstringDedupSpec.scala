package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.{size, split}

class SubstringDedupSpec extends SparkSpec {

  import spark.implicits._

  // 12 distinct tokens: windows inside it are unique unless text repeats
  private val phrase = (1 to 12).map(i => s"w$i").mkString(" ")

  test("first occurrence survives; later exact k-token repeats are killed") {
    val docs = Seq(
      (1L, s"$phrase unique1 unique2 unique3"),
      (2L, s"lead1 lead2 $phrase tail1 tail2")
    ).toDF("doc_id", "text")
    // doc 1 is the first occurrence everywhere — no kill spans, so it is
    // absent from the output entirely
    val rows = SubstringDedup.killSpans(docs, "doc_id", "text", k = 8)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSet === Set(2L))
    // doc 2: all 12 phrase tokens sit under killed 8-windows (5 windows
    // [3..10] merge to one span over tokens 3..14 = 12 tokens)
    val (_, total, removed, kept) = rows.head
    assert(total === 16L)
    assert(removed === 12L)
    assert(kept === 4L)
  }

  test("overlapping kill spans merge — internal repetition counted once") {
    // one doc that repeats its own 8-token run back to back: windows
    // overlap heavily but the union must count each token once
    val eight = (1 to 8).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, s"$eight $eight $eight")).toDF("doc_id", "text")
    val rows = SubstringDedup.killSpans(docs, "doc_id", "text", k = 8)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length === 1)
    val (_, total, removed, kept) = rows.head
    assert(total === 24L)
    // starts 1..8 are the 8 distinct rotations' first occurrences; starts
    // 9..17 each repeat the window 8 positions earlier, so their spans
    // union to tokens 9..24 — 16 killed, counted once despite 9 windows
    assert(removed === 16L)
    assert(kept === 8L)
  }

  test("documents shorter than k produce no windows and never phantom spans") {
    val docs = Seq(
      (1L, "a b c"),             // 3 tokens < k — must not fabricate windows
      (2L, "a b c")              // identical, still too short to match
    ).toDF("doc_id", "text")
    val rows = SubstringDedup.killSpans(docs, "doc_id", "text", k = 8).collect()
    assert(rows.isEmpty)
  }

  test("rewrite removes killed spans in place and keeps every document") {
    val docs = Seq(
      (1L, s"$phrase unique1 unique2 unique3"),
      (2L, s"lead1 lead2 $phrase tail1 tail2")
    ).toDF("doc_id", "text")
    val out = SubstringDedup.rewrite(docs, "doc_id", "text", k = 8)
      .orderBy("doc_id").select("doc_id", "text").as[(Long, String)].collect()
    // doc 1 is the first occurrence — verbatim; doc 2 loses exactly the
    // 12 phrase tokens its killSpans accounting reported
    assert(out.length === 2)
    assert(out(0)._2 === s"$phrase unique1 unique2 unique3")
    assert(out(1)._2 === "lead1 lead2 tail1 tail2")
  }

  test("rewrite and killSpans agree on the removed-token count") {
    val eight = (1 to 8).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, s"$eight $eight $eight"),
      (2L, s"pre1 pre2 pre3 $eight post1")
    ).toDF("doc_id", "text")
    val acct = SubstringDedup.killSpans(docs, "doc_id", "text", k = 8)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val clean = SubstringDedup.rewrite(docs, "doc_id", "text", k = 8)
      .select($"doc_id", size(split($"text", " ")).as("n"))
      .as[(Long, Int)].collect().toMap
    val orig = docs
      .select($"doc_id", size(split($"text", " ")).as("n"))
      .as[(Long, Int)].collect().toMap
    orig.foreach { case (id, n) =>
      assert(n - clean(id) === acct.getOrElse(id, 0L).toInt,
        s"doc $id: rewrite dropped ${n - clean(id)} tokens, accounting says ${acct.get(id)}")
    }
  }

  test("normalizeKey collapses case and whitespace drift, trims ends") {
    val df = Seq("  The   Quick\tBrown  Fox ", "the quick brown fox")
      .toDF("t").select(Dedup.normalizeKey($"t").as("k")).as[String].collect()
    assert(df(0) === df(1))
    assert(df(1) === "the quick brown fox")
  }
}
