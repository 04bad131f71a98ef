package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKAggregatorSpec extends SparkSpec {

  test("top-k aggregate equals window row_number top-k, on any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 5000).map(_ =>
      (s"g${rnd.nextInt(4)}", s"w${rnd.nextInt(50)}", 1L)).toSeq
    val counts = rows.toDF("g", "w", "one")
      .groupBy("g", "w").agg(sum("one").as("cnt"))

    val expected = {
      import org.apache.spark.sql.expressions.Window
      val win = Window.partitionBy(col("g")).orderBy(col("cnt").desc, col("w"))
      counts.withColumn("rnk", row_number().over(win)).filter(col("rnk") <= 3)
        .select("g", "w", "cnt").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    }

    val topk = TopKAggregator.topK(3)
    def viaAgg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(topk(col("w"), col("cnt")).as("top"))
        .select(col("g"), explode(col("top")).as("t"))
        .select(col("g"), col("t.item"), col("t.weight")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

    assert(viaAgg(counts) === expected)
    assert(viaAgg(counts.repartition(17)) === expected) // partitioning-independent
  }

  test("reduce is amortized: buffer floats to 2k-1 between prunes, finish/merge prune to k") {
    val agg = new TopKAggregator(2) // pruneAt = 4
    // appends below 2k don't sort — the buffer grows past k
    val b3 = (1 to 3).foldLeft(agg.zero)((b, i) => agg.reduce(b, Weighted(s"x$i", i.toLong)))
    assert(b3.length === 3, "reduce should append, not prune, below 2k")
    // hitting 2k prunes back to k
    assert(agg.reduce(b3, Weighted("x4", 4L)).length === 2)
    // the buffer is still bounded (≤ 2k-1) over any input length
    val buf = (1 to 1000).foldLeft(agg.zero)((b, i) => agg.reduce(b, Weighted(s"x$i", i.toLong)))
    assert(buf.length <= 3)
    assert(agg.finish(buf).map(_.weight) === Seq(1000L, 999L))
    val merged = agg.merge(agg.finish(buf), Seq(Weighted("y", 2000L)))
    assert(merged.length === 2)
    assert(merged.head.weight === 2000L)
  }

  test("micro-bench: amortized reduce beats sort-per-row") {
    // the round-4 nit: prune(buf :+ in) full-sorts per input row. With the
    // amortized bound only every k-th row pays a 2k-element sort. k = 64
    // amplifies the difference enough to dominate JIT noise in one JVM.
    val k = 64
    val n = 200000
    val inputs = {
      val rnd = new scala.util.Random(11)
      Array.fill(n)(Weighted(s"w${rnd.nextInt(100000)}", rnd.nextInt(1000000).toLong))
    }
    val bounded = new TopKAggregator(k)
    def sortPerRow(buf: Seq[Weighted], in: Weighted): Seq[Weighted] =
      (buf :+ in).sortBy(w => (-w.weight, w.item)).take(k)
    def run[B](zero: B)(step: (B, Weighted) => B): (B, Double) = {
      val t0 = System.nanoTime()
      val out = inputs.foldLeft(zero)(step)
      (out, (System.nanoTime() - t0) / 1e9)
    }
    // warmup both paths (JIT), then measure
    run(bounded.zero)(bounded.reduce); run(Seq.empty[Weighted])(sortPerRow)
    val (fastBuf, fastSec) = run(bounded.zero)(bounded.reduce)
    val (slowBuf, slowSec) = run(Seq.empty[Weighted])(sortPerRow)
    info(f"amortized reduce: $fastSec%.3fs, sort-per-row: $slowSec%.3fs (${slowSec / fastSec}%.1fx)")
    assert(bounded.finish(fastBuf) === slowBuf, "both variants must agree exactly")
    // timing is info-only: this host demonstrably throttles 40-70x in
    // windows, so a wall-clock ordering assertion would flake even with
    // the k=64 amplification. The exact-equality assertion above is the
    // gate; a speed regression shows in the info line and the bench.
  }
}
