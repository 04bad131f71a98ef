package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchSpec extends SparkSpec {

  import spark.implicits._

  test("hll register file is bounded by 2^p rows whatever the input size") {
    val df = spark.range(10000).toDF("k")
    val regs = Sketch.hllRegisters(df, "k", p = 6)
    val n = regs.count()
    assert(n <= 64, s"register file must stay <= m rows, got $n")
    // every register row is a (bucket, max_rho) in the legal ranges
    val bad = regs.filter(col("bucket") < 0 || col("bucket") > 63 ||
      col("max_rho") < 1 || col("max_rho") > 27).count()
    assert(bad === 0)
  }

  test("hll estimate lands near the true cardinality") {
    val df = spark.range(5000).toDF("k")
    val regs = Sketch.hllRegisters(df, "k", p = 6)
    val est = Sketch.hllEstimate(regs, p = 6).select("hll_est").as[Double].head()
    // raw HLL at m=64 has ~13% relative std error; 3 sigma
    assert(math.abs(est - 5000.0) / 5000.0 < 0.4, s"estimate $est too far from 5000")
  }

  test("register aggregation partially aggregates map-side") {
    val df = spark.range(1000).toDF("k")
    val plan = Sketch.hllRegisters(df, "k", p = 6).queryExecution.executedPlan.toString
    // partial + final pair, so the shuffle carries <= m rows per task
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"expected 2-phase aggregate:\n$plan")
  }

  test("count-min estimate is always an overestimate, exact for unique buckets") {
    val tokens = Seq.fill(50)("hot").union((1 to 200).map(i => s"t$i")).toDF("tok")
    val sketch = Sketch.countMin(tokens, "tok", d = 3, w = 512)
    assert(sketch.count() <= 3 * 512)
    val exact = tokens.groupBy($"tok").agg(count(lit(1)).as("exact_cnt"))
    val est = Sketch.countMinEstimate(exact, "tok", "exact_cnt", sketch, d = 3, w = 512)
    val under = est.filter($"cm_est" < $"exact_cnt").count()
    assert(under === 0, "count-min must never underestimate")
    val hot = est.filter($"tok" === "hot").select("cm_est").as[Long].head()
    assert(hot >= 50L)
    // a candidate the sketch never saw estimates 0 — not dropped, not
    // inflated (sparse sketch so no hash-collision false positive)
    val sparse = Sketch.countMin(Seq("a").toDF("tok"), "tok", d = 3, w = 512)
    val absent = Sketch.countMinEstimate(
      Seq(("never-seen-token", 7L)).toDF("tok", "exact_cnt"),
      "tok", "exact_cnt", sparse, d = 3, w = 512)
    assert(absent.count() === 1)
    assert(absent.select("cm_est").as[Long].head() === 0L)
  }

  test("per-group hll estimates track per-group cardinalities") {
    val df = (1 to 3).flatMap(g => (1 to g * 1000).map(i => (s"g$g", s"u${g}_$i")))
      .toDF("grp", "user")
    val regs = Sketch.hllRegistersBy(df, "grp", "user", p = 6)
    assert(regs.groupBy("grp").count().filter($"count" > 64).count() === 0)
    val est = Sketch.hllEstimateBy(regs, "grp", p = 6)
      .select($"grp", $"hll_est").as[(String, Double)].collect().toMap
    Seq("g1" -> 1000.0, "g2" -> 2000.0, "g3" -> 3000.0).foreach { case (g, n) =>
      assert(math.abs(est(g) - n) / n < 0.4, s"$g: ${est(g)} vs $n")
    }
  }

  test("histogram quantiles land within one bin of the exact percentile") {
    // uniform 0..999: p50 ~ 500, p95 ~ 950
    val df = (0 until 1000).map(v => ("a", v.toDouble)).toDF("grp", "v")
    val q = Sketch.histogramQuantiles(df, "grp", "v", width = 10.0)
      .select($"p50", $"p95", $"p99").as[(Double, Double, Double)].head()
    assert(math.abs(q._1 - 500.0) <= 10.0, s"p50=${q._1}")
    assert(math.abs(q._2 - 950.0) <= 10.0, s"p95=${q._2}")
    assert(math.abs(q._3 - 990.0) <= 10.0, s"p99=${q._3}")
  }

  test("salted sum/count equals the plain aggregation") {
    val df = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k${i % 7}", i.toLong))
      .toDF("key", "v")
    val salted = Skew.saltedSumCount(df, "key", "v", saltFactor = 8, saltBy = "v")
      .select($"key", $"sum_v", $"cnt")
    val plain = df.groupBy($"key").agg(sum($"v").as("sum_v"), count(lit(1)).as("cnt"))
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }
}
