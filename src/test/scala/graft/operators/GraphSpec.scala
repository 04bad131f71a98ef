package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: uniform on a cycle (fixed point)") {
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val pr = Graph.pageRank(nodes, edges, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the cycle is the stationary distribution: 0.15/3 + 0.85·(1/3) = 1/3
    pr.values.foreach(p => assert(math.abs(p - 1.0 / 3) < 1e-12, pr))
  }

  test("pageRank: chain concentrates mass downstream, dangling leaks") {
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val rows = Graph.pageRank(nodes, edges, iters = 2).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val pr = rows.map(t => t._1 -> t._2).toMap
    // hand-rolled 2 iterations: r1 = (.05, .05+.85/3, .05+.85/3),
    // r2 = (.05, .05+.85·.05, .05+.85·(.05+.85/3))
    assert(math.abs(pr(1L) - 0.15 / 3) < 1e-12, pr)
    assert(math.abs(pr(2L) - (0.15 / 3 + 0.85 * (0.15 / 3))) < 1e-12, pr)
    assert(math.abs(pr(3L) - (0.15 / 3 + 0.85 * (0.15 / 3 + 0.85 / 3))) < 1e-12, pr)
    assert(pr(3L) > pr(2L) && pr(2L) > pr(1L))
    // node 3 is dangling: mass leaks, totals stay below 1
    assert(pr.values.sum < 1.0)
    assert(rows.map(t => t._1 -> t._3).toMap === Map(1L -> 1L, 2L -> 1L, 3L -> 0L))
  }

  test("pageRank: partitioning-independent (decimal-rounded edge sums)") {
    val nodes = spark.range(0, 60).toDF("id")
    // star into node 0 from everyone, plus a chain
    val edges = ((1L until 60L).map(i => (i, 0L)) ++
      (0L until 59L).map(i => (i, i + 1))).toDF("src", "dst")
    def run(parts: Int) =
      Graph.pageRank(nodes.repartition(parts), edges.repartition(parts), iters = 3)
        .orderBy(col("id")).collect().map(_.getDouble(1)).toSeq
    assert(run(1) === run(13))
  }
}
