package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cluster formation over near-dup pairs: min-label propagation must
  * produce exact connected components with the minimum id as the
  * deterministic representative. */
class ConnectedComponentsSpec extends SparkSpec {

  import spark.implicits._

  private def comps(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.components(pairs.toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two separate cliques form two components under their min ids") {
    val got = comps(Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("a long chain converges to one component (diameter > 1 iteration)") {
    // 0-1-2-...-9 as a path: worst case for naive propagation; the min
    // label must still flood the whole chain within maxIter
    val chain = (0L until 9L).map(i => (i, i + 1))
    val got = comps(chain)
    assert(got.values.toSet === Set(0L))
    assert(got.keySet === (0L to 9L).toSet)
  }

  test("bridge edge merges two cliques into one component") {
    val two = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L))
    assert(comps(two).values.toSet === Set(1L, 10L))
    val bridged = two :+ (3L, 10L)
    assert(comps(bridged).values.toSet === Set(1L))
  }

  test("cluster summary matches a hand-computed grouping") {
    val pairs = Seq((5L, 7L), (7L, 9L), (20L, 21L)).toDF("a_id", "b_id")
    val summary = Dedup.components(pairs)
      .groupBy(col("label").as("cluster"))
      .agg(count(lit(1)).as("n"),
        concat_ws(",", expr("transform(sort_array(collect_list(node)), x -> cast(x AS string))")).as("members"))
      .orderBy(col("cluster"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(summary.toSeq === Seq((5L, 3L, "5,7,9"), (20L, 2L, "20,21")))
  }
}
