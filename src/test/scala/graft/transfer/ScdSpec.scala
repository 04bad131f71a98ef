package graft.transfer

import graft.SparkSpec

class ScdSpec extends SparkSpec {

  import spark.implicits._

  test("intervals chain per key; unchanged reloads collapse; last row is current") {
    val changes = Seq(
      (1L, 100L, 10L, "bronze"),
      (1L, 200L, 11L, "bronze"), // reloaded snapshot, no change -> collapsed
      (1L, 300L, 12L, "silver"),
      (1L, 400L, 13L, "gold"),
      (2L, 150L, 20L, "silver")
    ).toDF("key", "ms", "seq", "tier")
    val out = Scd.scd2(changes, "key", "ms", Seq("tier"), "seq")
      .orderBy("key", "effective_from")
      .select("key", "tier", "effective_from", "effective_to", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect()
    assert(out.toSeq === Seq(
      (1L, "bronze", 100L, Some(300L), false),
      (1L, "silver", 300L, Some(400L), false),
      (1L, "gold", 400L, None, true),
      (2L, "silver", 150L, None, true)))
  }

  test("a change back to an earlier value still opens a new interval") {
    val changes = Seq(
      (1L, 100L, 1L, "a"),
      (1L, 200L, 2L, "b"),
      (1L, 300L, 3L, "a") // returns to "a": new interval, not a collapse
    ).toDF("key", "ms", "seq", "v")
    val out = Scd.scd2(changes, "key", "ms", Seq("v"), "seq")
    assert(out.count() === 3)
    assert(out.filter($"is_current").select("v").as[String].head() === "a")
  }
}
