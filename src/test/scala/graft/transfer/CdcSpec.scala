package graft.transfer

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Row-level change detection: classification exactness and the upsert
  * set an incremental transfer would ship. */
class CdcSpec extends SparkSpec {

  import spark.implicits._

  private val oldV = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    .toDF("id", "name", "price")
  private val newV = Seq(
    (1L, "a", 10.0),            // same
    (2L, "b", 25.0),            // changed
    (4L, "z", 40.0),            // changed (string col)
    (5L, "e", 50.0))            // added; 3 removed
    .toDF("id", "name", "price")

  test("diff classifies every PK exactly") {
    val got = Cdc.diff(oldV, newV, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "same", 2L -> "changed", 3L -> "removed",
      4L -> "changed", 5L -> "added"))
  }

  test("null-safe comparison: null vs value is a change, null vs null is not") {
    val o = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("id", "v")
    val n = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("id", "v")
    val got = Cdc.diff(o, n, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "same", 2L -> "changed"))
  }

  test("upserts ship exactly the added+changed new-side rows") {
    val rows = Cdc.upserts(oldV, newV, Seq("id"))
      .select("id", "name", "price")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(rows === Set((2L, "b", 25.0), (4L, "z", 40.0), (5L, "e", 50.0)))
  }

  test("summary counts by status") {
    val got = Cdc.diffSummary(oldV, newV, Seq("id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("added" -> 1L, "changed" -> 2L, "removed" -> 1L, "same" -> 1L))
  }
}
