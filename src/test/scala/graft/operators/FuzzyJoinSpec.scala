package graft.operators

import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {

  import spark.implicits._

  test("half-blocking finds every single-substitution pair, any length") {
    val left = Seq((1L, "smith"), (2L, "ab"), (3L, "x")).toDF("id", "name")
    val right = Seq(
      (11L, "smitt"),  // substitution in the last char (old suffix block missed this)
      (12L, "smith"),  // exact duplicate
      (13L, "zmith"),  // substitution in the first char
      (14L, "aB"),     // substitution in a 2-char string
      (15L, "y"),      // substitution in a 1-char string
      (16L, "smiths")  // insertion: out of scope, must NOT match
    ).toDF("id", "name")
    val got = FuzzyJoin.fuzzyPairs(left, right, maxDist = 1)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 11L), (1L, 12L), (1L, 13L), (2L, 14L), (3L, 15L)))
  }

  test("pairs beyond the distance budget are dropped even when co-blocked") {
    val left = Seq((1L, "abcdef")).toDF("id", "name")
    val right = Seq((2L, "abcxyz")).toDF("id", "name") // same first half, dist 3
    assert(FuzzyJoin.fuzzyPairs(left, right, maxDist = 1).count() === 0)
  }
}
