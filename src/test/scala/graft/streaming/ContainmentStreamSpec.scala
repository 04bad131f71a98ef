package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.streaming.GroupStateTimeout

import graft.SparkSpec

/** Top-level so MemoryStream can build an encoder (an inner case class
  * has no accessible outer scope at codegen time). */
case class ContainmentStreamSpecDoc(doc_id: Long, text: String)

/** Round-10: streaming candidate surfacing for the capped containment
  * census — bounded per-shingle state, candidate-superset emission. */
class ContainmentStreamSpec extends SparkSpec {

  private type Doc = ContainmentStreamSpecDoc
  private def Doc(id: Long, text: String) = ContainmentStreamSpecDoc(id, text)

  test("streaming candidates cover the batch capped census's pairs (two-batch arrival)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val contained = (1 to 12).map(i => s"alpha$i beta$i gamma$i").mkString(" ")
    val docs = Seq(
      Doc(1L, contained),
      Doc(2L, s"prefix words here $contained suffix tail tokens now"),
      Doc(3L, "unrelated text about completely different things entirely"),
      Doc(4L, s"another container document holding $contained inside it"))

    // batch reference: the capped census at the same parameters
    val batchPairs = graft.operators.Dedup.containmentPairsCapped(
        docs.toDF("doc_id", "text"), "doc_id", "text",
        k = 3, listCap = 64, maxDf = 20, minContainment = 0.8)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchPairs.nonEmpty, "planted containment must surface in batch")

    val stream = MemoryStream[Doc]
    stream.addData(docs.take(2))
    val q = ContainmentStream.candidatePairs(stream.toDF())
      .writeStream.format("memory").queryName("cpairs_test")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      stream.addData(docs.drop(2)) // later batch must pair against state
      q.processAllAvailable()
      val streamed = spark.table("cpairs_test")
        .where("rare").select("a_id", "b_id").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batchPairs.subsetOf(streamed),
        s"streaming candidates $streamed must cover batch pairs $batchPairs")
      // cross-batch: doc 4 arrived after 1/2 were in state
      assert(streamed.exists(p => p._2 == 4L),
        "a later-batch container must pair against standing state")
    } finally q.stop()
  }

  test("transition: state bounded by the cap, both-new pairs emitted once") {
    val cap = 3
    // a fake GroupState backed by a var
    var backing = Option.empty[List[(Long, Long)]]
    val state = new org.apache.spark.sql.streaming.GroupState[List[(Long, Long)]] {
      override def exists: Boolean = backing.isDefined
      override def get: List[(Long, Long)] = backing.get
      override def getOption: Option[List[(Long, Long)]] = backing
      override def update(s: List[(Long, Long)]): Unit = backing = Some(s)
      override def remove(): Unit = backing = None
      override def hasTimedOut: Boolean = false
      override def setTimeoutDuration(d: Long): Unit = ()
      override def setTimeoutDuration(d: String): Unit = ()
      override def setTimeoutTimestamp(t: Long): Unit = ()
      override def setTimeoutTimestamp(t: Long, add: String): Unit = ()
      override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
      override def setTimeoutTimestamp(t: java.sql.Date, add: String): Unit = ()
      override def getCurrentWatermarkMs(): Long = 0L
      override def getCurrentProcessingTimeMs(): Long = 0L
    }
    // batch 1: ranks 10,20 admitted; one pair, emitted once
    val e1 = ContainmentStream.transition(cap, 20)(7L,
      Iterator(ContainmentStream.Occ(7L, 10L, 101L),
        ContainmentStream.Occ(7L, 20L, 102L)), state).toList
    assert(e1.map(p => (p.a_id, p.b_id)) === List((101L, 102L)))
    assert(backing.get.map(_._2) === List(101L, 102L))
    // batch 2: rank 5 admitted (evicting nothing yet), rank 99 evicted on
    // arrival of rank 1 in the same batch — state stays <= cap
    val e2 = ContainmentStream.transition(cap, 20)(7L,
      Iterator(ContainmentStream.Occ(7L, 5L, 103L),
        ContainmentStream.Occ(7L, 99L, 104L),
        ContainmentStream.Occ(7L, 1L, 105L)), state).toList
    assert(backing.get.length <= cap)
    assert(backing.get.map(_._2) === List(105L, 103L, 101L),
      "state must hold the bottom-cap ranks after the merge")
    // every emitted pair references only co-resident members
    val resident = backing.get.map(_._2).toSet + 101L + 102L
    e2.foreach(p => assert(resident(p.a_id) && resident(p.b_id)))
    // no duplicate emissions within the batch
    assert(e2.map(p => (p.a_id, p.b_id)).distinct.size === e2.size)
  }

  test("retention converges to the batch bottom-k regardless of arrival order") {
    val cap = 4
    val occs = (1 to 10).map(i =>
      ContainmentStream.Occ(1L, rk = (i * 37 % 11).toLong, id = 200L + i))
    def runOrder(order: Seq[ContainmentStream.Occ]): List[Long] = {
      var backing = Option.empty[List[(Long, Long)]]
      val state = new org.apache.spark.sql.streaming.GroupState[List[(Long, Long)]] {
        override def exists: Boolean = backing.isDefined
        override def get: List[(Long, Long)] = backing.get
        override def getOption: Option[List[(Long, Long)]] = backing
        override def update(s: List[(Long, Long)]): Unit = backing = Some(s)
        override def remove(): Unit = backing = None
        override def hasTimedOut: Boolean = false
        override def setTimeoutDuration(d: Long): Unit = ()
        override def setTimeoutDuration(d: String): Unit = ()
        override def setTimeoutTimestamp(t: Long): Unit = ()
        override def setTimeoutTimestamp(t: Long, add: String): Unit = ()
        override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
        override def setTimeoutTimestamp(t: java.sql.Date, add: String): Unit = ()
        override def getCurrentWatermarkMs(): Long = 0L
        override def getCurrentProcessingTimeMs(): Long = 0L
      }
      order.grouped(3).foreach(b =>
        ContainmentStream.transition(cap, 20)(1L, b.iterator, state).toList)
      backing.get.map(_._2)
    }
    val a = runOrder(occs)
    val b = runOrder(scala.util.Random.shuffle(occs.toList))
    assert(a === b, "bottom-k retention must be arrival-order independent")
  }
}
