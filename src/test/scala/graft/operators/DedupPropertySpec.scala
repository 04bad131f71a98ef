package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Property-based cross-checks of the round-8 pair operators against
  * in-memory brute-force references — the operators run distributed
  * (hash-blocked self-joins, window mins); the references are direct
  * set arithmetic over the same shingle semantics.
  */
class DedupPropertySpec extends SparkSpec {

  /** Mirror of WordNgrams + array_distinct: k-token windows, one
    * truncated window for texts shorter than k tokens. */
  private def shingleSet(text: String, k: Int): Set[String] = {
    val toks = text.split(" ").toSeq
    if (toks.length <= k) Set(toks.mkString(" "))
    else toks.sliding(k).map(_.mkString(" ")).toSet
  }

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")

  private def phrase(n: Int, seed: Long): String = {
    val r = new scala.util.Random(seed)
    (1 to n).map(_ => vocab(r.nextInt(vocab.size))).mkString(" ")
  }

  test("containmentPairs matches a brute-force reference on random corpora") {
    import spark.implicits._
    val (k, maxDf, heavyCap, minC) = (3, 4, 1000, 0.5)
    val corpusGen: Gen[Seq[(Long, String)]] = for {
      nBase <- Gen.choose(4, 8)
      seeds <- Gen.listOfN(nBase, Gen.choose(0L, 10000L))
      lens <- Gen.listOfN(nBase, Gen.choose(5, 25))
      nDerived <- Gen.choose(1, 3)
      picks <- Gen.listOfN(nDerived, Gen.choose(0, nBase - 1))
    } yield {
      val base = seeds.zip(lens).zipWithIndex.map { case ((s, l), i) =>
        (i.toLong, phrase(l, s))
      }
      // derived docs embed a base doc wholesale → planted containment
      val derived = picks.zipWithIndex.map { case (p, j) =>
        ((nBase + j).toLong, base(p)._2 + " " + phrase(8, 9000L + j))
      }
      base ++ derived
    }
    val prop = Prop.forAll(corpusGen) { corpus =>
      val shs = corpus.map { case (id, t) => id -> shingleSet(t, k) }.toMap
      val df = shs.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
      val countable: String => Boolean = s => df(s) >= 2 && df(s) <= heavyCap
      val ids = corpus.map(_._1).sorted
      val expected = (for {
        a <- ids; b <- ids if a < b
        shared = (shs(a) intersect shs(b)).filter(countable)
        if shared.nonEmpty && shared.exists(s => df(s) <= maxDf)
        inter = shared.size.toLong
        if inter.toDouble / math.min(shs(a).size, shs(b).size) >= minC
      } yield (a, b, inter, shs(a).size.toLong, shs(b).size.toLong)).toSet
      val got = Dedup.containmentPairs(corpus.toDF("doc_id", "text"),
          "doc_id", "text", k = k, maxDf = maxDf,
          minContainment = minC, heavyCap = heavyCap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("winnowing guarantee holds for every planted k+w-1-token run") {
    import spark.implicits._
    val (k, w) = (4, 4)
    val caseGen: Gen[(String, String)] = for {
      runSeed <- Gen.choose(0L, 10000L)
      preLen <- Gen.choose(0, 12)
      sufLen <- Gen.choose(0, 12)
      runLen <- Gen.choose(k + w - 1, k + w + 5)
    } yield {
      val run = phrase(runLen, runSeed)
      // distinct surrounding pools so only the run is shared by design
      val pre = (1 to preLen).map(i => s"pre$i$runSeed").mkString(" ")
      val suf = (1 to sufLen).map(i => s"suf$i$runSeed").mkString(" ")
      (s"$pre $run".trim, s"$run $suf".trim)
    }
    val prop = Prop.forAll(caseGen) { case (a, b) =>
      val fps = Winnow.fingerprints(
          Seq((1L, a), (2L, b)).toDF("doc_id", "text"), "doc_id", "text", k, w)
        .collect().map(r => r.getLong(0) -> r.getString(1))
      val f1 = fps.collect { case (1L, f) => f }.toSet
      val f2 = fps.collect { case (2L, f) => f }.toSet
      (f1 intersect f2).nonEmpty
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
