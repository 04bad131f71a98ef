package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-8 operators: BPE pair census, Zipf rank-frequency slope, PMI
  * collocations, ANN recall audit. */
class Round8OperatorsSpec extends SparkSpec {

  test("bpePairCensus: pair counts weight by occurrence, distinct words dedupe") {
    import spark.implicits._
    // each "abab" carries ab,ba,ab; "ab" carries ab; single-char "a"
    // contributes nothing → ab: 5 occurrences in 2 distinct words, ba: 2 in 1
    val docs = Seq("abab ab a", "abab").toDF("text")
    val out = TextAnalysis.bpePairCensus(docs, "text", topN = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("ab", 5L, 2L), ("ba", 2L, 1L)))
  }

  test("zipfSlope: an exact power law recovers its exponent") {
    import spark.implicits._
    // frequencies 64,32,16,8,4,2,1 over ranks 1..7: ln f = ln 64 - ln 2 · ln r / ... not
    // linear in ln r — instead use f(r) = floor(C / r) with C chosen so the
    // fit is exactly slope -1: f = 720/r for r=1..6 (720,360,240,180,144,120)
    val words = (1 to 6).flatMap(r => Seq.fill(720 / r)(s"w$r"))
    val docs = Seq(words.mkString(" ")).toDF("text").withColumn("lang", lit("en"))
    val row = TextAnalysis.zipfSlope(docs, "lang", "text", topN = 10).collect().head
    assert(row.getLong(1) === 6L)
    assert(math.abs(row.getDouble(2) - (-1.0)) < 1e-6,
      s"slope ${row.getDouble(2)} should be -1 for f = C/r")
  }

  test("pmiCollocations: a fused pair outranks independent co-occurrence") {
    import spark.implicits._
    // "new york" always adjacent (5x); "the cat" adjacent but both words
    // also appear apart → lower PMI
    val docs = Seq(
      Seq.fill(5)("new york").mkString(" "),
      "the cat the dog the cat the dog the cat",
      "cat alone the end the end the end the fin"
    ).toDF("text")
    val out = TextAnalysis.pmiCollocations(docs, "text", minCount = 3, topN = 5)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(3))).toMap
    assert(out.contains(("new", "york")))
    val pmiNy = out(("new", "york"))
    assert(out.filterNot(_._1 == (("new", "york"))).values.forall(_ < pmiNy),
      s"'new york' should carry the top PMI: $out")
  }

  test("noveltyCensus: a source repeating earlier content scores zero novelty") {
    import spark.implicits._
    // doc 1 (src_a) introduces everything; doc 2 (src_b) repeats doc 1
    // verbatim; doc 3 (src_b) is entirely new → src_b novelty = new/(old+new)
    val docs = Seq(
      (1L, "src_a", "a b c d"),
      (2L, "src_b", "a b c d"),
      (3L, "src_b", "p q r s")
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.noveltyCensus(docs, "doc_id", "text", "source", k = 3)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // k=3 over 4 tokens → 2 distinct shingles per doc
    assert(out.toSeq === Seq(
      ("src_a", 1L, 2L, 2L, 1.0),
      ("src_b", 2L, 4L, 2L, 0.5)))
  }

  test("annRecall: recall is 1 exactly for truth neighbors sharing the query's bucket") {
    val e = graft.sources.Tables.load(spark, sfDir, "embeddings")
    val out = Similarity.annRecall(e, e.filter(col("vec_id") < 10), k = 5)
      .orderBy(col("qid")).collect()
    assert(out.length === 10)
    out.foreach { r =>
      assert(r.getLong(1) === 5L) // n_truth = k
      val recall = r.getDouble(3)
      assert(recall >= 0.0 && recall <= 1.0)
      assert(recall === r.getLong(2).toDouble / 5.0)
    }
  }

  test("annRecall broadcasts the truth set, not the corpus") {
    val e = graft.sources.Tables.load(spark, sfDir, "embeddings")
    val plan = Similarity.annRecall(e, e.filter(col("vec_id") < 10), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"bucket joins not broadcast:\n$plan")
  }

  test("kmeansCensus: every vector lands in exactly one cluster, rollup is consistent") {
    val e = graft.sources.Tables.load(spark, sfDir, "embeddings")
    val out = Ivf.kmeansCensus(e, "vec_id", "embedding", k = 8, iters = 2).collect()
    assert(out.map(_.getInt(0)).toSet.subsetOf((0 until 8).toSet))
    assert(out.map(_.getLong(2)).sum === e.count())
    out.foreach { r =>
      val (mean, min) = (r.getDouble(3), r.getDouble(4))
      assert(min <= mean + 1e-12, s"cluster ${r.getInt(0)}: min $min > mean $mean")
      assert(mean <= 1.0 + 1e-12 && min >= -1.0 - 1e-12)
    }
    // Lloyd pulls members toward their centroid: after 2 iterations every
    // cluster's members should on average point the same way as it
    assert(out.forall(_.getDouble(3) > 0.0))
  }

  test("kmeansCensus is deterministic under repartitioning") {
    val e = graft.sources.Tables.load(spark, sfDir, "embeddings")
    val a = Ivf.kmeansCensus(e, "vec_id", "embedding", k = 8, iters = 2).collect()
    val b = Ivf.kmeansCensus(e.repartition(13), "vec_id", "embedding", k = 8, iters = 2)
      .collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("boilerplateCensus: corpus-wide doc frequency, per-source occurrence shares") {
    import spark.implicits._
    // line cutting at 3 tokens; "a b c" appears in docs 1 (src_x) and 2
    // (src_y) → boilerplate; doc 3's "g h i" is unique
    val docs = Seq(
      (1L, "src_x", "a b c d e f"), // lines: "a b c", "d e f"
      (2L, "src_y", "a b c"),       // line:  "a b c" (boilerplate, df=2)
      (3L, "src_y", "g h i")        // line:  "g h i" (unique)
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.boilerplateCensus(docs, "doc_id", "text", "source",
      lineTokens = 3, minDocs = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq === Seq(
      ("src_x", 2L, 1L, 1L, 0.5),
      ("src_y", 2L, 1L, 1L, 0.5)))
  }

  test("heapsCensus: saturated vocabulary gives beta 0, fresh-type growth gives 1") {
    import spark.implicits._
    // ids chosen so md5 first hex digit splits them into half/full slices
    val half = (1L to 200L).filter(id =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes).map("%02x".format(_)).mkString.head < '8')
    // saturated: every doc repeats the same 2 types → V == V_half → beta 0
    val sat = (1L to 200L).map(id => (id, "sat", "tok alt"))
    val df = sat.toDF("doc_id", "lang", "text")
    val out = TextAnalysis.heapsCensus(df, "lang", "text", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(5))).head
    assert(out._1 === "sat")
    assert(out._2 === 400L) // 2 tokens per doc
    assert(out._3 === 2L)
    assert(out._4 === 0.0) // ln(V/V_half) = ln(1) = 0
    assert(half.nonEmpty && half.size < 200) // the md5 half is a strict subset
  }

  test("heapsCensus: every-token-new corpus estimates beta = 1") {
    import spark.implicits._
    // each doc carries one globally unique type → V = N at every slice
    val docs = (1L to 100L).map(id => (id, "uniq", s"type_$id")).toDF("doc_id", "lang", "text")
    val row = TextAnalysis.heapsCensus(docs, "lang", "text", "doc_id").collect().head
    assert(row.getLong(1) === row.getLong(2))     // N == V
    assert(row.getLong(3) === row.getLong(4))     // N_half == V_half
    assert(math.abs(row.getDouble(5) - 1.0) < 1e-9)
  }

  test("bpeTrainMerges: merges follow frequency with greedy left-to-right apply") {
    import spark.implicits._
    // wc: aaab×2, ab×1.
    // iter0: (a,a) weighted 4 beats (a,b) 3 → merge aa; greedy leftmost
    //   in the aaa run merges pos0 only (pos1 consumed, pos2's next is b)
    // iter1: aaab is now [aa, a, b] → (aa,a) 2 vs (a,b) 2+1=3 → merge ab
    // iter2: aaab is [aa, ab] → merge aaab at weight 2
    // iter3: no adjacent pairs remain → trainer stops emitting
    val docs = Seq("aaab aaab ab").toDF("text")
    val out = TextAnalysis.bpeTrainMerges(docs, "text", nMerges = 4).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (0L, "a~a", "aa", 4L),
      (1L, "a~b", "ab", 3L),
      (2L, "aa~ab", "aaab", 2L)))
  }

  test("bpeTrainMerges: self-pair runs merge at even offsets only") {
    import spark.implicits._
    // "aaaa": run of four a's → greedy merges pos0 and pos2 → [aa, aa];
    // the second merge is then (aa,aa) → aaaa
    val docs = Seq("aaaa").toDF("text")
    val out = TextAnalysis.bpeTrainMerges(docs, "text", nMerges = 2).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq === Seq(("a~a", "aa", 3L), ("aa~aa", "aaaa", 1L)))
  }

  test("tokenBudgetPlan: sqrt temperature weights and epoch arithmetic are exact") {
    import spark.implicits._
    // 100 vs 400 tokens -> sqrt weights 10:20 -> 1/3 : 2/3 of a 250-token budget
    val docs = Seq(
      ("srcA", (1 to 100).map(i => s"a$i").mkString(" ")),
      ("srcB", (1 to 400).map(i => s"b$i").mkString(" "))).toDF("source", "text")
    val out = TextAnalysis.tokenBudgetPlan(docs, "source", "text").collect()
    val a = out.find(_.getString(0) == "srcA").get
    val b = out.find(_.getString(0) == "srcB").get
    assert(a.getLong(2) === 100L && b.getLong(2) === 400L)
    assert(math.abs(a.getDouble(4) - 1.0 / 3) < 1e-9)   // weight
    assert(math.abs(b.getDouble(4) - 2.0 / 3) < 1e-9)
    assert(math.abs(a.getDouble(5) - 250.0 / 3) < 1e-6) // planned tokens
    assert(math.abs(a.getDouble(6) - 2.5 / 3) < 1e-9)   // epochs: 83.3/100
    assert(math.abs(b.getDouble(6) - 250.0 / 600) < 1e-9)
  }

  test("noveltySaturation: first batch is all-novel, cumsum reaches the gram total") {
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val out = TextAnalysis.noveltySaturation(docs, "doc_id", "text", k = 8)
      .orderBy(col("batch")).collect()
    assert(out.nonEmpty)
    assert(out.head.getDouble(4) === 1.0, "earliest batch must be 100% novel")
    val totalNovel = out.map(_.getLong(2)).sum
    assert(out.last.getLong(3) === totalNovel, "cumsum must end at the novel total")
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // novel <= grams seen in batch
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
    // cum_novel is nondecreasing in batch order
    out.map(_.getLong(3)).sliding(2).foreach {
      case Array(x, y) => assert(x <= y); case _ => ()
    }
  }

  test("hardNegatives: one cross-label neighbor per emitting anchor, exact cosine") {
    val e = graft.sources.Tables.load(spark, sfDir, "embeddings").cache()
    val out = Similarity.hardNegatives(e, "vec_id", "embedding", "label", k = 1)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(0)).distinct.length === rows.length) // one per anchor
    rows.foreach { r =>
      assert(r.getInt(1) !== r.getInt(3), s"anchor ${r.getLong(0)}: same label")
      assert(r.getInt(5) === 1)
    }
    // reported cosine must equal the independently computed exact cosine
    graft.functions.GraftFunctions.register(spark)
    val sample = rows.take(5).map(r => (r.getLong(0), r.getLong(2), r.getDouble(4)))
    val byId = e.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    import spark.implicits._
    sample.foreach { case (aId, nId, cos) =>
      val df = Seq((byId(aId), byId(nId))).toDF("a", "b")
      val exact = df.select((Similarity.scaledDot("a", "b").cast("double") /
        (Similarity.scaledNorm("a") * Similarity.scaledNorm("b"))).as("c"))
        .collect().head.getDouble(0)
      assert(math.abs(exact - cos) < 1e-12, s"pair ($aId, $nId)")
    }
  }

  test("containmentPairs: doc-in-doc pair surfaces with high containment, low jaccard") {
    import spark.implicits._
    val small = "quick brown foxes vault over lazy sleeping dogs tonight"
    val big = small + " " + (1 to 60).map(i => s"filler$i token$i").mkString(" ")
    val other = "completely different content about maritime navigation charts"
    val docs = Seq((1L, small), (2L, big), (3L, other)).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, "doc_id", "text",
      k = 3, maxDf = 20, minContainment = 0.8).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1)) === ((1L, 2L)))
    assert(r.getDouble(5) === 1.0, "small doc fully contained")
    assert(r.getDouble(6) < 0.5, s"jaccard ${r.getDouble(6)} must stay low — " +
      "this is exactly the pair MinHash-on-Jaccard misses")
  }

  test("containmentPairs: ubiquitous shingles alone never form candidates") {
    import spark.implicits._
    // the shared trigram appears in every doc → df above maxDf → blocked
    val docs = (1L to 30L).map(i => (i, s"common shared trigram unique$i tail$i"))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, "doc_id", "text",
      k = 3, maxDf = 20, minContainment = 0.1).collect()
    assert(out.isEmpty, "stop-shingle must not drive a quadratic candidate set")
  }

  test("winnowing guarantee: a shared k+w-1-token run yields a common fingerprint") {
    import spark.implicits._
    val run = "alpha beta gamma delta epsilon zeta eta" // 7 tokens = k+w-1
    val a = s"one two three four five six seven eight nine ten $run"
    val b = s"$run red orange yellow green blue indigo violet umber"
    val c = "completely unrelated maritime navigation charts for coastal sailors tonight"
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val fps = Winnow.fingerprints(docs, "doc_id", "text", k = 4, w = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty,
      "the full window inside the shared run must select the same min in both docs")
    assert((byDoc(1L) intersect byDoc(3L)).isEmpty)
    assert((byDoc(2L) intersect byDoc(3L)).isEmpty)
  }

  test("winnowing: short documents contribute no fingerprints") {
    import spark.implicits._
    val docs = Seq((1L, "just five words right here"), (2L, "tiny")).toDF("doc_id", "text")
    // 5 tokens → 2 four-grams → no full 4-hash window; 1 token → truncated gram
    assert(Winnow.fingerprints(docs, "doc_id", "text", k = 4, w = 4).count() === 0)
  }

  test("labelPropagation separates bridged triangles that components would merge") {
    import spark.implicits._
    // two triangles joined by one bridge edge 3-4: connected components
    // sees ONE component; LPA keeps the two dense neighborhoods apart
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("src", "dst")
    val nodes = (1L to 6L).toDF("id")
    val got = Graph.labelPropagation(nodes, edges, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === got(2L) && got(2L) === got(3L))
    assert(got(4L) === got(5L) && got(5L) === got(6L))
    assert(got(1L) !== got(4L), s"bridge must not merge communities: $got")
  }

  test("triangleCensus: closed triangle counts once per node; open wedge counts zero") {
    import spark.implicits._
    // triangle 1-2-3 plus a pendant 3-4 and an open wedge 5-6, 6-7
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (5L, 6L), (6L, 7L))
      .toDF("a_id", "b_id")
    val got = Graph.triangleCensus(pairs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((2L, 1L, 1.0)))
    assert(got(2L) === ((2L, 1L, 1.0)))
    assert(got(3L) === ((3L, 1L, 1.0 / 3.0))) // 2·1/(3·2)
    assert(got(4L) === ((1L, 0L, 0.0)))
    assert(got(6L) === ((2L, 0L, 0.0)), "open wedge closes no triangle")
  }
}
