package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class DedupSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sfDir, "documents").cache()

  test("minhash signatures are deterministic and full-width") {
    val sig1 = Dedup.minhashSignatures(docs, "doc_id", "text").orderBy("doc_id").collect()
    val sig2 = Dedup.minhashSignatures(docs, "doc_id", "text").orderBy("doc_id").collect()
    assert(sig1.map(_.getSeq[Long](1)).toSeq === sig2.map(_.getSeq[Long](1)).toSeq)
    assert(sig1.head.getSeq[Long](1).length === Dedup.NumHashes)
  }

  test("identical texts always collide in minhash LSH") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different words about spark catalyst tungsten codegen")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(df, "doc_id", "text", threshold = 0.9).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    assert(pairs.head.getDouble(2) === 1.0)
  }

  test("minhash est similarity correlates with real near-dups in fixture") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5)
    assert(pairs.count() > 0) // fixture has planted near-dups
  }

  test("simhash: identical docs get hamming 0, near-dups small hamming") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon zeta eta iota") // 1 token changed
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDups(df, "doc_id", "text", maxHamming = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((1L, 2L)) === 0L)
    assert(pairs.get((1L, 3L)).forall(_ > 0L))
  }

  test("shingle guard: texts shorter than k don't explode") {
    import spark.implicits._
    val df = Seq((1L, "one"), (2L, "two words")).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(df, "doc_id", "text")
    assert(sigs.count() === 2)
  }

  test("incremental dedup: existing never dies, batch is first-occurrence-wins") {
    import spark.implicits._
    val x = "the quick brown fox jumps over the lazy dog again and again"
    val y = "spark catalyst plans every join shuffle and broadcast carefully"
    val z = "completely unrelated prose concerning nothing in particular here"
    val existing = Seq((1L, x), (2L, x)).toDF("doc_id", "text")
    val incoming = Seq((10L, x), (20L, y), (21L, y), (30L, z)).toDF("doc_id", "text")
    val got = Dedup.incrementalNearDups(existing, incoming, "doc_id", "text",
        threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // existing 1 and 2 duplicate each other but existing docs are never
    // victims; incoming 10 dies to the MIN existing partner with both
    // matches counted; 21 dies to its earlier batch mate 20, which itself
    // survives (no smaller-id match); 30 is unique and survives
    assert(got.toSeq === Seq((10L, 1L, 1.0, 2L), (21L, 20L, 1.0, 1L)))
  }
}

class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sfDir, "embeddings").cache()

  test("cosine of a vector with itself is 1.0 (exact)") {
    val self = emb.limit(5)
      .select((Similarity.dotExact("embedding", "embedding") /
        (Similarity.normExact("embedding") * Similarity.normExact("embedding"))).as("c"))
      .collect().map(_.getDouble(0))
    self.foreach(c => assert(math.abs(c - 1.0) < 1e-12))
  }

  test("brute-force top-k returns k ranked neighbors per query") {
    val r = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 3), k = 4)
      .collect()
    assert(r.length === 12)
    val byQ = r.groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      val cos = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b }) // descending
    }
  }

  test("exact dot product is partitioning-independent") {
    val one = emb.coalesce(1)
    val many = emb.repartition(7)
    def dots(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("vec_id") < 20)
        .select(col("vec_id"), Similarity.dotExact("embedding", "embedding").as("d"))
        .orderBy("vec_id").collect().map(_.getDouble(1)).toSeq
    assert(dots(one) === dots(many))
  }

  test("labelCentroidQuality: hand-computed centroids and cosines") {
    import spark.implicits._
    val vecs = Seq(
      (0, Array(1.0f, 0.0f)), // label-0 centroid = (0.5, 0.5); both members
      (0, Array(0.0f, 1.0f)), // sit at cos = 0.5 / (1 · √0.5) = √0.5
      (1, Array(3.0f, 4.0f))  // singleton: centroid = itself, cos exactly 1
    ).toDF("label", "embedding")
    val got = Similarity.labelCentroidQuality(vecs, "embedding", "label")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length === 2)
    val (l0, l1) = (got(0), got(1))
    assert(l0._1 === 0 && l0._2 === 2L)
    assert(math.abs(l0._3 - math.sqrt(0.5)) < 1e-5, l0)
    assert(math.abs(l0._4 - math.sqrt(0.5)) < 1e-5, l0)
    assert(l1._1 === 1 && l1._2 === 1L && l1._3 === 1.0 && l1._4 === 1.0)
  }

  test("labelCentroidQuality: centroids broadcast, no corpus-side shuffle join") {
    val df = Similarity.labelCentroidQuality(emb, "embedding", "label")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("LSH bucket join never emits a pair not sharing a bucket") {
    val sig = emb.select(col("vec_id"),
      Similarity.lshSignature("embedding").as("bucket"))
    val buckets = sig.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Similarity.lshNearNeighbors(emb, threshold = -1.0).collect()
    pairs.foreach { r =>
      assert(buckets(r.getLong(0)) === buckets(r.getLong(1)))
    }
  }
}

class SamplingSpec extends SparkSpec {

  test("epochManifest: stride interleave upweights small sources by sqrt-share") {
    import spark.implicits._
    // A: 90 docs (share .9, weight ≈ .949), B: 10 (share .1, weight ≈ .316)
    // → head proportion ≈ 3:1 (vs 9:1 natural); 40 head rows ⇒ B ≈ 10
    val docs = ((1 to 90).map(i => (i.toLong, "A")) ++
      (91 to 100).map(i => (i.toLong, "B"))).toDF("doc_id", "source")
    val head = Sampling.epochManifest(docs, "doc_id", "source", topN = 40).collect()
    val perSource = head.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(perSource("B") >= 7 && perSource("B") <= 13, perSource)
    // manifest comes back key-ascending, and each source's ranks appear
    // gap-free from 1 (a resumed reader can seek, not re-shuffle)
    val keys = head.map(_.getDouble(0))
    assert(keys.sameElements(keys.sorted))
    head.groupBy(_.getString(1)).foreach { case (_, rows) =>
      val ranks = rows.map(_.getInt(3)).sorted
      assert(ranks.sameElements(1 to ranks.length), ranks.mkString(","))
    }
    // deterministic: a second evaluation is row-identical
    val again = Sampling.epochManifest(docs, "doc_id", "source", topN = 40).collect()
    assert(head.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }
}

class TextAnalysisSpec extends SparkSpec {

  import TextAnalysis._

  test("occurrences counts literal markers") {
    import spark.implicits._
    val df = Seq(" the cat the dog the ").toDF("s")
    val n = df.select(occurrences(col("s"), " the ").as("n")).collect()(0).getLong(0)
    // non-overlapping: " the cat the dog the " → matches at 0 and 8 (shared spaces)
    assert(n >= 2)
  }

  test("token count matches split size on single-spaced text") {
    import spark.implicits._
    val df = Seq("a b c d", "single", "x y").toDF("s")
    val got = df.select(tokenCount(col("s")).as("n")).collect().map(_.getLong(0)).toSeq
    assert(got === Seq(4L, 1L, 2L))
  }

  test("langId picks the dominant marker with fixed tie precedence") {
    import spark.implicits._
    val df = Seq(
      " the cat the dog ",  // en
      " le chat le chien le ", // fr
      " nothing matching here ").toDF("padded")
    val got = df.select(langId(col("padded")).as("l")).collect().map(_.getString(0)).toSeq
    assert(got.take(2) === Seq("en", "fr"))
    assert(got(2) === "en") // all-zero tie → first in precedence
  }

  test("fingerprint is stable and 16 hex chars") {
    import spark.implicits._
    val df = Seq("some document text").toDF("s")
    val fp = df.select(fingerprint(col("s")).as("f")).collect()(0).getString(0)
    assert(fp.length === 16)
    assert(fp.matches("[0-9a-f]{16}"))
  }

  test("ngramOverlap counts distinct shared k-grams, train-side only") {
    import spark.implicits._
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon"), // shares the eval 4-gram twice-over region
      (2L, "alpha beta gamma delta zeta"),    // shares exactly one 4-gram
      (3L, "nothing in common at all here")).toDF("doc_id", "text")
    val eval = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val got = TextAnalysis.ngramOverlap(train, eval, "doc_id", "text", k = 4)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // doc 1: 4-grams {a b g d, b g d e} both shared → 2; doc 2: {a b g d} → 1
    assert(got === Seq((1L, 2L), (2L, 1L)))
  }

  test("ngramOverlap broadcasts the eval n-gram set") {
    import spark.implicits._
    val train = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val eval = Seq((9L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val df = TextAnalysis.ngramOverlap(train, eval, "doc_id", "text", k = 4)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the 100TB contract: eval (small) is the broadcast build side, the
    // train explode streams through map-side — no shuffle of train n-grams
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("repeatedNgramCensus: occurrence-preserving counts, short docs dropped") {
    import spark.implicits._
    val docs = Seq(
      (1L, "p q r s t u v w p q r s t u v w"), // the 8-gram "p q..w" twice
      (2L, "p q r s t u v w x"),               // shares it once, plus one more
      (3L, "short doc")).toDF("doc_id", "text") // < 8 tokens: no k-gram
    val got = TextAnalysis.repeatedNgramCensus(docs, "doc_id", "text", k = 8, topN = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // within-doc repeat counts in n_occ (3 = 2 in doc 1 + 1 in doc 2) but
    // n_docs stays distinct; ties at n_occ=1 break on ngram asc
    assert(got === Seq(
      ("p q r s t u v w", 3L, 2L, 1L),
      ("q r s t u v w p", 1L, 1L, 1L),
      ("q r s t u v w x", 1L, 1L, 2L)))
    assert(!got.exists(_._1.contains("short")))
  }

  test("repeatedNgramCensus top-N is a heap, not a global sort") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g h i")).toDF("doc_id", "text")
    val df = TextAnalysis.repeatedNgramCensus(docs, "doc_id", "text", k = 8, topN = 5)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }

  test("crossSourceNgramOverlap: distinct sets, bounded pair fanout, hand-computed") {
    import spark.implicits._
    val docs = Seq(
      ("A", "x y z"), // A-grams: {x y, y z}
      ("A", "x y q"), // dup "x y" collapses; A = {x y, y z, y q}
      ("B", "x y z"), // B = {x y, y z}
      ("C", "a b")    // C = {a b} — shares nothing: no output row
    ).toDF("source", "text")
    val got = TextAnalysis.crossSourceNgramOverlap(docs, "source", "text", k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got === Seq(("A", "B", 3L, 2L, 2L, 2.0 / 3.0)))
  }

  test("unigramKlBySource: hand-computed divergences") {
    import spark.implicits._
    // corpus: a:2 b:2 (T=4, q = 0.5/0.5)
    val docs = Seq(("A", "a a b"), ("B", "b")).toDF("source", "text")
    val got = TextAnalysis.unigramKlBySource(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val klA = (2.0 / 3) * math.log((2.0 / 3) / 0.5) + (1.0 / 3) * math.log((1.0 / 3) / 0.5)
    val klB = math.log(2.0)
    assert(got.map(t => (t._1, t._2, t._3)) === Seq(("A", 3L, 2L), ("B", 1L, 1L)))
    assert(math.abs(got(0)._4 - klA) < 1e-6, got(0))
    assert(math.abs(got(1)._4 - klB) < 1e-6, got(1))
    // a source identical to the corpus diverges by (at most rounding) zero
    val same = Seq(("X", "a b"), ("Y", "a b")).toDF("source", "text")
    TextAnalysis.unigramKlBySource(same, "source", "text")
      .collect().foreach(r => assert(math.abs(r.getDouble(3)) < 1e-8, r))
  }

  test("bigram-LM cross-entropy: add-one smoothing, hand-computed") {
    import spark.implicits._
    val train = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val eval = Seq((100L, "a b c"), (101L, "solo")).toDF("doc_id", "text")
    val got = TextAnalysis.ngramLmCrossEntropy(train, eval, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // train bigrams: (a,b)x2, (b,a)x1 -> c1: a=2, b=1; vocab V=2
    // P(b|a) = (2+1)/(2+2) = 0.75   -> -log2 rounds6 to 0.415037
    // P(c|b) = (0+1)/(1+2) = 1/3    -> -log2 rounds6 to 1.584963
    // xent = (0.415037 + 1.584963) / 2 = exactly 1.0 after the decimal sum;
    // the 1-token doc has no bigrams and emits no row
    assert(got === Seq((100L, 2L, 1.0)))
  }
}
