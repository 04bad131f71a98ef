package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity, SubstringDedup}
import Q._

/** Deduplication + similarity-search suite over the `documents` and
  * `embeddings` fixtures (training-data-pipeline extension surface).
  *
  * Oracle notes: every query here is fully DuckDB-oracle-checked. The
  * signature pipelines (q23 MinHash, q24 SimHash) use the md5-prefix hash
  * family ([[graft.functions.HashUtils]]) precisely so the oracle can
  * replay signatures bit-for-bit — `md5()` is the one hash both engines
  * share; their pipelines are additionally spec-tested in ScalaTest.
  */
object DedupQueries {

  val defs: Map[String, QueryFn] = Map(
    // Embedding-space decontamination (Similarity.semanticDecontaminate):
    // every train vector's max cosine against a small broadcast eval set
    // (vec_id % 499 == 0) + hits over 0.2 — the semantic counterpart to
    // q80/q96's n-gram decontamination. Top-50 closest train vectors.
    "q116_semantic_decontam" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      Similarity.semanticDecontaminate(
        e.filter(col("vec_id") % 499 =!= 0), e.filter(col("vec_id") % 499 === 0),
        "vec_id", "embedding", threshold = 0.2)
        .orderBy(col("max_cosine").desc, col("train_id")).limit(50)
    },

    // Exact-substring dedup (SubstringDedup.killSpans, Lee et al. 2022):
    // per-document merged kill-span accounting for 8-token windows whose
    // exact sequence occurred earlier in the corpus — first occurrence (by
    // (doc_id, pos)) survives, every later occurrence marks its [pos,
    // pos+8) span, overlapping spans union per document. The oracle
    // computes the union by COUNT(DISTINCT killed position) while the
    // Spark side merges sorted intervals — two independent algorithms
    // agreeing on the same answer.
    "q126_substring_dedup" -> { (s, dir) =>
      SubstringDedup.killSpans(t(s, dir, "documents"), "doc_id", "text", k = 8)
        .orderBy(col("removed_tokens").desc, col("doc_id")).limit(100)
    },

    // MinHash calibration — the reliability diagram for the sketch every
    // dedup decision rests on: LSH candidate pairs at a low gate
    // (est >= 0.2) re-scored with their TRUE shingle-set Jaccard, rolled
    // up by estimated-similarity decile. mean_true tracking mean_est per
    // bin is what justifies the q23/q70/q105 thresholds; a bin where they
    // diverge is a miscalibrated sketch. Candidates stay LSH-bounded — the
    // exact rescoring only touches pairs the banding already surfaced.
    "q124_minhash_calibration" -> { (s, dir) =>
      import org.apache.spark.sql.types.DecimalType
      val docs = t(s, dir, "documents")
      val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.2)
      val sh = docs.select(col("doc_id"), Dedup.shingles("text", 3).as("sh"))
      pairs
        .join(sh.select(col("doc_id").as("a_id"), col("sh").as("a_sh")), Seq("a_id"))
        .join(sh.select(col("doc_id").as("b_id"), col("sh").as("b_sh")), Seq("b_id"))
        .withColumn("inter", size(array_intersect(col("a_sh"), col("b_sh"))).cast("long"))
        .withColumn("true_j", col("inter").cast("double") /
          (size(col("a_sh")).cast("long") + size(col("b_sh")).cast("long") - col("inter"))
            .cast("double"))
        .withColumn("bin", floor(col("est_jaccard") * 10).cast("long"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_pairs"),
          (sum(col("est_jaccard").cast(DecimalType(30, 9))).cast("double") /
            count(lit(1))).as("mean_est"),
          (sum(col("true_j").cast(DecimalType(30, 9))).cast("double") /
            count(lit(1))).as("mean_true"),
          min(col("true_j")).as("min_true"),
          max(col("true_j")).as("max_true"))
        .orderBy(col("bin"))
    },

    // Exact dedup via content-hash groupBy: per-lang doc/unique/dup-group
    // counts, both full-text and 50-char-prefix normalized.
    // Sampled-audit census (round 9, the queries()-level twin of the
    // `dedup --sample` CLI verb): the SAME exact-dup census over the full
    // corpus and over a 25% deterministic content-hash Bernoulli sample
    // (Sampling.qualityWeighted at constant rate — membership is a pure
    // md5-threshold on the id, so DuckDB replays the identical sample),
    // side by side. At 100 TB the sample row is what an exact-
    // intersection-class audit (q124) actually runs on; the full row here
    // is the ground truth the sample's extrapolation is judged against.
    "q185_sampled_dedup_audit" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val sampled = graft.operators.Sampling.qualityWeighted(
        d.withColumn("_k", col("doc_id").cast("string")), "_k", lit(0.25))
        .drop("_k")
      def census(df: org.apache.spark.sql.DataFrame, mode: String) = df
        .groupBy(md5(col("text").cast("binary")).as("k"))
        .agg(count(lit(1)).as("c"))
        .agg(lit(mode).as("mode"), sum(col("c")).as("n_docs"),
          count(lit(1)).as("n_keys"),
          sum(when(col("c") > 1, col("c") - 1).otherwise(lit(0L))).as("dup_docs"))
      census(d, "full").unionByName(census(sampled, "sample"))
        .orderBy(col("mode"))
    },

    "q22_dedup_exact" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val prefixDups = d
        .groupBy(col("lang"), md5(substring(col("text"), 1, 50).cast("binary")).as("pfx"))
        .agg(count(lit(1)).as("c"))
        .filter(col("c") > 1)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_prefix_dup_groups"),
          sum(col("c")).as("n_prefix_dup_docs"))
      d.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(md5(col("text").cast("binary"))).as("n_unique"))
        .join(prefixDups, Seq("lang"), "left_outer")
        .select(col("lang"), col("n_docs"), col("n_unique"),
          coalesce(col("n_prefix_dup_groups"), lit(0L)).as("n_prefix_dup_groups"),
          coalesce(col("n_prefix_dup_docs"), lit(0L)).as("n_prefix_dup_docs"))
        .orderBy(col("lang"))
    },

    // Normalized dedup keys (Dedup.normalizeKey): exact-dup census under
    // raw vs casefold+whitespace-collapsed keys. The fixture corpus is
    // uniformly lowercase and single-spaced, so the normalizer's effect is
    // demonstrated on a deterministically perturbed union: every 40th doc
    // re-ingested with case drift (UPPER), every 55th with whitespace
    // drift (doubled separators + leading pad) — the two artifacts real
    // re-crawls produce. Raw keys see the perturbed copies as unique;
    // normalized keys collapse them back onto their originals, so the two
    // modes report DIFFERENT dup counts. One corpus scan: both keys ride
    // a 2-element explode, then two-level aggregation.
    "q127_normalized_dedup" -> { (s, dir) =>
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val cased = d.filter(col("doc_id") % 40 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), upper(col("text")).as("text"))
      val spaced = d.filter(col("doc_id") % 55 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(lit("  "), regexp_replace(col("text"), " ", "  ")).as("text"))
      d.unionByName(cased).unionByName(spaced)
        .select(explode(array(
          struct(lit("raw").as("mode"), col("text").as("k")),
          struct(lit("normalized").as("mode"),
            Dedup.normalizeKey(col("text")).as("k")))).as("mk"))
        .select(col("mk.mode").as("mode"), col("mk.k").as("k"))
        .groupBy(col("mode"), col("k")).agg(count(lit(1)).as("c"))
        .groupBy(col("mode"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("c") > 1, lit(1L)).otherwise(lit(0L))).as("dup_groups"),
          sum(when(col("c") > 1, col("c") - 1).otherwise(lit(0L))).as("dup_docs"))
        .orderBy(col("mode"))
    },

    // Full-Unicode NFC dedup census (round 9, the implemented COVERAGE
    // gap): plant TWO spellings of the same prefix — decomposed
    // E+COMBINING-ACUTE over uppercased text vs precomposed É over the
    // original with doubled spacing — and census raw vs
    // Dedup.normalizeKeyUnicode keys. Raw keys keep all plants distinct;
    // NFC+casefold+collapse keys collide them pairwise, which only a
    // canonical-composition normalizer can do (the q127 ASCII core cannot
    // — byte-distinct combining marks survive lower/trim). Oracle replays
    // via DuckDB's nfc_normalize + chr() so both engines build identical
    // UTF-8 plants.
    "q184_nfc_dedup" -> { (s, dir) =>
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val decomposed = d.filter(col("doc_id") % 40 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(lit("E\u0301cole "), upper(col("text"))).as("text"))
      val precomposed = d.filter(col("doc_id") % 40 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(lit("\u00c9cole  "), col("text")).as("text"))
      d.unionByName(decomposed).unionByName(precomposed)
        .select(explode(array(
          struct(lit("raw").as("mode"), col("text").as("k")),
          struct(lit("nfc").as("mode"),
            Dedup.normalizeKeyUnicode(col("text")).as("k")))).as("mk"))
        .select(col("mk.mode").as("mode"), col("mk.k").as("k"))
        .groupBy(col("mode"), col("k")).agg(count(lit(1)).as("c"))
        .groupBy(col("mode"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("c") > 1, lit(1L)).otherwise(lit(0L))).as("dup_groups"),
          sum(when(col("c") > 1, col("c") - 1).otherwise(lit(0L))).as("dup_docs"))
        .orderBy(col("mode"))
    },

    // MinHash+LSH near-dup pairs (shingle→minhash→band→bucket-join).
    "q23_dedup_minhash_lsh" -> { (s, dir) =>
      Dedup.minhashNearDups(t(s, dir, "documents"), "doc_id", "text", threshold = 0.5)
        .orderBy(col("a_id"), col("b_id"))
    },

    // Dedup cluster formation: MinHash-LSH pairs → connected components →
    // one row per cluster with its canonical (minimum-id) representative
    // and sorted member list — the "which doc do we keep" step after pair
    // generation.
    "q70_dedup_clusters" -> { (s, dir) =>
      val pairs = Dedup.minhashNearDups(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.5)
      Dedup.components(pairs)
        .groupBy(col("label").as("cluster"))
        .agg(count(lit(1)).as("n_members"),
          concat_ws(",",
            expr("transform(sort_array(collect_list(node)), x -> cast(x AS string))"))
            .as("members"))
        .orderBy(col("cluster"))
    },

    // Cross-source contamination census: near-dup pairs rolled up by the
    // (unordered) source pair — "which feeds duplicate each other", the
    // question that decides which crawl snapshots to drop. Composition of
    // the MinHash pipeline with a dimension re-attach: the pair set is tiny
    // after LSH+verify, so the two source joins are broadcast-sized.
    "q82_cross_source_dups" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5)
      val src = docs.select(col("doc_id"), col("source"))
      pairs
        .join(src.select(col("doc_id").as("a_id"), col("source").as("sa")), Seq("a_id"))
        .join(src.select(col("doc_id").as("b_id"), col("source").as("sb")), Seq("b_id"))
        .select(least(col("sa"), col("sb")).as("src_a"),
          greatest(col("sa"), col("sb")).as("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("src_a"), col("src_b"))
    },

    // Incremental dedup (Dedup.incrementalNearDups): the rolling-ingestion
    // flow — a new batch (doc_id % 4 = 0) deduped against the standing
    // corpus plus its own earlier docs. Existing x existing pairs are
    // never formed; output is the deterministic kill list.
    "q105_incremental_dedup" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      Dedup.incrementalNearDups(
        docs.filter(col("doc_id") % 4 =!= 0),
        docs.filter(col("doc_id") % 4 === 0),
        "doc_id", "text", threshold = 0.5)
        .orderBy(col("doc_id"))
    },

    // SemDeDup end step: canonical representative per near-dup cluster —
    // each q70 cluster keeps its longest member (n_chars desc, id asc
    // tie-break) and the rest become the kill list. One window over
    // cluster-labeled rows; clusters have ≥2 members by construction.
    "q114_cluster_canonical" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents")
      val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5)
      val labeled = Dedup.components(pairs)
        .join(docs.select(col("doc_id").as("node"), col("n_chars")), Seq("node"))
      val w = Window.partitionBy(col("label")).orderBy(col("n_chars").desc, col("node"))
      labeled.withColumn("rk", row_number().over(w))
        .groupBy(col("label").as("cluster"))
        .agg(min(when(col("rk") === 1, col("node"))).as("kept_id"),
          max(when(col("rk") === 1, col("n_chars"))).as("kept_chars"),
          sum(when(col("rk") > 1, 1L).otherwise(0L)).as("n_killed"),
          concat_ws(",", expr(
            "transform(sort_array(collect_list(CASE WHEN rk > 1 THEN node END)), " +
              "x -> cast(x AS string))")).as("killed"))
        .orderBy(col("cluster"))
    },

    // Per-label centroid quality (Similarity.labelCentroidQuality):
    // exact per-dim class centroids, member cosine to own centroid,
    // count/mean/min rollup — the embedding-space audit that flags
    // diffuse labels and probable mislabels. Centroid state is bounded
    // by #labels × dims; centroids broadcast back to the corpus.
    "q110_label_centroids" -> { (s, dir) =>
      Similarity.labelCentroidQuality(t(s, dir, "embeddings"), "embedding", "label")
    },

    // Leakage-safe train/val/test split (Splits.clusterSplitCensus):
    // exact-dup clusters inherit their representative's md5-bucketed
    // split, so no duplicated passage straddles the train/eval boundary;
    // n_leaked_naive counts the clusters a per-document hash split would
    // have torn across splits — the leakage this operator prevents.
    "q108_cluster_split" -> { (s, dir) =>
      graft.operators.Splits.clusterSplitCensus(
        t(s, dir, "documents"), "doc_id", "text")
    },

    // SimHash near-dup pairs (64-bit, hamming ≤ 3, pigeonhole bucketing).
    "q24_dedup_simhash" -> { (s, dir) =>
      Dedup.simhashNearDups(t(s, dir, "documents"), "doc_id", "text", maxHamming = 3)
        .orderBy(col("a_id"), col("b_id"))
    },

    // SPLIT_TO_TABLE through the full dialect path: Snowflake SQL →
    // translate → spark.sql (the generator/table-function rewrite,
    // view_procedure_translator.py:282-295).
    "q42_dialect_split" -> { (s, dir) =>
      graft.sources.Tables.registerAll(s, dir)
      val snowflakeSql =
        """SELECT word, COUNT(*) AS cnt FROM (
          |  SELECT SPLIT_TO_TABLE(p_type, ' ') AS word FROM TPCH.PUBLIC.PART
          |) GROUP BY word ORDER BY word""".stripMargin
      s.sql(graft.dialect.SnowflakeDialect.translate(snowflakeSql))
    },

    // Token-set Jaccard between consecutive doc ids — the SQL-expressible
    // slice of n-gram similarity, fully oracle-checked. Token sets stay
    // arrays and intersect per pair (array_intersect) — ONE join, no
    // explode: the exploded token self-join formulation shuffled one row
    // per token across five joins for the same numbers.
    "q25_ngram_jaccard" -> { (s, dir) =>
      val toks = t(s, dir, "documents").select(col("doc_id"),
        array_distinct(split(lower(col("text")), " ")).as("toks"))
      val a = toks.select(col("doc_id").as("a_id"), col("toks").as("a_toks"))
      val b = toks.select((col("doc_id") - 1).as("a_id"), col("toks").as("b_toks"))
      a.join(b, Seq("a_id"))
        .select(col("a_id"), (col("a_id") + 1).as("b_id"),
          size(array_intersect(col("a_toks"), col("b_toks"))).cast("long").as("inter_cnt"),
          size(col("a_toks")).cast("long").as("a_n"),
          size(col("b_toks")).cast("long").as("b_n"))
        .withColumn("jaccard", col("inter_cnt").cast("double") /
          (col("a_n") + col("b_n") - col("inter_cnt")))
        .orderBy(col("a_id"))
    },

    // Exact 3-gram (shingle-set) Jaccard between consecutive docs — the
    // ground truth that q23's MinHash signature agreement estimates.
    "q66_trigram_jaccard" -> { (s, dir) =>
      val sh = fanOut(t(s, dir, "documents").select(col("doc_id"), col("text")))
        .select(col("doc_id"), Dedup.shingles("text", 3).as("sh"))
      val a = sh.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
      val b = sh.select((col("doc_id") - 1).as("a_id"), col("sh").as("b_sh"))
      a.join(b, Seq("a_id"))
        .select(col("a_id"), (col("a_id") + 1).as("b_id"),
          size(array_intersect(col("a_sh"), col("b_sh"))).cast("long").as("inter_cnt"),
          size(col("a_sh")).cast("long").as("a_n"),
          size(col("b_sh")).cast("long").as("b_n"))
        .withColumn("jaccard", col("inter_cnt").cast("double") /
          (col("a_n") + col("b_n") - col("inter_cnt")))
        .orderBy(col("a_id"))
    },

    // Exact cosine over consecutive embedding pairs (vector ops slice).
    "q26_embed_pairs_sim" -> { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val e = t(s, dir, "embeddings")
      val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_vec"),
        col("label").as("a_label"))
      val b = e.select((col("vec_id") - 1).as("a_id"), col("embedding").as("b_vec"),
        col("label").as("b_label"))
      a.join(b, Seq("a_id"))
        .select(col("a_id"), (col("a_id") + 1).as("b_id"),
          (Similarity.scaledDot("a_vec", "b_vec").cast("double") /
            (Similarity.scaledNorm("a_vec") * Similarity.scaledNorm("b_vec"))).as("cosine"),
          (col("a_label") === col("b_label")).as("same_label"))
        .orderBy(col("a_id"))
    },

    // int8-quantized similarity vs the exact scaled dot on consecutive
    // pairs: the integer dot is bit-exact cross-engine; approx/exact
    // doubles quantify the quantization error a 4×-compressed store pays.
    "q72_int8_quantized_sim" -> { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val e = Similarity.int8Quantize(t(s, dir, "embeddings"), "embedding")
      val a = e.select(col("vec_id").as("a_id"), col("qvec").as("a_q"),
        col("qscale").as("a_s"), col("embedding").as("a_vec"))
      val b = e.select((col("vec_id") - 1).as("a_id"), col("qvec").as("b_q"),
        col("qscale").as("b_s"), col("embedding").as("b_vec"))
      a.join(b, Seq("a_id"))
        .select(col("a_id"), (col("a_id") + 1).as("b_id"),
          Similarity.int8Dot("a_q", "b_q").as("qdot"),
          (Similarity.int8Dot("a_q", "b_q").cast("double") * col("a_s") * col("b_s"))
            .as("approx_dot"),
          (Similarity.scaledDot("a_vec", "b_vec").cast("double") /
            java.lang.Math.scalb(1.0, Similarity.ScaledShift)).as("exact_dot"))
        .orderBy(col("a_id"))
    },

    // Brute-force cosine top-5 for queries vec_id < 10 (ANN baseline).
    "q27_ann_brute_topk" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10), k = 5)
        .orderBy(col("qid"), col("rank"))
    },

    // ANN recall audit: fraction of the exact top-5 (q27's ground truth)
    // that q28's 16-bit LSH bucketing surfaces as candidates — the eval a
    // pipeline runs before trusting the approximate index at scale.
    "q128_ann_recall" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      Similarity.annRecall(e, e.filter(col("vec_id") < 10), k = 5)
        .orderBy(col("qid"))
    },

    // LSH-bucketed near-neighbor pairs (the scale path): md5-derived
    // deterministic hyperplanes, fully oracle-replayable.
    "q28_ann_lsh" -> { (s, dir) =>
      Similarity.lshNearNeighbors(t(s, dir, "embeddings"), threshold = 0.2)
        .orderBy(col("a_id"), col("b_id"))
    },

    // Embedding-space near-dup clusters: LSH candidate pairs → connected
    // components — the same cluster-formation step as q70 composed over the
    // vector modality (threshold low enough for the random fixture to
    // produce multi-member clusters).
    "q77_embed_cluster_dedup" -> { (s, dir) =>
      val pairs = Similarity.lshNearNeighbors(t(s, dir, "embeddings"), threshold = 0.1)
        .select(col("a_id"), col("b_id"))
      Dedup.components(pairs)
        .groupBy(col("label").as("cluster"))
        .agg(count(lit(1)).as("n_members"))
        .orderBy(col("cluster"))
    },

    // Throughput ANN via the native codegen'd fvec_dot expression — ranks
    // only in the output (double-fold cosine isn't bit-comparable to the
    // oracle's exact-decimal path, but the induced ranking is).
    "q33_ann_fast_topk" -> { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      import org.apache.spark.sql.expressions.Window
      val e = t(s, dir, "embeddings")
      val c = e.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        .withColumn("cnorm", sqrt(expr("fvec_dot(cvec, cvec)")))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        .withColumn("qnorm", sqrt(expr("fvec_dot(qvec, qvec)")))
      val w = Window.partitionBy(col("qid"))
        .orderBy((expr("fvec_dot(qvec, cvec)") / (col("qnorm") * col("cnorm"))).desc, col("cid"))
      c.join(broadcast(q), col("cid") =!= col("qid"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("cid"), col("rank"))
        .orderBy(col("qid"), col("rank"))
    },

    // IVF ANN: deterministic md5-sampled centroids → inverted lists →
    // probe nProbe lists per query; exact-decimal dots make assignment and
    // ranking bit-replayable by the DuckDB oracle (recall pinned in IvfSpec).
    "q41_ann_ivf" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      graft.operators.Ivf.topK(e, e.filter(col("vec_id") < 10), k = 5)
        .select(col("qid"), col("cid"), col("rank"))
        .orderBy(col("qid"), col("rank"))
    },

    // Dedup impact per source: how much of each source a global MinHash
    // dedup pass would remove (q114's keep-longest rule rolled up to the
    // ingest-decision level) — a source that is mostly kill-list is a
    // mirror, not a corpus.
    "q145_dedup_impact_by_source" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents")
      val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5)
      val labeled = Dedup.components(pairs)
        .join(docs.select(col("doc_id").as("node"), col("n_chars"), col("source")),
          Seq("node"))
      val w = Window.partitionBy(col("label")).orderBy(col("n_chars").desc, col("node"))
      val perCluster = labeled.withColumn("rk", row_number().over(w))
      val perSrc = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      val dup = perCluster.groupBy(col("source"))
        .agg(count(lit(1)).as("n_in_clusters"),
          sum(when(col("rk") > 1, 1L).otherwise(0L)).as("n_killed"))
      perSrc.join(dup, Seq("source"), "left")
        .withColumn("n_in_clusters", coalesce(col("n_in_clusters"), lit(0L)))
        .withColumn("n_killed", coalesce(col("n_killed"), lit(0L)))
        .withColumn("kill_rate",
          col("n_killed").cast("double") / col("n_docs").cast("double"))
        .orderBy(col("source"))
    },

    // Hard-negative mining (Similarity.hardNegatives): per anchor, the
    // most-similar vector with a DIFFERENT label among banded-LSH
    // candidates — the confusable-neighbor set contrastive training
    // feeds back as negatives once random negatives stop teaching.
    "q135_hard_negatives" -> { (s, dir) =>
      Similarity.hardNegatives(t(s, dir, "embeddings"), "vec_id", "embedding", "label",
        k = 1)
        .orderBy(col("a_id"))
    },

    // Deterministic k-means census (Ivf.kmeansCensus): md5-ordered seeds,
    // 2 exact Lloyd iterations (decimal-exact per-dim means rounded to
    // float between passes), per-cluster size + member-cosine quality —
    // the corpus topic-discovery step SemDeDup/domain-mixing start from.
    "q134_kmeans_census" -> { (s, dir) =>
      graft.operators.Ivf.kmeansCensus(t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 8, iters = 2)
    },

    // Product quantization: 64-dim vectors → 8 sub-codes against md5-picked
    // codebooks; queries rank the whole corpus by ADC lookups over the
    // compressed codes (32x smaller index than raw floats). Codes and
    // scaled-long ADC scores both replay exactly in the oracle.
    "q83_pq_topk" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      graft.operators.Pq.topK(e, e.filter(col("vec_id") < 10), k = 5)
        .orderBy(col("qid"), col("rank"))
    },

    // IVF probing × PQ compression (graft.operators.Pq.ivfPqTopK): the
    // production ANN serving composition — clusters prune WHICH rows a
    // query touches, codes shrink WHAT each row costs. Same deterministic
    // machinery as q41 + q83, composed, still oracle-replayable.
    "q100_ivf_pq" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      graft.operators.Pq.ivfPqTopK(e, e.filter(col("vec_id") < 10), k = 5)
        .orderBy(col("qid"), col("rank"))
    },

    // KNN graph via banded LSH (graft.operators.Similarity.knnGraph): one
    // 24-bit signature split into 3×8-bit band buckets, capped bucket
    // self-join, exact rescoring, top-5 per node — the neighbor-graph
    // input of SemDeDup-style pipelines and graph-based ANN indexes.
    "q95_knn_graph" -> { (s, dir) =>
      graft.operators.Similarity.knnGraph(t(s, dir, "embeddings"), k = 5)
        .orderBy(col("a_id"), col("rank"))
    },

    // PageRank over the q95 KNN graph (graft.operators.Graph.pageRank):
    // graph-centrality quality signal — SemDeDup-style pipelines keep the
    // most central member of a near-dup neighborhood. 3 fixed iterations,
    // per-edge contributions decimal-rounded so scores replay exactly.
    "q113_knn_pagerank" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val edges = graft.operators.Similarity.knnGraph(emb, k = 5)
        .select(col("a_id").as("src"), col("b_id").as("dst"))
      graft.operators.Graph.pageRank(
        emb.select(col("vec_id").as("id")), edges, iters = 3)
        .select(col("id").as("vec_id"), col("pagerank"), col("n_out"))
        .orderBy(col("pagerank").desc, col("vec_id"))
        .limit(20)
    },

    // Asymmetric containment census (Dedup.containmentPairs): doc-in-doc
    // duplication that Jaccard-targeted MinHash misses — |A∩B|/min(|A|,|B|)
    // over exact trigram shingle sets, candidates from rare-shingle
    // blocking (df 2..20), verified by exact intersection joins.
    "q163_containment_dedup" -> { (s, dir) =>
      Dedup.containmentPairs(t(s, dir, "documents"), "doc_id", "text",
        k = 3, maxDf = 20, minContainment = 0.8)
        .orderBy(col("a_id"), col("b_id"))
    },

    // State-bounded containment census (Dedup.containmentPairsCapped):
    // the 100-TB-scale mode of q163 — every shingle's inverted list is
    // truncated to the 64 docs with the smallest deterministic salt-hash
    // rank, so the pair stream is ≤ #shingles·C(64,2), LINEAR in the
    // corpus, and no aggregation state is ever unbounded. Exact census
    // over the retained relation; the oracle replays the identical
    // ranking, so the approximation itself is hash-checked.
    "q186_containment_capped" -> { (s, dir) =>
      Dedup.containmentPairsCapped(t(s, dir, "documents"), "doc_id", "text",
        k = 3, listCap = 64, maxDf = 20, minContainment = 0.8)
        .orderBy(col("a_id"), col("b_id"))
    },

    // Rare-shingle containment (Dedup.containmentPairsRare): the third
    // containment regime — intersections AND denominators over df<=20
    // shingles only. Boilerplate-robust by construction (the round-10
    // stressor showed template shingles drag the full-denominator census
    // below threshold) and the cheapest at scale: <=C(20,2) pairs per
    // shingle, no unbounded aggregation state, no window sort.
    "q187_containment_rare" -> { (s, dir) =>
      Dedup.containmentPairsRare(t(s, dir, "documents"), "doc_id", "text",
        k = 3, maxDf = 20, minContainment = 0.8)
        .orderBy(col("a_id"), col("b_id"))
    },

    // Triangle / clustering-coefficient census over the near-dup graph
    // (Graph.triangleCensus on q23's pair set at threshold 0.3): nodes
    // whose neighborhoods close into triangles sit in genuine dup cliques;
    // high-degree zero-triangle nodes are boilerplate collision hubs.
    "q164_dup_triangles" -> { (s, dir) =>
      val pairs = Dedup.minhashNearDups(t(s, dir, "documents"),
        "doc_id", "text", threshold = 0.3)
      graft.operators.Graph.triangleCensus(pairs)
        .orderBy(col("node"))
    },

    // Edit-distance verification of the LSH candidate set: exact
    // Levenshtein + normalized similarity per surfaced pair — the
    // character-level ground truth layered over MinHash's token-level
    // estimate (catches shuffled-token false positives Jaccard can't see).
    // Cost is |pairs|·O(len²), never corpus²: candidates are LSH-bounded.
    "q171_editdist_verify" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      // Spread the LSH-bounded pair set before attaching texts: the exact
      // levenshtein verify is O(len²) per pair — CPU-bound, so stage width
      // should track cores, not shuffle bytes (AQE's byte-targeted
      // coalescing otherwise hands the whole candidate set to ONE task —
      // round-17 profile: two serial ~700 ms stages, the second being the
      // global sort's range-sampling re-execution of the same projection).
      // The explicit keyed exchange also gives the sampler a materialized
      // boundary, so the re-execution is a parallel ~50 ms, not serial.
      val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5)
        .repartition(s.sparkContext.defaultParallelism, col("a_id"), col("b_id"))
      val ta = docs.select(col("doc_id").as("a_id"), col("text").as("ta"))
      val tb = docs.select(col("doc_id").as("b_id"), col("text").as("tb"))
      pairs.join(ta, Seq("a_id")).join(tb, Seq("b_id"))
        .select(col("a_id"), col("b_id"),
          levenshtein(col("ta"), col("tb")).cast("long").as("edit_dist"),
          (lit(1.0) - levenshtein(col("ta"), col("tb")).cast("double") /
            greatest(length(col("ta")), length(col("tb")))).as("edit_sim"))
        .orderBy(col("a_id"), col("b_id"))
    },

    // MOSS-style winnowing (Winnow.sharedFingerprintPairs): window-min
    // k-gram fingerprints guarantee any shared k+w-1-token run selects a
    // common fingerprint — local plagiarism detection, a third regime
    // beside global Jaccard (q23) and containment (q163).
    "q170_winnow_pairs" -> { (s, dir) =>
      graft.operators.Winnow.sharedFingerprintPairs(t(s, dir, "documents"),
        "doc_id", "text", k = 4, w = 4, maxDf = 20, minShared = 3)
        .orderBy(col("a_id"), col("b_id"))
    },

    // Label-propagation communities over the q95 KNN graph
    // (Graph.labelPropagation): 3 synchronous rounds, most-frequent
    // neighbor label with min-label ties — the finer community structure
    // connected components can't see (a single bridge edge merges
    // components; LPA keeps weakly-bridged dense neighborhoods apart).
    "q178_knn_communities" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val edges = graft.operators.Similarity.knnGraph(emb, k = 5)
        .select(col("a_id").as("src"), col("b_id").as("dst"))
      graft.operators.Graph.labelPropagation(
        emb.select(col("vec_id").as("id")), edges, iters = 3)
        .select(col("id").as("vec_id"), col("label").as("community"))
        .orderBy(col("vec_id"))
    },

    // Per-source semantic redundancy matrix: the embedding-space companion
    // to q174's lexical overlap — exact decimal per-source centroids
    // (cross-modal join on vec_id = doc_id), pairwise centroid cosine.
    // Two sources can share zero 13-grams yet sit on top of each other
    // semantically (translations, paraphrase mirrors); this is the
    // ingest-dedup signal for that case. Centroid state is |sources|·dims.
    "q179_source_semantics" -> { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val j = t(s, dir, "embeddings")
        .join(t(s, dir, "documents")
          .select(col("doc_id").as("vec_id"), col("source")), Seq("vec_id"))
      // means ride the scaled-long discipline, NOT double→DECIMAL(38,18):
      // DuckDB converts double→scale-18 decimal by multiplying in double
      // space (v·1e18 overflows 2^53), so those casts drift in the last
      // two digits per element and the drift survives into the refloated
      // centroid. FLOOR(v·2^36) is exact and identical in both engines;
      // the mean is then one double division of exact integers.
      val cents = j
        .select(col("source"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .select(col("source"), col("pos"),
          floor(col("v").cast("double") * lit(68719476736.0d)).cast("long").as("sl"))
        .groupBy(col("source"), col("pos"))
        .agg((sum(col("sl")).cast("double") /
          (count(lit(1)).cast("double") * lit(68719476736.0d))).as("c"))
        .groupBy(col("source"))
        .agg(expr("transform(sort_array(collect_list(struct(pos, " +
          "CAST(c AS FLOAT)))), x -> x.col2)").as("centroid"))
      val a = cents.select(col("source").as("src_a"), col("centroid").as("ca"))
      val b = cents.select(col("source").as("src_b"), col("centroid").as("cb"))
      // |sources| rows per side — broadcast pins the non-equi pair join to
      // a nested-loop over a broadcast table, never a CartesianProduct
      a.join(broadcast(b), col("src_a") < col("src_b"))
        .select(col("src_a"), col("src_b"),
          (graft.operators.Similarity.scaledDot("ca", "cb").cast("double") /
            (graft.operators.Similarity.scaledNorm("ca") *
              graft.operators.Similarity.scaledNorm("cb"))).as("centroid_cosine"))
        .orderBy(col("src_a"), col("src_b"))
    },

    // Multimodal frame sampling: binary payload → 256-byte frames → keep
    // every 4th (the video-pipeline explode fanout), census per media type.
    "q61_frame_sample" -> { (s, dir) =>
      val a = graft.operators.Multimodal.assets(
        t(s, dir, "documents"), "doc_id", "text", "source")
      graft.operators.Multimodal.sampleFrames(a, everyN = 4)
        .groupBy(col("media_type"))
        .agg(count(lit(1)).as("n_frames_kept"),
          sum(length(col("frame_payload")).cast("long")).as("kept_bytes"),
          countDistinct(col("asset_id")).as("n_assets"))
        .orderBy(col("media_type"))
    },

    // Multimodal decode stage (mapPartitions batch, stubbed codec — the
    // "brightness" is a deterministic byte-mean, so the full decode
    // pipeline is oracle-checkable end-to-end on ASCII fixtures).
    "q62_multimodal_features" -> { (s, dir) =>
      val a = graft.operators.Multimodal.assets(
        t(s, dir, "documents"), "doc_id", "text", "source")
      graft.operators.Multimodal.decodeFeatures(a).toDF()
        .groupBy(col("media_type"))
        .agg(count(lit(1)).as("n_assets"),
          dsum(col("brightness")).as("sum_brightness"),
          sum(col("n_frames")).as("total_frames"))
        .orderBy(col("media_type"))
    },

    // Multimodal resize stage (mapPartitions, stubbed codec): census of
    // resized payload sizes per media type.
    "q65_multimodal_resize" -> { (s, dir) =>
      val a = graft.operators.Multimodal.assets(
        t(s, dir, "documents"), "doc_id", "text", "source")
      graft.operators.Multimodal.resize(a, factor = 2)
        .groupBy(col("media_type"))
        .agg(count(lit(1)).as("n_assets"),
          sum(length(col("resized")).cast("long")).as("resized_bytes"),
          min(length(col("resized")).cast("long")).as("min_bytes"),
          max(length(col("resized")).cast("long")).as("max_bytes"))
        .orderBy(col("media_type"))
    },

    // Audio census through the REAL RIFF/WAV codec (round-13 verdict item
    // 6 closed the audio stub): deterministic PCM clips are synthesized
    // per doc_id — rate/channels/length/samples all pure functions of the
    // id — ENCODED to real WAV bytes, then DECODED back through
    // WavCodec's chunk walk, and the census aggregates what the decoder
    // read. Both codec directions sit in one mapPartitions batch
    // (executor-local, no payload shuffle — only the 8-group census
    // exchanges), the 100 TB shape for an audio-corpus quality funnel.
    // The DuckDB oracle recomputes every field from the synthesis
    // parameters alone, so a codec bug in EITHER direction (header
    // arithmetic, chunk padding, sample order, clip/peak fold) breaks the
    // match.
    "q196_wav_census" -> { (s, dir) =>
      import s.implicits._
      val ids = t(s, dir, "documents")
        .select(col("doc_id").cast("long")).as[Long]
      val feats = ids.mapPartitions { it =>
        it.map { id =>
          val rate = 8000 + (id % 4).toInt * 4000
          val ch = 1 + (id % 2).toInt
          val n = 64 + (id % 32).toInt // frames per channel
          val samples = Array.tabulate[Short](n * ch) { i =>
            val raw = (id * 7 + i * 13) % 70000L - 35000L
            math.max(-32768L, math.min(32767L, raw)).toShort
          }
          val wav = graft.operators.WavCodec.encode(rate, ch, samples)
          val info = graft.operators.WavCodec.decode(wav).getOrElse(
            throw new IllegalStateException(s"own WAV failed to decode for $id"))
          (info.sampleRate.toLong, info.channels.toLong,
            info.nFrames, info.clipped, info.peak.toLong)
        }
      }.toDF("sample_rate", "channels", "n_frames", "clipped", "peak")
      feats.groupBy(col("sample_rate"), col("channels"))
        .agg(count(lit(1)).as("n_assets"),
          sum(col("n_frames")).as("total_frames"),
          sum(col("clipped")).as("total_clipped"),
          max(col("peak")).as("max_peak"))
        .orderBy(col("sample_rate"), col("channels"))
    },

    // Multimodal: opaque binary payloads + typed metadata, per media type.
    "q34_multimodal_meta" -> { (s, dir) =>
      val a = graft.operators.Multimodal.assets(
        t(s, dir, "documents"), "doc_id", "text", "source")
      a.groupBy(col("media_type"))
        .agg(count(lit(1)).as("n_assets"),
          sum(col("meta.n_bytes")).as("total_bytes"),
          countDistinct(col("meta.fingerprint")).as("n_unique_fp"),
          sum(ceil(col("meta.n_bytes").cast("double") / graft.operators.Multimodal.FrameBytes)
            .cast("long")).as("total_frames"))
        .orderBy(col("media_type"))
    },

    // Embedding L2-norm census per label — the embedding-space health
    // check run before any cosine pipeline (un-normalized vectors make
    // cosine ≠ dot and IVF cell radii meaningless; a norm-collapsed label
    // flags a degenerate encoder). Norms go through the codegen'd
    // fvec_scaled_dot (2^36 fixed-point self-dot, q27 discipline): the
    // true norm is the scaled norm / 2^18 — an exact power-of-two
    // division — rounded DECIMAL(30,9) per row, then exact-decimal
    // averaged. One narrow scan + one 10-group aggregate; no shuffle of
    // vector payloads, only (label, norm) pairs.
    "q152_embedding_norms" -> { (s, dir) =>
      import org.apache.spark.sql.types.DecimalType
      graft.functions.GraftFunctions.register(s)
      val e = t(s, dir, "embeddings")
        .withColumn("nrm",
          (graft.operators.Similarity.scaledNorm("embedding") / lit(262144.0d))
            .cast(DecimalType(30, 9)).cast("double"))
      e.groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          (sum(col("nrm").cast(DecimalType(30, 9))).cast("double") /
            count(lit(1))).as("avg_norm"),
          min(col("nrm")).as("min_norm"),
          max(col("nrm")).as("max_norm"))
        .orderBy(col("label"))
    })

  private val dot = Similarity.scaledDotSql _
  private def nrm(a: String) = Similarity.scaledNormSql(a)

  /** DuckDB replay of [[graft.operators.Ivf.kmeansCensus]]: cent0 = the k
    * smallest-md5 rows; per iteration an argmin-Euclid assignment CTE (the
    * same biased scaled longs, ties → lowest cidx) feeds a per-(cluster,
    * dim) DECIMAL(38,18) mean rounded to REAL; COALESCE keeps the previous
    * centroid for empty clusters. The tail is q110's exact cosine rollup
    * against the final centroids, seed ids re-attached from cent0. */
  private def kmeansCensusSql(k: Int, iters: Int): String = {
    def asg(i: Int) =
      s"""asg$i AS (
         |  SELECT vec_id, embedding, cidx FROM (
         |    SELECT e.vec_id, e.embedding, c.cidx,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${graft.operators.Ivf.euclidScoreSql("e.embedding", "c.cvec")} DESC,
         |          c.cidx) AS rn
         |    FROM embeddings e CROSS JOIN cent${i - 1} c) WHERE rn = 1)"""
    def mean(i: Int) =
      s"""m$i AS (
         |  SELECT cidx, list(CAST(c AS REAL) ORDER BY pos) AS mvec FROM (
         |    SELECT a.cidx, i.i AS pos,
         |      CAST(SUM(CAST(CAST(a.embedding[i.i + 1] AS DOUBLE) AS DECIMAL(38,18)))
         |        AS DOUBLE) / COUNT(*) AS c
         |    FROM asg$i a, UNNEST(range(0, len(a.embedding))) AS i(i)
         |    GROUP BY 1, 2) GROUP BY cidx)"""
    def cent(i: Int) =
      s"""cent$i AS (
         |  SELECT s.cidx, COALESCE(m.mvec, s.cvec) AS cvec
         |  FROM cent${i - 1} s LEFT JOIN m$i m ON m.cidx = s.cidx)"""
    val iterCtes = (1 to iters).map(i => Seq(asg(i), mean(i), cent(i)).mkString(",\n"))
    s"""WITH cent0 AS (
       |  SELECT cidx, svid, cvec FROM (
       |    SELECT vec_id AS svid, embedding AS cvec,
       |      ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cidx
       |    FROM embeddings) WHERE cidx < $k),
       |${iterCtes.mkString(",\n")},
       |fin AS (
       |  SELECT vec_id, cidx FROM (
       |    SELECT e.vec_id, c.cidx,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${graft.operators.Ivf.euclidScoreSql("e.embedding", "c.cvec")} DESC,
       |          c.cidx) AS rn
       |    FROM embeddings e CROSS JOIN cent$iters c) WHERE rn = 1),
       |cos AS (
       |  SELECT f.cidx,
       |    ${dot("e.embedding", "c.cvec")} / (${nrm("e.embedding")} * ${nrm("c.cvec")}) AS cosine
       |  FROM fin f
       |  JOIN embeddings e ON e.vec_id = f.vec_id
       |  JOIN cent$iters c ON c.cidx = f.cidx)
       |SELECT s.cidx AS cluster, s.svid AS seed_id, COUNT(*) AS n_members,
       |  CAST(SUM(CAST(cosine AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS mean_cosine,
       |  MIN(cosine) AS min_cosine
       |FROM cos JOIN cent0 s ON s.cidx = cos.cidx
       |GROUP BY 1, 2 ORDER BY cluster""".stripMargin
  }

  /** Shared DuckDB replay of the banded-LSH KNN graph (same constants as
    * [[Similarity.knnGraph]] with k = 5): 24-bit signature → 3×8-bit band
    * buckets → 200-cap → exact rescoring → top-5 per node. Ends at CTE
    * `knn(a_id, b_id, cosine, rank)`; q95/q113 append their own tails. */
  private lazy val knnGraphCtes: String =
    s"""sig AS (
       |  SELECT e.vec_id, e.embedding,
       |    CAST(${Similarity.lshBucketSql("e.embedding", 24)} AS BIGINT) AS sig,
       |    ${nrm("e.embedding")} AS nrm
       |  FROM embeddings e),
       |banded AS (
       |  SELECT vec_id, embedding, nrm, CAST(b AS INT) AS band,
       |    (sig >> (8 * CAST(b AS INT))) & 255 AS bucket
       |  FROM sig, UNNEST(range(3)) AS t(b)),
       |capped AS (
       |  SELECT * FROM (
       |    SELECT vec_id, embedding, nrm, band, bucket,
       |      ROW_NUMBER() OVER (PARTITION BY band, bucket
       |        ORDER BY ${Similarity.capSaltRankSql()}, vec_id) AS rn
       |    FROM banded) WHERE rn <= 200),
       |pairs AS (
       |  SELECT DISTINCT l.vec_id AS a_id, r.vec_id AS b_id,
       |    ${dot("l.embedding", "r.embedding")} / (l.nrm * r.nrm) AS cosine
       |  FROM capped l JOIN capped r
       |    ON l.band = r.band AND l.bucket = r.bucket AND l.vec_id <> r.vec_id),
       |knn AS (
       |  SELECT a_id, b_id, cosine, rank FROM (
       |    SELECT a_id, b_id, cosine,
       |      ROW_NUMBER() OVER (PARTITION BY a_id ORDER BY cosine DESC, b_id) AS rank
       |    FROM pairs) WHERE rank <= 5)""".stripMargin

  /** Shared DuckDB replay of the MinHash-LSH pair pipeline (same constants
    * as [[graft.operators.Dedup]]): shingles → md5-prefix base → 32 affine
    * permutations mod 2^31-1 → 8 four-slot bands → capped bucket join →
    * signature agreement. Ends at CTE `est(a_id, b_id, est_jaccard)`;
    * q23/q70/q82 append their own tails. */
  private val minhashEstCtes: String =
    """tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    concat_ws(' ', t[i.i + 1], t[i.i + 2], t[i.i + 3]) AS s
      |  FROM tk, UNNEST(range(0, greatest(len(t) - 3, 0) + 1)) AS i(i)),
      |h AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT % 2147483647 AS base FROM sh),
      |slots AS (
      |  SELECT doc_id, i.i AS i,
      |    MIN((base * ((2654435761 * (i.i + 1)) % 2147483647)
      |         + (40503 * (i.i + 1) + 1) % 2147483647) % 2147483647) AS m
      |  FROM h, UNNEST(range(0, 32)) AS i(i) GROUP BY 1, 2),
      |sig AS (SELECT doc_id, list(m ORDER BY i) AS sig FROM slots GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, b.b AS band,
      |    sig[b.b*4 + 1]::VARCHAR || '/' || sig[b.b*4 + 2]::VARCHAR || '/' ||
      |    sig[b.b*4 + 3]::VARCHAR || '/' || sig[b.b*4 + 4]::VARCHAR AS key
      |  FROM sig, UNNEST(range(0, 8)) AS b(b)),
      |ok AS (SELECT band, key FROM bands GROUP BY band, key HAVING COUNT(*) <= 1000),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM bands a JOIN ok USING (band, key) JOIN bands b USING (band, key)
      |  WHERE a.doc_id < b.doc_id),
      |est AS (
      |  SELECT c.a_id, c.b_id,
      |    len(list_filter(list_zip(sa.sig, sb.sig), p -> p[1] = p[2]))::DOUBLE / 32
      |      AS est_jaccard
      |  FROM cand c JOIN sig sa ON sa.doc_id = c.a_id JOIN sig sb ON sb.doc_id = c.b_id)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q152_embedding_norms" -> {
      val sd = graft.operators.Similarity.scaledDotSql("embedding", "embedding")
      s"""WITH n AS (
         |  SELECT label,
         |    CAST(CAST(sqrt(CAST($sd AS DOUBLE)) / 262144.0 AS DECIMAL(30,9))
         |      AS DOUBLE) AS nrm
         |  FROM embeddings)
         |SELECT label, COUNT(*) AS n_vecs,
         |  CAST(SUM(CAST(nrm AS DECIMAL(30,9))) AS DOUBLE) / COUNT(*) AS avg_norm,
         |  MIN(nrm) AS min_norm, MAX(nrm) AS max_norm
         |FROM n GROUP BY 1 ORDER BY label""".stripMargin
    },

    // union length via COUNT(DISTINCT killed position) — deliberately NOT
    // the Spark side's sorted-interval merge (independent algorithms)
    "q126_substring_dedup" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |w0 AS (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 7)) AS pos
        |       FROM toks WHERE len(ts) >= 8),
        |wins AS (SELECT doc_id, pos, array_to_string(ts[pos:pos+7], ' ') AS gram FROM w0),
        |firsts AS (SELECT gram, MIN(struct_pack(id := doc_id, p := pos)) AS f
        |           FROM wins GROUP BY gram),
        |dups AS (SELECT w.doc_id, w.pos FROM wins w JOIN firsts f USING (gram)
        |         WHERE NOT (w.doc_id = f.f.id AND w.pos = f.f.p)),
        |killed AS (SELECT DISTINCT doc_id, pos + o AS tok
        |           FROM dups, UNNEST(range(0, 8)) AS o(o)),
        |rem AS (SELECT doc_id, COUNT(*) AS removed_tokens FROM killed GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.ts) AS BIGINT) AS total_tokens,
        |  CAST(r.removed_tokens AS BIGINT) AS removed_tokens,
        |  CAST(len(t.ts) - r.removed_tokens AS BIGINT) AS kept_tokens
        |FROM toks t JOIN rem r USING (doc_id)
        |ORDER BY removed_tokens DESC, doc_id LIMIT 100""".stripMargin,

    "q116_semantic_decontam" ->
      s"""WITH ev AS (
         |  SELECT vec_id AS eval_id, embedding AS evec,
         |    ${nrm("embedding")} AS enorm
         |  FROM embeddings WHERE vec_id % 499 = 0),
         |tr AS (
         |  SELECT vec_id AS train_id, embedding AS tvec,
         |    ${nrm("embedding")} AS tnorm
         |  FROM embeddings WHERE vec_id % 499 <> 0),
         |p AS (
         |  SELECT train_id,
         |    CAST(${dot("tvec", "evec")} AS DOUBLE) / (tnorm * enorm) AS cosine
         |  FROM tr CROSS JOIN ev),
         |a AS (
         |  SELECT train_id, MAX(cosine) AS max_cosine,
         |    CAST(SUM(CASE WHEN cosine >= 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
         |  FROM p GROUP BY 1)
         |SELECT train_id, max_cosine, n_hits, n_hits > 0 AS contaminated
         |FROM a ORDER BY max_cosine DESC, train_id LIMIT 50""".stripMargin,

    // est CTE reused unfiltered; true Jaccard from the same sh shingle
    // sets the signatures were built over
    "q124_minhash_calibration" ->
      s"""WITH $minhashEstCtes,
         |p AS (SELECT a_id, b_id, est_jaccard FROM est WHERE est_jaccard >= 0.2),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |inter AS (
         |  SELECT p.a_id, p.b_id, COUNT(*) AS cnt
         |  FROM p
         |  JOIN sh a ON a.doc_id = p.a_id
         |  JOIN sh b ON b.doc_id = p.b_id AND b.s = a.s
         |  GROUP BY 1, 2),
         |tj AS (
         |  SELECT p.a_id, p.b_id, p.est_jaccard,
         |    CAST(COALESCE(i.cnt, 0) AS DOUBLE)
         |      / (sa.n + sb.n - COALESCE(i.cnt, 0)) AS true_j
         |  FROM p
         |  JOIN sz sa ON sa.doc_id = p.a_id
         |  JOIN sz sb ON sb.doc_id = p.b_id
         |  LEFT JOIN inter i ON i.a_id = p.a_id AND i.b_id = p.b_id)
         |SELECT CAST(FLOOR(est_jaccard * 10) AS BIGINT) AS bin,
         |  COUNT(*) AS n_pairs,
         |  CAST(SUM(CAST(est_jaccard AS DECIMAL(30,9))) AS DOUBLE) / COUNT(*) AS mean_est,
         |  CAST(SUM(CAST(true_j AS DECIMAL(30,9))) AS DOUBLE) / COUNT(*) AS mean_true,
         |  MIN(true_j) AS min_true, MAX(true_j) AS max_true
         |FROM tj GROUP BY 1 ORDER BY bin""".stripMargin,

    "q127_normalized_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, upper(text) FROM documents WHERE doc_id % 40 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, '  ' || replace(text, ' ', '  ')
        |  FROM documents WHERE doc_id % 55 = 0),
        |keyed AS (
        |  SELECT 'raw' AS mode, text AS k FROM corpus
        |  UNION ALL
        |  SELECT 'normalized', trim(regexp_replace(lower(text), '\s+', ' ', 'g'))
        |  FROM corpus),
        |grp AS (SELECT mode, k, COUNT(*) AS c FROM keyed GROUP BY 1, 2)
        |SELECT mode, COUNT(*) AS n_keys,
        |  CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_groups,
        |  CAST(SUM(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS BIGINT) AS dup_docs
        |FROM grp GROUP BY mode ORDER BY mode""".stripMargin,

    "q185_sampled_dedup_audit" ->
      """WITH sampled AS (
        |  SELECT * FROM documents
        |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |        < CAST(floor(0.25 * 4294967296.0) AS BIGINT)),
        |cf AS (SELECT md5(text) AS k, COUNT(*) AS c FROM documents GROUP BY 1),
        |cs AS (SELECT md5(text) AS k, COUNT(*) AS c FROM sampled GROUP BY 1),
        |f AS (SELECT 'full' AS mode, CAST(SUM(c) AS BIGINT) AS n_docs,
        |        COUNT(*) AS n_keys,
        |        CAST(SUM(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS BIGINT) AS dup_docs
        |      FROM cf),
        |sm AS (SELECT 'sample' AS mode, CAST(SUM(c) AS BIGINT) AS n_docs,
        |        COUNT(*) AS n_keys,
        |        CAST(SUM(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS BIGINT) AS dup_docs
        |      FROM cs)
        |SELECT * FROM f UNION ALL SELECT * FROM sm ORDER BY mode""".stripMargin,

    "q184_nfc_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, 'E' || chr(769) || 'cole ' || upper(text)
        |  FROM documents WHERE doc_id % 40 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, chr(201) || 'cole  ' || text
        |  FROM documents WHERE doc_id % 40 = 0),
        |keyed AS (
        |  SELECT 'raw' AS mode, text AS k FROM corpus
        |  UNION ALL
        |  SELECT 'nfc', trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'))
        |  FROM corpus),
        |grp AS (SELECT mode, k, COUNT(*) AS c FROM keyed GROUP BY 1, 2)
        |SELECT mode, COUNT(*) AS n_keys,
        |  CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_groups,
        |  CAST(SUM(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS BIGINT) AS dup_docs
        |FROM grp GROUP BY mode ORDER BY mode""".stripMargin,

    "q22_dedup_exact" ->
      """WITH pfx AS (
        |  SELECT lang, COUNT(*) AS c
        |  FROM documents GROUP BY lang, md5(substr(text, 1, 50)) HAVING COUNT(*) > 1),
        |pd AS (
        |  SELECT lang, COUNT(*) AS n_prefix_dup_groups, CAST(SUM(c) AS BIGINT) AS n_prefix_dup_docs
        |  FROM pfx GROUP BY lang)
        |SELECT d.lang, COUNT(*) AS n_docs, COUNT(DISTINCT md5(text)) AS n_unique,
        |  CAST(COALESCE(ANY_VALUE(pd.n_prefix_dup_groups), 0) AS BIGINT) AS n_prefix_dup_groups,
        |  CAST(COALESCE(ANY_VALUE(pd.n_prefix_dup_docs), 0) AS BIGINT) AS n_prefix_dup_docs
        |FROM documents d LEFT JOIN pd ON d.lang = pd.lang
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,

    // Centroid quality: per-dim exact-decimal means, centroid rounded to
    // REAL before the scaled dot — both engines feed identical floats to
    // the same integer-dot formula, so cosines replay bit-for-bit.
    "q110_label_centroids" ->
      s"""WITH ex AS (
         |  SELECT label, i.i AS pos, CAST(embedding[i.i + 1] AS DOUBLE) AS v
         |  FROM embeddings, UNNEST(range(0, len(embedding))) AS i(i)),
         |dims AS (
         |  SELECT label, pos,
         |    CAST(SUM(CAST(v AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS c
         |  FROM ex GROUP BY 1, 2),
         |cent AS (
         |  SELECT label, list(CAST(c AS REAL) ORDER BY pos) AS centroid
         |  FROM dims GROUP BY 1),
         |cos AS (
         |  SELECT e.label,
         |    ${dot("e.embedding", "c.centroid")} /
         |      (${nrm("e.embedding")} * ${nrm("c.centroid")}) AS cosine
         |  FROM embeddings e JOIN cent c ON c.label = e.label)
         |SELECT label, COUNT(*) AS n_vecs,
         |  CAST(SUM(CAST(cosine AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS mean_cosine,
         |  MIN(cosine) AS min_cosine
         |FROM cos GROUP BY 1 ORDER BY label""".stripMargin,

    // Cluster-aware split census: same md5-threshold split function on
    // both engines (lowercase hex compares identically), clusters keyed by
    // full-text md5, naive leakage counted per cluster-assigned split.
    "q108_cluster_split" ->
      s"""WITH d AS (
         |  SELECT doc_id, md5(text) AS ch,
         |    ${graft.operators.Splits.splitLabelSql("doc_id")} AS naive_split
         |  FROM documents),
         |c AS (
         |  SELECT ch, MIN(doc_id) AS rep, COUNT(*) AS csize,
         |    COUNT(DISTINCT naive_split) AS n_naive
         |  FROM d GROUP BY ch)
         |SELECT ${graft.operators.Splits.splitLabelSql("rep")} AS split,
         |  COUNT(*) AS n_clusters, CAST(SUM(csize) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN n_naive > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_leaked_naive
         |FROM c GROUP BY 1 ORDER BY split""".stripMargin,

    // Full MinHash-LSH replay ending in est_jaccard ≥ threshold.
    "q23_dedup_minhash_lsh" ->
      s"""WITH $minhashEstCtes
         |SELECT a_id, b_id, est_jaccard FROM est WHERE est_jaccard >= 0.5
         |ORDER BY a_id, b_id""".stripMargin,

    // MinHash pairs re-attached to their documents' sources, rolled up by
    // unordered source pair.
    "q82_cross_source_dups" ->
      s"""WITH $minhashEstCtes,
         |pairs AS (SELECT a_id, b_id FROM est WHERE est_jaccard >= 0.5),
         |ps AS (
         |  SELECT least(da.source, db.source) AS src_a,
         |         greatest(da.source, db.source) AS src_b
         |  FROM pairs p
         |  JOIN documents da ON da.doc_id = p.a_id
         |  JOIN documents db ON db.doc_id = p.b_id)
         |SELECT src_a, src_b, COUNT(*) AS n_pairs
         |FROM ps GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin,

    // q23's pair set filtered to kill-relevant directions: an incoming doc
    // (% 4 = 0) dies to any existing partner or a smaller-id batch mate;
    // killed_by = min qualifying partner, est via arg_min on the same key.
    // The full-corpus est replay is the right oracle because the operator
    // bands existing+incoming as one frame — identical buckets and caps.
    "q105_incremental_dedup" ->
      s"""WITH $minhashEstCtes,
         |pairs AS (SELECT a_id, b_id, est_jaccard FROM est WHERE est_jaccard >= 0.5),
         |k AS (
         |  SELECT b_id AS doc_id, a_id AS killer, est_jaccard
         |  FROM pairs WHERE b_id % 4 = 0
         |  UNION ALL
         |  SELECT a_id, b_id, est_jaccard
         |  FROM pairs WHERE a_id % 4 = 0 AND b_id % 4 <> 0)
         |SELECT doc_id, MIN(killer) AS killed_by,
         |  arg_min(est_jaccard, killer) AS est_jaccard,
         |  COUNT(*) AS n_matches
         |FROM k GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // Same shingle CTEs as q66 but collapsed to the operator's 60-bit
    // md5-prefix longs, then rare-shingle blocking (df 2..20) and exact
    // intersection verification — an independent containment replay.
    "q163_containment_dedup" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |shs AS (
        |  SELECT DISTINCT doc_id,
        |    concat_ws(' ', t[i.i + 1], t[i.i + 2], t[i.i + 3]) AS s0
        |  FROM tk, UNNEST(range(0, greatest(len(t) - 3, 0) + 1)) AS i(i)),
        |sh AS (
        |  SELECT doc_id, ('0x' || substr(md5(s0), 1, 15))::BIGINT AS s
        |  FROM shs),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
        |dfs AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY s
        |        HAVING COUNT(*) BETWEEN 2 AND 1000),
        |shd AS (SELECT sh.doc_id, sh.s, dfs.df FROM sh JOIN dfs ON dfs.s = sh.s),
        |inter AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter_cnt,
        |         MAX(CASE WHEN a.df <= 20 THEN 1 ELSE 0 END) AS has_rare
        |  FROM shd a JOIN shd b ON b.s = a.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT i.a_id, i.b_id, i.inter_cnt, sa.n AS a_n, sb.n AS b_n,
        |  CAST(i.inter_cnt AS DOUBLE) / least(sa.n, sb.n) AS containment,
        |  CAST(i.inter_cnt AS DOUBLE) / (sa.n + sb.n - i.inter_cnt) AS jaccard
        |FROM inter i JOIN sz sa ON sa.doc_id = i.a_id
        |             JOIN sz sb ON sb.doc_id = i.b_id
        |WHERE i.has_rare = 1
        |  AND CAST(i.inter_cnt AS DOUBLE) / least(sa.n, sb.n) >= 0.8
        |ORDER BY a_id, b_id""".stripMargin,

    // q163's CTEs with the cap inserted: a deterministic salt-hash rank
    // per (shingle, doc) and QUALIFY row_number <= 64 replay the bounded
    // aggregator's retention exactly; sizes/df/intersections all come
    // from the retained relation, so the twin checks the approximation
    // semantics themselves, not just the happy path.
    "q186_containment_capped" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |shs AS (
        |  SELECT DISTINCT doc_id,
        |    concat_ws(' ', t[i.i + 1], t[i.i + 2], t[i.i + 3]) AS s0
        |  FROM tk, UNNEST(range(0, greatest(len(t) - 3, 0) + 1)) AS i(i)),
        |sh AS (
        |  SELECT doc_id, ('0x' || substr(md5(s0), 1, 15))::BIGINT AS s
        |  FROM shs),
        |kept AS (
        |  SELECT doc_id, s FROM (
        |    SELECT doc_id, s,
        |      ((s % 4294967291) * 1000003
        |        + (doc_id % 4294967291) * 999983) % 4294967291 AS rk
        |    FROM sh)
        |  QUALIFY row_number() OVER (PARTITION BY s ORDER BY rk, doc_id) <= 64),
        |nret AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY 1),
        |dfs AS (SELECT s, COUNT(*) AS df FROM kept GROUP BY s
        |        HAVING COUNT(*) >= 2),
        |shd AS (SELECT kept.doc_id, kept.s, dfs.df
        |        FROM kept JOIN dfs ON dfs.s = kept.s),
        |inter AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter_cnt,
        |         MAX(CASE WHEN a.df <= 20 THEN 1 ELSE 0 END) AS has_rare
        |  FROM shd a JOIN shd b ON b.s = a.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT i.a_id, i.b_id, i.inter_cnt, sa.n AS a_n, sb.n AS b_n,
        |  CAST(i.inter_cnt AS DOUBLE) / least(sa.n, sb.n) AS containment,
        |  CAST(i.inter_cnt AS DOUBLE) / (sa.n + sb.n - i.inter_cnt) AS jaccard
        |FROM inter i JOIN nret sa ON sa.doc_id = i.a_id
        |             JOIN nret sb ON sb.doc_id = i.b_id
        |WHERE i.has_rare = 1
        |  AND CAST(i.inter_cnt AS DOUBLE) / least(sa.n, sb.n) >= 0.8
        |ORDER BY a_id, b_id""".stripMargin,

    // Rare-only replay: same shingle CTEs, df capped at 20 BEFORE any
    // pairing, denominators from the kept relation (df-1 shingles count
    // in sizes, expand no pairs via the a<b self-join).
    "q187_containment_rare" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |shs AS (
        |  SELECT DISTINCT doc_id,
        |    concat_ws(' ', t[i.i + 1], t[i.i + 2], t[i.i + 3]) AS s0
        |  FROM tk, UNNEST(range(0, greatest(len(t) - 3, 0) + 1)) AS i(i)),
        |sh AS (
        |  SELECT doc_id, ('0x' || substr(md5(s0), 1, 15))::BIGINT AS s
        |  FROM shs),
        |dfs AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY s
        |        HAVING COUNT(*) <= 20),
        |kept AS (SELECT sh.doc_id, sh.s FROM sh JOIN dfs ON dfs.s = sh.s),
        |nr AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter_cnt
        |  FROM kept a JOIN kept b ON b.s = a.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT i.a_id, i.b_id, i.inter_cnt, na.n AS a_n, nb.n AS b_n,
        |  CAST(i.inter_cnt AS DOUBLE) / least(na.n, nb.n) AS containment,
        |  CAST(i.inter_cnt AS DOUBLE) / (na.n + nb.n - i.inter_cnt) AS jaccard
        |FROM inter i JOIN nr na ON na.doc_id = i.a_id
        |             JOIN nr nb ON nb.doc_id = i.b_id
        |WHERE CAST(i.inter_cnt AS DOUBLE) / least(na.n, nb.n) >= 0.8
        |ORDER BY a_id, b_id""".stripMargin,

    // q23's est pipeline at threshold 0.3, then compact-forward triangle
    // closure on the id-oriented edge list and the 2T/d(d-1) coefficient.
    "q164_dup_triangles" ->
      s"""WITH $minhashEstCtes,
         |e AS (SELECT a_id AS a, b_id AS b FROM est WHERE est_jaccard >= 0.3),
         |deg AS (SELECT node, COUNT(*) AS degree FROM (
         |        SELECT a AS node FROM e UNION ALL SELECT b FROM e)
         |        GROUP BY 1),
         |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |        FROM e e1 JOIN e e2 ON e2.a = e1.b
         |                  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
         |pn AS (SELECT node, COUNT(*) AS n_triangles FROM (
         |       SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
         |       UNION ALL SELECT z FROM tri)
         |       GROUP BY 1)
         |SELECT d.node, d.degree, COALESCE(pn.n_triangles, 0) AS n_triangles,
         |  CASE WHEN d.degree >= 2
         |       THEN (2.0 * COALESCE(pn.n_triangles, 0)) /
         |            (d.degree * (d.degree - 1))
         |       ELSE 0.0 END AS clustering
         |FROM deg d LEFT JOIN pn ON pn.node = d.node
         |ORDER BY d.node""".stripMargin,

    // q23's pair set re-scored by DuckDB's own Levenshtein — both engines
    // implement the classic DP, so the integer distances agree exactly.
    "q171_editdist_verify" ->
      s"""WITH $minhashEstCtes,
         |p AS (SELECT a_id, b_id FROM est WHERE est_jaccard >= 0.5)
         |SELECT p.a_id, p.b_id,
         |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist,
         |  1.0 - CAST(levenshtein(a.text, b.text) AS DOUBLE) /
         |    greatest(len(a.text), len(b.text)) AS edit_sim
         |FROM p JOIN documents a ON a.doc_id = p.a_id
         |       JOIN documents b ON b.doc_id = p.b_id
         |ORDER BY a_id, b_id""".stripMargin,

    // Winnowing replay: same md5-prefix hex hashes, same ROWS-framed
    // window min, same df cap — lexicographic MIN over hex is engine-safe.
    "q170_winnow_pairs" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g AS (
        |  SELECT doc_id, i.i AS pos,
        |    substr(md5(concat_ws(' ', t[i.i+1], t[i.i+2], t[i.i+3], t[i.i+4])),
        |           1, 8) AS h
        |  FROM tk, UNNEST(range(0, greatest(len(t) - 4, 0) + 1)) AS i(i)),
        |sel AS (
        |  SELECT doc_id, pos,
        |    MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
        |                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS winmin,
        |    COUNT(*) OVER (PARTITION BY doc_id) AS n_grams
        |  FROM g),
        |fp AS (SELECT DISTINCT doc_id, winmin AS fp FROM sel
        |       WHERE pos <= n_grams - 4),
        |ok AS (SELECT fp FROM fp GROUP BY fp HAVING COUNT(*) BETWEEN 2 AND 20),
        |b AS (SELECT f.doc_id, f.fp FROM fp f JOIN ok ON ok.fp = f.fp),
        |p AS (SELECT a.doc_id AS a_id, b2.doc_id AS b_id, COUNT(*) AS n_shared
        |      FROM b a JOIN b b2 ON b2.fp = a.fp AND a.doc_id < b2.doc_id
        |      GROUP BY 1, 2)
        |SELECT a_id, b_id, CAST(n_shared AS BIGINT) AS n_shared
        |FROM p WHERE n_shared >= 3 ORDER BY a_id, b_id""".stripMargin,

    // q23's pair pipeline + recursive transitive closure: component id =
    // min over every reachable node (LEAST of self and reachable min).
    // q70's recursive components + q114's keep rule, rolled up per source
    // with the non-clustered majority re-attached via LEFT JOIN.
    "q145_dedup_impact_by_source" ->
      s"""WITH RECURSIVE $minhashEstCtes,
         |pairs AS (SELECT a_id, b_id FROM est WHERE est_jaccard >= 0.5),
         |edges AS (SELECT a_id AS s, b_id AS d FROM pairs
         |          UNION SELECT b_id, a_id FROM pairs),
         |reach(s, d) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT reach.s, e.d FROM reach JOIN edges e ON reach.d = e.s),
         |lbl AS (SELECT s AS node, LEAST(s, MIN(d)) AS cluster FROM reach GROUP BY s),
         |ranked AS (
         |  SELECT d.source,
         |    ROW_NUMBER() OVER (PARTITION BY l.cluster
         |      ORDER BY d.n_chars DESC, l.node) AS rk
         |  FROM lbl l JOIN documents d ON d.doc_id = l.node),
         |dup AS (
         |  SELECT source, COUNT(*) AS n_in_clusters,
         |    CAST(SUM(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_killed
         |  FROM ranked GROUP BY 1),
         |base AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1)
         |SELECT base.source, base.n_docs,
         |  CAST(COALESCE(dup.n_in_clusters, 0) AS BIGINT) AS n_in_clusters,
         |  CAST(COALESCE(dup.n_killed, 0) AS BIGINT) AS n_killed,
         |  CAST(COALESCE(dup.n_killed, 0) AS DOUBLE) / CAST(base.n_docs AS DOUBLE)
         |    AS kill_rate
         |FROM base LEFT JOIN dup ON dup.source = base.source
         |ORDER BY base.source""".stripMargin,

    "q70_dedup_clusters" ->
      s"""WITH RECURSIVE $minhashEstCtes,
         |pairs AS (SELECT a_id, b_id FROM est WHERE est_jaccard >= 0.5),
         |edges AS (SELECT a_id AS s, b_id AS d FROM pairs
         |          UNION SELECT b_id, a_id FROM pairs),
         |reach(s, d) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT reach.s, e.d FROM reach JOIN edges e ON reach.d = e.s),
         |lbl AS (SELECT s AS node, LEAST(s, MIN(d)) AS cluster FROM reach GROUP BY s)
         |SELECT cluster, COUNT(*) AS n_members,
         |  string_agg(node::VARCHAR, ',' ORDER BY node) AS members
         |FROM lbl GROUP BY cluster ORDER BY cluster""".stripMargin,

    // q70's recursive component replay + a quality window: the canonical
    // member is rk=1 by (n_chars desc, node); string_agg skips the NULLed
    // keeper, mirroring collect_list's null-skipping on the Spark side.
    "q114_cluster_canonical" ->
      s"""WITH RECURSIVE $minhashEstCtes,
         |pairs AS (SELECT a_id, b_id FROM est WHERE est_jaccard >= 0.5),
         |edges AS (SELECT a_id AS s, b_id AS d FROM pairs
         |          UNION SELECT b_id, a_id FROM pairs),
         |reach(s, d) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT reach.s, e.d FROM reach JOIN edges e ON reach.d = e.s),
         |lbl AS (SELECT s AS node, LEAST(s, MIN(d)) AS cluster FROM reach GROUP BY s),
         |m AS (
         |  SELECT lbl.cluster, lbl.node, d.n_chars,
         |    ROW_NUMBER() OVER (PARTITION BY lbl.cluster
         |      ORDER BY d.n_chars DESC, lbl.node) AS rk
         |  FROM lbl JOIN documents d ON d.doc_id = lbl.node)
         |SELECT cluster,
         |  MIN(CASE WHEN rk = 1 THEN node END) AS kept_id,
         |  MAX(CASE WHEN rk = 1 THEN n_chars END) AS kept_chars,
         |  CAST(SUM(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_killed,
         |  string_agg(CASE WHEN rk > 1 THEN node::VARCHAR END, ',' ORDER BY node) AS killed
         |FROM m GROUP BY cluster ORDER BY cluster""".stripMargin,

    // Full SimHash replay: md5-prefix 64-bit token hashes → per-bit votes →
    // fingerprint (HUGEINT two-halves reconstruction — DuckDB's BIGINT <<
    // overflows at bit 63) → 16-bit pigeonhole chunks → bucket join →
    // hamming ≤ 3. Same constants as graft.operators.Dedup.
    "q24_dedup_simhash" ->
      """WITH tok AS (
        |  SELECT DISTINCT doc_id, u.s AS s
        |  FROM documents, UNNEST(string_split(text, ' ')) AS u(s)),
        |h AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 16))::UBIGINT AS h64 FROM tok),
        |v AS (
        |  SELECT doc_id, j.j AS j,
        |    SUM(CASE WHEN ((h64 >> j.j) & 1) = 1 THEN 1 ELSE -1 END) AS vote
        |  FROM h, UNNEST(range(0, 64)) AS j(j) GROUP BY 1, 2),
        |parts AS (
        |  SELECT doc_id,
        |    SUM(CASE WHEN vote > 0 AND j < 32 THEN (1::BIGINT << j) ELSE 0 END) AS lo,
        |    SUM(CASE WHEN vote > 0 AND j >= 32 THEN (1::BIGINT << (j - 32)) ELSE 0 END) AS hi
        |  FROM v GROUP BY 1),
        |fp AS (
        |  SELECT doc_id,
        |    (CASE WHEN hi >= 2147483648 THEN hi::HUGEINT * 4294967296 + lo - 18446744073709551616
        |          ELSE hi::HUGEINT * 4294967296 + lo END)::BIGINT AS simhash
        |  FROM parts),
        |ch AS (
        |  SELECT doc_id, simhash, i.i AS chunk_idx, (simhash >> (i.i * 16)) & 65535 AS chunk
        |  FROM fp, UNNEST(range(0, 4)) AS i(i)),
        |ok AS (SELECT chunk_idx, chunk FROM ch GROUP BY chunk_idx, chunk HAVING COUNT(*) <= 1000),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
        |    bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
        |  FROM ch a JOIN ok USING (chunk_idx, chunk) JOIN ch b USING (chunk_idx, chunk)
        |  WHERE a.doc_id < b.doc_id AND bit_count(xor(a.simhash, b.simhash)) <= 3)
        |SELECT a_id, b_id, hamming FROM pairs ORDER BY a_id, b_id""".stripMargin,

    "q42_dialect_split" ->
      """SELECT u.word AS word, COUNT(*) AS cnt
        |FROM part, UNNEST(string_split(p_type, ' ')) AS u(word)
        |GROUP BY 1 ORDER BY word""".stripMargin,

    "q25_ngram_jaccard" ->
      """WITH toks AS (
        |  SELECT DISTINCT doc_id, u.tok
        |  FROM documents, UNNEST(string_split(lower(text), ' ')) AS u(tok)),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY 1),
        |inter AS (
        |  SELECT ta.doc_id AS a_id, COUNT(*) AS i
        |  FROM toks ta JOIN toks tb ON tb.doc_id = ta.doc_id + 1 AND tb.tok = ta.tok
        |  GROUP BY 1)
        |SELECT a.doc_id AS a_id, a.doc_id + 1 AS b_id,
        |  COALESCE(i, 0) AS inter_cnt, sa.n AS a_n, sb.n AS b_n,
        |  CAST(COALESCE(i, 0) AS DOUBLE) / (sa.n + sb.n - COALESCE(i, 0)) AS jaccard
        |FROM documents a
        |JOIN documents b ON b.doc_id = a.doc_id + 1
        |JOIN sizes sa ON sa.doc_id = a.doc_id
        |JOIN sizes sb ON sb.doc_id = b.doc_id
        |LEFT JOIN inter ON inter.a_id = a.doc_id
        |ORDER BY a_id""".stripMargin,

    "q66_trigram_jaccard" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    concat_ws(' ', t[i.i + 1], t[i.i + 2], t[i.i + 3]) AS s
        |  FROM tk, UNNEST(range(0, greatest(len(t) - 3, 0) + 1)) AS i(i)),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS a_id, COUNT(*) AS cnt
        |  FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1 AND b.s = a.s
        |  GROUP BY 1)
        |SELECT a.doc_id AS a_id, a.doc_id + 1 AS b_id,
        |  CAST(COALESCE(inter.cnt, 0) AS BIGINT) AS inter_cnt,
        |  sa.n AS a_n, sb.n AS b_n,
        |  CAST(COALESCE(inter.cnt, 0) AS DOUBLE) /
        |    (sa.n + sb.n - COALESCE(inter.cnt, 0)) AS jaccard
        |FROM documents a
        |JOIN documents b ON b.doc_id = a.doc_id + 1
        |JOIN sz sa ON sa.doc_id = a.doc_id
        |JOIN sz sb ON sb.doc_id = b.doc_id
        |LEFT JOIN inter ON inter.a_id = a.doc_id
        |ORDER BY a_id""".stripMargin,

    "q26_embed_pairs_sim" ->
      s"""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |  ${dot("a.embedding", "b.embedding")} /
         |    (${nrm("a.embedding")} * ${nrm("b.embedding")}) AS cosine,
         |  a.label = b.label AS same_label
         |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
         |ORDER BY a_id""".stripMargin,

    "q72_int8_quantized_sim" ->
      s"""WITH sc AS (
         |  SELECT vec_id, embedding,
         |    ${Similarity.int8ScaleSql("embedding")} AS qscale
         |  FROM embeddings),
         |q AS (
         |  SELECT vec_id, embedding, qscale,
         |    ${Similarity.int8QuantizeSql("embedding", "qscale")} AS qvec
         |  FROM sc)
         |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |  ${Similarity.int8DotSql("a.qvec", "b.qvec")} AS qdot,
         |  CAST(${Similarity.int8DotSql("a.qvec", "b.qvec")} AS DOUBLE)
         |    * a.qscale * b.qscale AS approx_dot,
         |  CAST(${dot("a.embedding", "b.embedding")} AS DOUBLE) / 68719476736.0 AS exact_dot
         |FROM q a JOIN q b ON b.vec_id = a.vec_id + 1
         |ORDER BY a_id""".stripMargin,

    "q33_ann_fast_topk" ->
      s"""WITH v AS (
         |  SELECT vec_id, embedding, ${nrm("embedding")} AS nrm FROM embeddings),
         |scored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    ${dot("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cosine
         |  FROM v q JOIN v c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
         |ranked AS (
         |  SELECT qid, cid,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rank
         |  FROM scored)
         |SELECT qid, cid, rank FROM ranked WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin,

    "q61_frame_sample" ->
      """WITH a AS (
        |  SELECT doc_id AS asset_id, 'media/' || source AS media_type,
        |         octet_length(CAST(text AS BLOB)) AS L
        |  FROM documents),
        |fr AS (
        |  SELECT asset_id, media_type, i.i AS frame_idx,
        |    least(256, L - i.i * 256) AS fbytes
        |  FROM a, UNNEST(range(0, greatest(CAST(ceil(L / 256.0) AS BIGINT), 1))) AS i(i)
        |  WHERE i.i % 4 = 0)
        |SELECT media_type, COUNT(*) AS n_frames_kept,
        |  CAST(SUM(fbytes) AS BIGINT) AS kept_bytes,
        |  COUNT(DISTINCT asset_id) AS n_assets
        |FROM fr GROUP BY 1 ORDER BY media_type""".stripMargin,

    "q62_multimodal_features" ->
      s"""WITH b AS (
         |  SELECT doc_id, 'media/' || source AS media_type,
         |    octet_length(CAST(text AS BLOB)) AS L,
         |    CASE WHEN length(text) = 0 THEN 0.0
         |         ELSE CAST(list_sum(list_transform(range(1, least(length(text), 64) + 1),
         |                i -> ord(substr(text, i, 1)))) AS DOUBLE)
         |              / (least(length(text), 64) * 256.0)
         |    END AS brightness
         |  FROM documents)
         |SELECT media_type, COUNT(*) AS n_assets,
         |  ${dsumSql("brightness")} AS sum_brightness,
         |  CAST(SUM(CAST(ceil(L / 256.0) AS BIGINT)) AS BIGINT) AS total_frames
         |FROM b GROUP BY 1 ORDER BY media_type""".stripMargin,

    "q65_multimodal_resize" ->
      """WITH r AS (
        |  SELECT 'media/' || source AS media_type,
        |    CAST((octet_length(CAST(text AS BLOB)) + 1) // 2 AS BIGINT) AS rb
        |  FROM documents)
        |SELECT media_type, COUNT(*) AS n_assets,
        |  CAST(SUM(rb) AS BIGINT) AS resized_bytes,
        |  MIN(rb) AS min_bytes, MAX(rb) AS max_bytes
        |FROM r GROUP BY 1 ORDER BY media_type""".stripMargin,

    // WAV-census twin: re-derives every field from the synthesis
    // parameters (pure functions of doc_id), so the Spark side's
    // encode→decode round trip must reproduce them exactly. clipped
    // counts raw values AT or BEYOND full scale — clamping on encode maps
    // exactly those to ±full-scale samples, which is what the decoder
    // censuses; peak is |sample| after clamping (32768 for a full-scale
    // negative, matching two's-complement abs).
    "q196_wav_census" ->
      """WITH p AS (
        |  SELECT doc_id, 8000 + (doc_id % 4) * 4000 AS sample_rate,
        |         1 + (doc_id % 2) AS channels, 64 + (doc_id % 32) AS n
        |  FROM documents),
        |s AS (
        |  SELECT p.doc_id, p.sample_rate, p.channels, p.n,
        |         (p.doc_id * 7 + i.i * 13) % 70000 - 35000 AS raw
        |  FROM p, UNNEST(range(0, p.n * p.channels)) AS i(i)),
        |c AS (
        |  SELECT doc_id, sample_rate, channels, n,
        |    SUM(CASE WHEN raw >= 32767 OR raw <= -32768 THEN 1 ELSE 0 END) AS clipped,
        |    MAX(abs(least(greatest(raw, -32768), 32767))) AS peak
        |  FROM s GROUP BY 1, 2, 3, 4)
        |SELECT sample_rate, channels, COUNT(*) AS n_assets,
        |  CAST(SUM(n) AS BIGINT) AS total_frames,
        |  CAST(SUM(clipped) AS BIGINT) AS total_clipped,
        |  CAST(MAX(peak) AS BIGINT) AS max_peak
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q34_multimodal_meta" ->
      """SELECT 'media/' || source AS media_type, COUNT(*) AS n_assets,
        |  CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
        |  COUNT(DISTINCT substr(md5(text), 1, 16)) AS n_unique_fp,
        |  CAST(SUM(CAST(CEIL(octet_length(CAST(text AS BLOB)) / 256.0) AS BIGINT)) AS BIGINT) AS total_frames
        |FROM documents GROUP BY 1 ORDER BY media_type""".stripMargin,

    // Hyperplane-LSH replay: md5-derived integer hyperplanes, exact-decimal
    // sign test per bit, bucket equi-join, exact cosine ≥ threshold. Same
    // constants as Similarity.lshNearNeighbors (bits=16, threshold=0.2).
    "q28_ann_lsh" ->
      s"""WITH bk AS (
         |  SELECT e.vec_id, CAST(${Similarity.lshBucketSql("e.embedding")} AS BIGINT) AS bucket
         |  FROM embeddings e),
         |v AS (
         |  SELECT e.vec_id, e.embedding, bk.bucket, ${nrm("e.embedding")} AS nrm
         |  FROM embeddings e JOIN bk USING (vec_id)),
         |pairs AS (
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |    ${dot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cosine
         |  FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |SELECT DISTINCT a_id, b_id, cosine FROM pairs WHERE cosine >= 0.2
         |ORDER BY a_id, b_id""".stripMargin,

    "q95_knn_graph" ->
      s"""WITH $knnGraphCtes
         |SELECT a_id, b_id, cosine, rank FROM knn
         |ORDER BY a_id, rank""".stripMargin,

    // 3 unrolled PageRank iterations over q95's knn edge set; per-edge
    // contributions round to DECIMAL(38,18) before each per-node sum and
    // the damping constants are explicit double ops, mirroring the Spark
    // loop bit-for-bit. Dangling mass leaks identically in both engines.
    "q113_knn_pagerank" -> {
      def iter(prev: String, out: String): String =
        s"""c_$out AS (
           |  SELECT e.dst AS id, SUM(CAST(r.pr / o.outdeg AS DECIMAL(38,18))) AS s
           |  FROM edges e JOIN odeg o ON o.src = e.src
           |  JOIN $prev r ON r.id = e.src GROUP BY 1),
           |$out AS (
           |  SELECT em.vec_id AS id,
           |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n +
           |      CAST(0.85 AS DOUBLE) * CAST(COALESCE(c.s, 0) AS DOUBLE) AS pr
           |  FROM embeddings em CROSS JOIN nn
           |  LEFT JOIN c_$out c ON c.id = em.vec_id)""".stripMargin
      s"""WITH $knnGraphCtes,
         |edges AS (SELECT a_id AS src, b_id AS dst FROM knn),
         |odeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1),
         |nn AS (SELECT COUNT(*) AS n FROM embeddings),
         |r0 AS (
         |  SELECT vec_id AS id, CAST(1.0 AS DOUBLE) / nn.n AS pr
         |  FROM embeddings CROSS JOIN nn),
         |${iter("r0", "r1")},
         |${iter("r1", "r2")},
         |${iter("r2", "r3")}
         |SELECT r3.id AS vec_id, r3.pr AS pagerank,
         |  CAST(COALESCE(o.outdeg, 0) AS BIGINT) AS n_out
         |FROM r3 LEFT JOIN odeg o ON o.src = r3.id
         |ORDER BY pagerank DESC, vec_id LIMIT 20""".stripMargin
    },

    // Same decimal-exact per-dim means refloated to REAL, same scaled-long
    // cosine tree as every embedding oracle.
    "q179_source_semantics" ->
      s"""WITH j AS (
         |  SELECT d.source, e.embedding
         |  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
         |dims AS (
         |  SELECT source, i.i AS pos,
         |    CAST(CAST(SUM(CAST(FLOOR(CAST(embedding[i.i + 1] AS DOUBLE)
         |        * 68719476736.0) AS BIGINT)) AS BIGINT) AS DOUBLE)
         |      / (CAST(COUNT(*) AS DOUBLE) * 68719476736.0) AS c
         |  FROM j, UNNEST(range(0, len(embedding))) AS i(i)
         |  GROUP BY 1, 2),
         |cent AS (
         |  SELECT source, list(CAST(c AS REAL) ORDER BY pos) AS centroid
         |  FROM dims GROUP BY 1)
         |SELECT a.source AS src_a, b.source AS src_b,
         |  ${dot("a.centroid", "b.centroid")} /
         |    (${nrm("a.centroid")} * ${nrm("b.centroid")}) AS centroid_cosine
         |FROM cent a JOIN cent b ON a.source < b.source
         |ORDER BY src_a, src_b""".stripMargin,

    // 3 unrolled synchronous LPA rounds over q95's edges made undirected;
    // the same frequency-then-min-label window decides every adoption.
    "q178_knn_communities" -> {
      def iter(prev: String, g: String, n: String, out: String): String =
        s"""$g AS (
           |  SELECT u.src, l.label, COUNT(*) AS cnt
           |  FROM und u JOIN $prev l ON l.id = u.dst GROUP BY 1, 2),
           |$n AS (
           |  SELECT src AS id, label FROM (
           |    SELECT src, label,
           |      ROW_NUMBER() OVER (PARTITION BY src
           |        ORDER BY cnt DESC, label) AS rn
           |    FROM $g) WHERE rn = 1),
           |$out AS (
           |  SELECT e.vec_id AS id, COALESCE(n.label, e.vec_id) AS label
           |  FROM embeddings e LEFT JOIN $n n ON n.id = e.vec_id)""".stripMargin
      s"""WITH $knnGraphCtes,
         |und AS (SELECT DISTINCT src, dst FROM (
         |  SELECT a_id AS src, b_id AS dst FROM knn
         |  UNION ALL SELECT b_id, a_id FROM knn)),
         |l0 AS (SELECT vec_id AS id, vec_id AS label FROM embeddings),
         |${iter("l0", "g1", "n1", "l1")},
         |${iter("l1", "g2", "n2", "l2")},
         |${iter("l2", "g3", "n3", "l3")}
         |SELECT id AS vec_id, label AS community FROM l3
         |ORDER BY vec_id""".stripMargin
    },

    "q77_embed_cluster_dedup" ->
      s"""WITH RECURSIVE bk AS (
         |  SELECT e.vec_id, CAST(${Similarity.lshBucketSql("e.embedding")} AS BIGINT) AS bucket
         |  FROM embeddings e),
         |v AS (
         |  SELECT e.vec_id, e.embedding, bk.bucket, ${nrm("e.embedding")} AS nrm
         |  FROM embeddings e JOIN bk USING (vec_id)),
         |pairs AS (
         |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
         |  FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |  WHERE ${dot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.1),
         |edges AS (SELECT a_id AS s, b_id AS d FROM pairs
         |          UNION SELECT b_id, a_id FROM pairs),
         |reach(s, d) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT reach.s, e.d FROM reach JOIN edges e ON reach.d = e.s),
         |lbl AS (SELECT s AS node, LEAST(s, MIN(d)) AS cluster FROM reach GROUP BY s)
         |SELECT cluster, COUNT(*) AS n_members
         |FROM lbl GROUP BY 1 ORDER BY 1""".stripMargin,

    // knnGraphCtes' banded pipeline with the label carried through: the
    // cross-label filter lands on candidate pairs before the per-anchor
    // rank, so rank 1 = nearest cross-label candidate.
    "q135_hard_negatives" ->
      s"""WITH sig AS (
         |  SELECT e.vec_id, e.embedding, e.label,
         |    CAST(${Similarity.lshBucketSql("e.embedding", 24)} AS BIGINT) AS sig,
         |    ${nrm("e.embedding")} AS nrm
         |  FROM embeddings e),
         |banded AS (
         |  SELECT vec_id, embedding, label, nrm, CAST(b AS INT) AS band,
         |    (sig >> (8 * CAST(b AS INT))) & 255 AS bucket
         |  FROM sig, UNNEST(range(3)) AS t(b)),
         |capped AS (
         |  SELECT * FROM (
         |    SELECT vec_id, embedding, label, nrm, band, bucket,
         |      ROW_NUMBER() OVER (PARTITION BY band, bucket
         |        ORDER BY ${Similarity.capSaltRankSql()}, vec_id) AS rn
         |    FROM banded) WHERE rn <= 200),
         |pairs AS (
         |  SELECT DISTINCT l.vec_id AS a_id, l.label AS a_label,
         |    r.vec_id AS neg_id, r.label AS neg_label,
         |    ${dot("l.embedding", "r.embedding")} / (l.nrm * r.nrm) AS cosine
         |  FROM capped l JOIN capped r
         |    ON l.band = r.band AND l.bucket = r.bucket AND l.label <> r.label),
         |ranked AS (
         |  SELECT a_id, a_label, neg_id, neg_label, cosine,
         |    ROW_NUMBER() OVER (PARTITION BY a_id ORDER BY cosine DESC, neg_id) AS rank
         |  FROM pairs)
         |SELECT a_id, a_label, neg_id, neg_label, cosine, rank
         |FROM ranked WHERE rank <= 1 ORDER BY a_id""".stripMargin,

    // Full Lloyd replay: seeds = smallest-md5 rows, each iteration one
    // Euclidean argmin assignment (Ivf.euclidScoreSql longs, ties → lowest
    // cidx) + decimal-exact per-dim means rounded to REAL, empty clusters
    // keeping the previous centroid; rollup = q110's cosine discipline.
    "q134_kmeans_census" -> kmeansCensusSql(k = 8, iters = 2),

    // IVF replay: md5-ordered centroid sample, exact-decimal assignment
    // (ties → lowest centroid index), nProbe=4 probe lists, exact cosine
    // top-5. Same constants as graft.operators.Ivf.topK.
    "q41_ann_ivf" ->
      s"""WITH cent AS (
         |  SELECT * FROM (
         |    SELECT vec_id AS cvid, embedding AS cvec,
         |      ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cidx
         |    FROM embeddings) WHERE cidx < 16),
         |asg AS (
         |  SELECT * FROM (
         |    SELECT e.vec_id, e.embedding, c.cidx,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dot("e.embedding", "c.cvec")} DESC, c.cidx) AS rn
         |    FROM embeddings e CROSS JOIN cent c) WHERE rn = 1),
         |probe AS (
         |  SELECT * FROM (
         |    SELECT q.vec_id AS qid, q.embedding AS qvec, c.cidx,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${dot("q.embedding", "c.cvec")} DESC, c.cidx) AS pr
         |    FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 10) WHERE pr <= 4),
         |scored AS (
         |  SELECT p.qid, a.vec_id AS cid,
         |    ${dot("p.qvec", "a.embedding")} / (${nrm("p.qvec")} * ${nrm("a.embedding")}) AS cosine
         |  FROM probe p JOIN asg a ON a.cidx = p.cidx AND a.vec_id <> p.qid),
         |ranked AS (
         |  SELECT qid, cid,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rank
         |  FROM scored)
         |SELECT qid, cid, rank FROM ranked WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin,

    // PQ replay: md5-ordered codebook rows sliced per subspace, scaled-
    // Euclidean encoding (bias = half scaled self-dot, ties → lowest code),
    // ADC = summed scaled dots of query slices against coded sub-centroids.
    // Same constants as graft.operators.Pq (m=8, k=128, shift=36).
    "q83_pq_topk" ->
      s"""WITH cb AS (
         |  SELECT * FROM (
         |    SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS code,
         |      embedding AS cvec
         |    FROM embeddings) WHERE code < 128),
         |cbsub AS (
         |  SELECT j.j AS sub, code, list_slice(cvec, j.j*8 + 1, j.j*8 + 8) AS scvec
         |  FROM cb, UNNEST(range(0, 8)) AS j(j)),
         |bias AS (
         |  SELECT sub, code, scvec,
         |    CAST(list_sum(list_transform(scvec, x ->
         |      CAST(FLOOR(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 68719476736.0) AS BIGINT)))
         |      AS BIGINT) // 2 AS b
         |  FROM cbsub),
         |enc AS (
         |  SELECT * FROM (
         |    SELECT e.vec_id, s.sub, s.code, s.scvec,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id, s.sub
         |        ORDER BY ${dot("list_slice(e.embedding, s.sub*8 + 1, s.sub*8 + 8)", "s.scvec")} - s.b DESC,
         |          s.code) AS rn
         |    FROM embeddings e CROSS JOIN bias s) WHERE rn = 1),
         |adc AS (
         |  SELECT q.vec_id AS qid, en.vec_id AS cid,
         |    CAST(SUM(${dot("list_slice(q.embedding, en.sub*8 + 1, en.sub*8 + 8)", "en.scvec")}) AS BIGINT) AS adc
         |  FROM embeddings q CROSS JOIN enc en
         |  WHERE q.vec_id < 10 AND en.vec_id <> q.vec_id
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT qid, cid, adc,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc DESC, cid) AS rank
         |  FROM adc)
         |SELECT qid, cid, adc, rank FROM ranked WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin,

    "q100_ivf_pq" ->
      s"""WITH cent AS (
         |  SELECT * FROM (
         |    SELECT vec_id AS cvid, embedding AS cvec,
         |      ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cidx
         |    FROM embeddings) WHERE cidx < 16),
         |asg AS (
         |  SELECT * FROM (
         |    SELECT e.vec_id, e.embedding, c.cidx,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dot("e.embedding", "c.cvec")} DESC, c.cidx) AS rn
         |    FROM embeddings e CROSS JOIN cent c) WHERE rn = 1),
         |probe AS (
         |  SELECT * FROM (
         |    SELECT q.vec_id AS qid, q.embedding AS qvec, c.cidx,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${dot("q.embedding", "c.cvec")} DESC, c.cidx) AS pr
         |    FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 10) WHERE pr <= 4),
         |cb AS (
         |  SELECT * FROM (
         |    SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS code,
         |      embedding AS cvec
         |    FROM embeddings) WHERE code < 128),
         |cbsub AS (
         |  SELECT j.j AS sub, code, list_slice(cvec, j.j*8 + 1, j.j*8 + 8) AS scvec
         |  FROM cb, UNNEST(range(0, 8)) AS j(j)),
         |bias AS (
         |  SELECT sub, code, scvec,
         |    CAST(list_sum(list_transform(scvec, x ->
         |      CAST(FLOOR(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 68719476736.0) AS BIGINT)))
         |      AS BIGINT) // 2 AS b
         |  FROM cbsub),
         |enc AS (
         |  SELECT * FROM (
         |    SELECT e.vec_id, s.sub, s.code, s.scvec,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id, s.sub
         |        ORDER BY ${dot("list_slice(e.embedding, s.sub*8 + 1, s.sub*8 + 8)", "s.scvec")} - s.b DESC,
         |          s.code) AS rn
         |    FROM embeddings e CROSS JOIN bias s) WHERE rn = 1),
         |adc AS (
         |  SELECT p.qid, a.vec_id AS cid,
         |    CAST(SUM(${dot("list_slice(p.qvec, en.sub*8 + 1, en.sub*8 + 8)", "en.scvec")}) AS BIGINT) AS adc
         |  FROM probe p
         |  JOIN asg a ON a.cidx = p.cidx AND a.vec_id <> p.qid
         |  JOIN enc en ON en.vec_id = a.vec_id
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT qid, cid, adc,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc DESC, cid) AS rank
         |  FROM adc)
         |SELECT qid, cid, adc, rank FROM ranked WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin,

    "q27_ann_brute_topk" ->
      s"""WITH v AS (
         |  SELECT vec_id, embedding, ${nrm("embedding")} AS nrm FROM embeddings),
         |scored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    ${dot("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cosine
         |  FROM v q JOIN v c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
         |ranked AS (
         |  SELECT qid, cid, cosine,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rank
         |  FROM scored)
         |SELECT qid, cid, cosine, rank FROM ranked WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin,

    // q27's exact-top-5 CTEs + q28's bucket CTE composed into the recall
    // audit; SUM(CASE ...) is HUGEINT in DuckDB, hence the BIGINT cast.
    "q128_ann_recall" ->
      s"""WITH v AS (
         |  SELECT vec_id, embedding, ${nrm("embedding")} AS nrm FROM embeddings),
         |scored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    ${dot("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cosine
         |  FROM v q JOIN v c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
         |truth AS (
         |  SELECT qid, cid FROM (
         |    SELECT qid, cid,
         |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rank
         |    FROM scored) WHERE rank <= 5),
         |bk AS (
         |  SELECT e.vec_id, CAST(${Similarity.lshBucketSql("e.embedding")} AS BIGINT) AS bucket
         |  FROM embeddings e)
         |SELECT t.qid, COUNT(*) AS n_truth,
         |  CAST(SUM(CASE WHEN q.bucket = c.bucket THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_candidates,
         |  CAST(SUM(CASE WHEN q.bucket = c.bucket THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE) AS recall_at_k
         |FROM truth t
         |JOIN bk q ON q.vec_id = t.qid
         |JOIN bk c ON c.vec_id = t.cid
         |GROUP BY 1 ORDER BY qid""".stripMargin)
}
