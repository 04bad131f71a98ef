package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis._
import Q._

/** Text-analysis suite over the `documents` fixture: language ID, quality
  * scoring, token counting, fingerprinting (training-data-pipeline
  * extension surface). All four fully oracle-checked — the operators are
  * deliberately built from cross-engine-deterministic string arithmetic
  * ([[graft.operators.TextAnalysis]]).
  */
object TextQueries {

  val defs: Map[String, QueryFn] = Map(
    // Vocabulary coverage (TextAnalysis.vocabCoverage): global top-500
    // vocab (count-desc word-asc — both engines replay the tie-break),
    // OOV-rate per language. The first table of any tokenizer RFC.
    "q115_vocab_coverage" -> { (s, dir) =>
      graft.operators.TextAnalysis.vocabCoverage(
        t(s, dir, "documents"), "lang", "text", topV = 500)
    },

    // Padding-waste census (TextAnalysis.paddingWaste): power-of-two
    // length buckets, pad tokens burned and utilization per bucket — the
    // fixed-shape-batching cost model. Integer bit-length bucketing, no
    // float log2.
    "q117_padding_waste" -> { (s, dir) =>
      graft.operators.TextAnalysis.paddingWaste(t(s, dir, "documents"), "text")
    },

    // CCNet-style perplexity gate: every document scored by the corpus
    // bigram LM (q104's operator with train = eval = corpus), then cut
    // into head/middle/tail terciles PER SOURCE (NTILE over xent with
    // doc_id tie-break). The per-source framing is the point: a uniform
    // global cut would just rank sources, not documents within them.
    "q118_perplexity_gate" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val docs = t(s, dir, "documents")
      val xent = graft.operators.TextAnalysis.ngramLmCrossEntropy(
        docs, docs, "doc_id", "text")
      val w = Window.partitionBy(col("source"))
        .orderBy(col("xent"), col("doc_id"))
      docs.select(col("doc_id"), col("source"))
        .join(xent, Seq("doc_id")) // inner: docs under 2 tokens score nothing
        .withColumn("tercile", ntile(3).over(w))
        .groupBy(col("source"), col("tercile"))
        .agg(count(lit(1)).as("n_docs"),
          (sum(col("xent").cast(DecimalType(30, 6))).cast("double") /
            count(lit(1))).as("avg_xent"))
        .orderBy(col("source"), col("tercile"))
    },

    // DSIR importance weights (TextAnalysis.dsirWeights): hashed-unigram
    // log-likelihood ratio of each document under the English slice vs the
    // raw corpus — the importance-resampling score for fitting a crawl to
    // a curated target. Top/bottom 10 by weight, deterministic tie-break.
    "q119_dsir_weights" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val scored = graft.operators.TextAnalysis.dsirWeights(
        docs, "doc_id", "text", col("lang") === "en")
        .join(docs.select(col("doc_id"), col("lang"), col("source")), Seq("doc_id"))
      val top = scored.orderBy(col("log_weight").desc, col("doc_id")).limit(10)
        .withColumn("side", lit("top"))
      val bottom = scored.orderBy(col("log_weight").asc, col("doc_id")).limit(10)
        .withColumn("side", lit("bottom"))
      top.unionByName(bottom)
        .select(col("side"), col("doc_id"), col("lang"), col("source"),
          col("n_tokens"), col("log_weight"))
        .orderBy(col("side"), col("log_weight").desc, col("doc_id"))
    },

    // HLL mergeability — THE distributed-sketch property: per-source
    // register files (what each executor/partition would ship) max-merge
    // into registers IDENTICAL to a direct whole-corpus build, so the
    // union estimate equals the direct estimate bit-for-bit. One row:
    // both estimates + the exact distinct for error audit.
    "q120_hll_union" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val bySrc = graft.operators.Sketch.hllRegistersBy(docs, "source", "text", p = 6)
      val merged = bySrc.groupBy(col("bucket"))
        .agg(max(col("max_rho")).cast("long").as("max_rho"))
      val union = graft.operators.Sketch.hllEstimate(merged, p = 6)
      val direct = graft.operators.Sketch.hllEstimate(
        graft.operators.Sketch.hllRegisters(docs, "text", p = 6)
          .select(col("bucket"), col("max_rho")), p = 6)
      union.select(col("occupied").as("u_occupied"),
          col("s_scaled").as("u_s_scaled"), col("hll_est").as("union_est"))
        .crossJoin(direct.select(col("hll_est").as("direct_est")))
        .crossJoin(docs.agg(countDistinct(col("text")).as("exact_distinct")))
    },

    // Pairwise source-overlap estimate WITHOUT touching row data twice:
    // inclusion-exclusion over mergeable HLL registers — est(A) + est(B) −
    // est(A∪B) per source pair, union registers formed by bucket-wise MAX
    // of the per-source register files (the ship-one-file-per-datacenter
    // property q120 proves). Register state is |sources|·m rows; the exact
    // shared-text audit column is the only corpus-scale pass and rides the
    // same distinct (source, text) projection a dup census already needs.
    "q174_hll_intersect" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val regs = graft.operators.Sketch.hllRegistersBy(docs, "source", "text", p = 6)
      val ests = graft.operators.Sketch.hllEstimateBy(regs, "source", p = 6)
      val srcs = docs.select(col("source")).distinct()
      val prs = srcs.select(col("source").as("src_a"))
        .join(srcs.select(col("source").as("src_b")), col("src_a") < col("src_b"))
      val uregs = prs
        .join(regs, col("source") === col("src_a") || col("source") === col("src_b"))
        .groupBy(col("src_a"), col("src_b"), col("bucket"))
        .agg(max(col("max_rho")).cast("long").as("max_rho"))
      // group on the real pair columns (multi-col hllEstimateBy) — the
      // earlier concat_ws("|")/split round-trip mis-split any source value
      // containing '|' and silently misattributed union estimates
      val uest = graft.operators.Sketch.hllEstimateBy(
        uregs, Seq("src_a", "src_b"), p = 6)
        .select(col("src_a"), col("src_b"), col("hll_est").as("union_est"))
      val ts = docs.select(col("source"), col("text")).distinct()
      val exact = ts.select(col("source").as("src_a"), col("text"))
        .join(ts.select(col("source").as("src_b"), col("text")), Seq("text"))
        .filter(col("src_a") < col("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("exact_shared"))
      uest
        .join(ests.select(col("source").as("src_a"), col("hll_est").as("est_a")),
          Seq("src_a"))
        .join(ests.select(col("source").as("src_b"), col("hll_est").as("est_b")),
          Seq("src_b"))
        .join(exact, Seq("src_a", "src_b"), "left_outer")
        .select(col("src_a"), col("src_b"), col("est_a"), col("est_b"),
          col("union_est"),
          ((col("est_a") + col("est_b")) - col("union_est")).as("inter_est"),
          coalesce(col("exact_shared"), lit(0L)).as("exact_shared"))
        .orderBy(col("src_a"), col("src_b"))
    },

    // Model-based quality scoring (the fastText-classifier analogue of
    // q30's hand features): fixed published-style weights over stopword
    // ratio, token shape and repetition, squashed by a logistic. The
    // accept gate is p >= 0.5 ⇔ z >= 0 — pure arithmetic, no exp in the
    // decision; the reported mean score rounds each sigmoid to
    // DECIMAL(30,9) before the exact sum (libm discipline).
    //
    // Accepted ulp-boundary risk (round-7 advice): the transcendental
    // queries (here, q104/q118's log2) depend on JVM Math.exp/log agreeing
    // with DuckDB's libm to within the DECIMAL rounding scale. Both engines
    // promise <1 ulp error but not the SAME rounding, so an input whose
    // true value sits within 1 ulp of a DECIMAL(30,9) rounding boundary
    // COULD round apart and flip the hash. The exposure is per-value ~1e-7
    // (boundary width / value spacing at scale 9) across ~1e4 fixture
    // values — ~0.1% per regeneration, accepted rather than coarsened:
    // rounding at a coarser scale shrinks the boundary-hit chance linearly
    // but loses a digit of report precision, and a hash flip here fails
    // loudly (one query, diagnosable in minutes) rather than corrupting
    // anything. If it ever fires twice, drop these casts to DECIMAL(30,6).
    "q121_quality_classifier" -> { (s, dir) =>
      import org.apache.spark.sql.types.DecimalType
      // fanOut: per-row gate metrics (dup-trigram fraction, stopword
      // occurrences) dominate the narrow scan
      val scored = fanOut(t(s, dir, "documents").select(col("source"), col("text")))
        .withColumn("padded", concat(lit(" "), col("text"), lit(" ")))
        .withColumn("n_tokens", tokenCount(col("text")))
        .withColumn("stop_ratio",
          (occurrences(col("padded"), " the ") + occurrences(col("padded"), " a "))
            .cast("double") / col("n_tokens"))
        .withColumn("avg_len", length(col("text")).cast("double") / col("n_tokens"))
        .withColumn("dup_frac", dupTrigramFraction("text"))
        .withColumn("z",
          lit(10.0) * col("stop_ratio") - lit(1.0) +
            lit(2.0) * (col("avg_len") - lit(5.0)) - lit(5.0) * col("dup_frac"))
        .withColumn("score", lit(1.0) / (lit(1.0) + exp(-col("z"))))
      scored.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("z") >= 0.0, 1L).otherwise(0L)).as("n_accepted"),
          (sum(col("score").cast(DecimalType(30, 9))).cast("double") /
            count(lit(1))).as("avg_score"))
        .orderBy(col("source"))
    },

    // Marker-based language ID vs the labeled lang column: confusion counts.
    "q29_lang_id" -> { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("padded", concat(lit(" "), col("text"), lit(" ")))
        .select(col("lang"), langId(col("padded")).as("predicted"))
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("lang"), col("predicted"))
    },

    // Per-document quality features: tokens, avg token length, stopword
    // ratio — single-pass, no shuffle beyond the final sort.
    "q30_quality_score" -> { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("padded", concat(lit(" "), col("text"), lit(" ")))
        .withColumn("n_tokens", tokenCount(col("text")))
        .withColumn("stop_hits",
          occurrences(col("padded"), " the ") + occurrences(col("padded"), " a "))
        .select(col("doc_id"), col("n_tokens"),
          (length(col("text")).cast("double") / col("n_tokens")).as("avg_token_len"),
          (col("stop_hits").cast("double") / col("n_tokens")).as("stop_ratio"))
        .orderBy(col("doc_id"))
    },

    // PII scrub: the fixture text is synthetic (no PII), so each row is
    // augmented with a deterministic email/phone/IP suffix derived from its
    // id — then redacted through the regexp_replace chain. Both engines
    // build and scrub the identical string, so the redaction itself is
    // what's hash-checked.
    "q71_pii_redaction" -> { (s, dir) =>
      t(s, dir, "documents").filter(col("doc_id") < 50)
        .select(col("doc_id"),
          concat(col("text"),
            lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com or 555-123-4567 node 10.0.0."),
            (col("doc_id") % 256).cast("string")).as("txt"))
        .select(col("doc_id"), redactPii(col("txt")).as("redacted"))
        .withColumn("clean", !col("redacted").contains("@") &&
          !col("redacted").rlike("\\d{3}[-.]\\d{3}"))
        .orderBy(col("doc_id"))
    },

    // Gopher-style repetition gate: per-doc duplicate-trigram fraction and
    // the resulting keep flag — the boilerplate/spam filter of a
    // pretraining pipeline, pure per-row array arithmetic.
    "q73_repetition_filter" -> { (s, dir) =>
      // fanOut: the per-row trigram-fraction array arithmetic dominates
      fanOut(t(s, dir, "documents").select(col("doc_id"), col("text")))
        .select(col("doc_id"), dupTrigramFraction("text").as("dup_frac"))
        .withColumn("keep", col("dup_frac") < 0.2)
        .orderBy(col("doc_id"))
    },

    // Context-window chunking: fixed 500-char chunks at stride 400 (100
    // chars of overlap) — how documents become training-context rows; the
    // chunk count per doc is ceil((L-chunk)/stride)+1 with a 1-chunk floor.
    "q78_context_chunks" -> { (s, dir) =>
      val (chunk, stride) = (500, 400)
      t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"), posexplode(expr(
          s"transform(sequence(0, greatest(cast(ceil((length(text) - $chunk) / $stride.0) AS int), 0)), " +
            s"i -> substring(text, i * $stride + 1, $chunk))")).as(Seq("chunk_idx", "chunk")))
        .withColumn("chunk_len", length(col("chunk")).cast("long"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },

    // Sequence packing: chunks fill fixed 4000-char context bins by
    // running total within each language shard (bin = floor of the
    // pre-chunk cumulative length / budget) — the greedy packing step that
    // turns chunked documents into training sequences. Partitioned by
    // lang so the window never degenerates to a single global sort.
    "q79_sequence_packing" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val (chunk, stride, budget) = (500, 400, 4000)
      val chunks = t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("lang"), col("doc_id"), posexplode(expr(
          s"transform(sequence(0, greatest(cast(ceil((length(text) - $chunk) / $stride.0) AS int), 0)), " +
            s"i -> substring(text, i * $stride + 1, $chunk))")).as(Seq("chunk_idx", "chunk")))
        .withColumn("chunk_len", length(col("chunk")).cast("long"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("doc_id"), col("chunk_idx"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      chunks
        .withColumn("bin", floor((sum(col("chunk_len")).over(w) - col("chunk_len"))
          / budget.toDouble).cast("long"))
        .groupBy(col("lang"), col("bin"))
        .agg(count(lit(1)).as("n_chunks"), sum(col("chunk_len")).as("packed_chars"))
        .orderBy(col("lang"), col("bin"))
    },

    // Quality-weighted sampling: keep-rate proportional to document length
    // (rate = min(1, tokens/150)) — per-row Bernoulli with deterministic
    // content-hash membership, the realistic corpus-downsampling policy.
    "q76_quality_weighted_sample" -> { (s, dir) =>
      val docs = t(s, dir, "documents").withColumn("n_tokens", tokenCount(col("text")))
      val rate = least(lit(1.0), col("n_tokens").cast("double") / 150.0)
      graft.operators.Sampling.qualityWeighted(docs, "text", rate)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_tokens")).as("kept_tokens"))
        .orderBy(col("lang"))
    },

    // Corpus token accounting per lang (the budget query of a data pipe).
    "q31_token_count" -> { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("n_tokens", tokenCount(col("text")))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          min(col("n_tokens")).as("min_tokens"),
          max(col("n_tokens")).as("max_tokens"))
        .orderBy(col("lang"))
    },

    // Stratified sample: exactly 30 docs per lang by content-hash order —
    // balanced training-set construction, reproducible on any cluster.
    "q48_stratified_sample" -> { (s, dir) =>
      graft.operators.Sampling.stratified(t(s, dir, "documents"), "lang", "text", 30)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(length(col("text")).cast("long")).as("sum_chars"))
        .orderBy(col("lang"))
    },

    // Weighted mixture sample: per-source keep-rates via hash thresholds
    // (deterministic Bernoulli; expected rate = weight).
    "q49_mixture_sample" -> { (s, dir) =>
      val weights = Map("en" -> 0.8, "fr" -> 0.5, "de" -> 0.25, "es" -> 0.25)
      graft.operators.Sampling.mixture(t(s, dir, "documents"), "lang", "text", weights)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"))
        .orderBy(col("lang"))
    },

    // Top-k per group (vocabulary heavy-hitters per lang): groupBy counts +
    // ranked window — the standard two-shuffle top-k-per-key plan.
    "q50_top_words_per_lang" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val counts = t(s, dir, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("word"))
        .groupBy(col("lang"), col("word"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("word"))
      counts.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .orderBy(col("lang"), col("rnk"))
    },

    // Same heavy-hitters result as q50, but via the typed TopKAggregator —
    // bounded partial buffers with map-side combine instead of a full
    // partition sort (the plan that survives a 1000-way hot group).
    "q51_topk_aggregate" -> { (s, dir) =>
      val topk = graft.functions.TopKAggregator.topK(5)
      val counts = t(s, dir, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("word"))
        .groupBy(col("lang"), col("word"))
        .agg(count(lit(1)).as("cnt"))
      counts.groupBy(col("lang"))
        .agg(topk(col("word"), col("cnt")).as("top"))
        .select(col("lang"), posexplode(col("top")).as(Seq("pos", "w")))
        .select(col("lang"), col("w.item").as("word"), col("w.weight").as("cnt"),
          (col("pos") + 1).cast("long").as("rnk"))
        .orderBy(col("lang"), col("rnk"))
    },

    // BPE-ish subword accounting (letters/digits/punct pre-tokenization).
    "q52_bpe_tokens" -> { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("n_bpe", bpeTokenCount(col("text")))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_bpe")).as("total_bpe"),
          min(col("n_bpe")).as("min_bpe"),
          max(col("n_bpe")).as("max_bpe"))
        .orderBy(col("lang"))
    },

    // Blocklist / safety filter census — the word-list gate every corpus
    // release runs (toxicity, PII keywords, spam markers): per-source hit
    // counts against a fixed term list, docs flagged at >= 2 hits, and
    // the flagged share. Same padded-occurrences arithmetic as the
    // stopword features — deterministic, no regex classes.
    "q125_blocklist_filter" -> { (s, dir) =>
      val terms = Seq("spark", "merge") // stands in for a real blocklist
      val p = concat(lit(" "), col("text"), lit(" "))
      val hits = terms.map(t => occurrences(p, s" $t ")).reduce(_ + _)
      t(s, dir, "documents")
        .withColumn("hits", hits)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("hits")).as("total_hits"),
          sum(when(col("hits") >= 2L, 1L).otherwise(0L)).as("n_flagged"))
        .withColumn("flagged_share",
          col("n_flagged").cast("double") / col("n_docs"))
        .orderBy(col("source"))
    },

    // BPE first-merge census: adjacent character-pair frequencies inside
    // words — the statistic tokenizer training computes before its first
    // merge. Charset²-bounded key space; top-N plans as a heap.
    "q129_bpe_pair_census" -> { (s, dir) =>
      graft.operators.TextAnalysis.bpePairCensus(t(s, dir, "documents"), "text", topN = 30)
    },

    // Zipf rank-frequency slope per language — the corpus-health number
    // (natural text ≈ -1; templated sources flatten it). Least squares on
    // decimal-rounded ln(rank)/ln(freq) over the top-200 ranks.
    "q130_zipf_slope" -> { (s, dir) =>
      graft.operators.TextAnalysis.zipfSlope(t(s, dir, "documents"), "lang", "text")
        .withColumnRenamed("grp", "lang")
        .orderBy(col("lang"))
    },

    // PMI collocations: top adjacent word pairs by pointwise mutual
    // information (min count 5) — the phrase-mining pass a tokenizer
    // vocabulary or n-gram quality audit runs.
    "q131_pmi_collocations" -> { (s, dir) =>
      graft.operators.TextAnalysis.pmiCollocations(t(s, dir, "documents"), "text")
    },

    // Per-source novelty census: share of each source's distinct 8-grams
    // first seen in that source's documents (first carrier = min doc_id)
    // — the incremental-value number behind "keep ingesting this crawl?".
    "q132_novelty_census" -> { (s, dir) =>
      graft.operators.TextAnalysis.noveltyCensus(
        t(s, dir, "documents"), "doc_id", "text", "source", k = 8)
        .orderBy(col("source"))
    },

    // Per-source token-length quantile table — the corpus-card length
    // section (truncation/padding planning reads p90/p99, not the mean):
    // exact interpolated percentiles over integer token counts (the q43
    // cross-engine parity discipline), one group-aggregate per source.
    "q150_length_quantiles" -> { (s, dir) =>
      graft.operators.TextAnalysis.lengthQuantiles(t(s, dir, "documents"))
    },

    // TF-IDF heavy terms per source — the corpus-card "distinctive
    // vocabulary" section (q50 ranks raw counts; this discounts words
    // every source shares, so ubiquitous terms score 0 and per-source
    // jargon surfaces). idf = ln(n_sources / doc_freq) over exact integer
    // counts, rounded DECIMAL(30,9) straight after the transcendental
    // (q104 discipline); score = tf · idf is then one double product.
    // Scale shape: both count shuffles are vocabulary-bounded with
    // map-side combine; the source count rides as a 1-row broadcast; the
    // per-source top-5 is a rank window over vocabulary-sized groups.
    "q151_tfidf_terms" -> { (s, dir) =>
      graft.operators.TextAnalysis.tfidfTermsFromTokens(
        t(s, dir, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("word")))
    },

    // n-gram diversity census: distinct trigrams / trigram occurrences per
    // source — the content-repetitiveness analogue of q81's token-level
    // TTR (a templated source scores low even when its token TTR looks
    // healthy). Native codegen'd WordNgrams cutting (truncated window for
    // short docs), mirrored in the oracle by the q66 greatest(len-k,0)+1
    // window. One vocabulary-bounded shuffle; distincts are partial-agg
    // friendly; no joins.
    "q154_ngram_diversity" -> { (s, dir) =>
      graft.operators.TextAnalysis.ngramDiversity(t(s, dir, "documents"))
    },

    // Curriculum phases: documents ranked easy→hard by rare-word ratio
    // (corpus frequency ≤ 2), cut into 4 equal-count phases, with a
    // per-phase census — the data-ordering plan curriculum-learning
    // schedules train from. Difficulty is an exact small-integer ratio;
    // the phase cut orders by (difficulty, doc_id), a total order, so
    // boundaries are deterministic. Scale shape: the corpus frequency
    // table is vocabulary-bounded and broadcast back onto the exploded
    // tokens (no shuffle of the token stream by word); the global rank
    // comes from GlobalIndex (range exchange + per-partition sort +
    // zipWithIndex) — NOT an unpartitioned ntile window, which would
    // funnel every per-doc row through one task — and the NTILE bucket
    // rule is replayed exactly in integer arithmetic: the first n%4
    // buckets take ceil(n/4) rows, the rest floor(n/4).
    "q157_curriculum_phases" -> { (s, dir) =>
      val words = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      val wf = words.groupBy(col("word")).agg(count(lit(1)).as("wf"))
      val perDoc = words.join(broadcast(wf), Seq("word"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tok"),
          sum(when(col("wf") <= 2L, 1L).otherwise(0L)).as("n_rare"))
        .withColumn("difficulty",
          col("n_rare").cast("double") / col("n_tok").cast("double"))
      val ranked = graft.operators.GlobalIndex.withRowNumbers(
        perDoc, Seq("difficulty", "doc_id"), "rn")
      val n = perDoc.agg(count(lit(1)).as("n"))
      ranked.crossJoin(broadcast(n))
        .withColumn("qsz", expr("n div 4")).withColumn("rmd", pmod(col("n"), lit(4)))
        .withColumn("boundary", col("rmd") * (col("qsz") + 1L))
        .withColumn("phase",
          when(col("rn") - 1L < col("boundary"),
            expr("(rn - 1) div (qsz + 1) + 1"))
          .otherwise(expr("rmd + (rn - 1 - boundary) div greatest(qsz, 1) + 1"))
          .cast("long"))
        .groupBy(col("phase"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("total_tok"),
          dsum(col("difficulty"), 30, 9).as("sum_difficulty"))
        .orderBy(col("phase"))
    },

    // Skip-gram co-occurrence pairs (window ±2): the word2vec-style
    // context statistic, counting unordered word pairs at distance 1 and
    // 2 from each full trigram window's anchor — complements q131's
    // adjacent-only PMI. Docs shorter than 3 tokens are excluded on both
    // sides (q107 discipline), so every window is full-width and the
    // anchor-forward pair decomposition is exact. One native codegen'd
    // WordNgrams cut, one vocabulary²-bounded count shuffle with map-side
    // combine, and a TakeOrdered top-30 on the (cnt desc, pair) total
    // order — no self-join of the token stream.
    "q158_skipgram_cooc" -> { (s, dir) =>
      val g = t(s, dir, "documents")
        .filter(size(split(col("text"), " ")) >= 3)
        .select(explode(graft.functions.GraftFunctions.wordNgrams(col("text"), 3))
          .as("g"))
        .select(substring_index(col("g"), " ", 1).as("w1"),
          expr("substring_index(substring_index(g, ' ', 2), ' ', -1)").as("w2"),
          substring_index(col("g"), " ", -1).as("w3"))
      g.select(explode(array(
          struct(least(col("w1"), col("w2")).as("pa"),
            greatest(col("w1"), col("w2")).as("pb")),
          struct(least(col("w1"), col("w3")).as("pa"),
            greatest(col("w1"), col("w3")).as("pb")))).as("p"))
        .select(col("p.pa").as("pa"), col("p.pb").as("pb"))
        .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pa"), col("pb"))
        .limit(30)
    },

    // Distributed BPE merge training (TextAnalysis.bpeTrainMerges): the
    // real tokenizer-training loop — 8 merges over the word-frequency
    // table, each one distributed pair count + 1-row argmax + row-logic
    // re-segmentation. The output IS the model (rank, pair, new token,
    // count); the oracle replays all 8 iterations with the same windows.
    "q147_bpe_train" -> { (s, dir) =>
      graft.operators.TextAnalysis.bpeTrainMerges(
        t(s, dir, "documents"), "text", nMerges = 8)
    },

    // Token-budget mixture plan: per-source epoch table under a half-corpus
    // training budget with alpha=0.5 temperature weights over TOKENS —
    // the decision artifact between q86 (weights) and q112 (the order).
    "q138_token_budget_plan" -> { (s, dir) =>
      graft.operators.TextAnalysis.tokenBudgetPlan(
        t(s, dir, "documents"), "source", "text")
    },

    // N-gram novelty saturation: distinct/first-carrier 8-grams per md5
    // pseudo-ingestion batch — the diminishing-returns curve that answers
    // "is more of this crawl still worth ingesting?".
    "q139_novelty_saturation" -> { (s, dir) =>
      graft.operators.TextAnalysis.noveltySaturation(
        t(s, dir, "documents"), "doc_id", "text", k = 8)
    },

    // Per-source contamination matrix: which sources carry the eval-set
    // overlap (q80's gate rolled up to the source level) — the corpus-card
    // table that says where the leakage lives.
    "q140_contamination_by_source" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val train = docs.filter(col("doc_id") % 50 =!= 0)
      val flagged = ngramOverlap(
        train, docs.filter(col("doc_id") % 50 === 0), "doc_id", "text", k = 4)
        .select(col("doc_id"))
      val perSrc = train.groupBy(col("source")).agg(count(lit(1)).as("n_train_docs"))
      val cont = train.select(col("doc_id"), col("source"))
        .join(flagged, Seq("doc_id"))
        .groupBy(col("source")).agg(count(lit(1)).as("n_contaminated"))
      perSrc.join(cont, Seq("source"), "left")
        .withColumn("n_contaminated", coalesce(col("n_contaminated"), lit(0L)))
        .withColumn("contamination_rate",
          col("n_contaminated").cast("double") / col("n_train_docs").cast("double"))
        .orderBy(col("source"))
    },

    // Heaps'-law vocabulary growth: per language, types-vs-tokens for the
    // full corpus and a deterministic md5-half, plus the growth exponent
    // beta = ln(V/V_half)/ln(N/N_half) — the tokenizer-sizing companion
    // to q130's Zipf slope (does this language keep minting new types?).
    "q137_heaps_census" -> { (s, dir) =>
      graft.operators.TextAnalysis.heapsCensus(
        t(s, dir, "documents"), "lang", "text", "doc_id")
    },

    // Boilerplate-line census: per source, how much volume sits in lines
    // repeated across >= 2 docs corpus-wide — the report that decides
    // which sources are worth a line-dedup pass (nav/footer repetition).
    "q136_boilerplate_census" -> { (s, dir) =>
      graft.operators.TextAnalysis.boilerplateCensus(
        t(s, dir, "documents"), "doc_id", "text", "source")
    },

    // Tokenizer fertility — the cross-lingual fairness metric: subword
    // (BPE-ish) tokens per whitespace word and chars per subword token,
    // per language. A tokenizer that spends 3× the tokens per word on one
    // language triples that language's training and serving cost; this is
    // the table that decision cites. Pure per-row counting, one aggregate.
    "q123_token_fertility" -> { (s, dir) =>
      graft.operators.TextAnalysis.tokenFertility(t(s, dir, "documents"), "lang", "text")
    },

    // Winnowing fingerprints (12-gram hashes → min-per-8-window): docs
    // sharing ≥8 kept fingerprints — the rolling-hash overlap detector.
    // Ubiquitous fingerprints (doc-frequency > 50) are dropped before the
    // self-join, the same frequent-key mitigation as the LSH bucket caps.
    "q68_winnow_pairs" -> { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      import org.apache.spark.sql.expressions.Window
      val fps = fanOut(t(s, dir, "documents").select(col("doc_id"), col("text")))
        .select(col("doc_id"),
          explode(expr("winnow_fingerprints(text, 12, 8)")).as("fp"))
        .withColumn("df", count(lit(1)).over(Window.partitionBy(col("fp"))))
        .filter(col("df") <= 50)
        .drop("df")
        .cache()
      fps.select(col("doc_id").as("a_id"), col("fp"))
        .join(fps.select(col("doc_id").as("b_id"), col("fp")), Seq("fp"))
        .filter(col("a_id") < col("b_id"))
        .groupBy(col("a_id"), col("b_id"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 8)
        .orderBy(col("a_id"), col("b_id"))
    },

    // Content fingerprints (md5-based rolling-hash analogue): collision
    // census per source.
    "q32_fingerprint" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("source"), fingerprint(trim(col("text"))).as("fp"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), countDistinct(col("fp")).as("n_unique_fp"))
        .orderBy(col("source"))
    },

    // Train/eval decontamination: docs with doc_id % 50 = 0 stand in for
    // the held-out eval set; every train doc sharing a word 4-gram with it
    // is flagged with its distinct-overlap count. Eval n-grams broadcast —
    // the benchmark-vs-100TB-corpus shape (see TextAnalysis.ngramOverlap).
    "q80_decontaminate" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      ngramOverlap(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0),
        "doc_id", "text", k = 4)
        .orderBy(col("doc_id"))
    },

    // Bloom-pruned decontamination (TextAnalysis.bloomNgramOverlap): the
    // giant-eval scale path — eval n-grams compressed to a broadcast
    // bloom (auto-sized ~12 bits/key from the eval cardinality) that
    // prunes train shingles map-side before the exact shuffled join.
    // False positives die in the join, so the result equals the exact
    // overlap — which is what the oracle checks.
    "q96_bloom_decontaminate" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      graft.operators.TextAnalysis.bloomNgramOverlap(
        docs.filter(col("doc_id") % 40 =!= 0),
        docs.filter(col("doc_id") % 40 === 0),
        "doc_id", "text", k = 4)
        .orderBy(col("doc_id"))
    },

    // Bigram-LM cross-entropy (TextAnalysis.ngramLmCrossEntropy): the
    // CCNet/Gopher perplexity quality signal — add-one-smoothed bigram
    // model trained on the held-in split, held-out docs scored by mean
    // -log2 P(w2|w1). The LM is a pair of count DataFrames joined onto
    // the eval bigrams; per-bigram costs round to DECIMAL(30,6) before
    // the exact sum so the mean survives libm and accumulation-order
    // differences between engines.
    "q104_ngram_lm_xent" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      graft.operators.TextAnalysis.ngramLmCrossEntropy(
        docs.filter(col("doc_id") % 40 =!= 0),
        docs.filter(col("doc_id") % 40 === 0),
        "doc_id", "text")
        .orderBy(col("doc_id"))
    },

    // Inverted-index build: term → document frequency + capped posting
    // list — the search-infrastructure face of a corpus pipeline. Posting
    // lists are bounded (first 10 doc ids) so the per-term aggregate state
    // stays O(cap) however hot the term; one term-partitioned shuffle.
    "q85_inverted_index" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(explode(array_distinct(split(col("text"), " "))).as("term"), col("doc_id"))
        .groupBy(col("term"))
        .agg(count(lit(1)).as("df"),
          concat_ws(",", expr(
            "transform(slice(sort_array(collect_list(doc_id)), 1, 10), x -> cast(x AS string))"))
            .as("postings"))
        .orderBy(col("df").desc, col("term"))
        .limit(20)
    },

    // Temperature-based corpus mixing (α = 0.5 via sqrt — the standard
    // low-resource-language up-weighting): per-language natural share,
    // temperature weight, and the resulting boost factor. sqrt and single
    // divisions are IEEE-correctly-rounded, so the doubles replay exactly.
    "q86_mixture_weights" -> { (s, dir) =>
      val counts = t(s, dir, "documents")
        .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      // Attach the corpus total as a broadcast 1-row crossJoin rather than an
      // empty-partition Window: same 5-row result, but no "Moving all data to
      // a single partition" warning polluting the bench stdout tail.
      counts.crossJoin(broadcast(counts.agg(sum(col("n_docs")).as("total_docs"))))
        .withColumn("natural_share",
          col("n_docs").cast("double") / col("total_docs").cast("double"))
        .withColumn("temp_weight", sqrt(col("natural_share")))
        .withColumn("boost", col("temp_weight") / col("natural_share"))
        .select(col("lang"), col("n_docs"), col("natural_share"),
          col("temp_weight"), col("boost"))
        .orderBy(col("lang"))
    },

    // Type-token ratio per language — the lexical-diversity quality signal.
    // Integer sums aggregate exactly; the single double division at the end
    // is IEEE-correctly-rounded in both engines.
    "q81_type_token_ratio" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("lang"),
          size(array_distinct(split(col("text"), " "))).cast("long").as("nd"),
          size(split(col("text"), " ")).cast("long").as("nw"))
        .groupBy(col("lang"))
        .agg(sum(col("nd")).as("sum_distinct"), sum(col("nw")).as("sum_words"))
        .withColumn("ttr", col("sum_distinct").cast("double") / col("sum_words"))
        .orderBy(col("lang"))
    },

    // Per-source score calibration: equal-frequency decile binning (NTILE
    // over each language's size distribution) — the normalization step
    // before cross-source mixing, so "top decile" means the same thing in
    // every source regardless of its absolute score scale. Deterministic
    // tie-break on doc_id keeps bucket edges identical across engines.
    "q102_decile_binning" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
      t(s, dir, "documents")
        .withColumn("decile", ntile(10).over(w))
        .groupBy(col("lang"), col("decile"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("lo_chars"), max(col("n_chars")).as("hi_chars"))
        .orderBy(col("lang"), col("decile"))
    },

    // Count-min heavy hitters (graft.operators.Sketch): the corpus token
    // stream folds into a fixed 3×512 grid — ONE bounded shuffle at any
    // corpus size — then the top-20 exact tokens are point-estimated
    // against it. cm_est >= exact_cnt always (sketch error is one-sided);
    // both ride in the output for audit.
    "q92_cm_heavy_hitters" -> { (s, dir) =>
      // fanOut the projected text before tokenizing: both consumers (sketch
      // + exact top-k) replay the explode, and the one-row-group scan would
      // otherwise run each on a single task
      val tokens = fanOut(t(s, dir, "documents").select(col("text")))
        .select(explode(split(col("text"), " ")).as("tok"))
      val sketch = graft.operators.Sketch.countMin(tokens, "tok", d = 3, w = 512)
      val top = tokens.groupBy(col("tok")).agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("tok")).limit(20)
      graft.operators.Sketch.countMinEstimate(top, "tok", "exact_cnt", sketch, d = 3, w = 512)
        .orderBy(col("exact_cnt").desc, col("tok"))
    },

    // Line-level exact dedup (RefinedWeb/CCNet-style, on 10-token lines —
    // the fixture text is single-line): first global occurrence of each
    // line survives, later copies are dropped, documents are reassembled
    // from their surviving lines. One shuffle on the line text (bounded by
    // distinct lines), one on doc_id to reassemble.
    "q93_line_dedup" -> { (s, dir) =>
      // dedupLines carries every document itself (left join onto the
      // id-keyed spine, zero-kept docs included) — no outer re-join needed
      graft.operators.LineDedup.dedupLines(
        t(s, dir, "documents"), "doc_id", "text", lineTokens = 10)
        .orderBy(col("doc_id"))
    },

    // Most-duplicated-passage census (TextAnalysis.repeatedNgramCensus):
    // top repeated word 8-grams with occurrence / distinct-doc counts and
    // an example doc — the memorization-risk report published alongside
    // corpus releases. Occurrence-preserving (within-doc repeats count),
    // full-length 8-grams only; top-50 by (n_occ desc, ngram) is a total
    // order, so the LIMIT cut is deterministic cross-engine.
    "q107_repeated_ngrams" -> { (s, dir) =>
      graft.operators.TextAnalysis.repeatedNgramCensus(
        t(s, dir, "documents"), "doc_id", "text", k = 8, topN = 50)
    },

    // Temperature-weighted epoch manifest (Sampling.epochManifest): the
    // deterministic training ORDER — stride scheduling interleaves
    // sources in proportion to their sqrt-share weights; head-of-manifest
    // report, TakeOrdered heap, no global sort.
    "q112_epoch_manifest" -> { (s, dir) =>
      graft.operators.Sampling.epochManifest(
        t(s, dir, "documents"), "doc_id", "source", topN = 100)
    },

    // Per-source unigram KL divergence vs the corpus blend (TextAnalysis
    // .unigramKlBySource): the domain-shift report — which sources' word
    // distributions sit far from the mixture they'll be trained as.
    // Probabilities are exact count ratios; the lone ln rounds to
    // DECIMAL(30,9) per term before the exact sum (q104 discipline).
    "q111_source_kl" -> { (s, dir) =>
      graft.operators.TextAnalysis.unigramKlBySource(
        t(s, dir, "documents"), "source", "text")
    },

    // Cross-source n-gram overlap matrix (TextAnalysis
    // .crossSourceNgramOverlap): distinct word 5-gram sets per source,
    // pairwise shared counts + Jaccard — the source-level contamination
    // census. Per-ngram join fanout is bounded by the source count.
    "q109_source_overlap" -> { (s, dir) =>
      graft.operators.TextAnalysis.crossSourceNgramOverlap(
        t(s, dir, "documents"), "source", "text", k = 5)
    },

    // Quality funnel: ordered Gopher-style gates (min length, token shape,
    // stopword evidence, repetition) with a per-stage rejection census —
    // the acceptance-funnel report a pretraining pipeline publishes with
    // every corpus release. ONE corpus scan computes all rule flags, one
    // 1-row aggregate counts the cumulative survivors, and stack() unpivots
    // the funnel — per-rule counts never re-scan the corpus.
    "q106_quality_funnel" -> { (s, dir) =>
      graft.operators.TextAnalysis.qualityFunnel(t(s, dir, "documents"), "text")
    })

  private val padded = "(' ' || text || ' ')"

  /** DuckDB replay of [[graft.operators.TextAnalysis.bpeTrainMerges]]:
    * s0 = character segmentation of the word-frequency table; each
    * iteration's CTE block mirrors the operator's windows exactly —
    * lead-pair weighted counts, (pc desc, pair asc) argmax, run-parity
    * match for the a = b self-pair, consumed-row drop, position
    * re-numbering. The final union reads the n 1-row merge CTEs. */
  private def bpeTrainSql(n: Int): String = {
    def iter(i: Int) =
      s"""l$i AS (
         |  SELECT word, cnt, pos, tok,
         |    LEAD(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt
         |  FROM s$i),
         |p$i AS (
         |  SELECT tok || '~' || nxt AS pair, CAST(SUM(cnt) AS BIGINT) AS pc
         |  FROM l$i WHERE nxt IS NOT NULL GROUP BY 1),
         |m$i AS (
         |  SELECT pair, pc, string_split(pair, '~')[1] AS a,
         |    string_split(pair, '~')[2] AS b
         |  FROM p$i ORDER BY pc DESC, pair LIMIT 1),
         |x$i AS (
         |  SELECT l.word, l.cnt, l.pos, l.tok, l.nxt, m.a, m.b,
         |    l.pos - ROW_NUMBER() OVER (PARTITION BY l.word, l.tok ORDER BY l.pos)
         |      AS grp
         |  FROM l$i l CROSS JOIN m$i m),
         |y$i AS (
         |  SELECT *, (tok = a AND nxt IS NOT DISTINCT FROM b AND
         |    (a <> b OR (pos - MIN(pos) OVER (PARTITION BY word, tok, grp)) % 2 = 0))
         |    AS matched
         |  FROM x$i),
         |z$i AS (
         |  SELECT word, cnt, pos,
         |    CASE WHEN matched THEN a || b ELSE tok END AS tok,
         |    COALESCE(LAG(matched) OVER (PARTITION BY word ORDER BY pos), false)
         |      AS consumed
         |  FROM y$i),
         |s${i + 1} AS (
         |  SELECT word, cnt,
         |    ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) - 1 AS pos, tok
         |  FROM z$i WHERE NOT consumed)"""
    val union = (0 until n)
      .map(i => s"SELECT $i AS merge_rank, pair, replace(pair, '~', '') AS new_token, " +
        s"pc AS pair_count FROM m$i")
      .mkString("\n  UNION ALL ")
    s"""WITH wc AS (
       |  SELECT u.w AS word, COUNT(*) AS cnt
       |  FROM documents, UNNEST(string_split(text, ' ')) AS u(w)
       |  WHERE len(u.w) > 0 GROUP BY 1),
       |s0 AS (
       |  SELECT word, cnt, CAST(i.i AS BIGINT) AS pos,
       |    word[CAST(i.i AS INT) + 1] AS tok
       |  FROM wc, UNNEST(range(0, len(word))) AS i(i)),
       |${(0 until n).map(iter).mkString(",\n")}
       |SELECT * FROM (
       |  $union
       |) ORDER BY merge_rank""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q125_blocklist_filter" ->
      s"""WITH h AS (
         |  SELECT source,
         |    ${occurrencesSql(padded, " spark ")} + ${occurrencesSql(padded, " merge ")} AS hits
         |  FROM documents)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(hits) AS BIGINT) AS total_hits,
         |  CAST(SUM(CASE WHEN hits >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
         |  CAST(SUM(CASE WHEN hits >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / COUNT(*) AS flagged_share
         |FROM h GROUP BY 1 ORDER BY source""".stripMargin,

    "q123_token_fertility" ->
      s"""SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
         |  CAST(SUM(${bpeTokenCountSql("text")}) AS BIGINT) AS sum_bpe,
         |  CAST(SUM(${tokenCountSql("text")}) AS BIGINT) AS sum_words,
         |  CAST(SUM(${bpeTokenCountSql("text")}) AS DOUBLE)
         |    / SUM(${tokenCountSql("text")}) AS fertility,
         |  CAST(SUM(length(text)) AS DOUBLE)
         |    / SUM(${bpeTokenCountSql("text")}) AS chars_per_token
         |FROM documents GROUP BY 1 ORDER BY lang""".stripMargin,

    // per-source registers max-merged == direct whole-corpus registers, so
    // union_est must equal direct_est bit-for-bit (mergeability)
    "q120_hll_union" ->
      """WITH h AS (
        |  SELECT source, ('0x' || substr(md5(text), 1, 8))::BIGINT AS h
        |  FROM documents),
        |regs AS (
        |  SELECT source, h % 64 AS bucket,
        |    MAX(CASE WHEN h // 64 = 0 THEN 27
        |             ELSE 27 - length(bin(h // 64)) END) AS max_rho
        |  FROM h GROUP BY 1, 2),
        |merged AS (SELECT bucket, MAX(max_rho) AS max_rho FROM regs GROUP BY 1),
        |u AS (
        |  SELECT COUNT(*) AS u_occupied,
        |    CAST(SUM(1::BIGINT << (27 - max_rho)) AS BIGINT) AS s_occ
        |  FROM merged),
        |us AS (
        |  SELECT u_occupied,
        |    CAST(s_occ + (64 - u_occupied) * 134217728 AS BIGINT) AS u_s_scaled
        |  FROM u),
        |d AS (
        |  SELECT h % 64 AS bucket,
        |    MAX(CASE WHEN h // 64 = 0 THEN 27
        |             ELSE 27 - length(bin(h // 64)) END) AS max_rho
        |  FROM h GROUP BY 1),
        |dd AS (
        |  SELECT COUNT(*) AS d_occ,
        |    CAST(SUM(1::BIGINT << (27 - max_rho)) AS BIGINT) AS d_s_occ
        |  FROM d),
        |ds AS (
        |  SELECT CAST(d_s_occ + (64 - d_occ) * 134217728 AS BIGINT) AS d_s_scaled
        |  FROM dd)
        |SELECT u_occupied, u_s_scaled,
        |  0.709::DOUBLE * 64 * 64 * 134217728 / u_s_scaled AS union_est,
        |  0.709::DOUBLE * 64 * 64 * 134217728 / d_s_scaled AS direct_est,
        |  (SELECT COUNT(DISTINCT text) FROM documents) AS exact_distinct
        |FROM us CROSS JOIN ds""".stripMargin,

    // Same registers, same harmonic-sum arithmetic, inclusion-exclusion in
    // the identical (a+b)-union association.
    "q174_hll_intersect" ->
      """WITH h AS (
        |  SELECT source, ('0x' || substr(md5(text), 1, 8))::BIGINT AS h
        |  FROM documents),
        |regs AS (
        |  SELECT source, h % 64 AS bucket,
        |    MAX(CASE WHEN h // 64 = 0 THEN 27
        |             ELSE 27 - length(bin(h // 64)) END) AS max_rho
        |  FROM h GROUP BY 1, 2),
        |ests AS (
        |  SELECT source,
        |    0.709::DOUBLE * 64 * 64 * 134217728 /
        |      CAST(SUM(1::BIGINT << (27 - max_rho))
        |           + (64 - COUNT(*)) * 134217728 AS BIGINT) AS est
        |  FROM regs GROUP BY source),
        |prs AS (
        |  SELECT a.source AS src_a, b.source AS src_b
        |  FROM (SELECT DISTINCT source FROM documents) a
        |  JOIN (SELECT DISTINCT source FROM documents) b ON a.source < b.source),
        |uregs AS (
        |  SELECT p.src_a, p.src_b, r.bucket, MAX(r.max_rho) AS max_rho
        |  FROM prs p JOIN regs r ON r.source IN (p.src_a, p.src_b)
        |  GROUP BY 1, 2, 3),
        |uest AS (
        |  SELECT src_a, src_b,
        |    0.709::DOUBLE * 64 * 64 * 134217728 /
        |      CAST(SUM(1::BIGINT << (27 - max_rho))
        |           + (64 - COUNT(*)) * 134217728 AS BIGINT) AS union_est
        |  FROM uregs GROUP BY 1, 2),
        |ts AS (SELECT DISTINCT source, text FROM documents),
        |exact AS (
        |  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS exact_shared
        |  FROM ts a JOIN ts b ON b.text = a.text AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT u.src_a, u.src_b, ea.est AS est_a, eb.est AS est_b, u.union_est,
        |  (ea.est + eb.est) - u.union_est AS inter_est,
        |  COALESCE(e.exact_shared, 0) AS exact_shared
        |FROM uest u JOIN ests ea ON ea.source = u.src_a
        |            JOIN ests eb ON eb.source = u.src_b
        |LEFT JOIN exact e ON e.src_a = u.src_a AND e.src_b = u.src_b
        |ORDER BY u.src_a, u.src_b""".stripMargin,

    "q121_quality_classifier" ->
      s"""WITH f AS (
         |  SELECT source,
         |    CAST(${occurrencesSql(padded, " the ")} + ${occurrencesSql(padded, " a ")} AS DOUBLE)
         |      / ${tokenCountSql("text")} AS stop_ratio,
         |    CAST(length(text) AS DOUBLE) / ${tokenCountSql("text")} AS avg_len,
         |    ${dupTrigramFractionSql("text")} AS dup_frac
         |  FROM documents),
         |z AS (
         |  SELECT source,
         |    10.0 * stop_ratio - 1.0 + 2.0 * (avg_len - 5.0) - 5.0 * dup_frac AS z
         |  FROM f)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN z >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_accepted,
         |  CAST(SUM(CAST(1.0 / (1.0 + exp(-z)) AS DECIMAL(30,9))) AS DOUBLE)
         |    / COUNT(*) AS avg_score
         |FROM z GROUP BY 1 ORDER BY source""".stripMargin,

    "q115_vocab_coverage" ->
      """WITH tk AS (
        |  SELECT lang, u.w AS w
        |  FROM documents, UNNEST(string_split(text, ' ')) AS u(w)),
        |v AS (SELECT w FROM (
        |  SELECT w, COUNT(*) AS c FROM tk GROUP BY 1
        |  ORDER BY c DESC, w LIMIT 500))
        |SELECT lang, COUNT(*) AS total_tokens,
        |  CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov_tokens,
        |  CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS oov_rate
        |FROM tk LEFT JOIN v ON tk.w = v.w
        |GROUP BY 1 ORDER BY lang""".stripMargin,

    "q117_padding_waste" ->
      s"""WITH d AS (
         |  SELECT greatest(${tokenCountSql("text")}, 32) AS n_tok,
         |    ${pow2BucketSql(tokenCountSql("text"))} AS bucket
         |  FROM documents)
         |SELECT bucket, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
         |  CAST(SUM(bucket - n_tok) AS BIGINT) AS pad_tokens,
         |  CAST(SUM(n_tok) AS DOUBLE) / (bucket * COUNT(*)) AS utilization
         |FROM d GROUP BY 1 ORDER BY bucket""".stripMargin,

    // the q104 LM replayed with train = eval = corpus, then the per-source
    // NTILE(3) tercile cut with doc_id tie-break
    "q118_perplexity_gate" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (
        |  SELECT doc_id, t[i.i + 1] AS w1, t[i.i + 2] AS w2
        |  FROM tk, UNNEST(range(0, greatest(len(t) - 1, 0))) AS i(i)),
        |c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY 1),
        |v AS (SELECT COUNT(DISTINCT w.w) AS v FROM tk, UNNEST(t) AS w(w)),
        |cost AS (
        |  SELECT b.doc_id,
        |    CAST(-log2((COALESCE(c2.c2, 0) + 1.0) /
        |      (COALESCE(c1.c1, 0) + v.v)) AS DECIMAL(30,6)) AS nll
        |  FROM bg b
        |  LEFT JOIN c2 ON c2.w1 = b.w1 AND c2.w2 = b.w2
        |  LEFT JOIN c1 ON c1.w1 = b.w1
        |  CROSS JOIN v),
        |x AS (
        |  SELECT doc_id, CAST(SUM(nll) AS DOUBLE) / COUNT(*) AS xent
        |  FROM cost GROUP BY 1),
        |n AS (
        |  SELECT d.source, d.doc_id, x.xent,
        |    NTILE(3) OVER (PARTITION BY d.source ORDER BY x.xent, d.doc_id) AS tercile
        |  FROM documents d JOIN x ON x.doc_id = d.doc_id)
        |SELECT source, tercile, COUNT(*) AS n_docs,
        |  CAST(SUM(CAST(xent AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS avg_xent
        |FROM n GROUP BY 1, 2 ORDER BY source, tercile""".stripMargin,

    "q119_dsir_weights" ->
      """WITH tk AS (
        |  SELECT doc_id, lang,
        |    ('0x' || substr(md5('ds:' || u.w), 1, 8))::BIGINT % 1024 AS bucket
        |  FROM documents, UNNEST(string_split(text, ' ')) AS u(w)),
        |raw AS (SELECT bucket, COUNT(*) AS c_r FROM tk GROUP BY 1),
        |tgt AS (SELECT bucket, COUNT(*) AS c_t FROM tk WHERE lang = 'en' GROUP BY 1),
        |tot AS (
        |  SELECT COUNT(*) AS t_r,
        |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS t_t
        |  FROM tk),
        |lr AS (
        |  SELECT r.bucket,
        |    CAST(ln((COALESCE(c_t, 0) + 1.0) / CAST(t_t + 1024 AS DOUBLE)) AS DECIMAL(30,9)) -
        |    CAST(ln((c_r + 1.0) / CAST(t_r + 1024 AS DOUBLE)) AS DECIMAL(30,9)) AS lr
        |  FROM raw r LEFT JOIN tgt ON tgt.bucket = r.bucket CROSS JOIN tot),
        |sc AS (
        |  SELECT t.doc_id, COUNT(*) AS n_tokens, CAST(SUM(lr) AS DOUBLE) AS log_weight
        |  FROM tk t JOIN lr ON lr.bucket = t.bucket GROUP BY 1),
        |j AS (
        |  SELECT s.doc_id, d.lang, d.source, s.n_tokens, s.log_weight
        |  FROM sc s JOIN documents d ON d.doc_id = s.doc_id),
        |te AS (SELECT 'top' AS side, doc_id, lang, source, n_tokens, log_weight
        |       FROM j ORDER BY log_weight DESC, doc_id LIMIT 10),
        |be AS (SELECT 'bottom' AS side, doc_id, lang, source, n_tokens, log_weight
        |       FROM j ORDER BY log_weight ASC, doc_id LIMIT 10)
        |SELECT * FROM (SELECT * FROM te UNION ALL SELECT * FROM be)
        |ORDER BY side, log_weight DESC, doc_id""".stripMargin,

    "q29_lang_id" ->
      s"""SELECT lang, ${langIdSql(padded)} AS predicted, COUNT(*) AS cnt
         |FROM documents
         |GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin,

    "q30_quality_score" ->
      s"""SELECT doc_id, ${tokenCountSql("text")} AS n_tokens,
         |  CAST(length(text) AS DOUBLE) / ${tokenCountSql("text")} AS avg_token_len,
         |  CAST(${occurrencesSql(padded, " the ")} + ${occurrencesSql(padded, " a ")} AS DOUBLE)
         |    / ${tokenCountSql("text")} AS stop_ratio
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q31_token_count" ->
      s"""SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(${tokenCountSql("text")}) AS BIGINT) AS total_tokens,
         |  MIN(${tokenCountSql("text")}) AS min_tokens,
         |  MAX(${tokenCountSql("text")}) AS max_tokens
         |FROM documents GROUP BY 1 ORDER BY lang""".stripMargin,

    "q79_sequence_packing" ->
      """WITH chunks AS (
        |  SELECT lang, doc_id, i.i AS chunk_idx,
        |    CAST(length(substr(text, i.i * 400 + 1, 500)) AS BIGINT) AS chunk_len
        |  FROM documents,
        |    UNNEST(range(0, greatest(CAST(ceil((length(text) - 500) / 400.0) AS INT), 0) + 1)) AS i(i)
        |  WHERE doc_id < 100),
        |binned AS (
        |  SELECT lang,
        |    CAST(floor((SUM(chunk_len) OVER (PARTITION BY lang ORDER BY doc_id, chunk_idx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - chunk_len) / 4000.0)
        |      AS BIGINT) AS bin,
        |    chunk_len
        |  FROM chunks)
        |SELECT lang, bin, COUNT(*) AS n_chunks, CAST(SUM(chunk_len) AS BIGINT) AS packed_chars
        |FROM binned GROUP BY 1, 2 ORDER BY lang, bin""".stripMargin,

    "q78_context_chunks" ->
      """SELECT doc_id, i.i AS chunk_idx,
        |  substr(text, i.i * 400 + 1, 500) AS chunk,
        |  CAST(length(substr(text, i.i * 400 + 1, 500)) AS BIGINT) AS chunk_len
        |FROM documents,
        |  UNNEST(range(0, greatest(CAST(ceil((length(text) - 500) / 400.0) AS INT), 0) + 1)) AS i(i)
        |WHERE doc_id < 100
        |ORDER BY doc_id, chunk_idx""".stripMargin,

    "q76_quality_weighted_sample" ->
      s"""SELECT lang, COUNT(*) AS n_kept, CAST(SUM(nt) AS BIGINT) AS kept_tokens
         |FROM (SELECT lang, text, ${tokenCountSql("text")} AS nt FROM documents)
         |WHERE ('0x' || substr(md5(text), 1, 8))::BIGINT <
         |  floor(least(CAST(nt AS DOUBLE) / 150.0, 1.0) * 4294967296)
         |GROUP BY lang ORDER BY lang""".stripMargin,

    "q73_repetition_filter" ->
      s"""SELECT doc_id,
         |  ${dupTrigramFractionSql("text")} AS dup_frac,
         |  ${dupTrigramFractionSql("text")} < 0.2 AS keep
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q71_pii_redaction" ->
      s"""SELECT doc_id, redacted,
         |  (NOT contains(redacted, '@'))
         |    AND (NOT regexp_matches(redacted, '\\d{3}[-.]\\d{3}')) AS clean
         |FROM (
         |  SELECT doc_id,
         |    ${graft.operators.TextAnalysis.redactPiiSql(
                 "text || ' contact user' || CAST(doc_id AS VARCHAR) || " +
                 "'@example.com or 555-123-4567 node 10.0.0.' || " +
                 "CAST(doc_id % 256 AS VARCHAR)")} AS redacted
         |  FROM documents WHERE doc_id < 50)
         |ORDER BY doc_id""".stripMargin,

    "q48_stratified_sample" ->
      """SELECT lang, COUNT(*) AS n, CAST(SUM(CAST(length(text) AS BIGINT)) AS BIGINT) AS sum_chars
        |FROM (
        |  SELECT lang, text,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(text), text) AS rnk
        |  FROM documents)
        |WHERE rnk <= 30
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "q49_mixture_sample" ->
      s"""SELECT lang, COUNT(*) AS n_kept
         |FROM documents
         |WHERE substr(md5(text), 1, 4) <
         |  CASE lang
         |    WHEN 'en' THEN '${graft.operators.Sampling.hexThreshold(0.8)}'
         |    WHEN 'fr' THEN '${graft.operators.Sampling.hexThreshold(0.5)}'
         |    WHEN 'de' THEN '${graft.operators.Sampling.hexThreshold(0.25)}'
         |    WHEN 'es' THEN '${graft.operators.Sampling.hexThreshold(0.25)}'
         |    ELSE NULL END
         |GROUP BY lang ORDER BY lang""".stripMargin,

    "q51_topk_aggregate" ->
      """SELECT lang, word, cnt, rnk FROM (
        |  SELECT lang, word, cnt,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, word) AS rnk
        |  FROM (
        |    SELECT lang, u.word AS word, COUNT(*) AS cnt
        |    FROM documents, UNNEST(string_split(text, ' ')) AS u(word)
        |    GROUP BY 1, 2))
        |WHERE rnk <= 5
        |ORDER BY lang, rnk""".stripMargin,

    "q50_top_words_per_lang" ->
      """SELECT lang, word, cnt, rnk FROM (
        |  SELECT lang, word, cnt,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, word) AS rnk
        |  FROM (
        |    SELECT lang, u.word AS word, COUNT(*) AS cnt
        |    FROM documents, UNNEST(string_split(text, ' ')) AS u(word)
        |    GROUP BY 1, 2))
        |WHERE rnk <= 5
        |ORDER BY lang, rnk""".stripMargin,

    "q52_bpe_tokens" ->
      s"""SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(${bpeTokenCountSql("text")}) AS BIGINT) AS total_bpe,
         |  MIN(${bpeTokenCountSql("text")}) AS min_bpe,
         |  MAX(${bpeTokenCountSql("text")}) AS max_bpe
         |FROM documents GROUP BY 1 ORDER BY lang""".stripMargin,

    "q68_winnow_pairs" ->
      """WITH g AS (
        |  SELECT doc_id, i.i AS pos,
        |    ('0x' || substr(md5(substr(text, i.i + 1, 12)), 1, 8))::BIGINT AS h
        |  FROM documents, UNNEST(range(0, greatest(length(text) - 11, 1))) AS i(i)),
        |n AS (SELECT doc_id, COUNT(*) AS ng FROM g GROUP BY 1),
        |wmin AS (
        |  SELECT g.doc_id, g.pos,
        |    MIN(h) OVER (PARTITION BY g.doc_id ORDER BY g.pos
        |      ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS fp
        |  FROM g),
        |fps AS (
        |  SELECT DISTINCT w.doc_id, w.fp
        |  FROM wmin w JOIN n ON n.doc_id = w.doc_id
        |  WHERE w.pos <= greatest(n.ng - 8, 0)),
        |ok AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= 50),
        |pairs AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_shared
        |  FROM fps a JOIN ok USING (fp) JOIN fps b USING (fp)
        |  WHERE a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT a_id, b_id, n_shared FROM pairs WHERE n_shared >= 8
        |ORDER BY a_id, b_id""".stripMargin,

    "q32_fingerprint" ->
      s"""SELECT source, COUNT(*) AS n_docs,
         |  COUNT(DISTINCT ${fingerprintSql("trim(text)")}) AS n_unique_fp
         |FROM documents GROUP BY 1 ORDER BY source""".stripMargin,

    "q80_decontaminate" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id,
        |    concat_ws(' ', t[i.i + 1], t[i.i + 2], t[i.i + 3], t[i.i + 4]) AS ng
        |  FROM tk, UNNEST(range(0, greatest(len(t) - 4, 0) + 1)) AS i(i)),
        |e AS (SELECT DISTINCT ng FROM g WHERE doc_id % 50 = 0)
        |SELECT g.doc_id, COUNT(*) AS n_overlap
        |FROM g JOIN e USING (ng)
        |WHERE g.doc_id % 50 <> 0
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // Bloom prefiltering must not change the result: the oracle is the
    // EXACT overlap on the same split.
    "q96_bloom_decontaminate" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id,
        |    concat_ws(' ', t[i.i + 1], t[i.i + 2], t[i.i + 3], t[i.i + 4]) AS ng
        |  FROM tk, UNNEST(range(0, greatest(len(t) - 4, 0) + 1)) AS i(i)),
        |e AS (SELECT DISTINCT ng FROM g WHERE doc_id % 40 = 0)
        |SELECT g.doc_id, COUNT(*) AS n_overlap
        |FROM g JOIN e USING (ng)
        |WHERE g.doc_id % 40 <> 0
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // Bigram probabilities are exact integer ratios; the only
    // transcendental op (log2) rounds to 6 decimals per bigram before the
    // exact decimal sum — same discipline as the Spark side.
    "q104_ngram_lm_xent" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |trbg AS (
        |  SELECT t[i.i + 1] AS w1, t[i.i + 2] AS w2
        |  FROM tk, UNNEST(range(0, greatest(len(t) - 1, 0))) AS i(i)
        |  WHERE doc_id % 40 <> 0),
        |c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM trbg GROUP BY 1, 2),
        |c1 AS (SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY 1),
        |v AS (SELECT COUNT(DISTINCT w.w) AS v
        |      FROM tk, UNNEST(t) AS w(w) WHERE doc_id % 40 <> 0),
        |evbg AS (
        |  SELECT doc_id, t[i.i + 1] AS w1, t[i.i + 2] AS w2
        |  FROM tk, UNNEST(range(0, greatest(len(t) - 1, 0))) AS i(i)
        |  WHERE doc_id % 40 = 0),
        |cost AS (
        |  SELECT e.doc_id,
        |    CAST(-log2((COALESCE(c2.c2, 0) + 1.0) /
        |      (COALESCE(c1.c1, 0) + v.v)) AS DECIMAL(30,6)) AS nll
        |  FROM evbg e
        |  LEFT JOIN c2 ON c2.w1 = e.w1 AND c2.w2 = e.w2
        |  LEFT JOIN c1 ON c1.w1 = e.w1
        |  CROSS JOIN v)
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |  CAST(SUM(nll) AS DOUBLE) / COUNT(*) AS xent
        |FROM cost GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "q85_inverted_index" ->
      """SELECT term, df, postings FROM (
        |  SELECT u.term AS term, COUNT(*) AS df,
        |    array_to_string(list_transform(
        |      list_slice(list_sort(list(doc_id)), 1, 10),
        |      x -> CAST(x AS VARCHAR)), ',') AS postings
        |  FROM documents, UNNEST(list_distinct(string_split(text, ' '))) AS u(term)
        |  GROUP BY 1)
        |ORDER BY df DESC, term LIMIT 20""".stripMargin,

    "q86_mixture_weights" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1)
        |SELECT lang, n_docs,
        |  CAST(n_docs AS DOUBLE) / CAST(SUM(n_docs) OVER () AS DOUBLE) AS natural_share,
        |  sqrt(CAST(n_docs AS DOUBLE) / CAST(SUM(n_docs) OVER () AS DOUBLE)) AS temp_weight,
        |  sqrt(CAST(n_docs AS DOUBLE) / CAST(SUM(n_docs) OVER () AS DOUBLE))
        |    / (CAST(n_docs AS DOUBLE) / CAST(SUM(n_docs) OVER () AS DOUBLE)) AS boost
        |FROM c ORDER BY lang""".stripMargin,

    "q81_type_token_ratio" ->
      """SELECT lang,
        |  CAST(SUM(len(list_distinct(string_split(text, ' ')))) AS BIGINT) AS sum_distinct,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_words,
        |  CAST(SUM(len(list_distinct(string_split(text, ' ')))) AS DOUBLE)
        |    / SUM(len(string_split(text, ' '))) AS ttr
        |FROM documents GROUP BY 1 ORDER BY lang""".stripMargin,

    "q102_decile_binning" ->
      """SELECT lang, decile, COUNT(*) AS n_docs,
        |  MIN(n_chars) AS lo_chars, MAX(n_chars) AS hi_chars
        |FROM (
        |  SELECT lang, n_chars,
        |    NTILE(10) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS decile
        |  FROM documents)
        |GROUP BY 1, 2 ORDER BY lang, decile""".stripMargin,

    "q92_cm_heavy_hitters" ->
      """WITH tokens AS (
        |  SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents),
        |salted AS (SELECT s, tok FROM tokens, UNNEST(range(3)) AS t(s)),
        |sketch AS (
        |  SELECT s,
        |    ('0x' || substr(md5('cm' || CAST(s AS VARCHAR) || ':' || tok), 1, 8))::BIGINT % 512 AS bucket,
        |    COUNT(*) AS cnt
        |  FROM salted GROUP BY 1, 2),
        |top AS (
        |  SELECT tok, COUNT(*) AS exact_cnt FROM tokens GROUP BY 1
        |  ORDER BY exact_cnt DESC, tok LIMIT 20),
        |probes AS (
        |  SELECT t.tok, t.exact_cnt, u.s,
        |    ('0x' || substr(md5('cm' || CAST(u.s AS VARCHAR) || ':' || t.tok), 1, 8))::BIGINT % 512 AS bucket
        |  FROM top t, UNNEST(range(3)) AS u(s))
        |SELECT p.tok, p.exact_cnt, MIN(k.cnt) AS cm_est
        |FROM probes p JOIN sketch k ON p.s = k.s AND p.bucket = k.bucket
        |GROUP BY 1, 2 ORDER BY exact_cnt DESC, tok""".stripMargin,

    "q93_line_dedup" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |lines AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS line_no,
        |    array_to_string(w[(i*10+1):(i*10+10)], ' ') AS line
        |  FROM toks, UNNEST(range((len(w)+9)//10)) AS t(i)),
        |flagged AS (
        |  SELECT doc_id, line_no, line,
        |    CASE WHEN ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, line_no) = 1
        |         THEN 1 ELSE 0 END AS keep
        |  FROM lines),
        |agg AS (
        |  SELECT doc_id, COUNT(*) AS n_lines, CAST(SUM(keep) AS BIGINT) AS n_kept,
        |    COALESCE(string_agg(CASE WHEN keep = 1 THEN line END, ' ' ORDER BY line_no), '') AS clean_text
        |  FROM flagged GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(a.n_lines, 0) AS n_lines,
        |  COALESCE(a.n_kept, 0) AS n_kept,
        |  COALESCE(a.clean_text, '') AS clean_text
        |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q107_repeated_ngrams" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    concat_ws(' ', t[i.i + 1], t[i.i + 2], t[i.i + 3], t[i.i + 4],
        |              t[i.i + 5], t[i.i + 6], t[i.i + 7], t[i.i + 8]) AS ngram
        |  FROM tk, UNNEST(range(0, len(t) - 8 + 1)) AS i(i)
        |  WHERE len(t) >= 8)
        |SELECT ngram, COUNT(*) AS n_occ, COUNT(DISTINCT doc_id) AS n_docs,
        |  MIN(doc_id) AS first_doc
        |FROM g GROUP BY 1
        |ORDER BY n_occ DESC, ngram LIMIT 50""".stripMargin,

    "q112_epoch_manifest" ->
      """WITH c AS (SELECT source, COUNT(*) AS n_s FROM documents GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n_total FROM c),
        |r AS (
        |  SELECT d.doc_id, d.source, c.n_s, t.n_total,
        |    ROW_NUMBER() OVER (PARTITION BY d.source
        |      ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rank_in_source
        |  FROM documents d JOIN c ON c.source = d.source CROSS JOIN t)
        |SELECT (CAST(rank_in_source AS DOUBLE) - 0.5) /
        |    sqrt(CAST(n_s AS DOUBLE) / CAST(n_total AS DOUBLE)) AS pos_key,
        |  source, doc_id, rank_in_source
        |FROM r
        |ORDER BY pos_key, source, doc_id LIMIT 100""".stripMargin,

    "q111_source_kl" ->
      """WITH tk AS (
        |  SELECT source, u.w AS w
        |  FROM documents, UNNEST(string_split(text, ' ')) AS u(w)),
        |sw AS (SELECT source, w, COUNT(*) AS c_sw FROM tk GROUP BY 1, 2),
        |s AS (SELECT source, CAST(SUM(c_sw) AS BIGINT) AS t_s FROM sw GROUP BY 1),
        |wt AS (SELECT w, CAST(SUM(c_sw) AS BIGINT) AS c_w FROM sw GROUP BY 1),
        |tot AS (SELECT CAST(SUM(t_s) AS BIGINT) AS corpus_total FROM s),
        |terms AS (
        |  SELECT sw.source, s.t_s,
        |    CAST((CAST(c_sw AS DOUBLE) / t_s) *
        |      ln((CAST(c_sw AS DOUBLE) / t_s) /
        |         (CAST(c_w AS DOUBLE) / corpus_total)) AS DECIMAL(30,9)) AS term
        |  FROM sw JOIN s ON s.source = sw.source
        |  JOIN wt ON wt.w = sw.w CROSS JOIN tot)
        |SELECT source, t_s AS n_tokens, COUNT(*) AS vocab,
        |  CAST(SUM(term) AS DOUBLE) AS kl_vs_corpus
        |FROM terms GROUP BY 1, 2 ORDER BY source""".stripMargin,

    "q109_source_overlap" ->
      """WITH tk AS (SELECT source, string_split(text, ' ') AS t FROM documents),
        |g AS (
        |  SELECT DISTINCT source,
        |    concat_ws(' ', t[i.i + 1], t[i.i + 2], t[i.i + 3], t[i.i + 4],
        |              t[i.i + 5]) AS ngram
        |  FROM tk, UNNEST(range(0, len(t) - 5 + 1)) AS i(i)
        |  WHERE len(t) >= 5),
        |tot AS (SELECT source, COUNT(*) AS n FROM g GROUP BY 1)
        |SELECT a.source AS src_a, b.source AS src_b, ta.n AS n_a, tb.n AS n_b,
        |  COUNT(*) AS n_shared,
        |  CAST(COUNT(*) AS DOUBLE) / CAST(ta.n + tb.n - COUNT(*) AS DOUBLE) AS jaccard
        |FROM g a JOIN g b ON a.ngram = b.ngram AND a.source < b.source
        |JOIN tot ta ON ta.source = a.source
        |JOIN tot tb ON tb.source = b.source
        |GROUP BY a.source, b.source, ta.n, tb.n
        |ORDER BY src_a, src_b""".stripMargin,

    "q106_quality_funnel" ->
      s"""WITH f AS (
         |  SELECT ${tokenCountSql("text")} AS n_tokens,
         |    CAST(length(text) AS DOUBLE) / ${tokenCountSql("text")} AS avg_len,
         |    ${occurrencesSql(padded, " the ")} + ${occurrencesSql(padded, " a ")} AS stop_hits,
         |    ${dupTrigramFractionSql("text")} AS dup_frac
         |  FROM documents),
         |a AS (
         |  SELECT COUNT(*) AS n0,
         |    CAST(SUM(CASE WHEN n_tokens >= 25 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
         |    CAST(SUM(CASE WHEN n_tokens >= 25 AND avg_len BETWEEN 4.0 AND 5.8
         |             THEN 1 ELSE 0 END) AS BIGINT) AS s2,
         |    CAST(SUM(CASE WHEN n_tokens >= 25 AND avg_len BETWEEN 4.0 AND 5.8
         |             AND stop_hits >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS s3,
         |    CAST(SUM(CASE WHEN n_tokens >= 25 AND avg_len BETWEEN 4.0 AND 5.8
         |             AND stop_hits >= 2 AND dup_frac < 0.05
         |             THEN 1 ELSE 0 END) AS BIGINT) AS s4
         |  FROM f)
         |SELECT 1 AS stage, 'min_tokens' AS rule, n0 - s1 AS n_fail, s1 AS n_surviving FROM a
         |UNION ALL SELECT 2, 'avg_token_len', s1 - s2, s2 FROM a
         |UNION ALL SELECT 3, 'stopwords', s2 - s3, s3 FROM a
         |UNION ALL SELECT 4, 'repetition', s3 - s4, s4 FROM a
         |ORDER BY stage""".stripMargin,

    // DuckDB range(1, n) yields 1..n-1, matching the Spark side's
    // sequence(1, length(w)-1) adjacent-pair positions.
    "q129_bpe_pair_census" ->
      """WITH w AS (
        |  SELECT t.w FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
        |  WHERE length(t.w) >= 2),
        |p AS (
        |  SELECT w, substr(w, CAST(i.i AS INT), 2) AS pair
        |  FROM w, UNNEST(range(1, length(w))) AS i(i))
        |SELECT pair, COUNT(*) AS n_occurrences,
        |  COUNT(DISTINCT w) AS n_distinct_words
        |FROM p GROUP BY 1
        |ORDER BY n_occurrences DESC, pair LIMIT 30""".stripMargin,

    // Same decimal-rounded ln / exact-sum / closed-form-double discipline
    // as the Spark side; the slope expression tree is written identically.
    "q130_zipf_slope" ->
      """WITH f AS (
        |  SELECT lang AS grp, t.w AS w, COUNT(*) AS f
        |  FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
        |  WHERE length(t.w) > 0 GROUP BY 1, 2),
        |r AS (
        |  SELECT grp, f,
        |    ROW_NUMBER() OVER (PARTITION BY grp ORDER BY f DESC, w) AS rank
        |  FROM f),
        |p AS (
        |  SELECT grp,
        |    CAST(CAST(ln(CAST(rank AS DOUBLE)) AS DECIMAL(30,9)) AS DOUBLE) AS x,
        |    CAST(CAST(ln(CAST(f AS DOUBLE)) AS DECIMAL(30,9)) AS DOUBLE) AS y
        |  FROM r WHERE rank <= 200),
        |s AS (
        |  SELECT grp, CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(x AS DECIMAL(30,9))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(y AS DECIMAL(30,9))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(x * y AS DECIMAL(30,12))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(x * x AS DECIMAL(30,12))) AS DOUBLE) AS sxx
        |  FROM p GROUP BY 1)
        |SELECT grp AS lang, CAST(n AS BIGINT) AS n_ranks,
        |  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
        |  (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept
        |FROM s ORDER BY lang""".stripMargin,

    // Same unrolled concat_ws shingle formation as q80/q96; SUM(CASE) is
    // HUGEINT in DuckDB, hence the BIGINT cast.
    "q132_novelty_census" ->
      """WITH tk AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id, source,
        |    concat_ws(' ', t[i.i + 1], t[i.i + 2], t[i.i + 3], t[i.i + 4],
        |      t[i.i + 5], t[i.i + 6], t[i.i + 7], t[i.i + 8]) AS ngram
        |  FROM tk, UNNEST(range(0, greatest(len(t) - 8, 0) + 1)) AS i(i)),
        |f AS (SELECT ngram, MIN(doc_id) AS first_id FROM g GROUP BY 1)
        |SELECT g.source, COUNT(DISTINCT g.doc_id) AS n_docs,
        |  COUNT(*) AS total_ngrams,
        |  CAST(SUM(CASE WHEN f.first_id = g.doc_id THEN 1 ELSE 0 END) AS BIGINT)
        |    AS novel_ngrams,
        |  CAST(SUM(CASE WHEN f.first_id = g.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS novelty_share
        |FROM g JOIN f USING (ngram)
        |GROUP BY 1 ORDER BY source""".stripMargin,

    // quantile_cont interpolates exactly like Spark's percentile on
    // integer inputs (q43 discipline).
    "q150_length_quantiles" ->
      s"""SELECT source, COUNT(*) AS n_docs,
         |  quantile_cont(${graft.operators.TextAnalysis.tokenCountSql("text")}, 0.1) AS p10,
         |  quantile_cont(${graft.operators.TextAnalysis.tokenCountSql("text")}, 0.5) AS p50,
         |  quantile_cont(${graft.operators.TextAnalysis.tokenCountSql("text")}, 0.9) AS p90,
         |  quantile_cont(${graft.operators.TextAnalysis.tokenCountSql("text")}, 0.99) AS p99,
         |  MAX(${graft.operators.TextAnalysis.tokenCountSql("text")}) AS max_tok
         |FROM documents GROUP BY 1 ORDER BY source""".stripMargin,

    "q151_tfidf_terms" ->
      """WITH w AS (
        |  SELECT source, u.word AS word
        |  FROM documents, UNNEST(string_split(text, ' ')) AS u(word)),
        |tf AS (SELECT source, word, COUNT(*) AS tf FROM w GROUP BY 1, 2),
        |ns AS (SELECT CAST(COUNT(DISTINCT source) AS DOUBLE) AS n_src FROM documents),
        |dfs AS (SELECT word, CAST(COUNT(*) AS DOUBLE) AS df_s FROM tf GROUP BY 1),
        |sc AS (
        |  SELECT tf.source, tf.word, tf.tf,
        |    CAST(tf.tf AS DOUBLE) *
        |      CAST(CAST(ln(ns.n_src / dfs.df_s) AS DECIMAL(30,9)) AS DOUBLE) AS score
        |  FROM tf JOIN dfs USING (word) CROSS JOIN ns)
        |SELECT source, word, tf, score, rnk FROM (
        |  SELECT source, word, tf, score,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY score DESC, word) AS rnk
        |  FROM sc)
        |WHERE rnk <= 5 ORDER BY source, rnk""".stripMargin,

    "q154_ngram_diversity" ->
      """WITH tk AS (SELECT source, doc_id, string_split(text, ' ') AS t FROM documents),
        |g AS (
        |  SELECT source, doc_id,
        |    concat_ws(' ', t[i.i + 1], t[i.i + 2], t[i.i + 3]) AS g
        |  FROM tk, UNNEST(range(0, greatest(len(t) - 3, 0) + 1)) AS i(i))
        |SELECT source, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occ,
        |  COUNT(DISTINCT g) AS n_types,
        |  CAST(COUNT(DISTINCT g) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS diversity
        |FROM g GROUP BY 1 ORDER BY source""".stripMargin,

    "q157_curriculum_phases" ->
      s"""WITH words AS (
         |  SELECT doc_id, u.word AS word
         |  FROM documents, UNNEST(string_split(text, ' ')) AS u(word)),
         |wf AS (SELECT word, COUNT(*) AS wf FROM words GROUP BY 1),
         |pd AS (
         |  SELECT w.doc_id, COUNT(*) AS n_tok,
         |    SUM(CASE WHEN f.wf <= 2 THEN 1 ELSE 0 END) AS n_rare
         |  FROM words w JOIN wf f USING (word) GROUP BY 1),
         |d AS (
         |  SELECT doc_id, n_tok,
         |    CAST(n_rare AS DOUBLE) / CAST(n_tok AS DOUBLE) AS difficulty
         |  FROM pd),
         |p AS (
         |  SELECT doc_id, n_tok, difficulty,
         |    NTILE(4) OVER (ORDER BY difficulty, doc_id) AS phase
         |  FROM d)
         |SELECT CAST(phase AS BIGINT) AS phase, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tok) AS BIGINT) AS total_tok,
         |  ${Q.dsumSql("difficulty", 30, 9)} AS sum_difficulty
         |FROM p GROUP BY 1 ORDER BY phase""".stripMargin,

    "q158_skipgram_cooc" ->
      """WITH tk AS (
        |  SELECT string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |p AS (
        |  SELECT least(t[i.i + 1], t[i.i + 2]) AS pa,
        |    greatest(t[i.i + 1], t[i.i + 2]) AS pb
        |  FROM tk, UNNEST(range(0, len(t) - 3 + 1)) AS i(i)
        |  UNION ALL
        |  SELECT least(t[i.i + 1], t[i.i + 3]), greatest(t[i.i + 1], t[i.i + 3])
        |  FROM tk, UNNEST(range(0, len(t) - 3 + 1)) AS i(i))
        |SELECT pa, pb, COUNT(*) AS cnt FROM p GROUP BY 1, 2
        |ORDER BY cnt DESC, pa, pb LIMIT 30""".stripMargin,

    // All 8 Lloyd-style iterations generated as CTE blocks: lead-pair
    // counts, 1-row argmax (pc desc, pair asc), gaps-and-islands run
    // parity for the self-pair case, consumed-row drop, re-numbering.
    "q147_bpe_train" -> bpeTrainSql(8),

    // sqrt weights DECIMAL(30,9)-rounded before the normalizing sum; the
    // remaining arithmetic is the identical double expression tree.
    "q138_token_budget_plan" ->
      s"""WITH c AS (
         |  SELECT source, COUNT(*) AS n_docs,
         |    CAST(SUM(${graft.operators.TextAnalysis.tokenCountSql("text")}) AS BIGINT)
         |      AS n_tokens
         |  FROM documents GROUP BY 1),
         |w AS (
         |  SELECT *, CAST(sqrt(CAST(n_tokens AS DOUBLE)) AS DECIMAL(30,9)) AS sw
         |  FROM c),
         |t AS (
         |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens, SUM(sw) AS sum_sw
         |  FROM w)
         |SELECT source, n_docs, n_tokens,
         |  CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS natural_share,
         |  CAST(sw AS DOUBLE) / CAST(sum_sw AS DOUBLE) AS weight,
         |  CAST(total_tokens AS DOUBLE) * 0.5 *
         |    (CAST(sw AS DOUBLE) / CAST(sum_sw AS DOUBLE)) AS planned_tokens,
         |  CAST(total_tokens AS DOUBLE) * 0.5 *
         |    (CAST(sw AS DOUBLE) / CAST(sum_sw AS DOUBLE)) / CAST(n_tokens AS DOUBLE)
         |    AS epochs
         |FROM w CROSS JOIN t ORDER BY source""".stripMargin,

    // q132's distinct-shingle formation (NULL-skipping concat_ws =
    // truncated short-doc window) keyed by the md5 pseudo-batch; the
    // 16-row cumsum is the same triangular join, not a window.
    "q139_novelty_saturation" ->
      """WITH tk AS (
        |  SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS batch, doc_id,
        |    string_split(text, ' ') AS t
        |  FROM documents),
        |g0 AS (
        |  SELECT DISTINCT batch, doc_id,
        |    concat_ws(' ', t[i.i + 1], t[i.i + 2], t[i.i + 3], t[i.i + 4],
        |      t[i.i + 5], t[i.i + 6], t[i.i + 7], t[i.i + 8]) AS gram
        |  FROM tk, UNNEST(range(0, greatest(len(t) - 8, 0) + 1)) AS i(i)),
        |g AS (SELECT batch, gram, COUNT(*) AS n_carriers FROM g0 GROUP BY 1, 2),
        |totals AS (SELECT batch, COUNT(*) AS n_grams FROM g GROUP BY 1),
        |novel AS (
        |  SELECT batch, COUNT(*) AS n_novel FROM (
        |    SELECT gram, MIN(batch) AS batch FROM g GROUP BY 1) GROUP BY 1),
        |per AS (
        |  SELECT t.batch, t.n_grams, COALESCE(n.n_novel, 0) AS n_novel
        |  FROM totals t LEFT JOIN novel n ON n.batch = t.batch)
        |SELECT a.batch, a.n_grams, CAST(a.n_novel AS BIGINT) AS n_novel,
        |  CAST(SUM(b.n_novel) AS BIGINT) AS cum_novel,
        |  CAST(a.n_novel AS DOUBLE) / CAST(a.n_grams AS DOUBLE) AS novelty_share
        |FROM per a JOIN per b ON b.batch <= a.batch
        |GROUP BY 1, 2, a.n_novel ORDER BY a.batch""".stripMargin,

    // q80's split and 4-gram overlap rolled up per train source.
    "q140_contamination_by_source" ->
      """WITH tk AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id, source,
        |    concat_ws(' ', t[i.i + 1], t[i.i + 2], t[i.i + 3], t[i.i + 4]) AS ng
        |  FROM tk, UNNEST(range(0, greatest(len(t) - 4, 0) + 1)) AS i(i)),
        |e AS (SELECT DISTINCT ng FROM g WHERE doc_id % 50 = 0),
        |hit AS (
        |  SELECT DISTINCT g.doc_id, g.source FROM g JOIN e USING (ng)
        |  WHERE g.doc_id % 50 <> 0),
        |per AS (
        |  SELECT source, COUNT(*) AS n_train_docs FROM documents
        |  WHERE doc_id % 50 <> 0 GROUP BY 1),
        |cont AS (SELECT source, COUNT(*) AS n_contaminated FROM hit GROUP BY 1)
        |SELECT per.source, per.n_train_docs,
        |  CAST(COALESCE(cont.n_contaminated, 0) AS BIGINT) AS n_contaminated,
        |  CAST(COALESCE(cont.n_contaminated, 0) AS DOUBLE) /
        |    CAST(per.n_train_docs AS DOUBLE) AS contamination_rate
        |FROM per LEFT JOIN cont ON cont.source = per.source
        |ORDER BY per.source""".stripMargin,

    // Same (lang, word)-keyed rollup; each ln rounds to DECIMAL(30,9)
    // before the division (q130's libm discipline); SUMs cast off HUGEINT.
    "q137_heaps_census" ->
      """WITH toks AS (
        |  SELECT lang,
        |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8' AS h,
        |    u.w AS w
        |  FROM documents, UNNEST(string_split(text, ' ')) AS u(w)
        |  WHERE len(u.w) > 0),
        |pw AS (
        |  SELECT lang, w, COUNT(*) AS c,
        |    CAST(SUM(CASE WHEN h THEN 1 ELSE 0 END) AS BIGINT) AS ch
        |  FROM toks GROUP BY 1, 2),
        |agg AS (
        |  SELECT lang,
        |    CAST(SUM(c) AS BIGINT) AS n_tokens,
        |    COUNT(*) AS n_types,
        |    CAST(SUM(ch) AS BIGINT) AS n_tokens_half,
        |    CAST(SUM(CASE WHEN ch > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_types_half
        |  FROM pw GROUP BY 1),
        |r AS (
        |  SELECT lang, n_tokens, n_types, n_tokens_half, n_types_half,
        |    CAST(CAST(ln(CAST(n_tokens AS DOUBLE)) AS DECIMAL(30,9)) AS DOUBLE) AS ln_n,
        |    CAST(CAST(ln(CAST(n_types AS DOUBLE)) AS DECIMAL(30,9)) AS DOUBLE) AS ln_v,
        |    CAST(CAST(ln(CAST(n_tokens_half AS DOUBLE)) AS DECIMAL(30,9)) AS DOUBLE) AS ln_nh,
        |    CAST(CAST(ln(CAST(n_types_half AS DOUBLE)) AS DECIMAL(30,9)) AS DOUBLE) AS ln_vh
        |  FROM agg)
        |SELECT lang, n_tokens, n_types, n_tokens_half, n_types_half,
        |  (ln_v - ln_vh) / NULLIF(ln_n - ln_nh, 0) AS heaps_beta
        |FROM r ORDER BY lang""".stripMargin,

    // q93's line cutting, doc-freq over (line, doc)-level rows, per-source
    // occurrence rollup; SUM over BIGINT is HUGEINT → BIGINT casts.
    "q136_boilerplate_census" ->
      """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
        |lines AS (
        |  SELECT doc_id, source,
        |    array_to_string(w[(i*10+1):(i*10+10)], ' ') AS line
        |  FROM toks, UNNEST(range((len(w)+9)//10)) AS t(i)),
        |ld AS (
        |  SELECT line, doc_id, source, COUNT(*) AS occ
        |  FROM lines GROUP BY 1, 2, 3),
        |df AS (SELECT line, COUNT(*) AS docs FROM ld GROUP BY 1)
        |SELECT ld.source,
        |  CAST(SUM(occ) AS BIGINT) AS n_lines,
        |  CAST(SUM(CASE WHEN df.docs >= 2 THEN occ ELSE 0 END) AS BIGINT)
        |    AS n_boiler_lines,
        |  COUNT(DISTINCT CASE WHEN df.docs >= 2 THEN ld.doc_id END)
        |    AS n_docs_affected,
        |  CAST(SUM(CASE WHEN df.docs >= 2 THEN occ ELSE 0 END) AS DOUBLE) /
        |    CAST(SUM(occ) AS DOUBLE) AS boiler_share
        |FROM ld JOIN df USING (line)
        |GROUP BY 1 ORDER BY source""".stripMargin,

    // PMI argument is a scalar double over exact integer counts; the lone
    // ln rounds to DECIMAL(30,6) before ordering (w1, w2 tie-break).
    "q131_pmi_collocations" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (
        |  SELECT t[i.i + 1] AS w1, t[i.i + 2] AS w2
        |  FROM tk, UNNEST(range(0, greatest(len(t) - 1, 0))) AS i(i)),
        |c2 AS (SELECT w1, w2, COUNT(*) AS c_ab FROM bg GROUP BY 1, 2),
        |uni AS (
        |  SELECT u.w AS w, COUNT(*) AS c_w
        |  FROM tk, UNNEST(t) AS u(w) GROUP BY 1),
        |tot AS (
        |  SELECT (SELECT CAST(SUM(c_ab) AS BIGINT) FROM c2) AS n2,
        |         (SELECT CAST(SUM(c_w) AS BIGINT) FROM uni) AS n1)
        |SELECT c2.w1, c2.w2, c2.c_ab,
        |  CAST(CAST(ln((CAST(c_ab AS DOUBLE) / CAST(n2 AS DOUBLE)) /
        |    ((CAST(a.c_w AS DOUBLE) / CAST(n1 AS DOUBLE)) *
        |     (CAST(b.c_w AS DOUBLE) / CAST(n1 AS DOUBLE))))
        |    AS DECIMAL(30,6)) AS DOUBLE) AS pmi
        |FROM c2
        |JOIN uni a ON a.w = c2.w1
        |JOIN uni b ON b.w = c2.w2
        |CROSS JOIN tot
        |WHERE c_ab >= 5
        |ORDER BY pmi DESC, w1, w2 LIMIT 30""".stripMargin)
}
