package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The text-pipeline analogue of the reference's `discover` report
  * (sf_migrate.py's per-schema discovery summary): ONE verb that emits the
  * whole corpus health report — quality funnel, cross-source n-gram
  * overlap, per-source KL, vocabulary/OOV coverage, padding waste,
  * tokenizer fertility, the Zipf rank-frequency slope, Heaps'-law
  * vocabulary growth, the boilerplate-line census, token-length
  * quantiles, TF-IDF distinctive terms and the n-gram diversity census —
  * as a single JSON document.
  *
  * The point of chaining (vs running the six census verbs separately) is
  * scan reuse: run independently, each census starts with its own parquet
  * scan of `documents` (six corpus scans), and the two unigram censuses
  * (KL, vocab/OOV) each pay their own corpus-sized explode. Here the
  * corpus is cached once, the unigram token stream `(lang, source, w)` is
  * exploded and cached ONCE and both token censuses aggregate from it, and
  * the remaining sections are per-row scans of the cached corpus. At
  * 100 TB you would swap the cache for a first-pass materialization of the
  * token stream; the section plans are unchanged.
  *
  * Section outputs are the SAME frames as their oracle-checked queries
  * (q106/q109/q111/q115/q117/q123 delegate to the same operator
  * functions), so the report inherits the suite's cross-engine-verified
  * semantics.
  */
object CorpusReport {

  /** The report sections, in publication order, built over one cached
    * corpus and one cached unigram explode registered in `scope` (the KL,
    * vocab/OOV and Zipf censuses all aggregate from that one token
    * stream). Every section output is a bounded aggregate (stages, source
    * pairs, sources, langs, log2 buckets, top ranks) — safe to collect. */
  def sections(docs: DataFrame, scope: CacheScope,
               langCol: String = "lang", sourceCol: String = "source",
               textCol: String = "text", idCol: String = "doc_id",
               topV: Int = 500, overlapK: Int = 5): Seq[(String, DataFrame)] = {
    val d = scope.cached(docs)
    // the one token explode every unigram census aggregates from; `h` is
    // the deterministic md5-half flag the Heaps census slices on
    val tokens = scope.cached(d.select(col(langCol), col(sourceCol),
      (substring(md5(col(idCol).cast("string")), 1, 1) < lit("8")).as("h"),
      explode(split(col(textCol), " ")).as("w")))
    Seq(
      "quality_funnel" -> TextAnalysis.qualityFunnel(d, textCol),
      "source_overlap" -> TextAnalysis.crossSourceNgramOverlap(d, sourceCol, textCol, overlapK),
      "source_kl" -> TextAnalysis.unigramKlFromTokens(
        tokens.select(col(sourceCol).as("source"), col("w"))),
      "vocab_coverage" -> TextAnalysis.vocabCoverageFromTokens(
        tokens.select(col(langCol).as("grp"), col("w")), langCol, topV),
      "padding_waste" -> TextAnalysis.paddingWaste(d, textCol),
      "token_fertility" -> TextAnalysis.tokenFertility(d, langCol, textCol),
      "zipf_slope" -> TextAnalysis.zipfSlopeFromTokens(
        tokens.select(col(langCol).as("grp"), col("w")))
        .withColumnRenamed("grp", langCol).orderBy(col(langCol)),
      "heaps_vocab_growth" -> TextAnalysis.heapsCensusFromTokens(
        tokens.select(col(langCol).as("lang"), col("h"), col("w")))
        .withColumnRenamed("lang", langCol),
      "boilerplate" -> TextAnalysis.boilerplateCensus(d, idCol, textCol, sourceCol),
      "length_quantiles" -> TextAnalysis.lengthQuantiles(d, sourceCol, textCol),
      "tfidf_terms" -> TextAnalysis.tfidfTermsFromTokens(
        tokens.select(col(sourceCol).as("source"), col("w").as("word"))),
      "ngram_diversity" -> TextAnalysis.ngramDiversity(d, sourceCol, idCol, textCol))
  }

  /** Render the report as one JSON object `{section: [row, ...], ...}` —
    * rows via Spark's own `toJSON` (correct escaping), sections in
    * [[sections]] order. Collect is bounded: every section is an
    * aggregate over sources/langs/stages/buckets, not documents. */
  def reportJson(docs: DataFrame, scope: CacheScope): String =
    sections(docs, scope).map { case (name, df) =>
      s""""$name":[${df.toJSON.collect().mkString(",")}]"""
    }.mkString("{", ",", "}")
}
