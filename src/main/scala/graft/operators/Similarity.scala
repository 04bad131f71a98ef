package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector-similarity search over an embedding column (`array<float>`):
  * exact cosine (decimal-accumulated so results are bit-identical across
  * engines and partitionings), brute-force top-k as the correctness
  * baseline, and random-hyperplane LSH bucketing as the 100 TB scale path.
  */
object Similarity {

  /** Exact dot product: per-element double products (exact for float32
    * inputs) accumulated in DECIMAL(38,18) — order-independent, so the
    * result is identical under any partitioning and in the DuckDB oracle. */
  def dotExact(a: String, b: String): Column =
    expr(s"CAST(aggregate(zip_with($a, $b, (x, y) -> " +
      "CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(38,18))), " +
      // re-cast each partial sum: Spark decimal + drops to scale 17, but all
      // operands are exact multiples of 1e-18, so the cast is lossless
      "CAST(0 AS DECIMAL(38,18)), (acc, v) -> CAST(acc + v AS DECIMAL(38,18))) AS DOUBLE)")

  /** Matching DuckDB fragment for [[dotExact]]. */
  def dotExactSql(a: String, b: String): String =
    s"CAST(list_sum(list_transform(list_zip($a, $b), x -> " +
      "CAST(CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE) AS DECIMAL(38,18)))) AS DOUBLE)"

  def normExact(a: String): Column = sqrt(dotExact(a, a))

  def normExactSql(a: String): String = s"sqrt(${dotExactSql(a, a)})"

  /** Fast double-precision dot product for throughput paths (bench/LSH);
    * order-dependent, so not oracle-comparable. */
  def dotFast(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0 AS DOUBLE), (acc, v) -> acc + v)")

  /** Brute-force cosine top-k: broadcast the (small) query set against the
    * corpus, rank per query. Exact-decimal cosine for oracle comparability. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      .withColumn("cnorm", normExact("cvec"))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .withColumn("qnorm", normExact("qvec"))
    val scored = c.join(broadcast(q), col("cid") =!= col("qid"))
      .withColumn("cosine", dotExact("qvec", "cvec") / (col("qnorm") * col("cnorm")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("cosine"), col("rank"))
  }

  /** Random-hyperplane LSH signature: `bits` sign-bits of dot products with
    * deterministic pseudo-random hyperplanes — no RNG state, reproducible
    * across runs, cluster sizes, AND engines: hyperplane j's i-th component
    * is the integer md5-prefix hash of "j_i" mod 1000, centered to
    * [-500, 500) (scaling by 1/1000 can't change the sign, so integer
    * components are used directly; DuckDB replays them via
    * `('0x'||substr(md5(j||'_'||i),1,8))::BIGINT`). The sign test runs on
    * the exact-decimal dot so bucket assignment is bit-identical in the
    * differential oracle. */
  def lshSignature(vecCol: String, bits: Int = 16): Column = {
    val bitCols = (0 until bits).map { j =>
      val hyper = s"transform(sequence(0, size($vecCol) - 1), " +
        s"i -> CAST(conv(substr(md5(concat('${j}_', CAST(i AS STRING))), 1, 8), 16, 10) AS BIGINT) % 1000 - 500)"
      val dot = expr(
        s"aggregate(zip_with($vecCol, $hyper, " +
          "(x, p) -> CAST(CAST(x AS DOUBLE) * p AS DECIMAL(38,18))), " +
          "CAST(0 AS DECIMAL(38,18)), (acc, v) -> CAST(acc + v AS DECIMAL(38,18)))")
      when(dot > 0, lit(1L << j)).otherwise(0L)
    }
    bitCols.reduce(_ + _)
  }

  /** Matching DuckDB fragment for [[lshSignature]] — bucket id of `vecCol`
    * given a lateral-unnested bit index column `j` (0-based). */
  def lshBucketSql(vecCol: String, bits: Int = 16): String =
    s"""CAST(SUM(CASE WHEN list_sum(list_transform(list_zip($vecCol,
       |  list_transform(range(0, len($vecCol)),
       |    i -> ('0x' || substr(md5(j.j || '_' || i), 1, 8))::BIGINT % 1000 - 500)),
       |  p -> CAST(CAST(p[1] AS DOUBLE) * p[2] AS DECIMAL(38,18)))) > 0
       |  THEN (1::BIGINT << j.j) ELSE 0 END) AS BIGINT)""".stripMargin

  /** LSH-bucketed ANN: only pairs sharing a signature bucket are scored —
    * the candidate join shuffles on the 16-bit bucket, never cross-joining
    * the corpus. Returns candidate pairs with exact cosine ≥ `threshold`. */
  def lshNearNeighbors(corpus: DataFrame, threshold: Double, bits: Int = 16): DataFrame = {
    // norms computed once per vector, not once per candidate pair; cached
    // because both join sides consume it (16 hyperplane dots per row)
    val sig = corpus.select(col("vec_id"), col("embedding"))
      .withColumn("bucket", lshSignature("embedding", bits))
      .withColumn("nrm", normExact("embedding"))
      .cache()
    val a = sig.select(col("vec_id").as("a_id"), col("embedding").as("a_vec"),
      col("nrm").as("a_nrm"), col("bucket"))
    val b = sig.select(col("vec_id").as("b_id"), col("embedding").as("b_vec"),
      col("nrm").as("b_nrm"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cosine", dotExact("a_vec", "b_vec") / (col("a_nrm") * col("b_nrm")))
      .filter(col("cosine") >= threshold)
      .select(col("a_id"), col("b_id"), col("cosine"))
      .distinct()
  }
}
