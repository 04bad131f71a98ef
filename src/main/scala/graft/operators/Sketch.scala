package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-size distributed sketches — the cardinality / frequency answers
  * that stay cheap when the data doesn't. At 100 TB a plain
  * `COUNT(DISTINCT url)` shuffles every distinct key; an HLL register file
  * is 2^p integers regardless of input size, and a count-min sketch bounds
  * heavy-hitter detection to a d×w grid. Both reduce with map-side partial
  * aggregation into bounded state — the shuffle carries at most
  * (#partitions × sketch size) rows, never the data.
  *
  * Determinism: Spark's own `approx_count_distinct` (HLL++) and
  * `count_min_sketch` use engine-private hashing, so their outputs can't be
  * replayed by another engine. These variants hash with the md5-prefix
  * family ([[graft.functions.HashUtils]]) and keep every intermediate in
  * integer space (register maxima, power-of-two scaled harmonic sums), so
  * registers AND estimates are bit-identical in the DuckDB oracle — the
  * same replay discipline as the MinHash/SimHash signatures.
  *
  * No reference counterpart (the reference computes exact counts only,
  * validator.py:208-238); this is part of the scale extension surface.
  */
object Sketch {

  /** 32-bit md5-prefix hash of a column rendered as its string form —
    * DuckDB replay: `('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 8))::BIGINT`. */
  private def h32(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")

  /** HyperLogLog register file over `keyCol`: one row per occupied bucket,
    * `m = 2^p` buckets. Bucket = low p bits of the 32-bit hash; rho = number
    * of leading zeros in the remaining (32-p)-bit word + 1 (the classic
    * Flajolet split). `length(bin(w))` is the integer bit-length — exact in
    * both engines, no float log2 anywhere.
    *
    * Scale shape: groupBy(bucket) with map-side partial max — each executor
    * contributes at most m rows to the shuffle no matter how many billions
    * of keys it scanned.
    */
  def hllRegisters(df: DataFrame, keyCol: String, p: Int = 6): DataFrame = {
    require(p >= 4 && p <= 16, s"p=$p out of range")
    val m = 1 << p
    val wBits = 32 - p
    val h = h32(col(keyCol))
    val w = shiftright(h, p)
    val rho = when(w === 0, lit(wBits + 1))
      .otherwise(lit(wBits + 1) - length(bin(w)))
    df.select((h % m).as("bucket"), rho.as("rho"))
      .groupBy(col("bucket"))
      .agg(max(col("rho")).cast("long").as("max_rho"), count(lit(1)).as("n_rows"))
  }

  /** Raw HLL estimate from a register file: `alpha_m * m^2 / Σ 2^-M_j`
    * (empty buckets contribute 2^0 — entering the sum ARITHMETICALLY as
    * `(m - occupied) * 2^maxRho` scaled units, no bucket-spine join). The
    * harmonic sum is computed SCALED by 2^(wBits+1) so it stays a long —
    * every term is an exact power of two, the sum is exact, and the single
    * double division at the end is IEEE-deterministic across engines.
    * Production HLL++ would apply small/large-range bias correction on
    * top; the raw estimator keeps the operator oracle-replayable and is
    * within ~2% at these cardinalities.
    */
  def hllEstimate(registers: DataFrame, p: Int = 6): DataFrame = {
    val m = 1 << p
    val maxRho = (32 - p) + 1
    val alpha = hllAlpha(m)
    registers
      .agg(
        count(lit(1)).as("occupied"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $maxRho - CAST(max_rho AS INT))")).as("s_occ"))
      .select(
        col("occupied"),
        (col("s_occ") + (lit(m.toLong) - col("occupied")) * (1L << maxRho))
          .cast("long").as("s_scaled"))
      .withColumn("hll_est",
        lit(alpha) * m * m * math.pow(2.0, maxRho).toLong / col("s_scaled"))
  }

  /** The standard alpha_m constants (Flajolet et al. 2007, Fig. 3). */
  def hllAlpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Per-group HLL register files: (group, bucket, max_rho) — bounded at
    * m rows per group key however many rows each group holds. The
    * "distinct users per dimension" shape at corpus scale. */
  def hllRegistersBy(df: DataFrame, groupCol: String, keyCol: String,
                     p: Int = 6): DataFrame = {
    require(p >= 4 && p <= 16, s"p=$p out of range")
    val m = 1 << p
    val wBits = 32 - p
    val h = h32(col(keyCol))
    val w = shiftright(h, p)
    val rho = when(w === 0, lit(wBits + 1))
      .otherwise(lit(wBits + 1) - length(bin(w)))
    df.select(col(groupCol), (h % m).as("bucket"), rho.as("rho"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("rho")).cast("long").as("max_rho"))
  }

  /** Per-group raw HLL estimates from [[hllRegistersBy]] output. Empty
    * buckets enter the harmonic sum arithmetically (m - occupied rows at
    * 2^0 each, scaled) — no bucket-spine join needed. */
  def hllEstimateBy(registers: DataFrame, groupCol: String, p: Int = 6): DataFrame =
    hllEstimateBy(registers, Seq(groupCol), p)

  /** Multi-column grouping variant: composite keys (e.g. a source PAIR)
    * group on the real columns rather than a delimiter-packed string — a
    * group value containing the delimiter can never mis-split. */
  def hllEstimateBy(registers: DataFrame, groupCols: Seq[String], p: Int): DataFrame = {
    require(groupCols.nonEmpty, "hllEstimateBy needs at least one group column")
    val m = 1 << p
    val maxRho = (32 - p) + 1
    val alpha = hllAlpha(m)
    registers.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("occupied"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $maxRho - CAST(max_rho AS INT))")).as("s_occ"))
      .select(
        groupCols.map(col) ++ Seq(
          col("occupied"),
          (col("s_occ") + (lit(m.toLong) - col("occupied")) * (1L << maxRho))
            .cast("long").as("s_scaled")): _*)
      .withColumn("hll_est",
        lit(alpha) * m * m * math.pow(2.0, maxRho).toLong / col("s_scaled"))
  }

  /** Histogram-sketch quantiles: values fold into fixed-`width` bins (one
    * bounded groupBy), quantiles read off the cumulative bin counts. The
    * p-quantile test is pure integer arithmetic (`cum * 100 >= pct *
    * total`), the returned estimate is the bin's lower edge — error
    * bounded by `width`, state bounded by the value range / width, both
    * independent of row count. */
  def histogramQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                         width: Double, pcts: Seq[Int] = Seq(50, 95, 99)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bins = df
      .select(col(groupCol), floor(col(valueCol) / width).cast("long").as("bin"))
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("cnt"))
    val byGroup = Window.partitionBy(col(groupCol))
    val cum = bins
      .withColumn("cum", sum(col("cnt")).over(byGroup.orderBy(col("bin"))))
      .withColumn("total", sum(col("cnt")).over(byGroup))
    val qCols = pcts.map(pct =>
      min(when(col("cum") * 100 >= lit(pct.toLong) * col("total"), col("bin")))
        .cast("double").multiply(width).as(s"p$pct"))
    val aggCols = max(col("total")).as("n") +: qCols
    cum.groupBy(col(groupCol))
      .agg(aggCols.head, aggCols.tail: _*)
  }

  /** Count-min sketch of a token column: `d` independent md5-salted hash
    * rows × `w` buckets, one count per (row, bucket). The sketch is a
    * bounded d×w grid — ONE shuffle of at most d·w rows per executor,
    * regardless of corpus size.
    */
  def countMin(tokens: DataFrame, tokenCol: String, d: Int = 3, w: Int = 512): DataFrame = {
    val salted = tokens.select(
      explode(array((0 until d).map(lit(_)): _*)).as("s"),
      col(tokenCol).as("tok"))
    salted
      .select(col("s"),
        (h32(concat(lit("cm"), col("s").cast("string"), lit(":"), col("tok"))) % w)
          .as("bucket"))
      .groupBy(col("s"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate candidate tokens against a count-min sketch:
    * `est(t) = min_s sketch[s][h_s(t)]` — always >= the true count. The
    * sketch side is broadcast (bounded at d×w rows by construction); a
    * LEFT join keeps candidates whose cells are unoccupied — a token the
    * sketch never saw correctly estimates 0 instead of silently vanishing
    * or overstating from its surviving cells. Output keeps the exact
    * count alongside for error audit. */
  def countMinEstimate(candidates: DataFrame, tokenCol: String, exactCol: String,
                       sketch: DataFrame, d: Int = 3, w: Int = 512): DataFrame = {
    val probes = candidates.select(
      col(tokenCol).as("tok"), col(exactCol).as("exact_cnt"),
      explode(array((0 until d).map(lit(_)): _*)).as("s"))
      .withColumn("bucket",
        h32(concat(lit("cm"), col("s").cast("string"), lit(":"), col("tok"))) % w)
    probes.join(broadcast(sketch), Seq("s", "bucket"), "left_outer")
      .groupBy(col("tok"), col("exact_cnt"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))
  }
}
