package graft.transfer

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** COPY-compatible CSV bulk sink — the testable core of the reference's
  * highest-throughput path (`data_transfer.py:210-382`: CSV buffer +
  * `COPY … FROM STDIN WITH CSV NULL '\N'`), re-expressed as a distributed
  * write: every executor formats its partition with codegen'd string
  * expressions and writes a COPY-ready shard, instead of one driver
  * process funneling every row through an in-memory `csv.writer`.
  *
  * Field discipline (data_transfer.py:272-358):
  *  - SQL NULL        → unquoted `\N`      (COPY `NULL '\N'` → DB NULL)
  *  - empty string    → unquoted empty     (stays `''`, NOT NULL)
  *  - `\x00` bytes    → stripped           (invalid in PG text; segfaults
  *                                          psycopg2's COPY at the C level)
  *  - quoting minimal → only fields containing comma/quote/CR/LF are
  *    quoted, with `""` doubling (RFC 4180, what COPY CSV parses)
  *  - a *literal* string `\N` → quoted `"\N"` — COPY's NULL marker matches
  *    only the unquoted form, so the value survives. (The reference's
  *    QUOTE_MINIMAL writer leaves it unquoted and silently collapses it to
  *    NULL — a bug this formatter fixes.)
  *
  * The executing counterpart is [[CopyManagerSink]]: it streams these same
  * lines through a `CopyManager.copyIn(String, Reader)`-shaped session, one
  * COPY stream per executor partition (no PG in this image, so the session
  * is a trait; the 3-line pgjdbc factory is documented on
  * [[CopySessionFactory]]). This sink keeps the file-shard form — COPY-ready
  * CSV on disk for `psql \copy` or audit.
  */
object CsvBulk {

  /** One COPY-ready CSV field via the native [[graft.functions.CsvField]]
    * expression: single byte-scan, zero-copy for clean fields. (The first
    * version composed translate + 4 contains + regexp_replace from
    * built-ins; correct, but it benchmarked ~10x slower than the parquet
    * write path — exactly the case the build rules reserve a native
    * codegen expression for.) */
  def csvField(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.CsvField(
        org.apache.spark.sql.graft.ColumnBridge.expression(c.cast("string"))))

  /** A whole row as one COPY CSV line. `concat` (not `concat_ws`) so a
    * NULL field can never collapse the line — every field is already
    * non-null after [[csvField]]. */
  def csvLine(df: DataFrame): Column = {
    val fields = df.columns.map(c => csvField(col(c)))
    val withCommas = fields.zipWithIndex.flatMap { case (f, i) =>
      if (i == 0) Seq(f) else Seq(lit(","), f)
    }
    concat(withCommas.toSeq: _*).as("line")
  }

  /** COPY text compatibility holds for scalar types only: a binary column
    * cast to string mangles bytes through UTF-8, and array/struct/map render
    * as Spark's `[1, 2]` display form, which PG array/record syntax does not
    * parse — either would load wrong silently. Fail loudly instead; callers
    * should project such columns to JSON (`to_json`) or hex (`hex`) first. */
  private[transfer] def requireCopyCompatible(df: DataFrame, table: String,
                                              sinkName: String): Unit = {
    import org.apache.spark.sql.types.{ArrayType, BinaryType, MapType, StructType}
    val bad = df.schema.fields.collect {
      case f if f.dataType == BinaryType || f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[StructType] || f.dataType.isInstanceOf[MapType] =>
        s"${f.name}: ${f.dataType.simpleString}"
    }
    require(bad.isEmpty,
      s"$sinkName($table): COPY CSV cannot carry non-scalar columns [${bad.mkString(", ")}]; " +
        "project them through to_json/hex before the sink")
  }
}

/** [[TableSink]] writing COPY-compatible CSV shards to `dir/<table>.csv/`.
  * Pairs with [[JdbcSource]]/[[ParquetSource]] under [[TransferEngine]];
  * the S3 COPY-sink row of SURVEY §2.1. Row counts come from an
  * `observe()` metric collected DURING the write job — re-reading the
  * text shards (or re-counting the source) would add a full second pass
  * just for stats. */
final class CsvBulkSink(dir: String, mode: SaveMode = SaveMode.Overwrite) extends TableSink {

  private val written = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  def path(table: String): String = s"$dir/$table.csv"

  def write(df: DataFrame, table: String): Unit = {
    written.put(table, writeLines(df, table, mode))
  }

  /** Chunked transfers append after the first chunk and accumulate the
    * observed row counts — without this override the default writeChunk
    * fell through to overwrite-mode write(), keeping only the LAST chunk.
    * A resume in a fresh engine (append arrives with no recorded first
    * chunk) makes the running count partial — drop it so stats fall back
    * to an accurate count instead of under-reporting. */
  override def writeChunk(df: DataFrame, table: String, firstChunk: Boolean): Unit = {
    val rows = writeLines(df, table, if (firstChunk) SaveMode.Overwrite else SaveMode.Append)
    if (firstChunk) written.put(table, rows)
    else written.computeIfPresent(table, // a blind resume records nothing: never a partial count
      (_: String, a: java.lang.Long) => java.lang.Long.valueOf(a + rows))
  }

  private def writeLines(df: DataFrame, table: String, m: SaveMode): Long = {
    CsvBulk.requireCopyCompatible(df, table, "CsvBulkSink")
    val obs = org.apache.spark.sql.Observation(s"csv_rows_${table}_${java.util.UUID.randomUUID()}")
    df.select(CsvBulk.csvLine(df))
      .observe(obs, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("rows"))
      .write.mode(m).text(path(table))
    obs.get("rows").asInstanceOf[Long]
  }

  override def countRows(spark: SparkSession, table: String): Option[Long] =
    Option(written.get(table)).map(_.longValue())
}
