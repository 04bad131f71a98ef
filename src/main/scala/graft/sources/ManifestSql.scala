package graft.sources

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType

/** SQL-surface manifest pruning (round-11 verdict item 7): [[Manifest]]'s
  * file skipping was helper-API-only — a `spark.sql` user, or a
  * dialect-translated view, scanned every file no matter how selective the
  * predicate. [[ManifestPruneRule]] closes that gap the way a lakehouse
  * format does it: the table registers as an ordinary parquet read carrying
  * a marker option; at optimization time the rule sees `Filter` over that
  * relation, extracts the key-column ranges from the filter's conjuncts,
  * consults the manifest (a footer-cheap parquet query over file stats, the
  * same path [[Manifest.select]] uses), and swaps the relation's file index
  * for one holding only the surviving files. The original `Filter` STAYS on
  * top — file zone maps are coarser than rows, so the row-level predicate
  * must re-apply — and Spark's own `FileSourceStrategy` then pushes it into
  * the (now pruned) scan, so file skipping and parquet pushdown compose.
  *
  * Conservative by construction: only plain `attr (=,<,<=,>,>=) literal`
  * conjuncts on manifest key columns prune; casts, disjunctions, and
  * expressions keep every file (they only cost performance, never rows). A
  * predicate no file overlaps yields an empty-but-valid scan — correct
  * relational semantics, unlike the Scala helper's loud zero-file error.
  *
  * Reference scope: this is the SQL face of the data-lake catalog that
  * replaces the reference's always-current INFORMATION_SCHEMA
  * (`discovery.py:200-248`) beyond driver-listing scale. */
object ManifestSql {

  /** Reader option marking a parquet relation as manifest-backed. */
  val PathOption = "graft.manifest.path"
  /** Reader option carrying the manifest's `table` value for the relation. */
  val TableOption = "graft.manifest.table"

  /** Read `dataDir/table.parquet` as a manifest-backed relation: SQL
    * filters over it file-skip through `manifestPath`. Plain-layout tables
    * only (Hive partition dirs already prune at the directory level). */
  def readTable(spark: SparkSession, dataDir: String, table: String,
                manifestPath: String): DataFrame = {
    enable(spark)
    spark.read
      .option(PathOption, manifestPath)
      .option(TableOption, table)
      .parquet(s"$dataDir/$table.parquet")
  }

  /** [[readTable]] + temp-view registration, so `spark.sql` and translated
    * views get file skipping without touching the Scala helpers. */
  def register(spark: SparkSession, dataDir: String, table: String,
               manifestPath: String, viewName: String): Unit =
    readTable(spark, dataDir, table, manifestPath)
      .createOrReplaceTempView(viewName)

  /** Idempotently add [[ManifestPruneRule]] to an already-built session
    * (new sessions get it through [[graft.plans.GraftExtensions]]). */
  def enable(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[ManifestPruneRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ManifestPruneRule(spark)
  }
}

/** The optimizer rule behind [[ManifestSql]]. Idempotent under the
  * fixed-point batch: the substituted relation drops the marker option, so
  * a second pass no longer matches. */
case class ManifestPruneRule(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, l @ LogicalRelation(h: HadoopFsRelation, _, _, _, _))
        if h.options.contains(ManifestSql.PathOption) &&
          h.partitionSchema.isEmpty && !l.isStreaming =>
      val mp = h.options(ManifestSql.PathOption)
      val tbl = h.options.getOrElse(ManifestSql.TableOption, "")
      // a manifest that vanished (or never materialized) must degrade to
      // the unpruned scan — stale catalog state may only cost performance,
      // never turn a valid query into a planning error
      scala.util.Try(prune(mp, tbl, cond)) match {
        case scala.util.Failure(e) =>
          logWarning(s"manifest pruning skipped for $tbl ($mp): $e")
          f
        case scala.util.Success(pruned) =>
          val newIndex = new InMemoryFileIndex(
            spark, pruned.map(new HPath(_)), Map.empty, Some(h.dataSchema))
          val newRel = h.copy(
            location = newIndex,
            options = h.options - ManifestSql.PathOption - ManifestSql.TableOption)(spark)
          Filter(cond, l.copy(relation = newRel))
      }
  }

  /** Surviving file paths for `cond` — every file when no conjunct is a
    * prunable key-range bound. */
  private def prune(manifestPath: String, table: String,
                    cond: Expression): Seq[String] = {
    val manifest = spark.read.parquet(manifestPath)
    val keyFields = manifest.schema("mins").dataType.asInstanceOf[StructType]
      .fields.map(f => f.name.toLowerCase(java.util.Locale.ROOT) -> f.name).toMap
    // manifests written before the nulls struct existed still range-prune;
    // referencing the absent column would fail the whole prune instead
    val hasNulls = manifest.schema.fieldNames.contains("nulls")
    val zonePred = splitConjunctivePredicates(cond)
      .flatMap(conjunctBound(_, keyFields, hasNulls))
      .reduceOption(_ && _)
    manifest
      .filter(col("table") === table && zonePred.getOrElse(lit(true)))
      .select(col("path")).distinct()
      .collect().map(_.getString(0)).toIndexedSeq
  }

  /** One conjunct → a zone-map overlap condition, when it is a plain
    * comparison between a bare key attribute and a foldable literal. NULL
    * zone maps (missing footer stats) always keep the file. */
  private def conjunctBound(e: Expression,
                            keyFields: Map[String, String],
                            hasNulls: Boolean): Option[Column] = {
    def key(a: Expression): Option[String] = a match {
      case ar: AttributeReference =>
        keyFields.get(ar.name.toLowerCase(java.util.Locale.ROOT))
      case _ => None
    }
    def ext(l: Literal): Option[Any] =
      Option(l.value).map(CatalystTypeConverters.convertToScala(_, l.dataType))
    def atLeast(k: String, v: Any): Column = // file range reaches up to v
      col(s"maxs.`$k`") >= lit(v) || col(s"maxs.`$k`").isNull
    def atMost(k: String, v: Any): Column = // file range reaches down to v
      col(s"mins.`$k`") <= lit(v) || col(s"mins.`$k`").isNull
    e match {
      case EqualTo(a, l: Literal) =>
        for (k <- key(a); v <- ext(l)) yield atLeast(k, v) && atMost(k, v)
      case EqualTo(l: Literal, a) =>
        for (k <- key(a); v <- ext(l)) yield atLeast(k, v) && atMost(k, v)
      // <=> with a non-null literal selects exactly like = (the null-side
      // semantics differ only for a NULL literal, which ext() rejects)
      case EqualNullSafe(a, l: Literal) =>
        for (k <- key(a); v <- ext(l)) yield atLeast(k, v) && atMost(k, v)
      case EqualNullSafe(l: Literal, a) =>
        for (k <- key(a); v <- ext(l)) yield atLeast(k, v) && atMost(k, v)
      // k LIKE 'abc%': every match sorts in ['abc', 'abd') — the upper
      // bound increments the prefix's last non-U+FFFF char (no finite
      // string upper-bounds a prefix ending in U+FFFF chars, so those
      // keep only the lower bound; appending U+FFFF instead would
      // wrongly prune matches that themselves contain U+FFFF)
      case StartsWith(a, l: Literal) =>
        for (k <- key(a); v <- ext(l); s = v.toString; if s.nonEmpty) yield {
          val lower = atLeast(k, s)
          prefixUpper(s).fold(lower)(hi => lower && atMost(k, hi))
        }
      case GreaterThan(a, l: Literal) =>
        for (k <- key(a); v <- ext(l)) yield atLeast(k, v)
      case GreaterThanOrEqual(a, l: Literal) =>
        for (k <- key(a); v <- ext(l)) yield atLeast(k, v)
      case LessThan(a, l: Literal) =>
        for (k <- key(a); v <- ext(l)) yield atMost(k, v)
      case LessThanOrEqual(a, l: Literal) =>
        for (k <- key(a); v <- ext(l)) yield atMost(k, v)
      case GreaterThan(l: Literal, a) =>
        for (k <- key(a); v <- ext(l)) yield atMost(k, v)
      case GreaterThanOrEqual(l: Literal, a) =>
        for (k <- key(a); v <- ext(l)) yield atMost(k, v)
      case LessThan(l: Literal, a) =>
        for (k <- key(a); v <- ext(l)) yield atLeast(k, v)
      case LessThanOrEqual(l: Literal, a) =>
        for (k <- key(a); v <- ext(l)) yield atLeast(k, v)
      // IN-lists: each member is a point lookup, OR'd — precise (a sparse
      // list skips files between its members) and still one manifest
      // query. NULL members match no row under IN, so they drop out.
      // Past 64 members fall back to [min,max] bounds: the OR tree's
      // planning cost grows while file-skipping precision rarely does.
      // NULL-count pruning (round 12): `IS NULL` keeps only files with
      // nulls; the `IS NOT NULL` Spark inserts under every comparison
      // skips all-null files. Unknown counts (legacy manifests without the
      // nulls struct read them as NULL) keep the file.
      case IsNull(a) if hasNulls =>
        key(a).map(k =>
          col(s"nulls.`$k`") > 0L || col(s"nulls.`$k`").isNull)
      case IsNotNull(a) if hasNulls =>
        key(a).map(k =>
          col(s"nulls.`$k`") < col("rows") || col(s"nulls.`$k`").isNull)
      case In(a, list) if list.nonEmpty && list.forall(_.isInstanceOf[Literal]) =>
        key(a).flatMap { k =>
          val vs = list.flatMap(l => ext(l.asInstanceOf[Literal]))
          inCondition(k, vs)
        }
      case InSet(a, hset) =>
        key(a).flatMap { k =>
          val vs = hset.toSeq.filter(_ != null)
            .map(CatalystTypeConverters.convertToScala(_, a.dataType))
          inCondition(k, vs)
        }
      case _ => None
    }
  }

  /** Smallest string strictly above every `s`-prefixed string, when one
    * exists: increment the last char that can be incremented, drop the
    * rest. None when the prefix is all U+FFFF. */
  private def prefixUpper(s: String): Option[String] = {
    val i = s.lastIndexWhere(_ != '\uffff')
    if (i < 0) None
    else Some(s.substring(0, i) + (s.charAt(i) + 1).toChar)
  }

  private def inCondition(k: String, vs: Seq[Any]): Option[Column] = {
    def cmp(x: Any, y: Any) = x.asInstanceOf[Comparable[Any]].compareTo(y)
    def point(v: Any): Column =
      (col(s"maxs.`$k`") >= lit(v) || col(s"maxs.`$k`").isNull) &&
        (col(s"mins.`$k`") <= lit(v) || col(s"mins.`$k`").isNull)
    if (vs.isEmpty) None // all-NULL list: matches nothing; leave to the filter
    else if (vs.size <= 64) Some(vs.map(point).reduce(_ || _))
    else {
      val lo = vs.reduce((x, y) => if (cmp(x, y) <= 0) x else y)
      val hi = vs.reduce((x, y) => if (cmp(x, y) >= 0) x else y)
      Some((col(s"maxs.`$k`") >= lit(lo) || col(s"maxs.`$k`").isNull) &&
        (col(s"mins.`$k`") <= lit(hi) || col(s"mins.`$k`").isNull))
    }
  }
}
