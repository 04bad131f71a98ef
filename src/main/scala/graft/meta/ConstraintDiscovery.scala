package graft.meta

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.transfer.JdbcSource

/** Source of the three ANSI information-schema catalog relations that
  * constraint discovery joins over (`discovery.py:250-346`). All three
  * DataFrames use the lowercase ANSI column names:
  *
  *  - tableConstraints: constraint_name, constraint_type, table_schema, table_name
  *  - keyColumnUsage:   constraint_name, table_schema, table_name, column_name, ordinal_position
  *  - referentialConstraints: constraint_name, constraint_schema,
  *                            unique_constraint_name, unique_constraint_schema
  */
trait ConstraintCatalog {
  def tableConstraints(spark: SparkSession): DataFrame
  def keyColumnUsage(spark: SparkSession): DataFrame
  def referentialConstraints(spark: SparkSession): DataFrame

  /** (constraint_name, check_clause) for CHECK constraints
    * (`discovery.py:276-287` reads the same pairing). Default: none —
    * engines whose catalog exposes no clause text still discover
    * everything else. */
  def checkClauses(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("constraint_name", StringType),
        StructField("check_clause", StringType))))
}

/** Production path: read `INFORMATION_SCHEMA.*` through [[JdbcSource]] —
  * works against any engine that exposes the ANSI views (Snowflake,
  * PostgreSQL, MySQL). `schemaPrefix` overrides the catalog schema name for
  * engines that mount it elsewhere. */
final class InformationSchemaCatalog(
    url: String,
    options: Map[String, String] = Map.empty,
    schemaPrefix: String = "INFORMATION_SCHEMA") extends ConstraintCatalog {

  private def read(spark: SparkSession, table: String): DataFrame = {
    val df = new JdbcSource(url, options).read(spark, s"$schemaPrefix.$table")
    df.select(df.columns.map(c => col(c).as(c.toLowerCase)).toSeq: _*)
  }

  def tableConstraints(spark: SparkSession): DataFrame = read(spark, "TABLE_CONSTRAINTS")
  def keyColumnUsage(spark: SparkSession): DataFrame = read(spark, "KEY_COLUMN_USAGE")
  def referentialConstraints(spark: SparkSession): DataFrame = read(spark, "REFERENTIAL_CONSTRAINTS")
  override def checkClauses(spark: SparkSession): DataFrame =
    read(spark, "CHECK_CONSTRAINTS").select(col("constraint_name"), col("check_clause"))
}

/** Fallback path for engines without an information schema (embedded Derby
  * here): synthesize the same three relations from the live
  * `java.sql.DatabaseMetaData` catalog — `getPrimaryKeys`,
  * `getIndexInfo(unique)`, `getImportedKeys`. Catalog-sized data, so the
  * driver-side fetch is O(#constraints), never O(rows). */
final class JdbcMetadataCatalog(
    url: String,
    schema: String,
    tables: Seq[String]) extends ConstraintCatalog {

  private val tcSchema = StructType(Seq(
    StructField("constraint_name", StringType), StructField("constraint_type", StringType),
    StructField("table_schema", StringType), StructField("table_name", StringType)))
  private val kcuSchema = StructType(Seq(
    StructField("constraint_name", StringType), StructField("table_schema", StringType),
    StructField("table_name", StringType), StructField("column_name", StringType),
    StructField("ordinal_position", IntegerType)))
  private val rcSchema = StructType(Seq(
    StructField("constraint_name", StringType), StructField("constraint_schema", StringType),
    StructField("unique_constraint_name", StringType), StructField("unique_constraint_schema", StringType)))

  private val ccSchema = StructType(Seq(
    StructField("constraint_name", StringType), StructField("check_clause", StringType)))

  private case class Raw(tc: Seq[Row], kcu: Seq[Row], rc: Seq[Row], cc: Seq[Row])

  private lazy val raw: Raw = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val md = conn.getMetaData
      val tc = Seq.newBuilder[Row]
      val kcu = Seq.newBuilder[Row]
      val rc = Seq.newBuilder[Row]
      val cc = Seq.newBuilder[Row]
      for (table <- tables) {
        // CHECK constraints: DatabaseMetaData has no CHECK API, so read the
        // engine's own catalog (Derby: SYSCONSTRAINTS ⋈ SYSCHECKS carries
        // the clause text the reference pulls from CHECK_CONSTRAINTS at
        // discovery.py:276-287); engines without these tables skip silently
        for ((name, clause) <- checkClausesFor(conn, table)) {
          tc += Row(name, "CHECK", schema, table)
          cc += Row(name, clause)
        }
        // primary key: one TABLE_CONSTRAINTS row + per-column KCU rows
        var pkName: Option[String] = None
        val pkCols = scala.collection.mutable.Set[String]()
        val prs = md.getPrimaryKeys(null, schema, table)
        while (prs.next()) {
          val name = Option(prs.getString("PK_NAME")).getOrElse(s"pk_$table")
          pkName = Some(name)
          pkCols += prs.getString("COLUMN_NAME")
          kcu += Row(name, schema, table, prs.getString("COLUMN_NAME"),
            prs.getShort("KEY_SEQ").toInt)
        }
        pkName.foreach(n => tc += Row(n, "PRIMARY KEY", schema, table))

        // unique constraints: unique backing indexes minus the PK's own
        val irs = md.getIndexInfo(null, schema, table, true, false)
        val uniqueCols = scala.collection.mutable.LinkedHashMap[String, Vector[(String, Int)]]()
        while (irs.next()) {
          val idx = irs.getString("INDEX_NAME")
          val c = irs.getString("COLUMN_NAME")
          if (idx != null && c != null)
            uniqueCols(idx) = uniqueCols.getOrElse(idx, Vector.empty) :+
              (c, irs.getShort("ORDINAL_POSITION").toInt)
        }
        // getIndexInfo names the backing *index* (Derby: "sql0000…"); map it
        // back to the declared constraint name where the engine lets us
        val names = constraintNamesByIndex(conn, table)
        for ((idx, cols) <- uniqueCols if cols.map(_._1).toSet != pkCols.toSet) {
          val name = names.getOrElse(idx.toUpperCase, idx)
          tc += Row(name, "UNIQUE", schema, table)
          cols.foreach { case (c, pos) => kcu += Row(name, schema, table, c, pos) }
        }

        // foreign keys: TABLE_CONSTRAINTS + KCU (local cols) + RC pointing
        // at the referenced PK constraint (whose KCU rows come from the
        // referenced table's own pass above)
        val frs = md.getImportedKeys(null, schema, table)
        val seenFk = scala.collection.mutable.Set[String]()
        while (frs.next()) {
          val name = Option(frs.getString("FK_NAME")).getOrElse(
            s"fk_${table}_${frs.getString("FKCOLUMN_NAME")}")
          val refPk = Option(frs.getString("PK_NAME")).getOrElse(
            s"pk_${frs.getString("PKTABLE_NAME")}")
          if (seenFk.add(name)) {
            tc += Row(name, "FOREIGN KEY", schema, table)
            rc += Row(name, schema, refPk, schema)
          }
          kcu += Row(name, schema, table, frs.getString("FKCOLUMN_NAME"),
            frs.getShort("KEY_SEQ").toInt)
        }
      }
      Raw(tc.result(), kcu.result(), rc.result(), cc.result())
    } finally conn.close()
  }

  /** (constraint name, clause text) for `table`'s CHECK constraints via
    * Derby's SYS catalog; empty on engines without it. */
  private def checkClausesFor(conn: java.sql.Connection, table: String): Seq[(String, String)] =
    try {
      val st = conn.prepareStatement(
        """SELECT c.constraintname, ck.checkdefinition
          |FROM sys.sysconstraints c
          |JOIN sys.syschecks ck ON c.constraintid = ck.constraintid
          |JOIN sys.systables t ON c.tableid = t.tableid
          |WHERE t.tablename = ?""".stripMargin)
      st.setString(1, table)
      val rs = st.executeQuery()
      val out = Seq.newBuilder[(String, String)]
      while (rs.next()) out += rs.getString(1) -> rs.getString(2)
      st.close()
      out.result()
    } catch { case NonFatal(_) => Nil }

  /** Backing-index name → declared constraint name, via Derby's SYS
    * catalog (SYSCONSTRAINTS ⋈ SYSKEYS ⋈ SYSCONGLOMERATES) — itself a
    * small live-catalog join; engines without these tables just keep the
    * index name. */
  private def constraintNamesByIndex(conn: java.sql.Connection, table: String): Map[String, String] =
    try {
      val st = conn.prepareStatement(
        """SELECT cg.conglomeratename, c.constraintname
          |FROM sys.sysconstraints c
          |JOIN sys.syskeys k ON c.constraintid = k.constraintid
          |JOIN sys.sysconglomerates cg ON k.conglomerateid = cg.conglomerateid
          |JOIN sys.systables t ON c.tableid = t.tableid
          |WHERE t.tablename = ?""".stripMargin)
      st.setString(1, table)
      val rs = st.executeQuery()
      val out = Map.newBuilder[String, String]
      while (rs.next()) out += rs.getString(1).toUpperCase -> rs.getString(2)
      st.close()
      out.result()
    } catch { case NonFatal(_) => Map.empty }

  private def frame(spark: SparkSession, rows: Seq[Row], schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)

  def tableConstraints(spark: SparkSession): DataFrame = frame(spark, raw.tc, tcSchema)
  def keyColumnUsage(spark: SparkSession): DataFrame = frame(spark, raw.kcu, kcuSchema)
  def referentialConstraints(spark: SparkSession): DataFrame = frame(spark, raw.rc, rcSchema)
  override def checkClauses(spark: SparkSession): DataFrame = frame(spark, raw.cc, ccSchema)
}

/** Live constraint discovery — the reference's two catalog joins
  * (`discovery.py:250-346`) re-expressed as Spark joins over
  * [[ConstraintCatalog]] relations:
  *
  *  - PK/UNIQUE: `TABLE_CONSTRAINTS ⋈ KEY_COLUMN_USAGE` (2-way) on
  *    (constraint_name, table_schema, table_name), columns ordered by
  *    `ordinal_position`;
  *  - FK: `REFERENTIAL_CONSTRAINTS ⋈ KEY_COLUMN_USAGE ⋈ KEY_COLUMN_USAGE`
  *    (3-way) — the second KCU leg resolves `unique_constraint_name` to the
  *    referenced table and columns.
  *
  * Catalog relations are tiny, so the joins collect at the end; like the
  * reference, an inaccessible catalog degrades to "no constraints" with one
  * warning rather than failing discovery (discovery.py:296-309).
  */
object ConstraintDiscovery {

  /** All constraints for `schemaName`, keyed by lowercase table name. */
  def discover(spark: SparkSession, catalog: ConstraintCatalog,
               schemaName: String): Map[String, Seq[ConstraintMeta]] =
    try {
      val tc = catalog.tableConstraints(spark)
        .filter(upper(col("table_schema")) === schemaName.toUpperCase)
      val kcu = catalog.keyColumnUsage(spark)

      // 2-way: PK/UNIQUE constraint → ordered column list
      val pkUnique = tc
        .filter(col("constraint_type").isin("PRIMARY KEY", "UNIQUE"))
        .join(kcu, Seq("constraint_name", "table_schema", "table_name"))
        .groupBy(col("table_name"), col("constraint_name"), col("constraint_type"))
        .agg(sort_array(collect_list(struct(col("ordinal_position"), col("column_name"))))
          .as("cols"))
        .collect()
        .map { r =>
          val cols = r.getSeq[Row](3).map(_.getString(1).toLowerCase)
          (r.getString(0).toLowerCase,
            ConstraintMeta(r.getString(1).toLowerCase, r.getString(2), cols))
        }

      // 3-way: FK constraint → local columns + referenced table/columns,
      // zipped positionally like the reference's paired ORDER BY fetch
      val fks =
        try {
          val rc = catalog.referentialConstraints(spark)
          val local = kcu.select(
            col("constraint_name"), col("table_name"),
            col("column_name"), col("ordinal_position"))
          val referenced = kcu.select(
            col("constraint_name").as("unique_constraint_name"),
            col("table_name").as("ref_table"),
            col("column_name").as("ref_column"),
            col("ordinal_position").as("ref_position"))
          rc.join(local, Seq("constraint_name"))
            .join(referenced, Seq("unique_constraint_name"))
            .filter(col("ordinal_position") === col("ref_position"))
            .groupBy(col("table_name"), col("constraint_name"), col("ref_table"))
            .agg(sort_array(collect_list(struct(
              col("ordinal_position"), col("column_name"), col("ref_column")))).as("cols"))
            .collect()
            .map { r =>
              val cols = r.getSeq[Row](3)
              (r.getString(0).toLowerCase,
                ConstraintMeta(r.getString(1).toLowerCase, "FOREIGN KEY",
                  cols.map(_.getString(1).toLowerCase),
                  referencedTable = Some(r.getString(2).toLowerCase),
                  referencedColumns = cols.map(_.getString(2).toLowerCase)))
            }
        } catch {
          case NonFatal(_) => Array.empty[(String, ConstraintMeta)] // PK/UNIQUE succeeded; FK view absent
        }

      // CHECK: constraint rows joined to their clause text — the same
      // pairing the reference fetches (discovery.py:276-287); engines that
      // surface no clause text simply contribute no rows
      val checks =
        try {
          tc.filter(col("constraint_type") === "CHECK")
            .join(catalog.checkClauses(spark), Seq("constraint_name"))
            .select(col("table_name"), col("constraint_name"), col("check_clause"))
            .collect()
            .map(r => (r.getString(0).toLowerCase,
              ConstraintMeta(r.getString(1).toLowerCase, "CHECK", Nil,
                checkClause = Some(r.getString(2)))))
        } catch {
          case NonFatal(_) => Array.empty[(String, ConstraintMeta)]
        }

      (pkUnique ++ fks ++ checks).groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    } catch {
      case NonFatal(e) =>
        // mirror discovery.py:296-309 — warn, return no constraints
        System.err.println(
          s"[graft] constraint catalog not accessible (${e.getMessage}); skipping constraints")
        Map.empty
    }

  /** Fold discovered constraints into a [[TableMeta]]. */
  def enrich(t: TableMeta, constraints: Map[String, Seq[ConstraintMeta]]): TableMeta = {
    val cs = constraints.getOrElse(t.name.toLowerCase, Nil)
    t.copy(
      primaryKey = cs.find(_.constraintType == "PRIMARY KEY").map(_.columns).getOrElse(Nil),
      foreignKeys = cs.filter(_.constraintType == "FOREIGN KEY"),
      uniqueConstraints = cs.filter(_.constraintType == "UNIQUE"),
      checkConstraints = cs.filter(_.constraintType == "CHECK"))
  }
}
