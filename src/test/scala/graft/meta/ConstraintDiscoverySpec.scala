package graft.meta

import java.sql.DriverManager

import graft.SparkSpec
import graft.ddl.DdlGenerator
import graft.transfer.JdbcSource

/** Live constraint discovery against embedded Derby: real PK/FK/UNIQUE
  * constraints created in a live catalog, discovered through the 2-way and
  * 3-way catalog joins, and round-tripped into emitted DDL
  * (discovery.py:250-346 → translator.py:85-229). */
class ConstraintDiscoverySpec extends SparkSpec {

  private val url = "jdbc:derby:memory:consdb;create=true"
  private val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
  private val tables = Seq("REGION", "NATION", "PARTSUPP", "LINEITEM")

  private lazy val setup: Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("""CREATE TABLE region (
        r_regionkey INT NOT NULL, r_name VARCHAR(25),
        CONSTRAINT region_pk PRIMARY KEY (r_regionkey))""")
      st.execute("""CREATE TABLE nation (
        n_nationkey INT NOT NULL, n_name VARCHAR(25) NOT NULL, n_regionkey INT NOT NULL,
        CONSTRAINT nation_pk PRIMARY KEY (n_nationkey),
        CONSTRAINT nation_name_uq UNIQUE (n_name),
        CONSTRAINT nation_region_fk FOREIGN KEY (n_regionkey) REFERENCES region (r_regionkey))""")
      st.execute("""CREATE TABLE partsupp (
        ps_partkey INT NOT NULL, ps_suppkey INT NOT NULL,
        CONSTRAINT partsupp_pk PRIMARY KEY (ps_partkey, ps_suppkey))""")
      st.execute("""CREATE TABLE lineitem (
        l_orderkey INT NOT NULL, l_partkey INT NOT NULL, l_suppkey INT NOT NULL,
        CONSTRAINT lineitem_ps_fk FOREIGN KEY (l_partkey, l_suppkey)
          REFERENCES partsupp (ps_partkey, ps_suppkey),
        CONSTRAINT lineitem_key_ck CHECK (l_orderkey > 0))""")
      st.close()
    } finally conn.close()
  }

  private def discovered: Map[String, Seq[ConstraintMeta]] = {
    setup
    ConstraintDiscovery.discover(spark,
      new JdbcMetadataCatalog(url, "APP", tables), "APP")
  }

  test("PK and UNIQUE discovered via the 2-way catalog join") {
    val nation = discovered("nation")
    val pk = nation.find(_.constraintType == "PRIMARY KEY").get
    assert(pk.name == "nation_pk" && pk.columns == Seq("n_nationkey"))
    val uq = nation.find(_.constraintType == "UNIQUE").get
    assert(uq.name == "nation_name_uq" && uq.columns == Seq("n_name"))
    // composite PK keeps ordinal order
    val psPk = discovered("partsupp").find(_.constraintType == "PRIMARY KEY").get
    assert(psPk.columns == Seq("ps_partkey", "ps_suppkey"))
  }

  test("FKs discovered via the 3-way join, composite columns pairwise aligned") {
    val fk = discovered("nation").find(_.constraintType == "FOREIGN KEY").get
    assert(fk.name == "nation_region_fk")
    assert(fk.columns == Seq("n_regionkey"))
    assert(fk.referencedTable.contains("region"))
    assert(fk.referencedColumns == Seq("r_regionkey"))

    val cfk = discovered("lineitem").find(_.constraintType == "FOREIGN KEY").get
    assert(cfk.columns == Seq("l_partkey", "l_suppkey"))
    assert(cfk.referencedTable.contains("partsupp"))
    assert(cfk.referencedColumns == Seq("ps_partkey", "ps_suppkey"))
  }

  test("CHECK constraints discovered with their clause text (discovery.py:276-287)") {
    val ck = discovered("lineitem").find(_.constraintType == "CHECK").get
    assert(ck.name == "lineitem_key_ck")
    // Derby stores the clause text as written (parenthesization may vary)
    assert(ck.checkClause.exists(_.toLowerCase.contains("l_orderkey")), ck.checkClause)
    // the discovered clause is directly evaluable by the Validator layer
    import org.apache.spark.sql.functions.expr
    val data = spark.range(1, 5).selectExpr("id AS l_orderkey")
    assert(data.filter(expr(ck.checkClause.get)).count() === 4)
  }

  test("discover → enrich → generateSchemaDdl emits PK/FK/UNIQUE from the live catalog") {
    setup
    val cons = discovered
    val metas = tables.map { t =>
      val df = new JdbcSource(url, opts).read(spark, t)
      ConstraintDiscovery.enrich(TableMeta.fromDataFrame(t, "app", df), cons)
    }
    val ddl = DdlGenerator.generateSchemaDdl("app", metas)
    val all = ddl.mkString("\n")
    assert(all.contains("PRIMARY KEY (\"n_nationkey\")"), all)
    assert(all.contains("CONSTRAINT \"nation_name_uq\" UNIQUE (\"n_name\")"), all)
    assert(all.contains("ADD CONSTRAINT \"nation_region_fk\" FOREIGN KEY (\"n_regionkey\") " +
      "REFERENCES \"app\".\"region\" (\"r_regionkey\")"), all)
    assert(all.contains("PRIMARY KEY (\"ps_partkey\", \"ps_suppkey\")"), all)
    assert(all.contains("CONSTRAINT \"lineitem_key_ck\" CHECK"), all)
    // FK topo order: referenced tables created before referencing ones
    val creates = ddl.filter(_.startsWith("CREATE TABLE"))
    assert(creates.indexWhere(_.contains("\"region\"")) <
      creates.indexWhere(_.contains("\"nation\"")), creates.mkString("\n"))
  }

  test("information-schema path through JdbcSource matches the metadata path") {
    setup
    // Derby has no INFORMATION_SCHEMA, so mirror the three ANSI relations
    // into a user schema and read them back through the production
    // JdbcSource → Spark-join path (schemaPrefix override).
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE SCHEMA INFO_TEST")
      st.execute("""CREATE TABLE INFO_TEST.TABLE_CONSTRAINTS (
        CONSTRAINT_NAME VARCHAR(128), CONSTRAINT_TYPE VARCHAR(32),
        TABLE_SCHEMA VARCHAR(128), TABLE_NAME VARCHAR(128))""")
      st.execute("""CREATE TABLE INFO_TEST.KEY_COLUMN_USAGE (
        CONSTRAINT_NAME VARCHAR(128), TABLE_SCHEMA VARCHAR(128),
        TABLE_NAME VARCHAR(128), COLUMN_NAME VARCHAR(128), ORDINAL_POSITION INT)""")
      st.execute("""CREATE TABLE INFO_TEST.REFERENTIAL_CONSTRAINTS (
        CONSTRAINT_NAME VARCHAR(128), CONSTRAINT_SCHEMA VARCHAR(128),
        UNIQUE_CONSTRAINT_NAME VARCHAR(128), UNIQUE_CONSTRAINT_SCHEMA VARCHAR(128))""")
      val tc = Seq(
        ("nation_pk", "PRIMARY KEY", "APP", "NATION"),
        ("nation_name_uq", "UNIQUE", "APP", "NATION"),
        ("nation_region_fk", "FOREIGN KEY", "APP", "NATION"),
        ("region_pk", "PRIMARY KEY", "APP", "REGION"))
      tc.foreach { case (n, t, s, tb) =>
        st.execute(s"INSERT INTO INFO_TEST.TABLE_CONSTRAINTS VALUES ('$n','$t','$s','$tb')") }
      val kcu = Seq(
        ("nation_pk", "APP", "NATION", "N_NATIONKEY", 1),
        ("nation_name_uq", "APP", "NATION", "N_NAME", 1),
        ("nation_region_fk", "APP", "NATION", "N_REGIONKEY", 1),
        ("region_pk", "APP", "REGION", "R_REGIONKEY", 1))
      kcu.foreach { case (n, s, tb, c, p) =>
        st.execute(s"INSERT INTO INFO_TEST.KEY_COLUMN_USAGE VALUES ('$n','$s','$tb','$c',$p)") }
      st.execute("INSERT INTO INFO_TEST.REFERENTIAL_CONSTRAINTS VALUES " +
        "('nation_region_fk','APP','region_pk','APP')")
      st.close()
    } finally conn.close()

    val viaInfoSchema = ConstraintDiscovery.discover(spark,
      new InformationSchemaCatalog(url, opts, "INFO_TEST"), "APP")
    val nation = viaInfoSchema("nation")
    assert(nation.find(_.constraintType == "PRIMARY KEY").get.columns == Seq("n_nationkey"))
    assert(nation.find(_.constraintType == "UNIQUE").get.columns == Seq("n_name"))
    val fk = nation.find(_.constraintType == "FOREIGN KEY").get
    assert(fk.referencedTable.contains("region") && fk.referencedColumns == Seq("r_regionkey"))
    // agrees with what the live-metadata path found for the same tables
    val viaMeta = discovered
    assert(nation.toSet == viaMeta("nation").toSet)
  }

  test("inaccessible catalog degrades to no constraints, not a failure") {
    val out = ConstraintDiscovery.discover(spark,
      new InformationSchemaCatalog(url, opts, "NO_SUCH_SCHEMA"), "APP")
    assert(out.isEmpty)
  }
}
