package graft.ddl

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.meta.{ColumnMeta, ConstraintMeta, TableMeta}

class DdlGeneratorSpec extends AnyFunSuite {

  private def tbl(name: String, fks: Seq[String] = Nil): TableMeta =
    TableMeta(name, "s",
      columns = Seq(ColumnMeta("id", LongType, nullable = false, ordinal = 1)),
      primaryKey = Seq("id"),
      foreignKeys = fks.zipWithIndex.map { case (ref, i) =>
        ConstraintMeta(s"fk_${name}_$i", "FOREIGN KEY", Seq("id"), Some(ref), Seq("id"))
      })

  test("create table DDL shape") {
    val t = TableMeta("orders", "sales",
      columns = Seq(
        ColumnMeta("o_id", LongType, nullable = false, ordinal = 1),
        ColumnMeta("amount", DecimalType(12, 2), ordinal = 2),
        ColumnMeta("note", StringType, ordinal = 3, defaultValue = Some("''"))),
      primaryKey = Seq("o_id"),
      uniqueConstraints = Seq(ConstraintMeta("uq_note", "UNIQUE", Seq("note"))))
    val ddl = DdlGenerator.createTable(t)
    assert(ddl.contains("CREATE TABLE \"sales\".\"orders\""))
    assert(ddl.contains("\"o_id\" BIGINT NOT NULL"))
    assert(ddl.contains("\"amount\" NUMERIC(12,2)"))
    assert(ddl.contains("\"note\" TEXT DEFAULT ''"))
    assert(ddl.contains("PRIMARY KEY (\"o_id\")"))
    assert(ddl.contains("CONSTRAINT \"uq_note\" UNIQUE (\"note\")"))
  }

  test("FK topological sort puts referenced tables first") {
    val region = tbl("region")
    val nation = tbl("nation", Seq("region"))
    val customer = tbl("customer", Seq("nation"))
    val orders = tbl("orders", Seq("customer"))
    // worst-case input order
    val sorted = DdlGenerator.topoSort(Seq(orders, customer, nation, region)).map(_.name)
    assert(sorted.indexOf("region") < sorted.indexOf("nation"))
    assert(sorted.indexOf("nation") < sorted.indexOf("customer"))
    assert(sorted.indexOf("customer") < sorted.indexOf("orders"))
  }

  test("topo sort survives FK cycles") {
    val a = tbl("a", Seq("b"))
    val b = tbl("b", Seq("a"))
    val sorted = DdlGenerator.topoSort(Seq(a, b))
    assert(sorted.map(_.name).sorted === Seq("a", "b"))
  }

  test("comments escape quotes") {
    val t = TableMeta("t", "s",
      columns = Seq(ColumnMeta("c", StringType, comment = Some("it's quoted"), ordinal = 1)),
      comment = Some("table's comment"))
    val cs = DdlGenerator.comments(t)
    assert(cs.exists(_.contains("'table''s comment'")))
    assert(cs.exists(_.contains("'it''s quoted'")))
  }

  test("full schema DDL ordering: schema, tables, FKs, comments") {
    val region = tbl("region")
    val nation = tbl("nation", Seq("region"))
    val ddl = DdlGenerator.generateSchemaDdl("s", Seq(nation, region))
    assert(ddl.head.startsWith("CREATE SCHEMA"))
    val createIdx = ddl.zipWithIndex.filter(_._1.startsWith("CREATE TABLE")).map(_._2)
    val fkIdx = ddl.zipWithIndex.filter(_._1.startsWith("ALTER TABLE")).map(_._2)
    assert(createIdx.nonEmpty && fkIdx.nonEmpty)
    assert(createIdx.max < fkIdx.min) // all creates before any FK
  }
}
