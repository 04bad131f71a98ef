package graft.dialect

import org.scalatest.funsuite.AnyFunSuite

/** Dialect rewrite fidelity — the edge cases the reference's
  * `_parse_function_args` handles (view_procedure_translator.py:236-276):
  * nested calls, string literals containing commas/parens, quoted
  * identifiers. */
class SnowflakeDialectSpec extends AnyFunSuite {

  private def tr(sql: String) = SnowflakeDialect.translate(sql)

  test("IFF basic") {
    assert(tr("SELECT IFF(a > 1, 'x', 'y')") ===
      "SELECT CASE WHEN a > 1 THEN 'x' ELSE 'y' END")
  }

  test("IFF nested") {
    assert(tr("IFF(a, IFF(b, 1, 2), 3)") ===
      "CASE WHEN a THEN CASE WHEN b THEN 1 ELSE 2 END ELSE 3 END")
  }

  test("IFF with commas and parens inside string literals") {
    assert(tr("IFF(x = 'a,b(c', 'then,(', 'else)')") ===
      "CASE WHEN x = 'a,b(c' THEN 'then,(' ELSE 'else)' END")
  }

  test("IFF with escaped quote in literal") {
    assert(tr("IFF(name = 'O''Brien', 1, 0)") ===
      "CASE WHEN name = 'O''Brien' THEN 1 ELSE 0 END")
  }

  test("IFF with function-call args") {
    assert(tr("IFF(COALESCE(a, b) > f(x, y), g(1), 2)") ===
      "CASE WHEN COALESCE(a, b) > f(x, y) THEN g(1) ELSE 2 END")
  }

  test("NVL and IFNULL become COALESCE") {
    assert(tr("SELECT NVL(a, b), IFNULL(c, d)") ===
      "SELECT COALESCE(a, b), COALESCE(c, d)")
  }

  test("zero-arg timestamp functions") {
    assert(tr("SELECT CURRENT_TIMESTAMP(), GETDATE(), SYSDATE()") ===
      "SELECT CURRENT_TIMESTAMP, CURRENT_TIMESTAMP, CURRENT_TIMESTAMP")
  }

  test("SPLIT_TO_TABLE becomes EXPLODE(SPLIT(...))") {
    assert(tr("SELECT SPLIT_TO_TABLE(tags, ',')") ===
      "SELECT EXPLODE(SPLIT(tags, ','))")
  }

  test("3-arg DATEDIFF becomes TIMESTAMPDIFF; 2-arg passes through") {
    assert(tr("SELECT DATEDIFF('day', a, b)") === "SELECT TIMESTAMPDIFF(DAY, a, b)")
    assert(tr("SELECT datediff(month, x, y)") === "SELECT TIMESTAMPDIFF(MONTH, x, y)")
    // nested translated args
    assert(tr("SELECT DATEDIFF('day', TO_DATE('2020-01-01'), NVL(d, e))") ===
      "SELECT TIMESTAMPDIFF(DAY, TO_DATE('2020-01-01'), COALESCE(d, e))")
    // Spark's own 2-arg datediff is left untouched
    assert(tr("SELECT DATEDIFF(a, b)") === "SELECT DATEDIFF(a, b)")
  }

  test("cast suffix rewrites") {
    assert(tr("SELECT a::NUMBER, b::VARCHAR, c::STRING") ===
      "SELECT a::DECIMAL(38,18), b::STRING, c::STRING")
  }

  test("three-part names stripped only in FROM/JOIN") {
    assert(tr("SELECT x FROM MYDB.PUBLIC.ORDERS o JOIN \"DB\".\"S\".\"T\" t ON o.id = t.id") ===
      "SELECT x FROM orders o JOIN t t ON o.id = t.id")
    // expression-position dots untouched
    assert(tr("SELECT s.t.c FROM a.b.c") === "SELECT s.t.c FROM c")
  }

  test("keywords inside strings are not rewritten") {
    assert(tr("SELECT 'IFF(a,b,c)' AS s") === "SELECT 'IFF(a,b,c)' AS s")
    assert(tr("SELECT \"NVL\" FROM t") === "SELECT \"NVL\" FROM t")
  }

  test("case-insensitive function matching") {
    assert(tr("iff(a, 1, 2)") === "CASE WHEN a THEN 1 ELSE 2 END")
    assert(tr("nvl(a, b)") === "COALESCE(a, b)")
  }
}
