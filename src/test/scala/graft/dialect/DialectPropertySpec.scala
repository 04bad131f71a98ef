package graft.dialect

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Property-based checks (SURVEY §5.3): the dialect translator against
  * generated nested expressions with hostile literals, plus parser-backed
  * reference detection. */
class DialectPropertySpec extends AnyFunSuite {

  private def passes(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  private val ident: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)

  /** Random Snowflake-ish scalar expression: nested IFF/NVL, literals
    * containing commas, parens, and escaped quotes. */
  private def exprGen(depth: Int): Gen[String] =
    if (depth == 0)
      Gen.oneOf(
        ident,
        Gen.oneOf("a,b", "x(", ")y", "it''s", "IFF(a,b,c)").map(s => s"'$s'"))
    else Gen.frequency(
      2 -> exprGen(0),
      2 -> (for {
        c <- exprGen(depth - 1); t <- exprGen(depth - 1); f <- exprGen(depth - 1)
      } yield s"IFF($c, $t, $f)"),
      1 -> (for {
        a <- exprGen(depth - 1); b <- exprGen(depth - 1)
      } yield s"NVL($a, $b)"))

  test("IFF/NVL never survive translation outside string literals; parens stay balanced") {
    passes(Prop.forAll(exprGen(3)) { sql =>
      val out = SnowflakeDialect.translate(s"SELECT $sql")
      // strip string literals first: balance/keyword checks apply to code,
      // not to literal text like 'x(' that legitimately rides through
      val stripped = out.replaceAll("'([^']|'')*'", "''").toUpperCase
      !stripped.contains("IFF(") && !stripped.contains("NVL(") &&
        stripped.count(_ == '(') == stripped.count(_ == ')') &&
        (stripped.contains("CASE WHEN") ==
          sql.replaceAll("'([^']|'')*'", "''").toUpperCase.contains("IFF("))
    })
  }

  test("translation is idempotent on its own output") {
    passes(Prop.forAll(exprGen(3)) { sql =>
      val once = SnowflakeDialect.translate(s"SELECT $sql FROM t")
      SnowflakeDialect.translate(once) == once
    })
  }

  test("variant paths of any depth rewrite completely and idempotently") {
    val pathGen = Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, ident)).map(_.mkString("."))
    passes(Prop.forAll(ident, pathGen) { (base, path) =>
      val out = SnowflakeDialect.translate(s"SELECT $base:$path FROM t")
      out == s"SELECT get_json_object($base, '$$.$path') FROM t" &&
        SnowflakeDialect.translate(out) == out
    })
  }

  test("QUALIFY lifts into a __qualify filter for any predicate shape") {
    passes(Prop.forAll(ident, ident, Gen.oneOf("", " ORDER BY 1")) { (a, b, tail) =>
      val out = SnowflakeDialect.translate(
        s"SELECT $a FROM t QUALIFY ROW_NUMBER() OVER (ORDER BY $b) = 1$tail")
      out.startsWith("SELECT * EXCEPT(__qualify) FROM (SELECT") &&
        out.contains("WHERE __qualify") &&
        !out.matches("(?s).*\\bQUALIFY\\b.*") &&
        SnowflakeDialect.translate(out) == out
    })
  }
}

class DialectParserSpec extends SparkSpec {

  test("referencedTables walks UnresolvedRelations through CTEs and joins") {
    val refs = SnowflakeDialect.referencedTables(spark,
      """WITH x AS (SELECT * FROM sch_a.t1 JOIN t2 ON t1.id = t2.id)
        |SELECT * FROM x, sch_b.t3 WHERE EXISTS (SELECT 1 FROM t4)""".stripMargin)
    assert(refs.toSet === Set("sch_a.t1", "t2", "sch_b.t3", "t4"))
  }

  test("crossSchemaRefs flags only foreign-schema references") {
    val sql = "SELECT * FROM target.t1 JOIN other.t2 ON t1.id = t2.id JOIN t3 ON 1=1"
    assert(SnowflakeDialect.crossSchemaRefs(spark, sql, "target") === Seq("other.t2"))
  }
}
