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

  test("QUALIFY becomes a windowed subquery filter, tail ORDER BY stays outer") {
    assert(tr("SELECT a, b FROM t QUALIFY ROW_NUMBER() OVER (PARTITION BY a ORDER BY b) = 1 ORDER BY a") ===
      "SELECT * EXCEPT(__qualify) FROM (SELECT a, b, " +
        "(ROW_NUMBER() OVER (PARTITION BY a ORDER BY b) = 1) AS __qualify " +
        "FROM t) WHERE __qualify ORDER BY a")
  }

  test("QUALIFY with no trailing clause, with GROUP BY body, after a WITH prefix") {
    assert(tr("SELECT a FROM t QUALIFY rk = 1") ===
      "SELECT * EXCEPT(__qualify) FROM (SELECT a, (rk = 1) AS __qualify FROM t) WHERE __qualify")
    // GROUP BY stays inside the derived table with the window evaluation
    assert(tr("SELECT a, COUNT(*) c FROM t GROUP BY a QUALIFY RANK() OVER (ORDER BY COUNT(*)) <= 2") ===
      "SELECT * EXCEPT(__qualify) FROM (SELECT a, COUNT(*) c, " +
        "(RANK() OVER (ORDER BY COUNT(*)) <= 2) AS __qualify FROM t GROUP BY a) WHERE __qualify")
    val cte = tr("WITH c AS (SELECT a, b FROM t) SELECT a, b FROM c QUALIFY ROW_NUMBER() OVER (ORDER BY b) = 1")
    assert(cte.startsWith("WITH c AS (SELECT a, b FROM t) SELECT * EXCEPT(__qualify)"), cte)
  }

  test("QUALIFY inside a subquery rewrites independently of the outer query") {
    val in = "SELECT x FROM (SELECT a AS x FROM t QUALIFY ROW_NUMBER() OVER (ORDER BY a) <= 3) ORDER BY x"
    assert(tr(in) ===
      "SELECT x FROM (SELECT * EXCEPT(__qualify) FROM (SELECT a AS x, " +
        "(ROW_NUMBER() OVER (ORDER BY a) <= 3) AS __qualify FROM t) WHERE __qualify) ORDER BY x")
  }

  test("QUALIFY keyword inside a string literal is untouched") {
    assert(tr("SELECT 'QUALIFY x' AS s FROM t") === "SELECT 'QUALIFY x' AS s FROM t")
  }

  test("Snowflake datetime formats translate to Java patterns") {
    assert(tr("SELECT TO_TIMESTAMP(s, 'DD/MM/YYYY HH24:MI:SS')") ===
      "SELECT TO_TIMESTAMP(s, 'dd/MM/yyyy HH:mm:ss')")
    assert(tr("SELECT TO_DATE(s, 'MON DD, YYYY')") === "SELECT TO_DATE(s, 'MMM dd, yyyy')")
    assert(tr("SELECT TO_TIMESTAMP(s, 'YYYY-MM-DD HH12:MI AM')") ===
      "SELECT TO_TIMESTAMP(s, 'yyyy-MM-dd hh:mm a')")
    // fractional seconds: FF<n> → n fraction digits
    assert(tr("SELECT TO_TIMESTAMP(s, 'YYYY-MM-DD HH24:MI:SS.FF3')") ===
      "SELECT TO_TIMESTAMP(s, 'yyyy-MM-dd HH:mm:ss.SSS')")
    // an already-Java pattern (has lowercase) is never double-translated:
    // MI/mm are case-ambiguous, so lowercase means hands off
    assert(tr("SELECT TO_TIMESTAMP(s, 'dd/MM/yyyy HH:mm')") ===
      "SELECT TO_TIMESTAMP(s, 'dd/MM/yyyy HH:mm')")
  }

  test("TO_CHAR: 2-arg becomes DATE_FORMAT with translated pattern, 1-arg a cast") {
    assert(tr("SELECT TO_CHAR(ts, 'YYYY-MM-DD')") === "SELECT DATE_FORMAT(ts, 'yyyy-MM-dd')")
    assert(tr("SELECT TO_CHAR(n)") === "SELECT CAST(n AS STRING)")
    assert(tr("SELECT TO_VARCHAR(ts, 'HH24:MI')") === "SELECT DATE_FORMAT(ts, 'HH:mm')")
  }

  test("TO_CHAR: 9/0 numeric masks translate to the format composition") {
    // FM: no blank padding — the exact-string pin for the whole shape
    assert(tr("SELECT TO_CHAR(amount, 'FM9,999.99')") ===
      "SELECT CONCAT(CASE WHEN (amount) < 0 THEN '-' ELSE '' END, " +
        "FORMAT_NUMBER(CAST(ABS(amount) AS DECIMAL(38,2)), 2))")
    // grouped currency: '$' between sign and digits; sign-slot blank pad
    // is the non-truncating GREATEST(LENGTH, w+1) form
    val cur = tr("SELECT TO_CHAR(amount, '$9,999.99')")
    assert(cur.contains("'$', FORMAT_NUMBER(CAST(ABS(amount) AS DECIMAL(38,2)), 2)"))
    assert(cur.contains("), 10), ' ')") && cur.contains("GREATEST(LENGTH("))
    // leading-zero mask: zero-pad the 4 digit slots, then the sign slot
    val zp = tr("SELECT TO_CHAR(k, '0000')")
    assert(zp.contains("CAST(CAST(ABS(k) AS DECIMAL(38,0)) AS STRING)"))
    assert(zp.contains("), 4), '0')") && zp.contains("), 5), ' ')"))
    // mid-mask zero ('9990'): pad only from the first 0 slot (1 digit —
    // a no-op pad, but MUST not truncate wider values)
    assert(tr("SELECT TO_CHAR(k, '990')").contains("), 1), '0')"))
  }

  test("TO_CHAR: S/MI sign masks translate with the Oracle/Snowflake sign columns") {
    // leading S: explicit '+'/'-' always, blank-padded to digits+sign width
    val sLead = tr("SELECT TO_CHAR(amount, 'S9999')")
    assert(sLead.contains("CASE WHEN (amount) < 0 THEN '-' ELSE '+' END"))
    assert(sLead.contains("), 5), ' ')"), sLead) // 4 digit slots + sign column
    // trailing MI: '-' for negatives, SPACE for non-negatives, sign at END
    val mi = tr("SELECT TO_CHAR(amount, '9999MI')")
    assert(mi.contains("CASE WHEN (amount) < 0 THEN '-' ELSE ' ' END"))
    assert(mi.matches("(?s).*CONCAT\\(LPAD.*CASE WHEN \\(amount\\) < 0 THEN '-' ELSE ' ' END\\)$"),
      mi)
    // FM…MI: body unpadded and the non-negative space suppressed
    val fmMi = tr("SELECT TO_CHAR(amount, 'FM9,999.99MI')")
    assert(fmMi.contains("CASE WHEN (amount) < 0 THEN '-' ELSE '' END"))
    assert(!fmMi.contains("' ')"), fmMi)
    // trailing S: explicit sign at the end, always printed
    val sTrail = tr("SELECT TO_CHAR(amount, '9999S')")
    assert(sTrail.contains("CASE WHEN (amount) < 0 THEN '-' ELSE '+' END"))
    // S composes with $ and grouping
    val curS = tr("SELECT TO_CHAR(amount, 'S$9,999.99')")
    assert(curS.contains("'$', FORMAT_NUMBER(CAST(ABS(amount) AS DECIMAL(38,2)), 2)"))
    assert(curS.contains("CASE WHEN (amount) < 0 THEN '-' ELSE '+' END"))
  }

  test("TO_CHAR: X hex masks translate to the HEX composition") {
    // plain: uppercase hex, blank-padded to digits+sign width
    val hx = tr("SELECT TO_CHAR(k, 'XXXX')")
    assert(hx.contains("UPPER(HEX(CAST(ROUND(k) AS BIGINT)))"), hx)
    assert(hx.contains("), 5), ' ')"), hx)
    // negatives print the Oracle '#' overflow fill — hex has no sign
    assert(hx.contains("REPEAT('#', 5)"), hx)
    // FM: no blank pad; leading 0 slots zero-pad the digit count
    assert(!tr("SELECT TO_CHAR(k, 'FMXX')").contains("' ')"))
    val zp = tr("SELECT TO_CHAR(k, '0XXX')")
    assert(zp.contains("), 4), '0')"), zp)
  }

  test("TO_CHAR: masks outside the 9/0 family still fail loudly") {
    // zero-pad through a group separator is ambiguous — unsupported
    intercept[IllegalArgumentException](tr("SELECT TO_CHAR(amount, '0,000')"))
    // non-standard separator positions (round-9 advice): FORMAT_NUMBER can
    // only emit 3-digit grouping, so '99,99' / '9,9,9' would silently
    // produce DIFFERENT output than Snowflake — they must fail loudly too,
    // along with the malformed trailing/double-comma shapes
    intercept[IllegalArgumentException](tr("SELECT TO_CHAR(amount, '99,99')"))
    intercept[IllegalArgumentException](tr("SELECT TO_CHAR(amount, '9,9,9')"))
    intercept[IllegalArgumentException](tr("SELECT TO_CHAR(amount, '9999,')"))
    intercept[IllegalArgumentException](tr("SELECT TO_CHAR(amount, '9,,999')"))
    // exponent/hex elements are not translated; S/MI are (round 10) but a
    // mask with TWO sign columns stays unsupported
    intercept[IllegalArgumentException](tr("SELECT TO_CHAR(amount, 'S9999MI')"))
    intercept[IllegalArgumentException](tr("SELECT TO_CHAR(amount, 'S9999S')"))
    // EEEE stays unsupported BY CHOICE: Java Formatter (HALF_UP) and C
    // printf (half-even) disagree on mantissa rounding ties, so a
    // translation could not be oracle-exact
    intercept[IllegalArgumentException](tr("SELECT TO_CHAR(amount, '9.99EEEE')"))
    // numeric elements built from datetime-lookalike letters: 'MI' is
    // Snowflake's trailing-minus sign, 'D' the decimal point, 'S' the
    // leading sign — a bare one must not silently become DATE_FORMAT
    intercept[IllegalArgumentException](tr("SELECT TO_CHAR(amount, 'MI')"))
    intercept[IllegalArgumentException](tr("SELECT TO_CHAR(amount, 'D')"))
    intercept[IllegalArgumentException](tr("SELECT TO_CHAR(amount, 'S')"))
    // while unambiguous datetime masks still translate: two-plus elements,
    // or one element next to a separator
    assert(tr("SELECT TO_CHAR(ts, 'YYYY')") === "SELECT DATE_FORMAT(ts, 'yyyy')")
    assert(tr("SELECT TO_CHAR(ts, 'HH24:MI')") === "SELECT DATE_FORMAT(ts, 'HH:mm')")
    assert(tr("SELECT TO_CHAR(ts, 'MON YYYY')") === "SELECT DATE_FORMAT(ts, 'MMM yyyy')")
    // a SINGLE unambiguous token also translates (round-5 advice: only 'MI'
    // doubles as a numeric-mask element; 'MM'/'MON'/'DD'/'HH24' never do, so
    // rejecting them was a coverage regression)
    assert(tr("SELECT TO_CHAR(ts, 'MM')") === "SELECT DATE_FORMAT(ts, 'MM')")
    assert(tr("SELECT TO_CHAR(ts, 'MON')") === "SELECT DATE_FORMAT(ts, 'MMM')")
    assert(tr("SELECT TO_CHAR(ts, 'DD')") === "SELECT DATE_FORMAT(ts, 'dd')")
    assert(tr("SELECT TO_CHAR(ts, 'HH24')") === "SELECT DATE_FORMAT(ts, 'HH')")
    // datetime masks keep translating
    assert(tr("SELECT TO_CHAR(ts, 'DD/MM/YYYY HH24:MI')") ===
      "SELECT DATE_FORMAT(ts, 'dd/MM/yyyy HH:mm')")
    // single-hit acceptance requires the WHOLE mask to scan as datetime
    // tokens: a format merely CONTAINING a token must keep failing loudly
    // ('MONTH' ⊃ MON, 'DDD' ⊃ DD would otherwise translate into patterns
    // with quoted stray letters)
    assertThrows[IllegalArgumentException](tr("SELECT TO_CHAR(ts, 'MONTH')"))
    assertThrows[IllegalArgumentException](tr("SELECT TO_CHAR(ts, 'DDD')"))
    // Snowflake bare HH aliases HH12, not Java's 24-hour HH
    assert(tr("SELECT TO_CHAR(ts, 'HH')") === "SELECT DATE_FORMAT(ts, 'hh')")
    assert(tr("SELECT TO_CHAR(ts, 'HH12')") === "SELECT DATE_FORMAT(ts, 'hh')")
  }

  test("TRY_TO_DATE/TRY_TO_TIMESTAMP translate with null-on-failure semantics") {
    // TRY_TO_TIMESTAMP is native Spark (≥3.5); formats translate like
    // TO_TIMESTAMP's. TRY_TO_DATE has no Spark twin → date-cast wrapper.
    assert(tr("SELECT TRY_TO_TIMESTAMP(s, 'DD/MM/YYYY HH24:MI')") ===
      "SELECT TRY_TO_TIMESTAMP(s, 'dd/MM/yyyy HH:mm')")
    assert(tr("SELECT TRY_TO_TIMESTAMP(s)") === "SELECT TRY_TO_TIMESTAMP(s)")
    assert(tr("SELECT TRY_TO_TIMESTAMP_NTZ(s)") === "SELECT TRY_TO_TIMESTAMP(s)")
    assert(tr("SELECT TRY_TO_DATE(s, 'DD/MM/YYYY')") ===
      "SELECT CAST(TRY_TO_TIMESTAMP(s, 'dd/MM/yyyy') AS DATE)")
    assert(tr("SELECT TRY_TO_DATE(s)") === "SELECT CAST(TRY_TO_TIMESTAMP(s) AS DATE)")
    // the TRY_TO_NUMBER loud-failure discipline: a non-datetime mask throws
    // at translation time instead of quietly yielding an all-NULL column
    intercept[IllegalArgumentException](tr("SELECT TRY_TO_DATE(s, '$999.99')"))
    intercept[IllegalArgumentException](tr("SELECT TRY_TO_TIMESTAMP(s, 'MI')"))
  }

  test("DECODE becomes a null-safe searched CASE") {
    assert(tr("SELECT DECODE(x, 1, 'a', 2, 'b', 'z') FROM t") ===
      "SELECT CASE WHEN (x <=> 1) THEN 'a' WHEN (x <=> 2) THEN 'b' ELSE 'z' END FROM t")
    // no default → no ELSE (CASE yields NULL, same as Snowflake)
    assert(tr("SELECT DECODE(x, 1, 'a') FROM t") ===
      "SELECT CASE WHEN (x <=> 1) THEN 'a' END FROM t")
    // NULL search value must match via <=>, not silently never-match
    assert(tr("SELECT DECODE(x, NULL, 'missing', x)") ===
      "SELECT CASE WHEN (x <=> NULL) THEN 'missing' ELSE x END")
    // nested calls in arguments rewrite recursively
    assert(tr("SELECT DECODE(NVL(x, 0), 0, IFF(y, 'a', 'b'), 'z')") ===
      "SELECT CASE WHEN (COALESCE(x, 0) <=> 0) THEN CASE WHEN y THEN 'a' ELSE 'b' END ELSE 'z' END")
  }

  test("REGEXP_SUBSTR 2-arg maps to REGEXP_EXTRACT group 0; other arities fail") {
    assert(tr("SELECT REGEXP_SUBSTR(s, '[A-Z]+') FROM t") ===
      "SELECT REGEXP_EXTRACT(s, '[A-Z]+', 0) FROM t")
    intercept[IllegalArgumentException](tr("SELECT REGEXP_SUBSTR(s, 'x', 2)"))
  }

  test("OBJECT_CONSTRUCT becomes TO_JSON(NAMED_STRUCT(...)); star form fails") {
    assert(tr("SELECT OBJECT_CONSTRUCT('k', v, 'n', 1) FROM t") ===
      "SELECT TO_JSON(NAMED_STRUCT('k', v, 'n', 1)) FROM t")
    intercept[IllegalArgumentException](tr("SELECT OBJECT_CONSTRUCT(*) FROM t"))
    intercept[IllegalArgumentException](tr("SELECT OBJECT_CONSTRUCT('k') FROM t"))
  }

  test("ILIKE is native Spark SQL and passes through untouched") {
    assert(tr("SELECT a FROM t WHERE name ILIKE '%urgent%'") ===
      "SELECT a FROM t WHERE name ILIKE '%urgent%'")
  }

  test("VARIANT colon paths become get_json_object") {
    assert(tr("SELECT payload:user.name FROM events") ===
      "SELECT get_json_object(payload, '$.user.name') FROM events")
    assert(tr("SELECT e.props:items[0].id FROM events e") ===
      "SELECT get_json_object(e.props, '$.items[0].id') FROM events e")
    // composes with the cast rewrite
    assert(tr("SELECT props:k::NUMBER AS k FROM events") ===
      "SELECT get_json_object(props, '$.k')::DECIMAL(38,18) AS k FROM events")
    // quoted path segment loses its quotes inside the JSON path
    assert(tr("""SELECT props:"weird key" FROM t""") ===
      "SELECT get_json_object(props, '$.weird key') FROM t")
    // colons inside strings and the :: operator are untouched
    assert(tr("SELECT '10:30' AS t, x::STRING FROM t") ===
      "SELECT '10:30' AS t, x::STRING FROM t")
  }

  test("LISTAGG WITHIN GROUP is native Spark 4 and passes through") {
    assert(tr("SELECT LISTAGG(x, ',') WITHIN GROUP (ORDER BY x) FROM t") ===
      "SELECT LISTAGG(x, ',') WITHIN GROUP (ORDER BY x) FROM t")
  }

  test("QUALIFY in set operations: binds to its own branch, tail operator stays outside") {
    assert(tr("SELECT a FROM t QUALIFY rk = 1 UNION SELECT b FROM u") ===
      "SELECT * EXCEPT(__qualify) FROM (SELECT a, (rk = 1) AS __qualify FROM t) " +
        "WHERE __qualify UNION SELECT b FROM u")
    assert(tr("SELECT a FROM t UNION SELECT b FROM u QUALIFY rk = 1") ===
      "SELECT a FROM t UNION SELECT * EXCEPT(__qualify) FROM " +
        "(SELECT b, (rk = 1) AS __qualify FROM u) WHERE __qualify")
    // QUALIFY in BOTH branches: fixpoint rewrites every one
    val both = tr("SELECT a FROM t QUALIFY r = 1 UNION SELECT b FROM u QUALIFY s = 2")
    assert(!both.matches("(?s).*\\bQUALIFY\\b.*"), both)
    assert(both.contains("(r = 1) AS __qualify") && both.contains("(s = 2) AS __qualify"), both)
  }

  test("FLATTEN with outer => TRUE and extra options; literals untouched") {
    assert(tr("SELECT f.value FROM t, LATERAL FLATTEN(input => arr, outer => TRUE) f") ===
      "SELECT f.value FROM t LATERAL VIEW POSEXPLODE_OUTER(arr) f AS index, value")
    // string literal containing the keyword is not mangled
    assert(tr("SELECT 'use LATERAL FLATTEN(input => x) here' AS hint FROM t") ===
      "SELECT 'use LATERAL FLATTEN(input => x) here' AS hint FROM t")
    // path/recursive/mode change the produced rows — must fail loudly,
    // never silently translate to a plain explode
    intercept[IllegalArgumentException] {
      tr("SELECT f.value FROM t, LATERAL FLATTEN(input => arr, path => 'items') f")
    }
    intercept[IllegalArgumentException] {
      tr("SELECT f.value FROM t, LATERAL FLATTEN(input => arr, recursive => TRUE) f")
    }
  }

  test("DATEADD 3-arg becomes TIMESTAMPADD; 2-arg passes through") {
    assert(tr("SELECT DATEADD('day', 30, d) FROM t") ===
      "SELECT TIMESTAMPADD(DAY, 30, d) FROM t")
    assert(tr("SELECT DATEADD('month', -1, TO_DATE(x)) FROM t") ===
      "SELECT TIMESTAMPADD(MONTH, -1, TO_DATE(x)) FROM t")
    assert(tr("SELECT DATEADD(d, 1) FROM t") === "SELECT DATEADD(d, 1) FROM t")
  }

  test("DATEADD/DATEDIFF normalize Snowflake unit aliases; unknown units fail") {
    assert(tr("SELECT DATEADD('dd', 1, d) FROM t") ===
      "SELECT TIMESTAMPADD(DAY, 1, d) FROM t")
    assert(tr("SELECT DATEADD('mins', 5, ts) FROM t") ===
      "SELECT TIMESTAMPADD(MINUTE, 5, ts) FROM t")
    assert(tr("SELECT DATEDIFF('hrs', a, b) FROM t") ===
      "SELECT TIMESTAMPDIFF(HOUR, a, b) FROM t")
    assertThrows[IllegalArgumentException](tr("SELECT DATEADD('fortnight', 1, d) FROM t"))
  }

  test("ZEROIFNULL/NULLIFZERO become COALESCE/NULLIF") {
    assert(tr("SELECT ZEROIFNULL(x), NULLIFZERO(y) FROM t") ===
      "SELECT COALESCE(x, 0), NULLIF(y, 0) FROM t")
  }

  test("ARRAY_CONTAINS swaps to Spark's (array, value) order") {
    assert(tr("SELECT ARRAY_CONTAINS(x, arr) FROM t") ===
      "SELECT ARRAY_CONTAINS(arr, x) FROM t")
    assertThrows[IllegalArgumentException](tr("SELECT ARRAY_CONTAINS(arr) FROM t"))
  }

  test("EQUAL_NULL becomes the null-safe equality operator") {
    assert(tr("SELECT EQUAL_NULL(a, b) FROM t") === "SELECT (a <=> b) FROM t")
  }

  test("BOOLOR_AGG/BOOLAND_AGG become BOOL_OR/BOOL_AND") {
    assert(tr("SELECT BOOLOR_AGG(f), BOOLAND_AGG(g) FROM t") ===
      "SELECT BOOL_OR(f), BOOL_AND(g) FROM t")
  }

  test("DAYNAME/MONTHNAME become abbreviated DATE_FORMAT masks") {
    assert(tr("SELECT DAYNAME(d), MONTHNAME(d) FROM t") ===
      "SELECT DATE_FORMAT(d, 'EEE'), DATE_FORMAT(d, 'MMM') FROM t")
  }

  test("SQUARE becomes POWER(x, 2)") {
    assert(tr("SELECT SQUARE(x + 1) FROM t") === "SELECT POWER(x + 1, 2) FROM t")
  }

  test("GET(array, i) becomes 1-based ELEMENT_AT; object-key form fails") {
    assert(tr("SELECT GET(arr, 0) FROM t") === "SELECT ELEMENT_AT(arr, (0) + 1) FROM t")
    assert(tr("SELECT GET(arr, i + 1) FROM t") ===
      "SELECT ELEMENT_AT(arr, (i + 1) + 1) FROM t")
    assertThrows[IllegalArgumentException](tr("SELECT GET(obj, 'k') FROM t"))
  }

  test("TRY_TO_NUMBER becomes TRY_CAST to decimal; format form fails") {
    assert(tr("SELECT TRY_TO_NUMBER(x) FROM t") ===
      "SELECT TRY_CAST(x AS DECIMAL(38,0)) FROM t")
    assert(tr("SELECT TRY_TO_NUMBER(x, 10, 2) FROM t") ===
      "SELECT TRY_CAST(x AS DECIMAL(10,2)) FROM t")
    assertThrows[IllegalArgumentException](tr("SELECT TRY_TO_NUMBER(x, '$99.99') FROM t"))
  }

  test("CHARINDEX becomes LOCATE; LEN/ARRAY_SIZE rename") {
    assert(tr("SELECT CHARINDEX('-', s) FROM t") === "SELECT LOCATE('-', s) FROM t")
    assert(tr("SELECT CHARINDEX('-', s, 3) FROM t") === "SELECT LOCATE('-', s, 3) FROM t")
    assert(tr("SELECT LEN(s), ARRAY_SIZE(a) FROM t") === "SELECT LENGTH(s), SIZE(a) FROM t")
  }

  test("ARRAY_AGG WITHIN GROUP becomes sorted collect; foreign order key fails") {
    assert(tr("SELECT ARRAY_AGG(x) WITHIN GROUP (ORDER BY x) FROM t") ===
      "SELECT SORT_ARRAY(COLLECT_LIST(x)) FROM t")
    assert(tr("SELECT ARRAY_AGG(x) WITHIN GROUP (ORDER BY x DESC) FROM t") ===
      "SELECT SORT_ARRAY(COLLECT_LIST(x), false) FROM t")
    assert(tr("SELECT ARRAY_AGG(DISTINCT x) WITHIN GROUP (ORDER BY x ASC) FROM t") ===
      "SELECT SORT_ARRAY(COLLECT_SET(x)) FROM t")
    // DISTINCT separated by any whitespace, any case — a tab/newline or
    // doubled space must not leave the keyword embedded in the expression
    assert(tr("SELECT ARRAY_AGG(DISTINCT\tx) FROM t GROUP BY g") ===
      "SELECT COLLECT_SET(x) FROM t GROUP BY g")
    assert(tr("SELECT ARRAY_AGG(distinct  x) WITHIN GROUP (ORDER BY x) FROM t") ===
      "SELECT SORT_ARRAY(COLLECT_SET(x)) FROM t")
    assert(tr("SELECT ARRAY_AGG(DISTINCT\nx) FROM t GROUP BY g") ===
      "SELECT COLLECT_SET(x) FROM t GROUP BY g")
    // bare form: unordered collect
    assert(tr("SELECT ARRAY_AGG(x) FROM t GROUP BY g") ===
      "SELECT COLLECT_LIST(x) FROM t GROUP BY g")
    // ARRAY_TO_STRING renames to ARRAY_JOIN, composing with the rewrite
    assert(tr("SELECT ARRAY_TO_STRING(ARRAY_AGG(x) WITHIN GROUP (ORDER BY x), ',') FROM t") ===
      "SELECT ARRAY_JOIN(SORT_ARRAY(COLLECT_LIST(x)), ',') FROM t")
    // ordering by a different key has no lossless rewrite — loud failure,
    // never a silently dropped ORDER BY
    val e = intercept[IllegalArgumentException](
      tr("SELECT ARRAY_AGG(x) WITHIN GROUP (ORDER BY y) FROM t"))
    assert(e.getMessage.contains("its own argument"), e.getMessage)
  }

  test("DIV0/DIV0NULL become zero-guarded CASE divisions") {
    assert(tr("SELECT DIV0(a, b) FROM t") ===
      "SELECT (CASE WHEN (b) = 0 THEN 0 ELSE (a) / (b) END) FROM t")
    assert(tr("SELECT DIV0NULL(a, b + 1) FROM t") ===
      "SELECT (CASE WHEN (b + 1) = 0 OR (b + 1) IS NULL THEN 0 ELSE (a) / (b + 1) END) FROM t")
  }

  test("TO_BOOLEAN/TRY_TO_BOOLEAN become BOOLEAN casts") {
    assert(tr("SELECT TO_BOOLEAN(f) FROM t") === "SELECT CAST(f AS BOOLEAN) FROM t")
    assert(tr("SELECT TRY_TO_BOOLEAN(f) FROM t") === "SELECT TRY_CAST(f AS BOOLEAN) FROM t")
  }

  test("ARRAY_SLICE/ARRAY_CAT/ARRAY_COMPACT rewrite to SLICE/CONCAT/FILTER") {
    assert(tr("SELECT ARRAY_SLICE(arr, 1, 3) FROM t") ===
      "SELECT SLICE(arr, (1) + 1, (3) - (1)) FROM t")
    assert(tr("SELECT ARRAY_CAT(a, b) FROM t") === "SELECT CONCAT(a, b) FROM t")
    assert(tr("SELECT ARRAY_COMPACT(a) FROM t") ===
      "SELECT FILTER(a, x -> x IS NOT NULL) FROM t")
  }

  test("STRTOK splits on a character set, collapses empties, NULLs out-of-range") {
    assert(tr("SELECT STRTOK(s, '-', 2) FROM t") ===
      "SELECT TRY_ELEMENT_AT(FILTER(SPLIT(s, '[\\\\-]'), x -> x != ''), 2) FROM t")
    assert(tr("SELECT STRTOK(s) FROM t") ===
      "SELECT TRY_ELEMENT_AT(FILTER(SPLIT(s, '[ ]'), x -> x != ''), 1) FROM t")
    // regex metacharacters in the delimiter set are escaped
    assert(tr("SELECT STRTOK(s, '.^', 1) FROM t")
      .contains("SPLIT(s, '[.\\\\^]')"))
    // non-literal delimiter cannot build the char class at translate time
    assertThrows[IllegalArgumentException](tr("SELECT STRTOK(s, d, 1) FROM t"))
  }

  test("PARSE_JSON is identity; OBJECT_KEYS becomes JSON_OBJECT_KEYS") {
    assert(tr("SELECT OBJECT_KEYS(PARSE_JSON(js)) FROM t") ===
      "SELECT JSON_OBJECT_KEYS((js)) FROM t")
  }

  test("RATIO_TO_REPORT becomes a double-quotient window share") {
    assert(tr("SELECT RATIO_TO_REPORT(x) OVER (PARTITION BY g) FROM t") ===
      "SELECT (CAST((x) AS DOUBLE) / CAST(SUM(x) OVER (PARTITION BY g) AS DOUBLE)) FROM t")
    assertThrows[IllegalArgumentException](tr("SELECT RATIO_TO_REPORT(x) FROM t"))
  }

  test("TIMEADD/TIMESTAMPADD/TIMEDIFF/TIMESTAMPDIFF synonyms normalize quoted units") {
    assert(tr("SELECT TIMEADD('day', 30, d) FROM t") ===
      "SELECT TIMESTAMPADD(DAY, 30, d) FROM t")
    assert(tr("SELECT TIMESTAMPADD('hh', 12, d) FROM t") ===
      "SELECT TIMESTAMPADD(HOUR, 12, d) FROM t")
    assert(tr("SELECT TIMEDIFF('mins', a, b) FROM t") ===
      "SELECT TIMESTAMPDIFF(MINUTE, a, b) FROM t")
    // already-Spark bare unit passes through the same normalization
    assert(tr("SELECT TIMESTAMPDIFF('mon', a, b) FROM t") ===
      "SELECT TIMESTAMPDIFF(MONTH, a, b) FROM t")
    // nested calls translate inside the argument list
    assert(tr("SELECT TIMESTAMPDIFF('day', d, TIMEADD('mon', 1, d)) FROM t") ===
      "SELECT TIMESTAMPDIFF(DAY, d, TIMESTAMPADD(MONTH, 1, d)) FROM t")
  }

  test("TO_NUMBER/TO_DECIMAL/TO_DOUBLE become erroring casts; format strings fail loudly") {
    assert(tr("SELECT TO_NUMBER(x) FROM t") ===
      "SELECT CAST(x AS DECIMAL(38,0)) FROM t")
    assert(tr("SELECT TO_DECIMAL(x, 18, 2) FROM t") ===
      "SELECT CAST(x AS DECIMAL(18,2)) FROM t")
    assert(tr("SELECT TO_NUMERIC(x, 10) FROM t") ===
      "SELECT CAST(x AS DECIMAL(10,0)) FROM t")
    assert(tr("SELECT TO_DOUBLE(x) FROM t") === "SELECT CAST(x AS DOUBLE) FROM t")
    assert(tr("SELECT TRY_TO_DOUBLE(x) FROM t") ===
      "SELECT TRY_CAST(x AS DOUBLE) FROM t")
    assertThrows[IllegalArgumentException](tr("SELECT TO_NUMBER(x, '$99.99') FROM t"))
    assertThrows[IllegalArgumentException](tr("SELECT TO_DOUBLE(x, 'fmt') FROM t"))
  }

  test("LATERAL FLATTEN becomes LATERAL VIEW POSEXPLODE") {
    assert(tr("SELECT f.value FROM t, LATERAL FLATTEN(input => split(tags, ',')) f") ===
      "SELECT f.value FROM t LATERAL VIEW POSEXPLODE(split(tags, ',')) f AS index, value")
    // TABLE(FLATTEN(...)) form, AS-alias, and a trailing WHERE
    assert(tr("SELECT d.index, d.value FROM t, TABLE(FLATTEN(input => arr)) AS d WHERE d.value > 1") ===
      "SELECT d.index, d.value FROM t LATERAL VIEW POSEXPLODE(arr) d AS index, value WHERE d.value > 1")
    // no alias: default f; keyword after the call is not eaten
    assert(tr("SELECT value FROM t, LATERAL FLATTEN(input => arr) WHERE value > 0") ===
      "SELECT value FROM t LATERAL VIEW POSEXPLODE(arr) f AS index, value WHERE value > 0")
    // two flattens in one statement both rewrite
    val two = tr("SELECT a.value, b.value FROM t, LATERAL FLATTEN(input => x) a, LATERAL FLATTEN(input => y) b")
    assert(two.contains("POSEXPLODE(x) a AS index, value") &&
      two.contains("POSEXPLODE(y) b AS index, value"), two)
  }

  test("string INSERT becomes ANSI OVERLAY; statement INSERT INTO is untouched") {
    assert(tr("SELECT INSERT(s, 9, 0, '/') FROM t") ===
      "SELECT OVERLAY(s PLACING '/' FROM 9 FOR 0) FROM t")
    assertThrows[IllegalArgumentException](tr("SELECT INSERT(s, 1) FROM t"))
    // no parenthesis after INSERT → the identifier passes through untouched
    assert(tr("INSERT INTO tgt SELECT * FROM t") === "INSERT INTO tgt SELECT * FROM t")
  }

  test("PIVOT aliases each IN literal; non-literal values fail loudly") {
    assert(tr("SELECT * FROM t PIVOT (MIN(v) FOR seg IN ('A-B', 'C'))") ===
      "SELECT * FROM t PIVOT (MIN(v) FOR seg IN ('A-B' AS A_B, 'C' AS C))")
    assertThrows[IllegalArgumentException](
      tr("SELECT * FROM t PIVOT (MIN(v) FOR seg IN (x))"))
    // UNPIVOT passes through untouched (the syntaxes coincide)
    assert(tr("SELECT * FROM t UNPIVOT (val FOR k IN (a, b))") ===
      "SELECT * FROM t UNPIVOT (val FOR k IN (a, b))")
  }

  test("CONDITIONAL_TRUE_EVENT becomes a ROWS-framed running CASE sum") {
    assert(tr("SELECT CONDITIONAL_TRUE_EVENT(x > 1) OVER (PARTITION BY g ORDER BY o) FROM t") ===
      "SELECT SUM(CASE WHEN (x > 1) THEN 1 ELSE 0 END) OVER (PARTITION BY g ORDER BY o " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) FROM t")
    assertThrows[IllegalArgumentException](
      tr("SELECT CONDITIONAL_TRUE_EVENT(x > 1) FROM t"))
  }
}
