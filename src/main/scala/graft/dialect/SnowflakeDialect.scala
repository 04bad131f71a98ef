package graft.dialect

import scala.annotation.tailrec

/** Snowflake-SQL → Spark-SQL dialect translation.
  *
  * Re-expresses the rewrite surface of the reference's view translator
  * (`snowflake_to_postgres/view_procedure_translator.py:14-341`) with Spark
  * SQL as the target dialect instead of PostgreSQL:
  *
  *   - `IFF(c, t, f)`          → `CASE WHEN c THEN t ELSE f END` (recursive,
  *     quote/paren-aware argument parsing — cf. `_parse_function_args`,
  *     view_procedure_translator.py:236-276)
  *   - `NVL(a,b)` / `IFNULL`   → `COALESCE(a,b)`
  *   - `GETDATE()` / `SYSDATE()` / `CURRENT_TIMESTAMP()` → `CURRENT_TIMESTAMP`
  *   - `SPLIT_TO_TABLE(c, d)`  → `EXPLODE(SPLIT(c, d))` (Snowflake's lone
  *     table function in scope; Spark's generator expression)
  *   - `x::NUMBER` / `::STRING` / `::VARCHAR` → Spark cast types
  *   - 3-part `"DB"."SCH"."TBL"` references → bare lowercase table names
  *     (cf. view_procedure_translator.py:82-91)
  *   - `QUALIFY <pred>` → windowed-column subquery + outer filter (Spark
  *     has no QUALIFY clause)
  *   - `TO_TIMESTAMP/TO_DATE(x, '<snowflake format>')` → Java pattern
  *     (`DD/MM/YYYY HH24:MI` → `dd/MM/yyyy HH:mm`); `TO_CHAR(ts, fmt)` →
  *     `DATE_FORMAT` (cf. view_procedure_translator.py:318-327)
  *   - `ILIKE` needs no rewrite — native in Spark ≥3.3 (pinned by spec)
  *   - `LATERAL FLATTEN(input => X)` / `TABLE(FLATTEN(...))` →
  *     `LATERAL VIEW POSEXPLODE(X) f AS index, value` (array mode)
  *   - VARIANT paths `col:a.b[0]` → `get_json_object(col, '$.a.b[0]')`;
  *     `LISTAGG … WITHIN GROUP` is native Spark ≥4.0 and passes through
  *   - `TRY_TO_TIMESTAMP(x[, fmt])` → native `TRY_TO_TIMESTAMP` (format
  *     elements translated); `TRY_TO_DATE` → `CAST(TRY_TO_TIMESTAMP AS DATE)`
  *   - `DECODE(e, s, r, …, d)` → null-safe searched CASE (`<=>`);
  *     `REGEXP_SUBSTR(s, p)` → `REGEXP_EXTRACT(s, p, 0)`;
  *     `OBJECT_CONSTRUCT('k', v, …)` → `TO_JSON(NAMED_STRUCT(…))`
  *
  * The translation is string-level (like the reference) but implemented with
  * a character scanner that respects single-quoted literals (with `''`
  * escapes) and double-quoted identifiers, not regexes over raw text.
  */
object SnowflakeDialect {

  def translate(sql: String): String = {
    var s = sql
    s = stripThreePartNames(s)
    s = rewriteQualify(s)
    s = rewriteLateralFlatten(s)
    s = rewriteFunctionCalls(s)
    s = rewriteVariantPaths(s)
    s = rewriteCasts(s)
    s
  }

  /** Snowflake VARIANT path access `col:a.b[0].c` →
    * `get_json_object(col, '$.a.b[0].c')`. Runs before the cast pass so
    * `payload:k::NUMBER` composes (`get_json_object(...)::NUMBER` →
    * decimal cast). Scanner-based: colons inside string literals (time
    * text like '10:30') and the `::` cast operator are never touched;
    * quoted path segments (`col:"Weird Key"`) lose their quotes inside
    * the JSON path. Qualified bases (`t.payload:k`) keep the qualifier. */
  private def rewriteVariantPaths(sql: String): String = {
    val out = new StringBuilder
    var i = 0
    val n = sql.length
    def isIdentChar(c: Char) = c.isLetterOrDigit || c == '_' || c == '$'
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'') { val j = skipString(sql, i); out.append(sql.substring(i, j)); i = j }
      else if (c == '"') { val j = skipQuotedIdent(sql, i); out.append(sql.substring(i, j)); i = j }
      else if (c == ':' && i + 1 < n && sql.charAt(i + 1) != ':' &&
        (i == 0 || sql.charAt(i - 1) != ':') &&
        out.nonEmpty && isIdentChar(out.last) &&
        (sql.charAt(i + 1).isLetter || sql.charAt(i + 1) == '_' || sql.charAt(i + 1) == '"')) {
        // scan the base identifier (possibly dotted) back off the output
        var b = out.length
        while (b > 0 && (isIdentChar(out.charAt(b - 1)) || out.charAt(b - 1) == '.')) b -= 1
        val base = out.substring(b)
        // parse the path: segments, quoted segments, [n] indexes
        var j = i + 1
        val path = new StringBuilder
        var done = false
        while (!done && j < n) {
          val ch = sql.charAt(j)
          if (isIdentChar(ch)) { path.append(ch); j += 1 }
          else if (ch == '"') {
            val e = skipQuotedIdent(sql, j); path.append(sql.substring(j + 1, e - 1)); j = e
          } else if (ch == '.' && j + 1 < n &&
            (sql.charAt(j + 1).isLetter || sql.charAt(j + 1) == '_' || sql.charAt(j + 1) == '"')) {
            path.append('.'); j += 1
          } else if (ch == '[') {
            var e = j + 1
            while (e < n && sql.charAt(e).isDigit) e += 1
            if (e < n && sql.charAt(e) == ']') { path.append(sql.substring(j, e + 1)); j = e + 1 }
            else done = true
          } else done = true
        }
        if (path.nonEmpty && base.nonEmpty) {
          out.delete(b, out.length)
          out.append(s"get_json_object($base, '$$.$path')")
          i = j
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** `, LATERAL FLATTEN(input => X) f` / `, TABLE(FLATTEN(input => X)) f`
    * → ` LATERAL VIEW POSEXPLODE(X) f AS index, value` — Snowflake's array
    * flatten as Spark's generator clause. `f.value`/`f.index` references
    * resolve unchanged (FLATTEN's VALUE/INDEX columns ↔ posexplode's).
    * Scope: array inputs (the overwhelmingly common case); FLATTEN's
    * OBJECT-mode KEY/PATH columns have no posexplode analogue and are
    * left to a view rewrite. */
  private def rewriteLateralFlatten(sql: String): String = {
    val pat = """(?is),?\s*(LATERAL\s+FLATTEN|TABLE\s*\(\s*FLATTEN)\s*\(""".r
    // skip matches inside string literals (the other passes scan; this one
    // pre-computes the literal spans and filters regex hits against them)
    val spans = stringSpans(sql)
    val m = pat.findAllMatchIn(sql)
      .find(mm => !spans.exists(s => mm.start >= s._1 && mm.start < s._2))
      .getOrElse(return sql)
    val isTableForm = m.group(1).toUpperCase.startsWith("TABLE")
    // args start at the '(' that ends the match
    val open = m.end - 1
    val (args, close) = parseArgs(sql, open)
    // FLATTEN(input => X [, path/outer/recursive/mode => …]): the input
    // arg drives the rewrite; OUTER => TRUE maps to POSEXPLODE_OUTER
    // (keep rows with empty/null arrays); other options pass unsupported
    val byKey = args.map(_.trim).map { a =>
      val kv = a.split("=>", 2)
      if (kv.length == 2) kv(0).trim.toUpperCase -> kv(1).trim else "INPUT" -> a
    }
    val input = byKey.collectFirst { case ("INPUT", v) => v }
      .getOrElse(throw new IllegalArgumentException(s"FLATTEN without input arg: ${m.matched}"))
    val outer = byKey.exists { case (k, v) => k == "OUTER" && v.equalsIgnoreCase("TRUE") }
    // PATH/RECURSIVE/MODE change which values come out — translating them
    // as a plain explode would run and silently return the wrong rows, so
    // fail loudly like the pre-option parser did
    val unsupported = byKey.map(_._1).filterNot(Set("INPUT", "OUTER"))
    if (unsupported.nonEmpty)
      throw new IllegalArgumentException(
        s"FLATTEN option(s) ${unsupported.mkString(", ")} have no Spark rewrite " +
          "(only input/outer are supported); restructure the view")
    val explodeFn = if (outer) "POSEXPLODE_OUTER" else "POSEXPLODE"
    // TABLE(FLATTEN(...)): skip the TABLE-wrapper's own ')'
    var i = close + 1
    if (isTableForm) {
      while (i < sql.length && sql.charAt(i).isWhitespace) i += 1
      require(i < sql.length && sql.charAt(i) == ')', "unclosed TABLE(FLATTEN(…))")
      i += 1
    }
    // optional [AS] alias
    var j = i
    while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
    var k = j
    while (k < sql.length && (sql.charAt(k).isLetterOrDigit || sql.charAt(k) == '_')) k += 1
    val keywords = Set("WHERE", "GROUP", "ORDER", "LIMIT", "QUALIFY", "HAVING",
      "JOIN", "ON", "LEFT", "RIGHT", "INNER", "FULL", "CROSS", "UNION", "SELECT")
    var alias = if (k > j) sql.substring(j, k) else ""
    if (alias.equalsIgnoreCase("AS")) {
      var j2 = k
      while (j2 < sql.length && sql.charAt(j2).isWhitespace) j2 += 1
      k = j2
      while (k < sql.length && (sql.charAt(k).isLetterOrDigit || sql.charAt(k) == '_')) k += 1
      alias = sql.substring(j2, k)
    }
    val aliasEnd =
      if (alias.isEmpty || keywords.contains(alias.toUpperCase)) { alias = "f"; i }
      else k
    val rewritten = sql.substring(0, m.start) +
      s" LATERAL VIEW $explodeFn(${rewriteLateralFlatten(input)}) $alias AS index, value" +
      sql.substring(aliasEnd)
    rewriteLateralFlatten(rewritten) // additional FLATTENs later in the text
  }

  /** [start, end) spans of single-quoted literals and double-quoted
    * identifiers — for passes that pre-filter regex hits. */
  private def stringSpans(sql: String): Seq[(Int, Int)] = {
    val spans = Seq.newBuilder[(Int, Int)]
    var i = 0
    while (i < sql.length) {
      sql.charAt(i) match {
        case '\'' => val j = skipString(sql, i); spans += i -> j; i = j
        case '"' => val j = skipQuotedIdent(sql, i); spans += i -> j; i = j
        case _ => i += 1
      }
    }
    spans.result()
  }

  /** Table references of a translated statement, via Catalyst's parser
    * (parse → walk `UnresolvedRelation`s) — robust against strings/comments
    * where regex scanning isn't. Descends into CTE definitions and subquery
    * expressions; CTE names themselves are excluded from the result. */
  def referencedTables(spark: org.apache.spark.sql.SparkSession, sql: String): Seq[String] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnresolvedWith}

    val refs = scala.collection.mutable.LinkedHashSet[String]()
    val cteNames = scala.collection.mutable.Set[String]()

    def walk(plan: LogicalPlan): Unit =
      plan.foreach { node =>
        node match {
          case w: UnresolvedWith =>
            w.cteRelations.foreach { case (name, sub, _) =>
              cteNames += name.toLowerCase
              walk(sub)
            }
          case r: UnresolvedRelation =>
            refs += r.multipartIdentifier.mkString(".")
          case _ => ()
        }
        node.expressions.foreach(_.foreach {
          case sq: SubqueryExpression => walk(sq.plan)
          case _ => ()
        })
      }

    walk(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.sqlParser.parsePlan(sql))
    refs.toSeq.filterNot(r => !r.contains('.') && cteNames.contains(r.toLowerCase))
  }

  /** Cross-schema dependency detection (view_procedure_translator.py:122-144):
    * references that carry a qualifier other than `targetSchema`. */
  def crossSchemaRefs(spark: org.apache.spark.sql.SparkSession, sql: String,
                      targetSchema: String): Seq[String] =
    referencedTables(spark, sql).filter { ref =>
      val parts = ref.split('.')
      parts.length > 1 && !parts.dropRight(1).last.equalsIgnoreCase(targetSchema)
    }

  /** `FROM "DB"."SCHEMA"."TBL"` / `JOIN DB.SCH.TBL` → lowercase bare `tbl`.
    * Scoped to FROM/JOIN clauses, as the reference scopes its db-prefix
    * strip to table references (view_procedure_translator.py:82-120). */
  private val threePart =
    """(?i)\b(FROM|JOIN)\s+"?([A-Za-z_][\w$]*)"?\."?([A-Za-z_][\w$]*)"?\."?([A-Za-z_][\w$]*)"?""".r

  private def stripThreePartNames(sql: String): String =
    threePart.replaceAllIn(sql, m =>
      java.util.regex.Matcher.quoteReplacement(s"${m.group(1)} ${m.group(4).toLowerCase}"))

  private val castMap: Seq[(String, String)] = Seq(
    "::NUMBER"  -> "::DECIMAL(38,18)",
    "::STRING"  -> "::STRING",
    "::VARCHAR" -> "::STRING",
    "::TEXT"    -> "::STRING")

  private def rewriteCasts(sql: String): String = {
    val pat = """(?i)::(NUMBER|STRING|VARCHAR|TEXT)\b""".r
    pat.replaceAllIn(sql, m => m.group(1).toUpperCase match {
      case "NUMBER" => "::DECIMAL(38,18)"
      case _        => "::STRING"
    })
  }

  /** `QUALIFY <pred>` → post-window filter (Spark has no QUALIFY clause;
    * `ILIKE`, by contrast, is native Spark and passes through untouched).
    * The standard expansion: the predicate becomes a boolean select-list
    * column evaluated with the window functions, then an outer
    * `SELECT * EXCEPT(__qualify) ... WHERE __qualify` filters on it —
    * semantically QUALIFY's evaluation order (after window, before
    * ORDER BY/LIMIT). Applied recursively inside parenthesized subqueries;
    * the trailing top-level ORDER BY/LIMIT stays on the outer query. */
  private def rewriteQualify(sql: String): String = {
    // recurse into parenthesized blocks first (subqueries, CTE bodies)
    val out = new StringBuilder
    var i = 0
    while (i < sql.length) {
      sql.charAt(i) match {
        case '\'' => val j = skipString(sql, i); out.append(sql.substring(i, j)); i = j
        case '"'  => val j = skipQuotedIdent(sql, i); out.append(sql.substring(i, j)); i = j
        case '(' =>
          val close = matchParen(sql, i)
          out.append('(').append(rewriteQualify(sql.substring(i + 1, close))).append(')')
          i = close + 1
        case c => out.append(c); i += 1
      }
    }
    // fixpoint: a set operation may carry QUALIFY in several branches, and
    // one pass rewrites only the first
    var cur = out.toString
    var prev = ""
    while (cur != prev) { prev = cur; cur = rewriteTopLevelQualify(cur) }
    cur
  }

  /** Positions of depth-0 keywords outside quotes, in order. */
  private def topLevelKeywords(sql: String): Seq[(String, Int)] = {
    val hits = Seq.newBuilder[(String, Int)]
    var i = 0
    var depth = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'') i = skipString(sql, i)
      else if (c == '"') i = skipQuotedIdent(sql, i)
      else if (c == '(') { depth += 1; i += 1 }
      else if (c == ')') { depth -= 1; i += 1 }
      else if (c.isLetter || c == '_') {
        var j = i
        while (j < n && (sql.charAt(j).isLetterOrDigit || sql.charAt(j) == '_')) j += 1
        if (depth == 0) hits += sql.substring(i, j).toUpperCase -> i
        i = j
      } else i += 1
    }
    hits.result()
  }

  private def rewriteTopLevelQualify(sql: String): String = {
    val kws = topLevelKeywords(sql)
    val qualify = kws.find(_._1 == "QUALIFY").map(_._2).getOrElse(return sql)
    // the QUALIFY binds to the NEAREST preceding top-level SELECT — in a
    // set operation that is the branch the clause sits in, not the first
    val select = kws.filter { case (w, p) => w == "SELECT" && p < qualify }
      .lastOption.map(_._2)
      .getOrElse(throw new IllegalArgumentException(s"QUALIFY without SELECT in: $sql"))
    val from = kws.find { case (w, p) => w == "FROM" && p > select }.map(_._2)
      .getOrElse(throw new IllegalArgumentException(s"QUALIFY without FROM in: $sql"))
    // the predicate ends at the next top-level clause OR set operator — a
    // following UNION/INTERSECT/EXCEPT must stay outside the rewrite
    val tailKws = Set("ORDER", "LIMIT", "OFFSET", "FETCH",
      "UNION", "INTERSECT", "EXCEPT", "MINUS")
    val tail = kws.collectFirst {
      case (w, p) if tailKws.contains(w) && p > qualify => p
    }.getOrElse(sql.length)
    val prefix = sql.substring(0, select) // e.g. a WITH clause
    val selList = sql.substring(select + "SELECT".length, from).trim
    val body = sql.substring(from, qualify).trim
    val pred = sql.substring(qualify + "QUALIFY".length, tail).trim
    val tailSql = sql.substring(tail)
    val tailSep = if (tailSql.isEmpty) "" else " "
    s"${prefix}SELECT * EXCEPT(__qualify) FROM (SELECT $selList, ($pred) AS __qualify " +
      s"$body) WHERE __qualify$tailSep$tailSql"
  }

  /** Index of the ')' matching the '(' at `open`, respecting quotes. */
  private def matchParen(sql: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < sql.length) {
      sql.charAt(i) match {
        case '\'' => i = skipString(sql, i)
        case '"'  => i = skipQuotedIdent(sql, i)
        case '(' => depth += 1; i += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i
          i += 1
        case _ => i += 1
      }
    }
    throw new IllegalArgumentException(s"unbalanced parens at $open")
  }

  /** Snowflake datetime format → Java/Spark pattern
    * (view_procedure_translator.py:318-327 rewrites the same element table
    * for PostgreSQL). Only applied to all-uppercase formats — the Snowflake
    * convention — so an already-Java pattern (`dd/MM/yyyy HH:mm`) is never
    * double-translated (`MI`/`mm` are case-ambiguous otherwise). Unknown
    * letter runs are emitted single-quoted (pattern-literal text). */
  private[dialect] def translateDateFormat(fmt: String): String = {
    if (fmt.exists(_.isLower)) return fmt // already a Java pattern
    val out = new StringBuilder
    var i = 0
    val n = fmt.length
    val tokens: Seq[(String, String)] = Seq(
      "YYYY" -> "yyyy", "YY" -> "yy",
      "MMMM" -> "MMMM", "MON" -> "MMM", "MM" -> "MM",
      "DD" -> "dd",
      // Snowflake bare HH is an alias for HH12 (docs: "HH — hour 01-12"),
      // while Java bare HH is 24-hour — mapping HH→HH would silently turn
      // 3pm into "15" where Snowflake renders "03"
      "HH24" -> "HH", "HH12" -> "hh", "HH" -> "hh",
      "MI" -> "mm", "SS" -> "ss",
      "AM" -> "a", "PM" -> "a",
      "TZH" -> "x", "FF" -> "")
    while (i < n) {
      val c = fmt.charAt(i)
      if (c.isLetter) {
        tokens.find { case (tok, _) => fmt.regionMatches(i, tok, 0, tok.length) } match {
          case Some(("FF", _)) =>
            i += 2
            // FF<n> → n fraction digits; bare FF → 6 (Snowflake default FF9
            // is nanoseconds, beyond timestamp precision here)
            val digits = if (i < n && fmt.charAt(i).isDigit) { val d = fmt.charAt(i) - '0'; i += 1; d }
              else 6
            out.append("S" * digits)
          case Some((tok, rep)) => out.append(rep); i += tok.length
          case None =>
            var j = i
            while (j < n && fmt.charAt(j).isLetter &&
              !tokens.exists { case (tok, _) => fmt.regionMatches(j, tok, 0, tok.length) }) j += 1
            out.append('\'').append(fmt.substring(i, j)).append('\'')
            i = j
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Numeric TO_CHAR/TO_VARCHAR masks — the `[FM][$]` + 9/0 digit-slot
    * family (`9,999`, `0000`, `$9,999,999.99`, `FM…`), translated to a
    * FORMAT_NUMBER / LPAD / CONCAT composition (reference rewrite class:
    * `view_procedure_translator.py`'s function-replacement table).
    * Semantics follow the Oracle/Snowflake convention: output width =
    * mask width + 1 (the sign column), blank-padded on the left, `FM`
    * suppresses the blank padding, a leading-`0` integer mask zero-pads,
    * `,` groups thousands, and the fractional digit count fixes the
    * printed decimals. Rounding is HALF_UP via a DECIMAL(38, d) cast of
    * the ABSOLUTE value (sign re-attached after formatting), so the
    * DuckDB twin (`round(abs(x), d)`, half-away-from-zero — identical on
    * the positive operand) replays bit-for-bit. Documented divergences
    * from Oracle, chosen for a total translation: no `#` overflow fill
    * (a value wider than the mask prints at full width — the pads use
    * `LPAD(s, GREATEST(LENGTH(s), n))`, never the truncating plain LPAD),
    * and `FM` does not strip trailing fractional zeros.
    *
    * Sign-mask elements (round-10, common in financial exports):
    * leading `S` prints an explicit sign ALWAYS (`+` / `-`) in the sign
    * column; trailing `S` prints it after the digits; trailing `MI`
    * prints `-` for negatives and a SPACE for non-negatives (`FM…MI`
    * suppresses that space) — the Oracle/Snowflake conventions. A mask
    * with both a leading and a trailing sign element stays unsupported.
    *
    * Hex masks (round-10): `[FM][0…]X…` print the value rounded to an
    * integer in uppercase hex — Spark `HEX(BIGINT)` and DuckDB
    * `to_hex(BIGINT)` agree exactly (uppercase, no leading zeros), so the
    * translation is bit-replayable; leading `0` slots zero-pad to the
    * digit count, negatives print the Oracle `#` overflow fill (hex has
    * no sign rendering). `EEEE` stays unsupported BY CHOICE: scientific
    * notation needs correctly-rounded mantissa digits and Java's
    * Formatter (HALF_UP) and C printf (round-to-nearest-even) disagree on
    * ties, so a translation could not be oracle-exact — it fails loudly
    * instead of drifting. `B` and zero-pad + grouping combined also
    * return None and the caller fails loudly as before. */
  private val NumericMaskRe =
    "(?i)^(FM)?(S)?(\\$)?([09][09,]*)(\\.([09]+))?(S|MI)?$".r
  private val HexMaskRe = "(?i)^(FM)?(0*)(X+)$".r

  /** Grouped int masks must place separators at standard thousands
    * positions ('9,999,999') — FORMAT_NUMBER can only emit 3-digit
    * grouping, so a non-standard mask like '99,99' or '9,9,9' would
    * silently translate to DIFFERENT output than Snowflake/Oracle
    * produce. Reject those into the fail-loudly path instead
    * (round-9 advice). Ungrouped masks are unconstrained. */
  private val StdGroupingRe = "^[09]{1,3}(,[09]{3})*$".r

  private[dialect] def translateNumericMask(e: String, fmt: String): Option[String] =
    fmt match {
      case HexMaskRe(fm, zeros, xs) =>
        val ex = s"($e)"
        val digits = zeros.length + xs.length
        val body0 = s"UPPER(HEX(CAST(ROUND$ex AS BIGINT)))"
        val body =
          if (zeros.nonEmpty)
            s"LPAD($body0, GREATEST(LENGTH($body0), $digits), '0')"
          else body0
        val res =
          if (fm != null) body
          else s"LPAD($body, GREATEST(LENGTH($body), ${digits + 1}), ' ')"
        Some(s"CASE WHEN $ex < 0 THEN REPEAT('#', ${digits + 1}) ELSE $res END")
      case NumericMaskRe(fm, sLead, dollar, intPart, _, fracPart, signTrail)
          if (!intPart.contains(',') ||
             StdGroupingRe.pattern.matcher(intPart).matches()) &&
             !(sLead != null && signTrail != null) => // 'S999MI': two sign columns
        val ex = s"($e)"
        val d = Option(fracPart).map(_.length).getOrElse(0)
        val grouping = intPart.contains(',')
        val intDigits = intPart.filterNot(_ == ',')
        val firstZero = intDigits.indexOf('0')
        val padDigits = if (firstZero >= 0) intDigits.length - firstZero else 0
        if (grouping && padDigits > 0) None // '0,000': pad-through-separator
        else {
          // printed width of the UNSIGNED body: $ + int digits/commas + .frac
          // (sign handling adds its own column below — fmt.length would
          // count S/MI letters as body characters)
          val w = (if (dollar != null) 1 else 0) + intPart.length +
            (if (d > 0) d + 1 else 0)
          // non-truncating pad: plain LPAD CUTS a string longer than the
          // target, which would silently corrupt any value wider than its
          // mask — pad to max(length, n) instead (overflow prints whole)
          def pad(s: String, n: Int, ch: String) =
            s"LPAD($s, GREATEST(LENGTH($s), $n), '$ch')"
          val absDec = s"CAST(ABS$ex AS DECIMAL(38,$d))"
          val digits =
            if (grouping) s"FORMAT_NUMBER($absDec, $d)"
            else s"CAST($absDec AS STRING)"
          val padded =
            if (padDigits > 0)
              pad(digits, padDigits + (if (d > 0) d + 1 else 0), "0")
            else digits
          val dollarSql = if (dollar != null) "'$', " else ""
          if (signTrail == null) {
            // leading sign column: '-'/'' for the plain family, always
            // explicit '+'/'-' under a leading S
            val signCase =
              if (sLead != null) s"CASE WHEN $ex < 0 THEN '-' ELSE '+' END"
              else s"CASE WHEN $ex < 0 THEN '-' ELSE '' END"
            val signed = s"CONCAT($signCase, $dollarSql$padded)"
            Some(if (fm != null) signed else pad(signed, w + 1, " "))
          } else {
            // trailing sign column: body first (blank-padded to its own
            // width unless FM), then the sign character — MI prints a
            // space for non-negatives (suppressed by FM), S always prints
            val body = s"CONCAT($dollarSql$padded)"
            val lead = if (fm != null) body else pad(body, w, " ")
            val suffix =
              if (signTrail.equalsIgnoreCase("S"))
                s"CASE WHEN $ex < 0 THEN '-' ELSE '+' END"
              else if (fm != null) s"CASE WHEN $ex < 0 THEN '-' ELSE '' END"
              else s"CASE WHEN $ex < 0 THEN '-' ELSE ' ' END"
            Some(s"CONCAT($lead, $suffix)")
          }
        }
      case _ => None
    }

  /** True when a TO_CHAR/TO_VARCHAR format literal is a datetime mask —
    * it carries at least one recognized Snowflake datetime token (or is
    * already a Java pattern, which only datetime formats are here). A
    * numeric mask like `$999.99` or `FM9,990.00` matches none of these. */
  /** True when `fmt` scans completely as known datetime tokens (the
    * [[translateDateFormat]] table, longest-first, FF taking an optional
    * digit) and separator punctuation — i.e. translation would emit no
    * quoted-literal letter runs. 'MONTH' (MON + stray "TH") and 'DDD'
    * (DD + stray "D") fail this; 'HH12', 'YYYY-MM-DD' pass. */
  private def tokenizesCleanly(fmt: String): Boolean = {
    val toks = Seq("YYYY", "MMMM", "HH24", "HH12", "TZH", "MON", "YY",
      "MM", "DD", "HH", "MI", "SS", "AM", "PM", "FF")
    var i = 0
    val n = fmt.length
    while (i < n) {
      val c = fmt.charAt(i)
      if (c.isLetter) {
        toks.find(t => fmt.regionMatches(i, t, 0, t.length)) match {
          case Some("FF") =>
            i += 2
            if (i < n && fmt.charAt(i).isDigit) i += 1
          case Some(t) => i += t.length
          case None => return false
        }
      } else if ("-/:,. ".contains(c)) i += 1
      else return false
    }
    true
  }

  private[dialect] def isDatetimeFormat(fmt: String): Boolean = {
    val upper = fmt.toUpperCase
    val datetimeTokens =
      Seq("YYYY", "YY", "MON", "MM", "DD", "HH", "MI", "SS", "AM", "PM", "TZH", "FF")
    // '9'/'0'/'$' only occur in numeric masks — any of them decides
    if (fmt.exists(c => c == '9' || c == '0' || c == '$')) return false
    val hits = datetimeTokens.filter(upper.contains)
    // Of these tokens only 'MI' doubles as a Snowflake *numeric* mask
    // element (trailing minus sign); the numeric 'D'/'S'/'TM' elements are
    // never tokenized here ('DD'/'SS' are the datetime spellings). A
    // single hit is accepted only when the WHOLE mask scans as datetime
    // tokens + separators — substring hits inside something larger
    // ('MONTH' ⊃ MON, 'DDD' ⊃ DD) previously slipped through to
    // translateDateFormat, which quoted the stray letters into malformed
    // patterns. An 'MI'-only mask additionally needs a datetime separator
    // for corroboration; a bare 'MI' keeps failing loudly instead of
    // silently becoming DATE_FORMAT.
    hits.size >= 2 ||
      (hits.size == 1 && tokenizesCleanly(upper) &&
        (hits.head != "MI" || fmt.exists(c => "-/:,. ".contains(c))))
  }

  /** One pass over the SQL rewriting known function calls; recurses into
    * arguments so nested `IFF` translate fully. */
  private def rewriteFunctionCalls(sql: String): String = {
    val zeroArg = Map(
      "GETDATE"           -> "CURRENT_TIMESTAMP",
      "SYSDATE"           -> "CURRENT_TIMESTAMP",
      "CURRENT_TIMESTAMP" -> "CURRENT_TIMESTAMP")
    val renamed = Map(
      "NVL" -> "COALESCE", "IFNULL" -> "COALESCE",
      "LEN" -> "LENGTH", "ARRAY_SIZE" -> "SIZE",
      "ARRAY_TO_STRING" -> "ARRAY_JOIN")
    val datetimeFns = Set("TO_TIMESTAMP", "TO_TIMESTAMP_NTZ", "TO_DATE", "TO_CHAR", "TO_VARCHAR")
    def isStringLiteral(s: String): Boolean =
      s.length >= 2 && s.head == '\'' && s.last == '\''

    val out = new StringBuilder
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'') { val j = skipString(sql, i); out.append(sql.substring(i, j)); i = j }
      else if (c == '"') { val j = skipQuotedIdent(sql, i); out.append(sql.substring(i, j)); i = j }
      else if (c.isLetter || c == '_') {
        var j = i
        while (j < n && (sql.charAt(j).isLetterOrDigit || sql.charAt(j) == '_')) j += 1
        val word = sql.substring(i, j)
        val upper = word.toUpperCase
        // position after optional whitespace
        var k = j
        while (k < n && sql.charAt(k).isWhitespace) k += 1
        val hasParen = k < n && sql.charAt(k) == '('
        if (hasParen && upper == "IFF") {
          val (args, close) = parseArgs(sql, k)
          require(args.length == 3, s"IFF expects 3 args, got ${args.length} in: $word")
          val t = args.map(a => rewriteFunctionCalls(a.trim))
          out.append(s"CASE WHEN ${t(0)} THEN ${t(1)} ELSE ${t(2)} END")
          i = close + 1
        } else if (hasParen && (upper == "DATEDIFF" || upper == "TIMEDIFF" ||
            upper == "TIMESTAMPDIFF")) {
          // Snowflake 3-arg DATEDIFF('day', a, b) → Spark TIMESTAMPDIFF(DAY, a, b)
          // (the reference flags its PG DATE_PART rewrite "may need manual
          // adjustment", view_procedure_translator.py:304 — Spark's
          // timestampdiff expresses it exactly); 2-arg passes through.
          // TIMEDIFF/TIMESTAMPDIFF are Snowflake synonyms of the 3-arg
          // form (quoted unit aliases normalized the same way — Spark's
          // own TIMESTAMPDIFF only accepts bare canonical units).
          val (args, close) = parseArgs(sql, k)
          if (args.length == 3) {
            val unit = normalizeDateUnit(
              args.head.trim.stripPrefix("'").stripSuffix("'"), upper)
            val t = args.tail.map(a => rewriteFunctionCalls(a.trim))
            out.append(s"TIMESTAMPDIFF($unit, ${t(0)}, ${t(1)})")
            i = close + 1
          } else { out.append(word); i = j }
        } else if (hasParen && datetimeFns.contains(upper)) {
          // TO_TIMESTAMP/TO_DATE(expr, 'DD/MM/YYYY…') carry a Snowflake
          // format element string → Java pattern; TO_CHAR(ts, fmt) becomes
          // DATE_FORMAT, 1-arg TO_CHAR a plain string cast
          // (view_procedure_translator.py:318-327).
          val (args, close) = parseArgs(sql, k)
          val t = args.map(a => rewriteFunctionCalls(a.trim))
          val translated = if (t.length == 2 && isStringLiteral(t(1)))
            Seq(t(0), "'" + translateDateFormat(t(1).substring(1, t(1).length - 1)) + "'")
          else t
          val call = upper match {
            case "TO_CHAR" | "TO_VARCHAR" =>
              // 2-arg TO_CHAR is only a datetime format when the literal
              // carries datetime tokens; a numeric 9/0-family mask
              // ('$9,999.99') becomes the translateNumericMask composition,
              // and anything else must fail loudly — rewriting it to
              // DATE_FORMAT would silently return a formatted *date* for
              // an amount column
              if (translated.length == 2 && isStringLiteral(t(1)) &&
                  !isDatetimeFormat(t(1).substring(1, t(1).length - 1)))
                translateNumericMask(t(0), t(1).substring(1, t(1).length - 1))
                  .getOrElse(throw new IllegalArgumentException(
                    s"unsupported $upper format ${t(1)} — only unambiguous datetime " +
                      "formats and [FM][$] 9/0 numeric masks translate"))
              else if (translated.length == 2) s"DATE_FORMAT(${translated.mkString(", ")})"
              else s"CAST(${translated.head} AS STRING)"
            case "TO_TIMESTAMP_NTZ" => s"TO_TIMESTAMP(${translated.mkString(", ")})"
            case fn => s"$fn(${translated.mkString(", ")})"
          }
          out.append(call)
          i = close + 1
        } else if (hasParen && upper == "ARRAY_AGG") {
          // ARRAY_AGG([DISTINCT] e) [WITHIN GROUP (ORDER BY e [ASC|DESC])]
          // → SORT_ARRAY(COLLECT_LIST/COLLECT_SET(e)[, false]) — Spark's
          // collect_* reject WITHIN GROUP outright. Only the self-ordered
          // form translates: ordering by a DIFFERENT key would need a
          // struct sort-and-project, and silently dropping the order
          // would corrupt the result, so that fails loudly.
          val (args, close) = parseArgs(sql, k)
          require(args.length == 1, s"ARRAY_AGG expects 1 arg, got ${args.length}")
          val raw = args.head.trim
          // any whitespace after the keyword (tab/newline/multiple spaces) —
          // a single-space-only match would leave "DISTINCT\tx" embedded in
          // the rewritten expression
          val distinctRe = "(?i)^DISTINCT\\s+".r
          val isDistinct = distinctRe.findPrefixOf(raw).isDefined
          val e = rewriteFunctionCalls(distinctRe.replaceFirstIn(raw, "").trim)
          val coll = if (isDistinct) s"COLLECT_SET($e)" else s"COLLECT_LIST($e)"
          // lookahead for the WITHIN GROUP clause
          var p = close + 1
          while (p < n && sql.charAt(p).isWhitespace) p += 1
          if (p + 6 <= n && sql.substring(p, p + 6).equalsIgnoreCase("WITHIN")) {
            var q = p + 6
            while (q < n && sql.charAt(q).isWhitespace) q += 1
            require(q + 5 <= n && sql.substring(q, q + 5).equalsIgnoreCase("GROUP"),
              "ARRAY_AGG: WITHIN not followed by GROUP")
            q += 5
            while (q < n && sql.charAt(q).isWhitespace) q += 1
            require(q < n && sql.charAt(q) == '(',
              "ARRAY_AGG WITHIN GROUP: missing parenthesis")
            val (wgArgs, wgClose) = parseArgs(sql, q)
            val inner = wgArgs.mkString(",").trim
            require(inner.length >= 8 && inner.substring(0, 8).equalsIgnoreCase("ORDER BY"),
              s"ARRAY_AGG WITHIN GROUP expects ORDER BY, got: $inner")
            var ord = inner.substring(8).trim
            val descOrder = ord.toUpperCase.endsWith(" DESC")
            if (descOrder) ord = ord.substring(0, ord.length - 5).trim
            else if (ord.toUpperCase.endsWith(" ASC")) ord = ord.substring(0, ord.length - 4).trim
            val ordT = rewriteFunctionCalls(ord)
            require(ordT.equalsIgnoreCase(e),
              s"ARRAY_AGG WITHIN GROUP only translates when ordered by its own argument " +
                s"($e); ORDER BY $ordT has no lossless distributed rewrite")
            out.append(if (descOrder) s"SORT_ARRAY($coll, false)" else s"SORT_ARRAY($coll)")
            i = wgClose + 1
          } else {
            out.append(coll) // bare ARRAY_AGG: unordered, like collect_list
            i = close + 1
          }
        } else if (hasParen && upper == "SPLIT_TO_TABLE") {
          val (args, close) = parseArgs(sql, k)
          val t = args.map(a => rewriteFunctionCalls(a.trim))
          out.append(s"EXPLODE(SPLIT(${t.mkString(", ")}))")
          i = close + 1
        } else if (hasParen && upper == "DECODE") {
          // DECODE(e, s1, r1[, s2, r2…][, default]) → searched CASE. The
          // comparisons use `<=>` (null-safe equals): Snowflake DECODE
          // matches NULL against a NULL search value, which plain `=`
          // would silently never do.
          val (args, close) = parseArgs(sql, k)
          require(args.length >= 3, s"DECODE expects >= 3 args, got ${args.length}")
          val t = args.map(a => rewriteFunctionCalls(a.trim))
          val subject = t.head
          val rest = t.tail
          val whens = rest.grouped(2).filter(_.length == 2)
            .map(p => s"WHEN ($subject <=> ${p(0)}) THEN ${p(1)}").mkString(" ")
          val dflt = if (rest.length % 2 == 1) s" ELSE ${rest.last}" else ""
          out.append(s"CASE $whens$dflt END")
          i = close + 1
        } else if (hasParen && upper == "REGEXP_SUBSTR") {
          // 2-arg form → REGEXP_EXTRACT(subject, pattern, 0); the
          // position/occurrence/flags variants change match semantics and
          // must fail loudly rather than drop arguments
          val (args, close) = parseArgs(sql, k)
          val t = args.map(a => rewriteFunctionCalls(a.trim))
          if (t.length != 2)
            throw new IllegalArgumentException(
              s"unsupported REGEXP_SUBSTR arity ${t.length} — only (subject, pattern) translates")
          out.append(s"REGEXP_EXTRACT(${t(0)}, ${t(1)}, 0)")
          i = close + 1
        } else if (hasParen && upper == "OBJECT_CONSTRUCT") {
          // OBJECT_CONSTRUCT('k', v, …) → TO_JSON(NAMED_STRUCT(…)): the
          // VARIANT object becomes its JSON text rendering, the same
          // degrade-to-JSON the type map applies to VARIANT columns.
          // OBJECT_CONSTRUCT(*) (all-columns form) has no key list to
          // translate — fail loudly.
          val (args, close) = parseArgs(sql, k)
          val t = args.map(a => rewriteFunctionCalls(a.trim))
          if (t.isEmpty || t.length % 2 != 0)
            throw new IllegalArgumentException(
              s"unsupported OBJECT_CONSTRUCT form — need literal key/value pairs, got ${t.length} args")
          out.append(s"TO_JSON(NAMED_STRUCT(${t.mkString(", ")}))")
          i = close + 1
        } else if (hasParen && (upper == "DATEADD" || upper == "TIMEADD" ||
            upper == "TIMESTAMPADD")) {
          // DATEADD('unit', n, expr) → TIMESTAMPADD(UNIT, n, expr), with
          // TIMEADD/TIMESTAMPADD as Snowflake synonyms (quoted unit
          // aliases normalized — Spark's TIMESTAMPADD rejects them), and
          // Snowflake unit aliases ('dd', 'mins', …) normalized — Spark
          // rejects them at analysis time with an error pointing at SQL
          // the user never wrote. 2-arg DATEADD (PG form) passes through.
          // Type caveat (documented divergence): Snowflake returns DATE
          // for DATE inputs on date-granularity units; a string-level
          // rewriter can't see operand types, so the result is TIMESTAMP —
          // migrated views that need DATE output add ::DATE (q94 does).
          val (args, close) = parseArgs(sql, k)
          if (args.length == 3) {
            val unit = normalizeDateUnit(
              args.head.trim.stripPrefix("'").stripSuffix("'"), upper)
            val t = args.tail.map(a => rewriteFunctionCalls(a.trim))
            out.append(s"TIMESTAMPADD($unit, ${t(0)}, ${t(1)})")
            i = close + 1
          } else { out.append(word); i = j }
        } else if (hasParen && upper == "ZEROIFNULL") {
          val (args, close) = parseArgs(sql, k)
          require(args.length == 1, s"ZEROIFNULL expects 1 arg, got ${args.length}")
          out.append(s"COALESCE(${rewriteFunctionCalls(args.head.trim)}, 0)")
          i = close + 1
        } else if (hasParen && upper == "NULLIFZERO") {
          val (args, close) = parseArgs(sql, k)
          require(args.length == 1, s"NULLIFZERO expects 1 arg, got ${args.length}")
          out.append(s"NULLIF(${rewriteFunctionCalls(args.head.trim)}, 0)")
          i = close + 1
        } else if (hasParen && upper == "ARRAY_CONTAINS") {
          // Snowflake is ARRAY_CONTAINS(value, array); Spark is
          // ARRAY_CONTAINS(array, value) — same name, swapped args: a
          // pass-through would type-check against the wrong operands or
          // silently return the wrong answer on two array columns.
          val (args, close) = parseArgs(sql, k)
          require(args.length == 2, s"ARRAY_CONTAINS expects 2 args, got ${args.length}")
          val t = args.map(a => rewriteFunctionCalls(a.trim))
          out.append(s"ARRAY_CONTAINS(${t(1)}, ${t(0)})")
          i = close + 1
        } else if (hasParen && upper == "EQUAL_NULL") {
          // EQUAL_NULL(a, b) → (a <=> b): Spark's null-safe equality is
          // exactly Snowflake's NULL-is-a-value comparison.
          val (args, close) = parseArgs(sql, k)
          require(args.length == 2, s"EQUAL_NULL expects 2 args, got ${args.length}")
          val t = args.map(a => rewriteFunctionCalls(a.trim))
          out.append(s"(${t(0)} <=> ${t(1)})")
          i = close + 1
        } else if (hasParen && (upper == "BOOLOR_AGG" || upper == "BOOLAND_AGG")) {
          // BOOLOR_AGG/BOOLAND_AGG(e) → BOOL_OR/BOOL_AND(e) (Spark ≥3.0).
          val (args, close) = parseArgs(sql, k)
          require(args.length == 1, s"$upper expects 1 arg, got ${args.length}")
          val fn = if (upper == "BOOLOR_AGG") "BOOL_OR" else "BOOL_AND"
          out.append(s"$fn(${rewriteFunctionCalls(args.head.trim)})")
          i = close + 1
        } else if (hasParen && (upper == "DAYNAME" || upper == "MONTHNAME")) {
          // Snowflake returns the ABBREVIATED English name ('Mon', 'Jan');
          // DATE_FORMAT's EEE/MMM masks produce exactly those under the
          // suite's root locale.
          val (args, close) = parseArgs(sql, k)
          require(args.length == 1, s"$upper expects 1 arg, got ${args.length}")
          val mask = if (upper == "DAYNAME") "EEE" else "MMM"
          out.append(s"DATE_FORMAT(${rewriteFunctionCalls(args.head.trim)}, '$mask')")
          i = close + 1
        } else if (hasParen && upper == "SQUARE") {
          val (args, close) = parseArgs(sql, k)
          require(args.length == 1, s"SQUARE expects 1 arg, got ${args.length}")
          out.append(s"POWER(${rewriteFunctionCalls(args.head.trim)}, 2)")
          i = close + 1
        } else if (hasParen && (upper == "DIV0" || upper == "DIV0NULL")) {
          // DIV0(a, b): 0 instead of a division-by-zero error; DIV0NULL
          // additionally returns 0 for a NULL divisor.
          val (args, close) = parseArgs(sql, k)
          require(args.length == 2, s"$upper expects 2 args, got ${args.length}")
          val t = args.map(a => rewriteFunctionCalls(a.trim))
          val nullArm = if (upper == "DIV0NULL") s" OR (${t(1)}) IS NULL" else ""
          out.append(s"(CASE WHEN (${t(1)}) = 0$nullArm THEN 0 ELSE (${t(0)}) / (${t(1)}) END)")
          i = close + 1
        } else if (hasParen && (upper == "TO_BOOLEAN" || upper == "TRY_TO_BOOLEAN")) {
          // Spark's BOOLEAN cast accepts the same 'true'/'false'/'t'/'f'/
          // 'yes'/'no'/'1'/'0' lexicon; TRY_ degrades to NULL on junk.
          val (args, close) = parseArgs(sql, k)
          require(args.length == 1, s"$upper expects 1 arg, got ${args.length}")
          val cast = if (upper == "TO_BOOLEAN") "CAST" else "TRY_CAST"
          out.append(s"$cast(${rewriteFunctionCalls(args.head.trim)} AS BOOLEAN)")
          i = close + 1
        } else if (hasParen && upper == "ARRAY_SLICE") {
          // ARRAY_SLICE(a, from, to): 0-based, `to` exclusive → SLICE's
          // 1-based (start, length) form.
          val (args, close) = parseArgs(sql, k)
          require(args.length == 3, s"ARRAY_SLICE expects 3 args, got ${args.length}")
          val t = args.map(a => rewriteFunctionCalls(a.trim))
          out.append(s"SLICE(${t(0)}, (${t(1)}) + 1, (${t(2)}) - (${t(1)}))")
          i = close + 1
        } else if (hasParen && upper == "ARRAY_CAT") {
          val (args, close) = parseArgs(sql, k)
          require(args.length == 2, s"ARRAY_CAT expects 2 args, got ${args.length}")
          val t = args.map(a => rewriteFunctionCalls(a.trim))
          out.append(s"CONCAT(${t(0)}, ${t(1)})")
          i = close + 1
        } else if (hasParen && upper == "ARRAY_COMPACT") {
          val (args, close) = parseArgs(sql, k)
          require(args.length == 1, s"ARRAY_COMPACT expects 1 arg, got ${args.length}")
          out.append(s"FILTER(${rewriteFunctionCalls(args.head.trim)}, x -> x IS NOT NULL)")
          i = close + 1
        } else if (hasParen && upper == "OBJECT_KEYS") {
          // VARIANT objects degrade to JSON text (the OBJECT_CONSTRUCT
          // discipline) — key enumeration is JSON_OBJECT_KEYS over that.
          val (args, close) = parseArgs(sql, k)
          require(args.length == 1, s"OBJECT_KEYS expects 1 arg, got ${args.length}")
          out.append(s"JSON_OBJECT_KEYS(${rewriteFunctionCalls(args.head.trim)})")
          i = close + 1
        } else if (hasParen && upper == "PARSE_JSON") {
          // VARIANT = its JSON text in this engine's degrade model, so
          // PARSE_JSON is the identity — the ':' paths and OBJECT_KEYS
          // rewrites consume the text directly.
          val (args, close) = parseArgs(sql, k)
          require(args.length == 1, s"PARSE_JSON expects 1 arg, got ${args.length}")
          out.append(s"(${rewriteFunctionCalls(args.head.trim)})")
          i = close + 1
        } else if (hasParen && upper == "STRTOK") {
          // STRTOK(s[, delimCHARS[, part]]): every character of the
          // delimiter is a separator, empty tokens collapse, out-of-range
          // parts are NULL → split on the char class, drop empties,
          // TRY_ELEMENT_AT. Literal delimiters only (the char-class
          // escape needs the value at translation time).
          val (args, close) = parseArgs(sql, k)
          require(args.length >= 1 && args.length <= 3,
            s"STRTOK expects 1-3 args, got ${args.length}")
          val t = args.map(a => rewriteFunctionCalls(a.trim))
          val delim = if (t.length >= 2) t(1) else "' '"
          if (!isStringLiteral(delim))
            throw new IllegalArgumentException(
              "unsupported STRTOK — delimiter must be a string literal")
          val chars = delim.substring(1, delim.length - 1)
            .flatMap(c => if ("\\^]-".contains(c)) s"\\\\$c" else c.toString)
          val part = if (t.length == 3) t(2) else "1"
          out.append(s"TRY_ELEMENT_AT(FILTER(SPLIT(${t(0)}, '[$chars]'), " +
            s"x -> x != ''), $part)")
          i = close + 1
        } else if (hasParen && upper == "RATIO_TO_REPORT") {
          // RATIO_TO_REPORT(x) OVER (w) → x / SUM(x) OVER (w), with both
          // operands cast to DOUBLE so the quotient's type doesn't depend
          // on engine-specific decimal-division scale rules (the inner
          // SUM still aggregates at the operand's exact type).
          val (args, close) = parseArgs(sql, k)
          require(args.length == 1, s"RATIO_TO_REPORT expects 1 arg, got ${args.length}")
          val x = rewriteFunctionCalls(args.head.trim)
          var p = close + 1
          while (p < sql.length && sql(p).isWhitespace) p += 1
          val overKw = if (p + 4 <= sql.length) sql.substring(p, p + 4).toUpperCase else ""
          if (overKw != "OVER")
            throw new IllegalArgumentException(
              "unsupported RATIO_TO_REPORT without an OVER clause")
          var q = p + 4
          while (q < sql.length && sql(q).isWhitespace) q += 1
          require(q < sql.length && sql(q) == '(',
            "unsupported RATIO_TO_REPORT — OVER must be followed by (...)")
          val (overArgs, overClose) = parseArgs(sql, q)
          val w = rewriteFunctionCalls(overArgs.mkString(",").trim)
          out.append(s"(CAST(($x) AS DOUBLE) / CAST(SUM($x) OVER ($w) AS DOUBLE))")
          i = overClose + 1
        } else if (hasParen && upper == "GET") {
          // GET(array, i) is 0-based; Spark ELEMENT_AT is 1-based → +1.
          // The object form GET(obj, 'key') belongs to the VARIANT path
          // family (`:`/GET_JSON_OBJECT) — fail loudly rather than emit an
          // array lookup against an object.
          val (args, close) = parseArgs(sql, k)
          require(args.length == 2, s"GET expects 2 args, got ${args.length}")
          val t = args.map(a => rewriteFunctionCalls(a.trim))
          if (isStringLiteral(t(1)))
            throw new IllegalArgumentException(
              "unsupported GET(obj, 'key') — use the ':' VARIANT path syntax instead")
          out.append(s"ELEMENT_AT(${t(0)}, (${t(1)}) + 1)")
          i = close + 1
        } else if (hasParen && upper == "INSERT") {
          // String INSERT(base, pos, len, repl): 1-based pos, replaces len
          // chars — exactly ANSI OVERLAY's contract, which Spark ships.
          // (Statement-position INSERT never reaches here: translate only
          // rewrites SELECT-context expression text.)
          val (args, close) = parseArgs(sql, k)
          require(args.length == 4, s"INSERT expects 4 args, got ${args.length}")
          val t = args.map(a => rewriteFunctionCalls(a.trim))
          out.append(s"OVERLAY(${t(0)} PLACING ${t(3)} FROM ${t(1)} FOR ${t(2)})")
          i = close + 1
        } else if (hasParen && upper == "PIVOT") {
          // Snowflake PIVOT (agg FOR col IN ('v1', 'v2')) → Spark's
          // aliased IN list. Spark names unaliased pivot columns by the
          // literal's string form; Snowflake wraps them in quoted
          // identifiers ('AUTOMOBILE'). The translation contract: output
          // columns are the unquoted literal text sanitized to an
          // identifier ([^A-Za-z0-9_] → _), emitted as explicit aliases.
          val (args, close) = parseArgs(sql, k)
          require(args.length == 1, s"PIVOT expects one clause, got ${args.length}")
          val inner = args.head
          val mo = "(?i)\\bIN\\s*\\(".r.findAllMatchIn(inner).toSeq.lastOption
            .getOrElse(throw new IllegalArgumentException(
              "unsupported PIVOT — no IN value list"))
          val (vals, inClose) = parseArgs(inner, mo.end - 1)
          require(inner.substring(inClose + 1).trim.isEmpty,
            "unsupported PIVOT — trailing text after the IN list")
          val names = vals.map(_.trim).map { v =>
            if (!isStringLiteral(v))
              throw new IllegalArgumentException(
                "unsupported PIVOT — IN values must be string literals")
            v -> v.substring(1, v.length - 1).replaceAll("[^A-Za-z0-9_]", "_")
          }
          // sanitization is lossy ('A-B' and 'A_B' both become A_B) — two
          // IN values colliding into one output column name would produce
          // duplicate pivot columns with no error at translate time, so
          // fail loudly here like the other unsupported shapes
          val dups = names.groupBy(_._2).filter(_._2.size > 1).keys
          if (dups.nonEmpty)
            throw new IllegalArgumentException(
              "unsupported PIVOT — IN values collide after sanitization: " +
                dups.mkString(", "))
          val aliased = names.map { case (v, name) => s"$v AS $name" }
            .mkString(", ")
          val prefix = rewriteFunctionCalls(inner.substring(0, mo.start).trim)
          out.append(s"PIVOT ($prefix IN ($aliased))")
          i = close + 1
        } else if (hasParen && upper == "CONDITIONAL_TRUE_EVENT") {
          // CONDITIONAL_TRUE_EVENT(e) OVER (w) → running count of rows
          // where e held, current row included: SUM(CASE WHEN e THEN 1
          // ELSE 0 END) with an explicit ROWS frame — the default RANGE
          // frame would lump ORDER-BY peers together, Snowflake's function
          // numbers them row-by-row.
          val (args, close) = parseArgs(sql, k)
          require(args.length == 1,
            s"CONDITIONAL_TRUE_EVENT expects 1 arg, got ${args.length}")
          val e = rewriteFunctionCalls(args.head.trim)
          var p = close + 1
          while (p < sql.length && sql(p).isWhitespace) p += 1
          val overKw = if (p + 4 <= sql.length) sql.substring(p, p + 4).toUpperCase else ""
          if (overKw != "OVER")
            throw new IllegalArgumentException(
              "unsupported CONDITIONAL_TRUE_EVENT without an OVER clause")
          var q = p + 4
          while (q < sql.length && sql(q).isWhitespace) q += 1
          require(q < sql.length && sql(q) == '(',
            "unsupported CONDITIONAL_TRUE_EVENT — OVER must be followed by (...)")
          val (overArgs, overClose) = parseArgs(sql, q)
          val w = rewriteFunctionCalls(overArgs.mkString(",").trim)
          out.append(s"SUM(CASE WHEN ($e) THEN 1 ELSE 0 END) OVER ($w " +
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
          i = overClose + 1
        } else if (hasParen && (upper == "TRY_TO_DATE" || upper == "TRY_TO_TIMESTAMP" ||
            upper == "TRY_TO_TIMESTAMP_NTZ")) {
          // TRY_TO_TIMESTAMP is native in Spark ≥3.5 (NULL on parse failure,
          // exactly Snowflake's contract); format elements translate like
          // TO_TIMESTAMP's. Spark has no TRY_TO_DATE, so it becomes
          // CAST(TRY_TO_TIMESTAMP(…) AS DATE) — same null-on-failure
          // semantics. Same loud-failure discipline as TRY_TO_NUMBER: a
          // mask that isn't an unambiguous datetime format throws at
          // translation time, not as a silently-NULL column at runtime.
          val (args, close) = parseArgs(sql, k)
          require(args.length == 1 || args.length == 2,
            s"$upper expects 1-2 args, got ${args.length}")
          val t = args.map(a => rewriteFunctionCalls(a.trim))
          val translated = if (t.length == 2 && isStringLiteral(t(1))) {
            val fmt = t(1).substring(1, t(1).length - 1)
            if (!isDatetimeFormat(fmt))
              throw new IllegalArgumentException(
                s"unsupported $upper format ${t(1)} — only unambiguous datetime formats translate")
            Seq(t(0), "'" + translateDateFormat(fmt) + "'")
          } else t
          val inner = s"TRY_TO_TIMESTAMP(${translated.mkString(", ")})"
          out.append(if (upper == "TRY_TO_DATE") s"CAST($inner AS DATE)" else inner)
          i = close + 1
        } else if (hasParen && (upper == "TRY_TO_NUMBER" || upper == "TRY_TO_DECIMAL")) {
          // TRY_TO_NUMBER(x[, p, s]) → TRY_CAST(x AS DECIMAL(p,s)); the
          // format-string variant changes parse semantics — fail loudly.
          val (args, close) = parseArgs(sql, k)
          val t = args.map(a => rewriteFunctionCalls(a.trim))
          val ps = t.drop(1)
          if (ps.exists(a => !a.forall(_.isDigit)))
            throw new IllegalArgumentException(
              s"unsupported $upper format-string form — only (expr[, precision, scale]) translates")
          val (p, sc) = ps match {
            case Nil            => (38, 0)
            case pp :: Nil      => (pp.toInt, 0)
            case pp :: ss :: _  => (pp.toInt, ss.toInt)
          }
          out.append(s"TRY_CAST(${t.head} AS DECIMAL($p,$sc))")
          i = close + 1
        } else if (hasParen && (upper == "TO_NUMBER" || upper == "TO_DECIMAL" ||
            upper == "TO_NUMERIC")) {
          // TO_NUMBER(x[, p, s]) → CAST(x AS DECIMAL(p,s)) — the erroring
          // twin of TRY_TO_NUMBER; format-string variants fail loudly for
          // the same reason.
          val (args, close) = parseArgs(sql, k)
          val t = args.map(a => rewriteFunctionCalls(a.trim))
          val ps = t.drop(1)
          if (ps.exists(a => !a.forall(_.isDigit)))
            throw new IllegalArgumentException(
              s"unsupported $upper format-string form — only (expr[, precision, scale]) translates")
          val (p, sc) = ps match {
            case Nil            => (38, 0)
            case pp :: Nil      => (pp.toInt, 0)
            case pp :: ss :: _  => (pp.toInt, ss.toInt)
          }
          out.append(s"CAST(${t.head} AS DECIMAL($p,$sc))")
          i = close + 1
        } else if (hasParen && (upper == "TO_DOUBLE" || upper == "TRY_TO_DOUBLE")) {
          // TO_DOUBLE(x) → CAST(x AS DOUBLE); TRY_ form → TRY_CAST. The
          // format-string variant changes parse semantics — fail loudly.
          val (args, close) = parseArgs(sql, k)
          require(args.length == 1,
            s"unsupported $upper form — only the 1-arg (expr) shape translates")
          val castFn = if (upper.startsWith("TRY_")) "TRY_CAST" else "CAST"
          out.append(s"$castFn(${rewriteFunctionCalls(args.head.trim)} AS DOUBLE)")
          i = close + 1
        } else if (hasParen && upper == "CHARINDEX") {
          // CHARINDEX(needle, hay[, start]) → LOCATE — same arg order, same
          // 1-based/0-when-missing semantics.
          val (args, close) = parseArgs(sql, k)
          require(args.length == 2 || args.length == 3,
            s"CHARINDEX expects 2-3 args, got ${args.length}")
          val t = args.map(a => rewriteFunctionCalls(a.trim))
          out.append(s"LOCATE(${t.mkString(", ")})")
          i = close + 1
        } else if (hasParen && zeroArg.contains(upper)) {
          val (_, close) = parseArgs(sql, k)
          out.append(zeroArg(upper)); i = close + 1
        } else if (hasParen && renamed.contains(upper)) {
          out.append(renamed(upper)); i = j
        } else { out.append(word); i = j }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Snowflake date-part aliases → the Spark unit keyword
    * (docs.snowflake.com "Supported date and time parts"); unknown units
    * fail here, at the translation layer, instead of as a Spark analysis
    * error pointing at generated SQL. */
  private[dialect] def normalizeDateUnit(raw: String, fn: String): String =
    raw.toUpperCase match {
      case "YEAR" | "Y" | "YY" | "YYY" | "YYYY" | "YR" | "YEARS" | "YRS" => "YEAR"
      case "QUARTER" | "Q" | "QTR" | "QTRS" | "QUARTERS"                 => "QUARTER"
      case "MONTH" | "MM" | "MON" | "MONS" | "MONTHS"                    => "MONTH"
      case "WEEK" | "W" | "WK" | "WEEKOFYEAR" | "WOY" | "WY" | "WEEKS"   => "WEEK"
      case "DAY" | "D" | "DD" | "DAYS" | "DAYOFMONTH"                    => "DAY"
      case "HOUR" | "H" | "HH" | "HR" | "HOURS" | "HRS"                  => "HOUR"
      case "MINUTE" | "M" | "MI" | "MIN" | "MINUTES" | "MINS"            => "MINUTE"
      case "SECOND" | "S" | "SEC" | "SECONDS" | "SECS"                   => "SECOND"
      case "MILLISECOND" | "MS" | "MSEC" | "MILLISECONDS"                => "MILLISECOND"
      case "MICROSECOND" | "US" | "USEC" | "MICROSECONDS"                => "MICROSECOND"
      case other => throw new IllegalArgumentException(
        s"unsupported $fn unit '$other'")
    }

  /** Given `sql` with an opening '(' at `open`, return (top-level args,
    * index of matching ')'). Respects nested parens, single-quoted strings
    * (with '' escapes) and double-quoted identifiers. */
  def parseArgs(sql: String, open: Int): (List[String], Int) = {
    require(sql.charAt(open) == '(', s"expected ( at $open")
    val args = List.newBuilder[String]
    val cur = new StringBuilder
    var depth = 1
    var i = open + 1
    while (i < sql.length && depth > 0) {
      sql.charAt(i) match {
        case '\'' => val j = skipString(sql, i); cur.append(sql.substring(i, j)); i = j
        case '"'  => val j = skipQuotedIdent(sql, i); cur.append(sql.substring(i, j)); i = j
        case '(' => depth += 1; cur.append('('); i += 1
        case ')' =>
          depth -= 1
          if (depth == 0) { if (cur.nonEmpty || args.result().nonEmpty) args += cur.toString }
          else cur.append(')')
          i += 1
        case ',' if depth == 1 => args += cur.toString; cur.clear(); i += 1
        case c => cur.append(c); i += 1
      }
    }
    require(depth == 0, s"unbalanced parens starting at $open")
    (args.result(), i - 1)
  }

  /** Index just past a single-quoted SQL string starting at `i` ('' escape). */
  @tailrec
  private def skipString(sql: String, i: Int, from: Int = -1): Int = {
    val start = if (from < 0) i + 1 else from
    val q = sql.indexOf('\'', start)
    if (q < 0) sql.length
    else if (q + 1 < sql.length && sql.charAt(q + 1) == '\'') skipString(sql, i, q + 2)
    else q + 1
  }

  private def skipQuotedIdent(sql: String, i: Int): Int = {
    val q = sql.indexOf('"', i + 1)
    if (q < 0) sql.length else q + 1
  }
}
