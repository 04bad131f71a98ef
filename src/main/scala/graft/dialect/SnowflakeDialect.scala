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
  *
  * The translation is string-level (like the reference) but implemented with
  * a character scanner that respects single-quoted literals (with `''`
  * escapes) and double-quoted identifiers, not regexes over raw text.
  */
object SnowflakeDialect {

  def translate(sql: String): String = {
    var s = sql
    s = stripThreePartNames(s)
    s = rewriteFunctionCalls(s)
    s = rewriteCasts(s)
    s
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

  /** One pass over the SQL rewriting known function calls; recurses into
    * arguments so nested `IFF` translate fully. */
  private def rewriteFunctionCalls(sql: String): String = {
    val zeroArg = Map(
      "GETDATE"           -> "CURRENT_TIMESTAMP",
      "SYSDATE"           -> "CURRENT_TIMESTAMP",
      "CURRENT_TIMESTAMP" -> "CURRENT_TIMESTAMP")
    val renamed = Map("NVL" -> "COALESCE", "IFNULL" -> "COALESCE")

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
        } else if (hasParen && upper == "DATEDIFF") {
          // Snowflake 3-arg DATEDIFF('day', a, b) → Spark TIMESTAMPDIFF(DAY, a, b)
          // (the reference flags its PG DATE_PART rewrite "may need manual
          // adjustment", view_procedure_translator.py:304 — Spark's
          // timestampdiff expresses it exactly); 2-arg passes through.
          val (args, close) = parseArgs(sql, k)
          if (args.length == 3) {
            val unit = args.head.trim.stripPrefix("'").stripSuffix("'").toUpperCase
            val t = args.tail.map(a => rewriteFunctionCalls(a.trim))
            out.append(s"TIMESTAMPDIFF($unit, ${t(0)}, ${t(1)})")
            i = close + 1
          } else { out.append(word); i = j }
        } else if (hasParen && upper == "SPLIT_TO_TABLE") {
          val (args, close) = parseArgs(sql, k)
          val t = args.map(a => rewriteFunctionCalls(a.trim))
          out.append(s"EXPLODE(SPLIT(${t.mkString(", ")}))")
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
