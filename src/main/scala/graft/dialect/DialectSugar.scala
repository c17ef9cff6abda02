package graft.dialect

/** DuckDB SQL sugar the reference engine accepts but Spark SQL lacks,
  * rewritten at the string level (literal- and paren-depth-aware):
  *
  *  - `QUALIFY <pred>` — post-window filtering
  *    (duckdb docs/sql/query_syntax/qualify): the query is wrapped so the
  *    predicate becomes a computed column of a subquery and the filter an
  *    ordinary WHERE; the `__graft_qual` marker column is removed inside
  *    the rewrite itself via star-EXCEPT. The predicate may reference any
  *    column the SELECT list projects (the overwhelmingly common form —
  *    `QUALIFY row_number() OVER (...) <= k` over `SELECT *`).
  *  - `GROUP BY ALL` — group by every select item that contains no
  *    aggregate function, referenced positionally (Spark's groupByOrdinal).
  *  - `ORDER BY ALL [ASC|DESC]` — order by every select item left to
  *    right, positionally.
  *  - Star select items (`*`, `t.*`) make the positional forms
  *    unknowable at the string level: GROUP BY ALL / ORDER BY ALL are
  *    then left untouched so Spark rejects them loudly instead of this
  *    shim guessing a silently-wrong ordinal list.
  *  - `* EXCLUDE (...)` — Spark spells it `* EXCEPT (...)`.
  *
  * Set-operation branches are processed independently; parenthesized
  * subqueries (including CTE bodies) are processed recursively. All
  * scanning skips single-quoted literals via [[SqlText]].
  */
object DialectSugar {

  val QualMarker = "__graft_qual"

  def rewrite(sql: String): String = process(sql)

  // ---------------------------------------------------------------- scan
  /** End index (exclusive) of a comment starting at `i`, or `i` if none:
    * `-- …\n` and `/* … */` must not contribute keywords or parens. */
  private def commentEnd(sql: String, i: Int): Int =
    if (sql.startsWith("--", i)) {
      val nl = sql.indexOf('\n', i)
      if (nl < 0) sql.length else nl + 1
    } else if (sql.startsWith("/*", i)) {
      val end = sql.indexOf("*/", i + 2)
      if (end < 0) sql.length else end + 2
    } else i

  /** Index of the first depth-0, non-literal, non-comment, word-boundary
    * occurrence of `word` (case-insensitive; spaces in `word` mean \s+). */
  private def topLevelIndex(sql: String, word: String, from: Int = 0): Int = {
    val pattern = ("(?i)\\b" + word.replace(" ", "\\s+") + "\\b").r
    var i = from
    var depth = 0
    while (i < sql.length) {
      val ce = commentEnd(sql, i)
      if (ce > i) { i = ce }
      else sql.charAt(i) match {
        case '\'' => i = SqlText.literalEnd(sql, i)
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case _ =>
          if (depth == 0) {
            // try to match the keyword starting exactly here
            // manual left boundary: \b sees the substring start as a word
            // boundary, so also reject a preceding identifier char
            // (including '_', which isLetterOrDigit misses)
            val prevOk = i == 0 || {
              val p = sql.charAt(i - 1); !p.isLetterOrDigit && p != '_'
            }
            pattern.findPrefixOf(sql.substring(i)) match {
              case Some(_) if prevOk => return i
              case _ => i += 1
            }
          } else i += 1
      }
    }
    -1
  }

  /** Length of the keyword match at `idx` (handles internal \s+). */
  private def matchLen(sql: String, idx: Int, word: String): Int = {
    val pattern = ("(?i)" + word.replace(" ", "\\s+")).r
    pattern.findPrefixOf(sql.substring(idx)).map(_.length).getOrElse(word.length)
  }

  /** Split `s` at depth-0, non-literal occurrences of `sep`. */
  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val parts = Seq.newBuilder[String]
    var start = 0
    var i = 0
    var depth = 0
    while (i < s.length) {
      val ce = commentEnd(s, i)
      if (ce > i) { i = ce }
      else s.charAt(i) match {
        case '\'' => i = SqlText.literalEnd(s, i)
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case c if c == sep && depth == 0 =>
          parts += s.substring(start, i); start = i + 1; i += 1
        case _ => i += 1
      }
    }
    parts += s.substring(start)
    parts.result()
  }

  // ----------------------------------------------------------- recursion
  /** Recursively process every depth-0 parenthesized group, then apply the
    * top-level rewrites to this level (per set-operation branch). */
  private def process(sql: String): String = {
    val sb = new StringBuilder
    var i = 0
    var segStart = 0
    while (i < sql.length) {
      val ce = commentEnd(sql, i)
      if (ce > i) { i = ce }
      else sql.charAt(i) match {
        case '\'' => i = SqlText.literalEnd(sql, i)
        case '(' =>
          var depth = 1
          var j = i + 1
          while (j < sql.length && depth > 0) {
            val jc = commentEnd(sql, j)
            if (jc > j) j = jc
            else {
              sql.charAt(j) match {
                case '\'' => j = SqlText.literalEnd(sql, j)
                case '(' => depth += 1; j += 1
                case ')' => depth -= 1; j += 1
                case _ => j += 1
              }
            }
          }
          sb.append(sql.substring(segStart, i + 1))
          sb.append(process(sql.substring(i + 1, j - 1)))
          sb.append(")")
          i = j
          segStart = j
        case _ => i += 1
      }
    }
    sb.append(sql.substring(segStart))
    rewriteLevel(sb.toString)
  }

  /** Apply the level-local rewrites, set-op branch by set-op branch. */
  private def rewriteLevel(sql: String): String = {
    val setOp = "(UNION ALL|UNION|INTERSECT ALL|INTERSECT|EXCEPT ALL|EXCEPT)"
    // split on set operators at depth 0 — but EXCEPT inside `* EXCEPT (` is
    // a star modifier, not a set op; exclude those by requiring the branch
    // split keyword to be followed by SELECT/( eventually. Simplest robust
    // rule: a set-op keyword NOT immediately followed by '(' after optional
    // whitespace is still ambiguous, so instead protect star-EXCEPT first.
    val protectedSql = SqlText.mapOutsideLiterals(excludeRewrite(sql))(
      _.replaceAll("(?i)\\*\\s*EXCEPT\\s*\\(", "* __STAR_EXCEPT__("))
    val parts = Seq.newBuilder[(String, String)] // (branch, trailing set-op)
    var rest = protectedSql
    var done = false
    while (!done) {
      val idx = topLevelIndex(rest, setOp)
      if (idx < 0) { parts += ((rest, "")); done = true }
      else {
        val len = matchLen(rest, idx, setOp)
        parts += ((rest.substring(0, idx), rest.substring(idx, idx + len)))
        rest = rest.substring(idx + len)
      }
    }
    // group-by-all and order-by-all must expand BEFORE qualify wraps the
    // base query in parens (hiding them from the depth-0 scan); order-by
    // positions stay valid through the wrap because the marker column is
    // appended after `*`.
    parts.result().map { case (branch, op) =>
      val rewritten = qualify(orderByAll(groupByAll(branch)))
      rewritten + (if (op.nonEmpty) " " + op + " " else "")
    }.mkString("").replace("__STAR_EXCEPT__(", "EXCEPT (")
  }

  /** `* EXCLUDE (a, b)` → `* EXCEPT (a, b)` (Spark's spelling). */
  private def excludeRewrite(sql: String): String =
    SqlText.mapOutsideLiterals(sql)(
      _.replaceAll("(?i)(\\*\\s*)EXCLUDE(\\s*\\()", "$1EXCEPT$2"))

  // ------------------------------------------------------------- QUALIFY
  private def qualify(sql: String): String = {
    val qIdx = topLevelIndex(sql, "QUALIFY")
    if (qIdx < 0) return sql
    val qLen = matchLen(sql, qIdx, "QUALIFY")
    val base = sql.substring(0, qIdx).trim
    val afterQ = sql.substring(qIdx + qLen)
    // predicate runs until a depth-0 ORDER BY / LIMIT / OFFSET or the end
    val tailKw = "(ORDER BY|LIMIT|OFFSET)"
    val tIdx = topLevelIndex(afterQ, tailKw)
    val (pred, tail) =
      if (tIdx < 0) (afterQ.trim, "")
      else (afterQ.substring(0, tIdx).trim, " " + afterQ.substring(tIdx).trim)
    // star-EXCEPT removes the marker inside the rewrite itself, so a
    // QUALIFY in a subquery doesn't leak the marker into the outer query's
    // star expansion (the emitted EXCEPT is below this level's set-op
    // split, and nested rewriteLevel protection round-trips it untouched)
    s"SELECT * EXCEPT ($QualMarker) FROM " +
      s"(SELECT *, ($pred) AS $QualMarker FROM ($base) __gq_in) __gq " +
      s"WHERE $QualMarker$tail"
  }

  // -------------------------------------------------------- GROUP BY ALL
  private val AggFn =
    ("(?i)\\b(sum|count|min|max|avg|mean|stddev|stddev_samp|stddev_pop|variance|" +
      "var_samp|var_pop|first|last|first_value|last_value|any_value|collect_list|" +
      "collect_set|array_agg|approx_count_distinct|approx_percentile|percentile|" +
      "percentile_cont|percentile_disc|median|mode|corr|covar_samp|covar_pop|" +
      "bool_and|bool_or|every|some|string_agg|listagg|bit_and|bit_or|bit_xor|" +
      "skewness|kurtosis|count_if|regr_\\w+|hll_\\w+|grouping|grouping_id)\\s*\\(").r

  /** Select items of the statement's main SELECT (between SELECT [DISTINCT]
    * and the depth-0 FROM), or Nil if the shape isn't recognized. */
  private def selectItems(sql: String): Seq[String] = {
    val sIdx = topLevelIndex(sql, "SELECT")
    if (sIdx < 0) return Nil
    val afterSel = {
      val a = sql.substring(sIdx + matchLen(sql, sIdx, "SELECT"))
      val d = "(?i)^\\s*DISTINCT\\b".r.findFirstIn(a)
      d.map(m => a.substring(m.length)).getOrElse(a)
    }
    val fIdx = topLevelIndex(afterSel, "FROM")
    if (fIdx < 0) return Nil
    splitTopLevel(afterSel.substring(0, fIdx), ',').map(_.trim).filter(_.nonEmpty)
  }

  /** The item with its string literals BLANKED (not preserved), so
    * aggregate-looking text inside a constant can't count. */
  private def stripLiterals(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\'') i = SqlText.literalEnd(s, i)
      else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  private def isAggregate(item: String): Boolean = {
    val bare = stripLiterals(item)
    AggFn.findFirstIn(bare).isDefined &&
      !"(?i)\\bOVER\\b".r.findFirstIn(bare).isDefined
  }

  private def groupByAll(sql: String): String = {
    val gIdx = topLevelIndex(sql, "GROUP BY ALL")
    if (gIdx < 0) return sql
    val gLen = matchLen(sql, gIdx, "GROUP BY ALL")
    val items = selectItems(sql)
    // star items make positional grouping unknowable — leave the query
    // for Spark to reject loudly instead of emitting a wrong GROUP BY
    if (items.isEmpty || items.exists(isStarItem)) return sql
    val keys = items.zipWithIndex.collect {
      case (item, i) if !isAggregate(item) => (i + 1).toString
    }
    val replacement = if (keys.isEmpty) "" else s"GROUP BY ${keys.mkString(", ")}"
    sql.substring(0, gIdx) + replacement + sql.substring(gIdx + gLen)
  }

  // -------------------------------------------------------- ORDER BY ALL
  // one regex instance for both the suffix text and its consumed length:
  // ASC/DESC and/or NULLS FIRST/LAST, each optionally present
  private val OrderSfx = "(?i)^(\\s*(ASC|DESC))?(\\s*NULLS\\s+(FIRST|LAST))?".r

  private def orderByAll(sql: String): String = {
    val oIdx = topLevelIndex(sql, "ORDER BY ALL")
    if (oIdx < 0) return sql
    val oLen = matchLen(sql, oIdx, "ORDER BY ALL")
    val items = selectItems(sql)
    // a star item hides the real column count — bail out loudly rather
    // than rewrite to a silently-wrong single-ordinal ORDER BY (Spark
    // then rejects the bare ALL, which is an error, not wrong data)
    if (items.isEmpty || items.exists(isStarItem)) return sql
    val n = items.size
    // optional direction/null-ordering suffix distributes over EVERY key
    val m = OrderSfx.findFirstMatchIn(sql.substring(oIdx + oLen))
    val sfx = m.map(_.matched.trim).getOrElse("")
    val sfxLen = m.map(_.matched.length).getOrElse(0)
    val rest = sql.substring(oIdx + oLen + sfxLen)
    val keys = (1 to n).map(i =>
      if (sfx.isEmpty) i.toString else s"$i ${sfx.replaceAll("\\s+", " ")}")
    // explicit separator: `rest` may start with LIMIT/OFFSET with its
    // leading whitespace already consumed by the suffix matcher
    sql.substring(0, oIdx) + s"ORDER BY ${keys.mkString(", ")}" +
      (if (rest.isEmpty || rest.head.isWhitespace) rest else " " + rest)
  }

  /** `*`, `t.*`, or a star with modifiers — the item count is unknowable
    * at the string level. */
  private def isStarItem(item: String): Boolean = {
    val t = item.trim
    t == "*" || t.endsWith(".*") || t.startsWith("*") ||
      "(?i)^\\S*\\.\\*\\s".r.findFirstIn(t + " ").isDefined
  }
}
