package graft.dialect

import org.apache.spark.sql.SparkSession

/** DuckDB's `COLUMNS(...)` star expression (duckdb docs/sql/expressions/
  * star#columns-expression): a select item that expands to every matching
  * column of the query's source —
  *
  *  - `COLUMNS('regex')` — columns whose NAME fully matches the regex;
  *  - `COLUMNS(*)` — all columns;
  *  - `COLUMNS(* EXCLUDE (a, b))` — all but the listed ones;
  *  - wrapping expressions replicate per column:
  *    `min(COLUMNS('n_.*'))` becomes `min(n_nationkey), min(n_name), ...`.
  *
  * Spark has no equivalent, so the expansion happens at rewrite time
  * against the resolved schema of the level's FROM relation (a single
  * table/view — multi-relation FROMs are ambiguous for unqualified names
  * and are left untouched, surfacing Spark's own error). Each nesting
  * level expands against its own FROM, so subqueries compose. Wrapped
  * copies keep Spark's default naming (`min(n_nationkey)`), which differs
  * from DuckDB's qualified spelling — oracle queries use the bare form,
  * whose output names are the column names in both engines.
  *
  * The expansion is purely textual and pre-planning: the emitted query is
  * an ordinary projection, so column pruning reaches the scan exactly as
  * if the user had typed the list (at 100 TB a COLUMNS('two_cols') query
  * reads two columns, not the table).
  */
object ColumnsExpansion {

  private val ColsRe = java.util.regex.Pattern.compile("(?i)\\bCOLUMNS\\s*\\(")

  def rewrite(spark: SparkSession, sql: String): String =
    if (!ColsRe.matcher(sql).find()) sql
    else processLevel(spark, sql)

  /** Recurse into parenthesized segments first (subquery levels own their
    * FROM), then expand this level's select items. */
  private def processLevel(spark: SparkSession, sql: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < sql.length) {
      sql.charAt(i) match {
        case '\'' =>
          val end = SqlText.literalEnd(sql, i)
          sb.append(sql.substring(i, end)); i = end
        case '(' =>
          val close = matchingParen(sql, i)
          if (close < 0) { sb.append(sql.charAt(i)); i += 1 }
          else {
            sb.append('(')
              .append(processLevel(spark, sql.substring(i + 1, close)))
              .append(')')
            i = close + 1
          }
        case c => sb.append(c); i += 1
      }
    }
    expandLevel(spark, sb.toString)
  }

  /** Expand COLUMNS items of THIS level's select list (depth-0 SELECT…FROM
    * over a single named relation). */
  private def expandLevel(spark: SparkSession, sql: String): String = {
    val selStart = topLevelWord(sql, "select", 0)
    if (selStart < 0) return sql
    val listStart = selStart + "select".length
    val fromIdx = topLevelWord(sql, "from", listStart)
    if (fromIdx < 0) return sql
    val listText = sql.substring(listStart, fromIdx)
    if (!ColsRe.matcher(listText).find()) return sql
    // the level's source: a single table/view name (optionally aliased)
    val TableRe = """(?s)^\s*([\w.`"]+)\s*(.*)$""".r
    val cols: Seq[String] = sql.substring(fromIdx + 4) match {
      case TableRe(name, rest) =>
        val next = rest.trim.takeWhile(c => c.isLetterOrDigit || c == '_')
        val restIsJoin = Set("join", "inner", "left", "right", "full",
          "cross", "asof").contains(next.toLowerCase) ||
          rest.trim.startsWith(",")
        if (restIsJoin) return sql
        try spark.table(name.replaceAll("[`\"]", "")).columns.toSeq
        catch { case _: Exception => return sql }
      case _ => return sql
    }
    // DISTINCT / ALL prefix stays outside the item list
    val PrefixRe = """(?is)^(\s*(?:DISTINCT|ALL)\b)?(.*)$""".r
    val (prefix, items) = listText match {
      case PrefixRe(p, body) => (Option(p).getOrElse(""), splitTopLevel(body))
    }
    val expanded = items.map(expandItem(_, cols)).mkString(", ")
    sql.substring(0, listStart) + prefix + " " + expanded + " " +
      sql.substring(fromIdx)
  }

  /** One select item: replicate it per matched column, replacing the
    * COLUMNS(...) span. Items with zero or two+ COLUMNS calls pass through. */
  private def expandItem(item: String, cols: Seq[String]): String = {
    val m = ColsRe.matcher(item)
    if (!m.find() || insideLiteral(item, m.start())) return item.trim
    if (m.find()) return item.trim // two calls in one item: unsupported
    val m2 = ColsRe.matcher(item)
    m2.find()
    val close = matchingParen(item, m2.end() - 1)
    if (close < 0) return item.trim
    val arg = item.substring(m2.end(), close).trim
    val matched: Seq[String] = parseArg(arg, cols).getOrElse(return item.trim)
    if (matched.isEmpty) return item.trim
    val pre = item.substring(0, m2.start())
    val post = item.substring(close + 1)
    matched.map(c => (pre + c + post).trim).mkString(", ")
  }

  /** `'regex'` (full name match), `*`, or `* EXCLUDE (a, b)`. */
  private def parseArg(arg: String, cols: Seq[String]): Option[Seq[String]] = {
    val Regex = """(?s)^'((?:[^']|'')*)'$""".r
    val Excl = """(?is)^\*\s+EXCLUDE\s*\(([^)]*)\)$""".r
    arg match {
      case "*" => Some(cols)
      case Excl(list) =>
        val drop = list.split(",").map(_.trim.replaceAll("[`\"]", "").toLowerCase)
          .filter(_.nonEmpty).toSet
        Some(cols.filterNot(c => drop.contains(c.toLowerCase)))
      case Regex(re) =>
        try {
          val p = java.util.regex.Pattern.compile(re.replace("''", "'"))
          Some(cols.filter(c => p.matcher(c).matches()))
        } catch { case _: Exception => None }
      case _ => None
    }
  }

  // ------------------------------------------------------------- scanning

  /** Index of the first depth-0, non-literal occurrence of `word`. */
  private def topLevelWord(sql: String, word: String, from: Int): Int = {
    var i = from
    var depth = 0
    while (i < sql.length) {
      sql.charAt(i) match {
        case '\'' => i = SqlText.literalEnd(sql, i) - 1
        case '(' => depth += 1
        case ')' => depth -= 1
        case c if depth == 0 && (c.isLetter || c == '_') =>
          var j = i
          while (j < sql.length && (sql.charAt(j).isLetterOrDigit || sql.charAt(j) == '_'))
            j += 1
          if (sql.substring(i, j).equalsIgnoreCase(word)) return i
          i = j - 1
        case _ => ()
      }
      i += 1
    }
    -1
  }

  private def insideLiteral(sql: String, pos: Int): Boolean = {
    var i = 0
    while (i < sql.length && i <= pos) {
      if (sql.charAt(i) == '\'') {
        val end = SqlText.literalEnd(sql, i)
        if (pos >= i && pos < end) return true
        i = end
      } else i += 1
    }
    false
  }

  private def matchingParen(sql: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < sql.length) {
      sql.charAt(i) match {
        case '\'' => i = SqlText.literalEnd(sql, i) - 1
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i
        case _ => ()
      }
      i += 1
    }
    -1
  }

  private def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => i = SqlText.literalEnd(s, i) - 1
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case ',' if depth == 0 =>
          out += s.substring(start, i)
          start = i + 1
        case _ => ()
      }
      i += 1
    }
    out += s.substring(start)
    out.filter(_.trim.nonEmpty).toSeq
  }
}
