package graft.dialect

/** DuckDB FROM-first query syntax (reference: duckdb SELECT-statement
  * grammar, "FROM-first syntax"; the wasm shell accepts these verbatim):
  *
  *   FROM t                          → SELECT * FROM t
  *   FROM t WHERE p                  → SELECT * FROM t WHERE p
  *   FROM t SELECT a, b              → SELECT a, b FROM t
  *   FROM t SELECT a WHERE p         → SELECT a FROM t WHERE p
  *   WITH c AS (...) FROM c          → WITH c AS (...) SELECT * FROM c
  *   SELECT * FROM (FROM t)          → SELECT * FROM (SELECT * FROM t)
  *   FROM a UNION ALL FROM b         → both branches rewritten
  *
  * Grammar note (verified against DuckDB 1.0): the optional SELECT clause
  * may appear ONLY directly after the from-list — `FROM t WHERE p SELECT
  * x` is a DuckDB parse error — so relocation never crosses WHERE/GROUP/
  * ORDER text. Query-block starts are: statement start (after an optional
  * WITH definition list), directly after '(' (subqueries, CTE bodies),
  * and after a top-level set-operation keyword. Literals and comments are
  * skipped everywhere; blocks not starting with FROM pass through
  * byte-identically.
  */
object FromFirst {

  private val SetOp =
    java.util.regex.Pattern.compile("(?i)\\b(UNION|INTERSECT|EXCEPT)\\b")
  /** Clause keywords that may follow the from-list (end the relocated
    * SELECT list / the block scan). ON/USING/JOIN etc. stay inside the
    * from-list text and are never scanned for. */
  private val ClauseKw = java.util.regex.Pattern.compile(
    "(?i)\\b(WHERE|GROUP|HAVING|WINDOW|QUALIFY|ORDER|LIMIT|OFFSET)\\b")
  private val SelectKw = java.util.regex.Pattern.compile("(?i)\\bSELECT\\b")
  private val FromKw = java.util.regex.Pattern.compile("(?i)\\bFROM\\b")
  private val WithKw = java.util.regex.Pattern.compile("(?i)\\bWITH\\b")
  private val Ident =
    java.util.regex.Pattern.compile("[A-Za-z_][A-Za-z0-9_]*")

  private def lookingAt(p: java.util.regex.Pattern, sql: String, i: Int): Boolean = {
    val m = p.matcher(sql); m.region(i, sql.length); m.lookingAt()
  }

  def rewrite(sql: String): String = {
    var out = sql
    var changed = true
    var guard = 0
    while (changed && guard < 256) {
      guard += 1
      firstFromBlock(out) match {
        case Some(fromIdx) => out = rewriteOne(out, fromIdx)
        case None => changed = false
      }
    }
    out
  }

  /** Index of the FROM keyword of the first query block that starts with
    * FROM, or None. */
  private def firstFromBlock(sql: String): Option[Int] = {
    // statement start (handles a leading WITH definition list)
    val stmtQ = afterWith(sql, SqlText.skipWsAndComments(sql, 0))
    if (lookingAt(FromKw, sql, stmtQ)) return Some(stmtQ)
    var i = 0
    while (i < sql.length) {
      sql.charAt(i) match {
        case '\'' => i = SqlText.literalEnd(sql, i)
        case '-' | '/' =>
          val ce = SqlText.commentEnd(sql, i)
          if (ce > i) i = ce else i += 1
        case '(' =>
          val q = SqlText.skipWsAndComments(sql, i + 1)
          if (lookingAt(FromKw, sql, q)) return Some(q)
          i += 1
        case c if c == 'u' || c == 'U' || c == 'i' || c == 'I' ||
                  c == 'e' || c == 'E' =>
          val m = SetOp.matcher(sql); m.region(i, sql.length)
          if (m.lookingAt() && isWordStart(sql, i)) {
            var q = SqlText.skipWsAndComments(sql, m.end)
            // optional ALL | DISTINCT | BY NAME modifiers
            var more = true
            while (more) {
              more = false
              for (kw <- Seq("ALL", "DISTINCT", "BY", "NAME")) {
                if (sql.regionMatches(true, q, kw, 0, kw.length) &&
                    (q + kw.length >= sql.length ||
                      !isIdentChar(sql.charAt(q + kw.length)))) {
                  q = SqlText.skipWsAndComments(sql, q + kw.length)
                  more = true
                }
              }
            }
            if (lookingAt(FromKw, sql, q)) return Some(q)
            i = m.end
          } else i += 1
        case _ => i += 1
      }
    }
    None
  }

  private def isIdentChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '_'

  private def isWordStart(sql: String, i: Int): Boolean =
    i == 0 || !isIdentChar(sql.charAt(i - 1))

  /** Skip a leading `WITH [RECURSIVE] name [(cols)] AS [MATERIALIZED] (...)
    * [, ...]` definition list; returns the position of the main query. */
  private def afterWith(sql: String, start: Int): Int = {
    if (!lookingAt(WithKw, sql, start)) return start
    var i = SqlText.skipWsAndComments(sql, start + 4)
    if (sql.regionMatches(true, i, "RECURSIVE", 0, 9) &&
        (i + 9 >= sql.length || !isIdentChar(sql.charAt(i + 9))))
      i = SqlText.skipWsAndComments(sql, i + 9)
    var done = false
    while (!done) {
      val im = Ident.matcher(sql); im.region(i, sql.length)
      if (!im.lookingAt()) return start // not a WITH list we understand
      i = SqlText.skipWsAndComments(sql, im.end)
      if (i < sql.length && sql.charAt(i) == '(') // column alias list
        i = SqlText.skipWsAndComments(sql, closeParen(sql, i))
      if (!sql.regionMatches(true, i, "AS", 0, 2)) return start
      i = SqlText.skipWsAndComments(sql, i + 2)
      for (kw <- Seq("NOT", "MATERIALIZED"))
        if (sql.regionMatches(true, i, kw, 0, kw.length) &&
            (i + kw.length >= sql.length || !isIdentChar(sql.charAt(i + kw.length))))
          i = SqlText.skipWsAndComments(sql, i + kw.length)
      if (i >= sql.length || sql.charAt(i) != '(') return start
      i = SqlText.skipWsAndComments(sql, closeParen(sql, i))
      if (i < sql.length && sql.charAt(i) == ',')
        i = SqlText.skipWsAndComments(sql, i + 1)
      else done = true
    }
    i
  }

  /** Index just past the ')' matching the '(' at `open` (literal/comment
    * aware). */
  private def closeParen(sql: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < sql.length) {
      sql.charAt(i) match {
        case '\'' => i = SqlText.literalEnd(sql, i)
        case '-' | '/' =>
          val ce = SqlText.commentEnd(sql, i)
          if (ce > i) i = ce else i += 1
        case '(' => depth += 1; i += 1
        case ')' =>
          depth -= 1; i += 1
          if (depth == 0) return i
        case _ => i += 1
      }
    }
    sql.length
  }

  /** Rewrite the single FROM-first block whose FROM keyword sits at
    * `fromIdx`: relocate its optional SELECT clause to the front, or
    * synthesize `SELECT *`. */
  private def rewriteOne(sql: String, fromIdx: Int): String = {
    // scan the block for a top-level SELECT (only legal directly after the
    // from-list) and the block end (enclosing ')', set-op keyword, ';').
    var i = fromIdx + 4
    var selIdx = -1
    var blockEnd = sql.length
    var scanning = true
    var sig = ' ' // last significant char: '*' exempts a star-EXCEPT modifier
    while (scanning && i < sql.length) {
      sql.charAt(i) match {
        case '\'' => sig = '\''; i = SqlText.literalEnd(sql, i)
        case '-' | '/' =>
          val ce = SqlText.commentEnd(sql, i)
          if (ce > i) i = ce else { sig = sql.charAt(i); i += 1 }
        case '(' => sig = ')'; i = closeParen(sql, i)
        case ')' | ';' => blockEnd = i; scanning = false
        case c if isIdentChar(c) && isWordStart(sql, i) =>
          if (lookingAt(SelectKw, sql, i) && selIdx < 0) {
            selIdx = i; sig = 'T'; i += 6
          } else if (sql.regionMatches(true, i, "EXCEPT", 0, 6) && sig == '*' &&
                     (i + 6 >= sql.length || !isIdentChar(sql.charAt(i + 6)))) {
            sig = 'T'; i += 6 // `* EXCEPT (cols)` star modifier, not a set op
          } else {
            val m = SetOp.matcher(sql); m.region(i, sql.length)
            if (m.lookingAt()) { blockEnd = i; scanning = false }
            else {
              val im = Ident.matcher(sql); im.region(i, sql.length)
              sig = 'x'
              i = if (im.lookingAt()) im.end else i + 1
            }
          }
        case c =>
          if (!c.isWhitespace) sig = c
          i += 1
      }
    }
    if (selIdx < 0)
      sql.substring(0, fromIdx) + "SELECT * " + sql.substring(fromIdx)
    else {
      // select list: from after SELECT to the next top-level clause keyword.
      // `* EXCEPT (cols)` is a star modifier, not a set op — tracked via
      // the last significant char.
      var j = selIdx + 6
      var listEnd = blockEnd
      var inList = true
      var lastSig = ' '
      while (inList && j < blockEnd) {
        sql.charAt(j) match {
          case '\'' => lastSig = '\''; j = SqlText.literalEnd(sql, j)
          case '-' | '/' =>
            val ce = SqlText.commentEnd(sql, j)
            if (ce > j) j = ce else { lastSig = sql.charAt(j); j += 1 }
          case '(' => lastSig = ')'; j = closeParen(sql, j)
          case c if isIdentChar(c) && isWordStart(sql, j) =>
            if (sql.regionMatches(true, j, "EXCEPT", 0, 6) && lastSig == '*' &&
                (j + 6 >= sql.length || !isIdentChar(sql.charAt(j + 6)))) {
              lastSig = 'T'; j += 6 // star modifier: stays in the list
            } else if (lookingAt(ClauseKw, sql, j)) { listEnd = j; inList = false }
            else {
              val im = Ident.matcher(sql); im.region(j, sql.length)
              lastSig = 'x'
              j = if (im.lookingAt()) im.end else j + 1
            }
          case c =>
            if (!c.isWhitespace) lastSig = c
            j += 1
        }
      }
      // raw-span reconstruction: spans keep their own whitespace and the
      // newline separator terminates any trailing `--` comment in the
      // select clause, so comments never swallow the relocated FROM text
      sql.substring(0, fromIdx) + sql.substring(selIdx, listEnd) + "\n" +
        sql.substring(fromIdx, selIdx) + sql.substring(listEnd)
    }
  }
}
