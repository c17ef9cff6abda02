package graft.dialect

/** Rewrites integer-target casts to the rounding [[graft.functions
  * .GraftIntCast]] (DuckDB numeric→int casts ROUND; Spark's truncate):
  *
  *   CAST(e AS INT)   → graft_icast(e, 'int')
  *   e::BIGINT        → graft_icast(e, 'bigint')
  *
  * Handled targets: TINYINT/SMALLINT/INT/INTEGER/BIGINT. `::INTERVAL`
  * (word-boundary) and array types (`INT[]`, `INT[3]`) are excluded.
  * The `::` operand is found with the same backward scan the bracket
  * pass uses (identifier chains, parenthesized calls, literals).
  *
  * Casts whose operand contains a window `OVER` keep the plain Spark
  * Cast: the frame-EXCLUDE machinery pattern-matches `CAST(agg(...)
  * OVER ...)` text and must keep seeing it (and window aggregates over
  * integral measures — every declared case — round and truncate
  * identically; a fractional window sum cast to int is the one corner
  * that stays truncating, documented here). */
object IntCastSyntax {

  private val Targets = Map(
    "tinyint" -> "tinyint", "smallint" -> "smallint", "int" -> "int",
    "integer" -> "int", "bigint" -> "bigint")

  private val CastOpen = java.util.regex.Pattern.compile("(?i)\\bCAST\\s*\\(")
  private val ColonType = java.util.regex.Pattern.compile(
    "::\\s*(?i:(TINYINT|SMALLINT|INTEGER|INT|BIGINT))(?![A-Za-z0-9_])(?!\\s*\\[)")

  /** Prefix-position `-literal::TYPE` (round-14 grid): Spark's parser
    * folds the minus INTO the numeric literal (losing the IEEE sign of
    * -0.0 through the DECIMAL intermediate, and the out-of-range error
    * of -128::TINYINT — DuckDB applies unary minus AFTER the cast).
    * Rewritten to (- (literal::TYPE)) — the parenthesized operand is no
    * longer a literal token, so UnaryMinus applies after the cast and
    * PRESERVES ITS TYPE (a (-1)·x spelling would widen TINYINT to INT
    * and break bit_count's width dispatch). Fires only when the minus is
    * unambiguously unary (preceded by start / open-paren / comma / an
    * operator), the `**` discipline. */
  private val PrefixMinusCast = java.util.regex.Pattern.compile(
    """(^|[(,=<>+\-*/%])(\s*)-\s*((?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)\s*::\s*(\w+(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)""")

  def rewrite(sql: String): String = {
    val noFold = SqlText.mapOutsideLiterals(sql) { seg =>
      PrefixMinusCast.matcher(seg).replaceAll("$1$2(- ($3::$4))")
    }
    colonCasts(castCalls(noFold))
  }

  // ------------------------------------------------- CAST(e AS INT) form
  private def castCalls(sql: String): String = {
    val m = CastOpen.matcher(sql)
    var out = sql
    var guard = 0
    var changed = true
    while (changed && guard < 256) {
      guard += 1
      changed = false
      m.reset(out)
      var search = 0
      while (!changed && m.find(search)) {
        if (insideLiteral(out, m.start())) search = m.end()
        else {
          val open = m.end() - 1
          val close = closeParen(out, open) // past ')'
          val inner = out.substring(open + 1, close - 1)
          lastTopLevelAs(inner) match {
            case Some(asIdx) =>
              val expr = inner.substring(0, asIdx).trim
              val tpe = inner.substring(asIdx + 2).trim.toLowerCase
              Targets.get(tpe) match {
                case Some(t) if expr.nonEmpty && !containsOver(expr) =>
                  out = out.substring(0, m.start()) +
                    s"graft_icast($expr, '$t')" + out.substring(close)
                  changed = true
                case _ => search = m.end()
              }
            case None => search = m.end()
          }
        }
      }
    }
    out
  }

  /** Index of the LAST top-level ` AS ` in the cast body, or None. */
  private def lastTopLevelAs(s: String): Option[Int] = {
    var i = 0
    var depth = 0
    var last = -1
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => i = SqlText.literalEnd(s, i)
        case '(' | '[' => depth += 1; i += 1
        case ')' | ']' => depth -= 1; i += 1
        case c if depth == 0 && (c == 'a' || c == 'A') &&
            (i == 0 || !isIdentChar(s.charAt(i - 1))) &&
            i + 2 < s.length &&
            (s.charAt(i + 1) == 's' || s.charAt(i + 1) == 'S') &&
            !isIdentChar(s.charAt(i + 2)) =>
          last = i // the expr is substring(0, last), the type substring(last + 2)
          i += 2
        case _ => i += 1
      }
    }
    if (last < 0) None else Some(last)
  }

  // ------------------------------------------------------- e::INT form
  private def colonCasts(sql: String): String = {
    val m = ColonType.matcher(sql)
    var out = sql
    var guard = 0
    var changed = true
    while (changed && guard < 256) {
      guard += 1
      changed = false
      m.reset(out)
      var search = 0
      while (!changed && m.find(search)) {
        if (insideLiteral(out, m.start())) search = m.end()
        else {
          val vs = valueStart(out, m.start())
          val v = out.substring(vs, m.start())
          if (v.trim.nonEmpty && !containsOver(v)) {
            val t = Targets(m.group(1).toLowerCase)
            out = out.substring(0, vs) +
              s"graft_icast(${v.trim}, '$t')" + out.substring(m.end())
            changed = true
          } else search = m.end()
        }
      }
    }
    out
  }

  /** Start of the value a postfix `::` applies to: identifier chains with
    * dots, close-parens/brackets with their groups, string literals. */
  private def valueStart(sql: String, colonIdx: Int): Int = {
    var i = colonIdx - 1
    while (i >= 0) {
      val ch = sql.charAt(i)
      if (ch == ')' || ch == ']') {
        val open = if (ch == ')') '(' else '['
        var depth = 0
        var j = i
        var found = -1
        while (j >= 0 && found < 0) {
          val cj = sql.charAt(j)
          if (cj == ch) depth += 1
          else if (cj == open) { depth -= 1; if (depth == 0) found = j }
          j -= 1
        }
        if (found < 0) return i + 1
        i = found - 1
      } else if (ch == '\'') {
        var j = i - 1
        while (j >= 0 && sql.charAt(j) != '\'') j -= 1
        if (j < 0) return i + 1
        i = j - 1
      } else if (isIdentChar(ch) || ch == '.' || ch == '`' || ch == '"') i -= 1
      else return i + 1
    }
    0
  }

  private def isIdentChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  /** The word OVER outside string literals — window casts stay plain. */
  private def containsOver(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => i = SqlText.literalEnd(s, i)
        case c if (c == 'o' || c == 'O') &&
            (i == 0 || !isIdentChar(s.charAt(i - 1))) &&
            s.regionMatches(true, i, "OVER", 0, 4) &&
            (i + 4 >= s.length || !isIdentChar(s.charAt(i + 4))) =>
          return true
        case _ => i += 1
      }
    }
    false
  }

  private def insideLiteral(sql: String, pos: Int): Boolean = {
    var i = 0
    while (i < pos) {
      if (sql.charAt(i) == '\'') {
        val e = SqlText.literalEnd(sql, i)
        if (pos < e) return true
        i = e
      } else i += 1
    }
    false
  }

  private def closeParen(sql: String, open: Int): Int = {
    var i = open
    var depth = 0
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
}
