package graft.dialect

/** DuckDB `ASOF [LEFT] JOIN` SQL (duckdb docs/sql/query_syntax/from): each
  * left row matches the single right row with the same equality keys whose
  * time is the latest ≤ the left time (or earliest ≥, for the forward
  * form). Spark has no ASOF join; the statement is rewritten TEXTUALLY into
  * a plain equi-join against the right side augmented with each row's next
  * (resp. previous) time per key:
  *
  * {{{
  * L a ASOF JOIN R b ON a.k = b.k AND a.t >= b.t
  * -- becomes
  * L a JOIN (SELECT *, lead(t) OVER (PARTITION BY k ORDER BY t)
  *           AS __asof_nxt FROM R __asof_src) b
  *   ON a.k = b.k AND a.t >= b.t
  *      AND (b.__asof_nxt IS NULL OR a.t < b.__asof_nxt)
  * }}}
  *
  * Each right row's [t, next_t) interval tiles the key's timeline, so every
  * left row joins AT MOST ONE right row — exactly the ASOF result. The
  * rewrite keeps both relation aliases intact (outer references like
  * `a.col` / `b.col` still resolve), which a subquery-flattening rewrite
  * could not do.
  *
  * Scale shape: an equi-join on the keys (shuffle or AQE broadcast, both
  * sides partitioned by key — no single-task stage) plus one window over
  * the RIGHT side only, partitioned by the same keys. A hot key degrades to
  * per-key scan cost like any non-equi residual; the programmatic
  * [[graft.operators.TemporalJoins.asofJoin]] (union + running last) and
  * [[graft.scale.Scale.segmentedAsofJoin]] (skew-sliced) remain the
  * operator-level paths.
  *
  * Supported ON form: a conjunction of alias-qualified column equalities
  * plus exactly ONE inequality (`>=`, `>`, `<=`, `<`) between a left
  * expression and a right column. Anything else (OR-conditions, function
  * calls over the right time, missing alias on a subquery) is left
  * untouched and surfaces as Spark's own parse error. Ties between equal
  * right times are resolved arbitrarily in both engines — oracle queries
  * deduplicate the right side per (key, time) first.
  *
  * Output deviation (documented): the augmented right side exposes one
  * helper column (`__asof_nxt`/`__asof_prv`), so `SELECT *` over an ASOF
  * join includes it; explicit projections are unaffected.
  */
object AsofJoinSql {

  private val AsofRe = java.util.regex.Pattern.compile(
    "(?i)\\bASOF\\s+(LEFT\\s+)?JOIN\\b")

  def rewrite(sql: String): String = {
    var cur = sql
    var guard = 0
    var changed = true
    while (changed && guard < 16) {
      changed = false
      guard += 1
      val m = AsofRe.matcher(cur)
      var search = 0
      var done = false
      while (!done && m.find(search)) {
        if (insideLiteral(cur, m.start())) search = m.end()
        else rewriteOne(cur, m.start(), m.end(), m.group(1) != null) match {
          case Some(next) => cur = next; changed = true; done = true
          case None => search = m.end()
        }
      }
    }
    cur
  }

  private def rewriteOne(sql: String, asofStart: Int, joinEnd: Int,
      isLeft: Boolean): Option[String] = {
    var i = skipWs(sql, joinEnd)
    // right relation: parenthesized subquery or a (possibly dotted) name
    val (rightText, afterRight) =
      if (i < sql.length && sql.charAt(i) == '(') {
        val close = matchingParen(sql, i)
        if (close < 0) return None
        (sql.substring(i, close + 1), close + 1)
      } else {
        var j = i
        while (j < sql.length && (sql.charAt(j).isLetterOrDigit ||
            "._`\"".indexOf(sql.charAt(j)) >= 0)) j += 1
        if (j == i) return None
        (sql.substring(i, j), j)
      }
    // optional alias (AS x | x), then mandatory ON
    i = skipWs(sql, afterRight)
    var alias = ""
    val w1 = word(sql, i)
    if (w1.equalsIgnoreCase("as")) {
      i = skipWs(sql, i + w1.length)
      val a = word(sql, i)
      if (a.isEmpty) return None
      alias = a; i += a.length
    } else if (w1.nonEmpty && !w1.equalsIgnoreCase("on")) {
      alias = w1; i += w1.length
    }
    if (alias.isEmpty) {
      if (rightText.startsWith("(")) return None // subquery needs an alias
      alias = rightText.substring(rightText.lastIndexOf('.') + 1)
        .replaceAll("[`\"]", "")
    }
    i = skipWs(sql, i)
    val w2 = word(sql, i)
    if (!w2.equalsIgnoreCase("on")) return None
    i = skipWs(sql, i + w2.length)
    val condEnd = findCondEnd(sql, i)
    val cond = sql.substring(i, condEnd).trim
    if (cond.isEmpty) return None

    // classify the conjunction: equalities on the right alias + ONE
    // inequality against a right column
    val CmpRe = """(?s)^\s*([\w.`"]+)\s*(>=|<=|>|<|=)\s*([\w.`"]+)\s*$""".r
    val ap = alias.toLowerCase + "."
    def isRight(ref: String) = ref.toLowerCase.startsWith(ap)
    def bare(ref: String) = ref.substring(alias.length + 1)
    def flip(op: String) = op match {
      case ">=" => "<="; case "<=" => ">="; case ">" => "<"; case "<" => ">"
      case other => other
    }
    var eqKeys = List.empty[String]
    var ineq: Option[(String, String, String)] = None
    for (part <- splitAnd(cond)) part match {
      case CmpRe(a, op, b) =>
        val (l, rRef, o) =
          if (isRight(b) && !isRight(a)) (a, b, op)
          else if (isRight(a) && !isRight(b)) (b, a, flip(op))
          else return None
        if (o == "=") eqKeys ::= bare(rRef)
        else if (ineq.isDefined) return None
        else ineq = Some((l, o, bare(rRef)))
      case _ => return None
    }
    val (lexpr, op, tcol) = ineq.getOrElse(return None)

    val (helperFn, helperName, boundOp) = op match {
      case ">=" => ("lead", "__asof_nxt", "<")
      case ">" => ("lead", "__asof_nxt", "<=")
      case "<=" => ("lag", "__asof_prv", ">")
      case _ => ("lag", "__asof_prv", ">=")
    }
    val partBy =
      if (eqKeys.isEmpty) ""
      else s"PARTITION BY ${eqKeys.reverse.mkString(", ")} "
    val newRight = s"(SELECT *, $helperFn($tcol) OVER (${partBy}ORDER BY " +
      s"$tcol) AS $helperName FROM $rightText __asof_src)"
    val bound = s"($alias.$helperName IS NULL OR $lexpr $boundOp $alias.$helperName)"
    val joinWord = if (isLeft) "LEFT JOIN" else "JOIN"
    Some(sql.substring(0, asofStart) +
      s"$joinWord $newRight $alias ON $cond AND $bound" +
      sql.substring(condEnd))
  }

  // -------------------------------------------------------------- scanning

  /** End of the ON condition: the next clause keyword, depth-0 comma (next
    * FROM item), or the ')' closing the enclosing subquery. */
  private val CondStop = Set(
    "where", "group", "order", "having", "qualify", "window", "limit",
    "union", "intersect", "except", "join", "inner", "left", "right",
    "full", "cross", "asof", "semi", "anti")

  private def findCondEnd(sql: String, from: Int): Int = {
    var i = from
    var depth = 0
    while (i < sql.length) {
      sql.charAt(i) match {
        case '\'' => i = SqlText.literalEnd(sql, i) - 1
        case '(' => depth += 1
        case ')' =>
          if (depth == 0) return i
          depth -= 1
        case ',' if depth == 0 => return i
        case c if depth == 0 && (c.isLetter || c == '_') =>
          val w = word(sql, i)
          if (CondStop.contains(w.toLowerCase)) return i
          i += w.length - 1
        case _ => ()
      }
      i += 1
    }
    sql.length
  }

  /** Split on top-level AND (paren- and literal-aware, case-insensitive). */
  private def splitAnd(cond: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var depth = 0
    var start = 0
    var i = 0
    while (i < cond.length) {
      cond.charAt(i) match {
        case '\'' => i = SqlText.literalEnd(cond, i) - 1
        case '(' => depth += 1
        case ')' => depth -= 1
        case c if depth == 0 && (c.isLetter || c == '_') =>
          val w = word(cond, i)
          if (w.equalsIgnoreCase("and")) {
            out += cond.substring(start, i)
            start = i + w.length
          }
          i += w.length - 1
        case _ => ()
      }
      i += 1
    }
    out += cond.substring(start)
    out.toSeq
  }

  private def skipWs(sql: String, from: Int): Int = {
    var i = from
    while (i < sql.length && sql.charAt(i).isWhitespace) i += 1
    i
  }

  private def word(sql: String, at: Int): String = {
    var j = at
    while (j < sql.length && (sql.charAt(j).isLetterOrDigit || sql.charAt(j) == '_'))
      j += 1
    sql.substring(at, j)
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
}
