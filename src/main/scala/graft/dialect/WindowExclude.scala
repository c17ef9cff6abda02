package graft.dialect

/** Window-frame `EXCLUDE CURRENT ROW` (duckdb docs/sql/functions/window —
  * the frame-exclusion clause; standard SQL:2016 T620), which Spark's
  * window specs lack entirely.
  *
  * Rewritten by splitting the ROWS frame around the current row:
  * `agg(x) OVER (ROWS BETWEEN a AND b EXCLUDE CURRENT ROW)` becomes the
  * combination of `agg(x)` over `[a, 1 PRECEDING]` and over
  * `[1 FOLLOWING, b]`. The split form is exact for every supported
  * aggregate — unlike the subtract-the-current-row trick, which cannot
  * express min/max — and both halves stay ordinary Spark window frames
  * (same partitioning, same sort, evaluated in one Window operator since
  * the specs share partition+order), so the plan shape at scale is the
  * plain two-frame window, nothing extra.
  *
  * Combination rules (NULL = empty-frame aggregate, as both engines
  * define it):
  *  - sum:   NULL iff both halves NULL, else coalesce(l,0)+coalesce(r,0)
  *  - count: l + r (count is never NULL; an empty half contributes 0)
  *  - min:   least skipping NULL halves;  max: greatest likewise
  *  - avg:   split sum / split count(x), cast to DOUBLE (deviation: DuckDB
  *           keeps DECIMAL averages exact; this engine's avg is DOUBLE)
  *
  * Scope: explicit `ROWS BETWEEN` frames whose start is `UNBOUNDED
  * PRECEDING` / `k PRECEDING` / `CURRENT ROW` and end is `CURRENT ROW` /
  * `k FOLLOWING` / `UNBOUNDED FOLLOWING` — a start of CURRENT ROW makes
  * the left half empty (NULL/0 literal), symmetrically for the end.
  * `EXCLUDE NO OTHERS` (the default) is stripped. RANGE/GROUPS frames and
  * `EXCLUDE TIES/GROUP` pass through untouched for Spark to reject
  * loudly: a rows-wise split would cut peer groups in half, silently
  * wrong.
  */
object WindowExclude {

  private val AggCall =
    java.util.regex.Pattern.compile("(?i)\\b(sum|count|avg|min|max)\\s*\\(")
  private val ExcludeCur =
    java.util.regex.Pattern.compile("(?i)\\bEXCLUDE\\s+CURRENT\\s+ROW\\s*$")
  private val ExcludeNone =
    java.util.regex.Pattern.compile("(?i)\\bEXCLUDE\\s+NO\\s+OTHERS\\s*$")
  private val RowsBetween =
    java.util.regex.Pattern.compile("(?i)\\bROWS\\s+BETWEEN\\s+")
  private val Over = java.util.regex.Pattern.compile("(?i)\\s*OVER\\s*\\(")

  def rewrite(sql: String): String = {
    var out = inlineNamed(sql)
    var changed = true
    while (changed) {
      changed = false
      rewriteOne(out) match {
        case Some(next) => out = next; changed = true
        case None =>
      }
    }
    out
  }

  private val WindowClause =
    java.util.regex.Pattern.compile("(?i)\\bWINDOW\\s+")
  private val NamedDef =
    java.util.regex.Pattern.compile("(?i)\\s*([A-Za-z_][A-Za-z0-9_]*)\\s+AS\\s*\\(")

  /** Inline `WINDOW w AS (spec)` definitions when any spec carries an
    * EXCLUDE clause: every `OVER w` becomes `OVER (spec)` and the WINDOW
    * clause is dropped, so the per-aggregate expansion sees inline specs.
    * WINDOW clauses without EXCLUDE are left for Spark's native named
    * windows. Window specs that reference other window names are out of
    * scope (left untouched). */
  private def inlineNamed(sql: String): String = {
    val wm = WindowClause.matcher(sql)
    var from = 0
    while (true) {
      var start = -1
      var i = from
      while (i < sql.length && start < 0) {
        sql.charAt(i) match {
          case '\'' => i = SqlText.literalEnd(sql, i)
          case _ =>
            wm.region(i, sql.length)
            if (wm.lookingAt()) start = i else i += 1
        }
      }
      if (start < 0) return sql
      // parse `name AS (spec) [, name AS (spec)]*`
      var defs = List.empty[(String, String)]
      var pos = wm.end
      var ok = true
      var done = false
      while (ok && !done) {
        val dm = NamedDef.matcher(sql)
        dm.region(pos, sql.length)
        if (dm.lookingAt()) {
          val close = groupEnd(sql, dm.end - 1)
          defs ::= (dm.group(1), sql.substring(dm.end, close - 1))
          var j = close
          while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
          if (j < sql.length && sql.charAt(j) == ',') pos = j + 1
          else { pos = close; done = true }
        } else ok = false
      }
      if (ok && defs.exists(d =>
          java.util.regex.Pattern.compile("(?i)\\bEXCLUDE\\b").matcher(d._2).find())) {
        var out = sql.substring(0, start) + sql.substring(pos)
        defs.foreach { case (name, spec) =>
          out = out.replaceAll("(?i)\\bOVER\\s+" + name + "\\b",
            java.util.regex.Matcher.quoteReplacement(s"OVER ($spec)"))
        }
        return inlineNamed(out)
      }
      from = if (ok) pos else start + 6
      if (from >= sql.length) return sql
    }
    sql
  }

  /** Rewrite the first `agg(...) OVER (... EXCLUDE CURRENT ROW)` found
    * outside literals, or None when none (or an unsupported shape) left. */
  private def rewriteOne(sql: String): Option[String] = {
    val m = AggCall.matcher(sql)
    var i = 0
    while (i < sql.length) {
      sql.charAt(i) match {
        case '\'' => i = SqlText.literalEnd(sql, i)
        case _ =>
          m.region(i, sql.length)
          if (m.lookingAt()) {
            val fn = m.group(1).toLowerCase
            val argsOpen = m.end - 1
            val argsClose = groupEnd(sql, argsOpen)
            val args = sql.substring(argsOpen + 1, argsClose - 1)
            val om = Over.matcher(sql)
            om.region(argsClose, sql.length)
            if (om.lookingAt()) {
              val specOpen = om.end - 1
              val specClose = groupEnd(sql, specOpen)
              val spec = sql.substring(specOpen + 1, specClose - 1)
              expand(fn, args, spec).foreach { repl =>
                return Some(sql.substring(0, i) + repl + sql.substring(specClose))
              }
              i = m.end
            } else i = m.end
          } else i += 1
      }
    }
    None
  }

  /** The split-frame expression for one call, or None when the spec has no
    * (supported) exclusion. */
  private def expand(fn: String, args: String, spec: String): Option[String] = {
    val none = ExcludeNone.matcher(spec)
    if (none.find())
      return Some(s"$fn($args) OVER (${spec.substring(0, none.start).trim})")
    val ex = ExcludeCur.matcher(spec)
    if (!ex.find()) return None
    val body = spec.substring(0, ex.start).trim
    val rb = RowsBetween.matcher(body)
    if (!rb.find()) return None
    val base = body.substring(0, rb.start).trim
    val bounds = body.substring(rb.end).trim
    val andM = java.util.regex.Pattern.compile("(?i)\\s+AND\\s+").matcher(bounds)
    if (!andM.find()) return None
    val lo = bounds.substring(0, andM.start).trim
    val hi = bounds.substring(andM.end).trim
    val loCur = lo.equalsIgnoreCase("CURRENT ROW") ||
      lo.matches("(?i)0\\s+PRECEDING|0\\s+FOLLOWING")
    val hiCur = hi.equalsIgnoreCase("CURRENT ROW") ||
      hi.matches("(?i)0\\s+PRECEDING|0\\s+FOLLOWING")
    if (!loCur && !lo.matches("(?i)(UNBOUNDED|\\d+)\\s+PRECEDING")) return None
    if (!hiCur && !hi.matches("(?i)(UNBOUNDED|\\d+)\\s+FOLLOWING")) return None
    def half(f: String, a: String, b: String) =
      s"$f($a) OVER ($base ROWS BETWEEN $b)"
    val l = if (loCur) None else Some((f: String, a: String) =>
      half(f, a, s"$lo AND 1 PRECEDING"))
    val r = if (hiCur) None else Some((f: String, a: String) =>
      half(f, a, s"1 FOLLOWING AND $hi"))
    def sumOf(f: String, a: String, empty: String, combine: (String, String) => String) =
      (l, r) match {
        case (Some(lf), Some(rf)) => combine(lf(f, a), rf(f, a))
        case (Some(lf), None) => lf(f, a)
        case (None, Some(rf)) => rf(f, a)
        case (None, None) => empty
      }
    def addNullable(a: String, b: String) =
      s"(CASE WHEN $a IS NULL AND $b IS NULL THEN NULL " +
        s"ELSE coalesce($a, 0) + coalesce($b, 0) END)"
    def extremum(pick: String)(a: String, b: String) =
      s"(CASE WHEN $a IS NULL THEN $b WHEN $b IS NULL THEN $a " +
        s"ELSE $pick($a, $b) END)"
    Some(fn match {
      case "sum" => sumOf("sum", args, "NULL", addNullable)
      case "count" => sumOf("count", args, "0",
        (a, b) => s"($a + $b)")
      case "min" => sumOf("min", args, "NULL", extremum("least"))
      case "max" => sumOf("max", args, "NULL", extremum("greatest"))
      case "avg" =>
        val s = sumOf("sum", args, "NULL", addNullable)
        val c = sumOf("count", args, "0", (a, b) => s"($a + $b)")
        s"(CAST($s AS DOUBLE) / nullif($c, 0))"
    })
  }

  private def groupEnd(sql: String, open: Int): Int = {
    var depth = 1
    var j = open + 1
    while (j < sql.length && depth > 0) {
      sql.charAt(j) match {
        case '\'' => j = SqlText.literalEnd(sql, j)
        case '(' => depth += 1; j += 1
        case ')' => depth -= 1; j += 1
        case _ => j += 1
      }
    }
    j
  }
}
