package graft.dialect

/** DuckDB function spellings mapped onto Spark equivalents, so reference
  * query text runs unchanged (reference surface: duckdb docs/sql/functions/
  * list + text; exercised all over the reference's own tests, e.g.
  * `packages/duckdb-wasm/test/bindings.test.ts` uses list/unnest forms).
  *
  * Three rewrite shapes, all literal-aware (string constants pass through
  * byte-identical):
  *
  *  1. NAME MAP — functions whose argument shape and semantics line up 1:1
  *     (`list_contains` → `array_contains`, `unnest` → `explode`, ...).
  *     Pure name substitution, the arguments are untouched.
  *  2. `string_split(e, 'sep')` — DuckDB splits on a PLAIN separator while
  *     Spark's `split` takes a regex, so a literal separator is regex-quoted
  *     (`\Q...\E`) in the emitted call. Non-literal separators pass through
  *     unchanged (no safe quoting exists at rewrite time).
  *  3. `range(n)` / `range(a, b)` list form — DuckDB is end-EXCLUSIVE and
  *     yields `[]` when the range is empty, while Spark's `sequence(a, b)`
  *     is end-inclusive and DESCENDS when a > b, so the rewrite guards with
  *     slice(..., greatest(0, n)) to reproduce the empty case.
  *
  * The rewrite is string-level and runs once on the driver; every emitted
  * function is a codegen'd Spark builtin, so nothing here affects the
  * physical plan shape at scale.
  */
object DialectFunctions {

  /** DuckDB name → Spark name, 1:1 argument shape and semantics:
    * `list_extract`/`element_at` are both 1-based, `list_sort`/`sort_array`
    * both default ASC NULLS FIRST, `regexp_split_to_array`/`split` both take
    * a regex. `array_length` → `size` narrows BIGINT → INT (callers that
    * compare widths cast explicitly, as DuckDB users already do). */
  private val NameMap: Seq[(String, String)] = Seq(
    "regexp_split_to_array" -> "split",
    "list_contains" -> "array_contains",
    "list_has" -> "array_contains",
    "list_extract" -> "element_at",
    "list_element" -> "element_at",
    "list_distinct" -> "array_distinct",
    "list_sort" -> "sort_array",
    "list_transform" -> "transform",
    "list_filter" -> "filter",
    "list_concat" -> "concat",
    "list_cat" -> "concat",
    "list_append" -> "array_append",
    "list_prepend" -> "array_prepend",
    "list_max" -> "array_max",
    "list_min" -> "array_min",
    "array_length" -> "size",
    "unnest" -> "explode",
    // string predicates/joins: same argument shapes and semantics
    "regexp_matches" -> "regexp_like",
    "starts_with" -> "startswith",
    "ends_with" -> "endswith",
    "array_to_string" -> "array_join")

  private val namePatterns: Seq[(java.util.regex.Pattern, String)] =
    NameMap.map { case (from, to) =>
      java.util.regex.Pattern.compile("(?i)\\b" + from + "\\s*\\(") -> (to + "(")
    }

  def rewrite(sql: String): String = {
    var out = SqlText.mapOutsideLiterals(sql) { seg =>
      namePatterns.foldLeft(seg) { case (s, (p, repl)) =>
        p.matcher(s).replaceAll(java.util.regex.Matcher.quoteReplacement(repl))
      }
    }
    out = rewriteCalls(out, "string_split|str_split") {
      case Seq(e, sep) if isLiteral(sep) =>
        Some(s"split($e, ${quoteRegexLiteral(sep)})")
      case _ => None
    }
    // DuckDB's JSON arrow operator `expr ->> 'path'` (VARCHAR extraction)
    // → get_json_object; a bare key normalizes to a '$.key' path like
    // DuckDB's binder does. `->` (JSON-typed result, quotes strings) has
    // no Spark twin and is left alone.
    out = rewriteArrow(out)
    // strftime/strptime carry C strftime patterns (reference surface:
    // insert_csv.test.ts:151-177 uses the same pattern family for CSV
    // options) — translate a literal format to the Java pattern Spark's
    // date_format/to_timestamp expect. Non-literal formats pass through.
    out = rewriteCalls(out, "strftime") {
      case Seq(e, fmt) if isLiteral(fmt) =>
        Some(s"date_format($e, ${javaPatternLit(fmt)})")
      case _ => None
    }
    // DuckDB epoch_ms(ts) ≡ Spark unix_millis, but parquet naive timestamps
    // surface as TIMESTAMP_NTZ which unix_millis rejects — the cast is
    // meaning-preserving because the engine session is pinned to UTC, the
    // same wall-clock interpretation DuckDB gives its (naive) TIMESTAMP.
    out = rewriteCalls(out, "epoch_ms") {
      case Seq(e) => Some(s"unix_millis(CAST($e AS TIMESTAMP))")
      case _ => None
    }
    out = rewriteCalls(out, "strptime") {
      case Seq(e, fmt) if isLiteral(fmt) =>
        Some(s"to_timestamp($e, ${javaPatternLit(fmt)})")
      case _ => None
    }
    // LIST form only: `FROM range(...)` is a table-valued function in both
    // dialects, and Spark's native range TVF already has DuckDB's
    // end-exclusive semantics — leave it alone.
    out = rewriteCalls(out, "range", skipAfterWords = Set("from", "join")) {
      case Seq(n) => Some(rangeSql("CAST(0 AS BIGINT)", s"CAST($n AS BIGINT)"))
      case Seq(a, b) => Some(rangeSql(s"CAST($a AS BIGINT)", s"CAST($b AS BIGINT)"))
      case _ => None
    }
    out
  }

  private val ArrowRe = java.util.regex.Pattern.compile(
    """([\w.`"]+)\s*->>\s*'((?:[^']|'')*)'""")

  private def rewriteArrow(sql: String): String = {
    val m = ArrowRe.matcher(sql)
    val sb = new StringBuilder
    var last = 0
    while (m.find()) {
      if (insideLiteral(sql, m.start())) {
        sb.append(sql.substring(last, m.end()))
      } else {
        val path = m.group(2)
        val norm = if (path.startsWith("$")) path else "$." + path
        sb.append(sql.substring(last, m.start()))
          .append(s"get_json_object(${m.group(1)}, '$norm')")
      }
      last = m.end()
    }
    sb.append(sql.substring(last)).toString
  }

  /** Word (identifier/keyword) immediately before `pos`, lowercased. */
  private def precedingWord(sql: String, pos: Int): String = {
    var end = pos
    while (end > 0 && sql.charAt(end - 1).isWhitespace) end -= 1
    var start = end
    while (start > 0 && (sql.charAt(start - 1).isLetterOrDigit || sql.charAt(start - 1) == '_'))
      start -= 1
    sql.substring(start, end).toLowerCase
  }

  /** `[a, b)` as a Spark sequence with DuckDB's empty-range behavior. */
  private def rangeSql(a: String, b: String): String =
    s"slice(sequence($a, greatest($a, $b - 1)), 1, " +
      s"CAST(greatest(0L, $b - $a) AS INT))"

  /** strftime-pattern literal → Java DateTimeFormatter-pattern literal.
    * Java patterns single-quote literal letters (`'T'`), which must
    * re-escape as `''` inside the emitted SQL literal. */
  private def javaPatternLit(lit: String): String = {
    val t = lit.trim
    "'" + Strftime.toJavaPattern(t.substring(1, t.length - 1)).replace("'", "''") + "'"
  }

  private def isLiteral(arg: String): Boolean = {
    val t = arg.trim
    t.length >= 2 && t.head == '\'' && SqlText.literalEnd(t, 0) == t.length
  }

  /** Regex-quote the CONTENT of a SQL string literal: `'a.b'` → `'\Qa.b\E'`.
    * Spark's split() sees the quoted form and matches it as plain text. */
  private def quoteRegexLiteral(lit: String): String = {
    val t = lit.trim
    val content = t.substring(1, t.length - 1) // SQL '' escapes stay as-is
    s"'\\\\Q$content\\\\E'"
  }

  /** Rewrite every top-level call of `namePattern(...)` outside string
    * literals: the handler receives the top-level comma-split argument list
    * and returns the replacement text (None = leave the call unchanged).
    * Nested calls are handled by re-scanning until no rewrite fires. */
  private def rewriteCalls(sql: String, namePattern: String,
      skipAfterWords: Set[String] = Set.empty)(
      f: Seq[String] => Option[String]): String = {
    val re = java.util.regex.Pattern.compile("(?i)\\b(?:" + namePattern + ")\\s*\\(")
    var cur = sql
    var changed = true
    var guard = 0
    while (changed && guard < 64) {
      changed = false
      guard += 1
      val m = re.matcher(cur)
      var search = 0
      var done = false
      while (!done && m.find(search)) {
        if (insideLiteral(cur, m.start()) ||
            skipAfterWords.contains(precedingWord(cur, m.start()))) search = m.end()
        else {
          val argsStart = m.end()
          val close = matchingParen(cur, argsStart - 1)
          if (close < 0) { search = m.end() }
          else {
            val args = splitTopLevel(cur.substring(argsStart, close))
            f(args) match {
              case Some(repl) =>
                cur = cur.substring(0, m.start()) + repl + cur.substring(close + 1)
                changed = true
                done = true // restart the scan on the rewritten text
              case None => search = m.end()
            }
          }
        }
      }
    }
    cur
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

  /** Index of the ')' matching the '(' at `open` (literal-aware), or -1. */
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

  /** Split argument text on top-level commas (paren- and literal-aware). */
  private def splitTopLevel(args: String): Seq[String] = {
    if (args.trim.isEmpty) return Nil
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var depth = 0
    var start = 0
    var i = 0
    while (i < args.length) {
      args.charAt(i) match {
        case '\'' => i = SqlText.literalEnd(args, i) - 1
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case ',' if depth == 0 =>
          out += args.substring(start, i).trim
          start = i + 1
        case _ => ()
      }
      i += 1
    }
    out += args.substring(start).trim
    out.toSeq
  }
}
