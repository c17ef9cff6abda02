package graft.dialect

/** DuckDB bracket list expressions → Spark SQL.
  *
  * Two forms share the `[...]` syntax in expression position (DuckDB docs,
  * sql/data_types/list + sql/functions/list — "list comprehension"):
  *
  *   - list literal:        `[1, 2, 3]`            → `array(1, 2, 3)`
  *   - list comprehension:  `[f(x) FOR x IN l IF p(x)]`
  *                          → `transform(filter(l, x -> p(x)), x -> f(x))`
  *     (without IF: `transform(l, x -> f(x))`)
  *
  * The hard part is telling an expression-position bracket from the OTHER
  * bracket uses Spark owns natively: `l[i]` indexing and `s['k']` struct
  * access follow a value (identifier, `)`, `]`, or a string literal), while
  * a literal/comprehension bracket follows an operator, a comma, an opening
  * paren, or a keyword. A preceding identifier word that is a reserved
  * keyword (SELECT, WHEN, THEN, IN, ...) therefore opens a literal, any
  * other identifier means indexing and is left alone.
  *
  * Nested brackets recurse: `[[x, 1] FOR x IN l]` and comprehensions over
  * comprehension results both fold inside-out. Runs before the
  * function-spelling pass so `list_*` names inside the emitted lambdas
  * still get mapped.
  */
object ListComprehension {

  // a preceding word in this set means the bracket STARTS an expression
  private val KeywordsBefore = Set(
    "select", "where", "and", "or", "not", "then", "when", "else", "in",
    "on", "having", "by", "distinct", "all", "union", "except", "intersect",
    "values", "set", "returning", "case", "like", "ilike", "between", "is",
    "return", "from")

  def rewrite(sql: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'') {
        val e = SqlText.literalEnd(sql, i); sb.append(sql.substring(i, e)); i = e
      } else if (sql.startsWith("--", i) || sql.startsWith("/*", i)) {
        val e = commentEnd(sql, i); sb.append(sql.substring(i, e)); i = e
      } else if (c == '[' && opensExpression(sb)) {
        val close = matchingBracket(sql, i)
        if (close < 0) { sb.append(c); i += 1 }
        else {
          // recurse first so inner brackets are already Spark text
          val inner = rewrite(sql.substring(i + 1, close))
          sb.append(translate(inner))
          i = close + 1
        }
      } else if (c == '[') {
        // indexing position. Two DuckDB forms need rewriting, both 1-based:
        //  - slice `e[a:b]` (ends inclusive, either open, negatives from
        //    the end, clamping) → graft_slice, a native expression that
        //    dispatches STRING vs ARRAY after resolution (text can't)
        //  - element index `l[i]` → element_at (Spark's bracket is 0-BASED;
        //    element_at is 1-based and takes negative from-the-end indexes,
        //    exactly DuckDB's bracket semantics)
        //  - string-literal keys `e['k']` → graft_extract too (round 13):
        //    struct field access stays scalar, but MAP bracket extraction
        //    is LIST-valued in DuckDB 1.0 — the type dispatch needs
        //    resolution, which text cannot do
        // Left untouched: empty brackets and bare type names (`INT[]`
        // list type spellings in DDL).
        val close = matchingBracket(sql, i)
        val inner0 = if (close < 0) "" else rewrite(sql.substring(i + 1, close))
        val parts = if (close < 0) None else sliceParts(inner0)
        val vs = valueStart(sb)
        val v = sb.substring(vs)
        parts match {
          case Some((lo, hi)) if v.nonEmpty =>
            sb.setLength(vs)
            val lo2 = if (lo.isEmpty) "1" else lo
            // open upper bound: INT_MAX, clamped to the length inside
            // graft_slice (size()/length() dispatch lives there)
            val hi2 = if (hi.isEmpty) "2147483647" else hi
            sb.append(s"graft_slice($v, $lo2, $hi2)")
            i = close + 1
          case None if close >= 0 && v.trim.equalsIgnoreCase("array") &&
              inner0.trim.nonEmpty =>
            // postgres-style ARRAY[...] literal spelling
            sb.setLength(vs)
            sb.append(translate(inner0))
            i = close + 1
          case None if close >= 0 && v.nonEmpty && inner0.trim.nonEmpty &&
              !(isTypeWord(v) && inTypePosition(sb, vs)) =>
            sb.setLength(vs)
            // graft_extract = element_at for arrays/maps (unchanged
            // semantics) + DuckDB char extraction for strings
            sb.append(s"graft_extract($v, ${inner0.trim})")
            i = close + 1
          case _ => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Decide from the text ALREADY EMITTED whether a `[` begins a list
    * expression (vs indexing a value). */
  private def opensExpression(sb: StringBuilder): Boolean = {
    var i = sb.length - 1
    while (i >= 0 && sb.charAt(i).isWhitespace) i -= 1
    if (i < 0) return true
    val c = sb.charAt(i)
    if (c == ')' || c == ']' || c == '\'') return false
    if (!c.isLetterOrDigit && c != '_') return true // operator/comma/paren
    if (c.isDigit) return false                     // 1[?] — not valid anyway
    val end = i + 1
    while (i >= 0 && (sb.charAt(i).isLetterOrDigit || sb.charAt(i) == '_')) i -= 1
    KeywordsBefore.contains(sb.substring(i + 1, end).toLowerCase)
  }

  /** SQL type names: `INT[3]` / `VARCHAR[]` are list/array TYPE spellings
    * (DDL / casts), never element indexing. */
  private val TypeWords = Set(
    "tinyint", "smallint", "int", "integer", "bigint", "hugeint", "utinyint",
    "usmallint", "uinteger", "ubigint", "float", "real", "double", "decimal",
    "numeric", "varchar", "char", "text", "string", "blob", "binary", "bytea",
    "boolean", "bool", "date", "time", "timestamp", "timestamptz", "interval",
    "uuid", "json", "struct", "map", "union", "array", "list")

  private def isTypeWord(v: String): Boolean =
    TypeWords.contains(v.trim.toLowerCase)

  /** A type word only BLOCKS the index rewrite in a type position: right
    * after `::` or the keyword AS (cast targets — the pinned `CAST(x AS
    * VARCHAR[3])` shape). Elsewhere a type-named identifier is an ordinary
    * column (`text[5]` extracts the 5th character of column `text`). */
  private def inTypePosition(sb: StringBuilder, vs: Int): Boolean = {
    var i = vs - 1
    while (i >= 0 && sb.charAt(i).isWhitespace) i -= 1
    if (i >= 1 && sb.charAt(i) == ':' && sb.charAt(i - 1) == ':') return true
    if (i >= 1 && (sb.charAt(i) == 's' || sb.charAt(i) == 'S') &&
        (sb.charAt(i - 1) == 'a' || sb.charAt(i - 1) == 'A') &&
        (i - 2 < 0 || !(sb.charAt(i - 2).isLetterOrDigit || sb.charAt(i - 2) == '_')))
      return true
    false
  }

  /** If the bracket content is a slice (`lo:hi` with exactly one top-level
    * single colon — `::` casts don't count), the two bound texts. */
  private def sliceParts(inner: String): Option[(String, String)] = {
    var i = 0
    var depth = 0
    var colon = -1
    while (i < inner.length) {
      inner.charAt(i) match {
        case '\'' => i = SqlText.literalEnd(inner, i)
        case '(' | '[' => depth += 1; i += 1
        case ')' | ']' => depth -= 1; i += 1
        case ':' if depth == 0 =>
          if (i + 1 < inner.length && inner.charAt(i + 1) == ':') i += 2 // cast
          else if (colon >= 0) return None // a second colon: not a slice
          else { colon = i; i += 1 }
        case _ => i += 1
      }
    }
    if (colon < 0) None
    else Some((inner.substring(0, colon).trim, inner.substring(colon + 1).trim))
  }

  /** Start index in `sb` of the value expression an indexing bracket
    * applies to: trailing identifier characters, with balanced `(..)` /
    * `[..]` groups (call arguments, prior indexes) jumped as units. */
  private def valueStart(sb: StringBuilder): Int = {
    var i = sb.length - 1
    while (i >= 0) {
      val ch = sb.charAt(i)
      if (ch == ')' || ch == ']') {
        val open = if (ch == ')') '(' else '['
        var depth = 0
        var j = i
        var found = -1
        while (j >= 0 && found < 0) {
          val cj = sb.charAt(j)
          if (cj == ch) depth += 1
          else if (cj == open) { depth -= 1; if (depth == 0) found = j }
          j -= 1
        }
        if (found < 0) return i + 1
        i = found - 1
      } else if (ch == '\'') {
        // walk back over a string literal ('hello'[2:4] slices the
        // literal); '' doubling scans as literal-close + literal-open,
        // which lands on the same opening quote
        var j = i - 1
        while (j >= 0 && sb.charAt(j) != '\'') j -= 1
        if (j < 0) return i + 1
        i = j - 1
      } else if (ch.isLetterOrDigit || ch == '_' || ch == '.' || ch == '`' ||
          ch == '"') i -= 1
      else return i + 1
    }
    0
  }

  /** Index of the `]` matching the `[` at `open` (literal-aware), or -1. */
  private def matchingBracket(sql: String, open: Int): Int = {
    var i = open + 1
    var depth = 0
    while (i < sql.length) {
      sql.charAt(i) match {
        case '\'' => i = SqlText.literalEnd(sql, i)
        case '[' | '(' => depth += 1; i += 1
        case ']' if depth == 0 => return i
        case ']' | ')' => depth -= 1; i += 1
        case _ =>
          val ce = commentEnd(sql, i)
          i = if (ce > i) ce else i + 1
      }
    }
    -1
  }

  /** Translate the bracket CONTENT (already recursed) to Spark. */
  private def translate(inner: String): String = {
    val forIdx = topLevelWord(inner, "FOR")
    if (forIdx < 0) return s"array($inner)"
    val exprPart = inner.substring(0, forIdx).trim
    val afterFor = inner.substring(forIdx + 3)
    val inIdx = topLevelWord(afterFor, "IN")
    if (inIdx < 0) return s"array($inner)" // not a comprehension after all
    val varName = afterFor.substring(0, inIdx).trim
    val afterIn = afterFor.substring(inIdx + 2)
    val ifIdx = topLevelWord(afterIn, "IF")
    val (listExpr, cond) =
      if (ifIdx < 0) (afterIn.trim, None)
      else (afterIn.substring(0, ifIdx).trim, Some(afterIn.substring(ifIdx + 2).trim))
    val source = cond match {
      case Some(p) => s"filter($listExpr, $varName -> $p)"
      case None => listExpr
    }
    s"transform($source, $varName -> $exprPart)"
  }

  /** First depth-0, literal-aware, word-boundary index of `word`. */
  private def topLevelWord(s: String, word: String): Int = {
    var i = 0
    var depth = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => i = SqlText.literalEnd(s, i)
        case '(' | '[' => depth += 1; i += 1
        case ')' | ']' => depth -= 1; i += 1
        case c if depth == 0 && (c.isLetter || c == '_') =>
          var j = i + 1
          while (j < s.length && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '_')) j += 1
          if (s.substring(i, j).equalsIgnoreCase(word) &&
              (i == 0 || !isWordChar(s.charAt(i - 1)))) return i
          i = j
        case _ => i += 1
      }
    }
    -1
  }

  private def isWordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  private def commentEnd(sql: String, i: Int): Int =
    if (sql.startsWith("--", i)) {
      val nl = sql.indexOf('\n', i)
      if (nl < 0) sql.length else nl + 1
    } else if (sql.startsWith("/*", i)) {
      val end = sql.indexOf("*/", i + 2)
      if (end < 0) sql.length else end + 2
    } else i
}
