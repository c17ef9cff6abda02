package graft.session

import scala.collection.mutable.ArrayBuffer

/** SQL lexer emitting the reference's simplified token categories for shell
  * highlighting (reference tokenize(), lib/src/webdb.cc:491-512; golden test
  * lib/test/webdb_test.cc:75-80: `SELECT 1` → offsets [0,7], types [4,1]).
  *
  * Categories (DuckDB SimplifiedTokenType):
  * 0=IDENTIFIER 1=NUMERIC_CONSTANT 2=STRING_CONSTANT 3=OPERATOR 4=KEYWORD
  * 5=COMMENT
  */
object SqlTokenizer {
  final val Identifier = 0
  final val Numeric = 1
  final val StringConst = 2
  final val Operator = 3
  final val Keyword = 4
  final val Comment = 5

  private val keywords: Set[String] = Set(
    "select", "from", "where", "group", "by", "order", "having", "limit",
    "offset", "join", "inner", "left", "right", "full", "outer", "cross",
    "on", "using", "as", "and", "or", "not", "in", "exists", "between",
    "like", "is", "null", "case", "when", "then", "else", "end", "union",
    "all", "intersect", "except", "distinct", "with", "create", "table",
    "view", "insert", "into", "values", "update", "set", "delete", "drop",
    "alter", "if", "desc", "asc", "cast", "copy", "to", "export", "database",
    "pragma", "primary", "key", "default", "references", "window", "over",
    "partition", "rows", "range", "unbounded", "preceding", "following",
    "current", "row", "true", "false", "interval", "extract", "substring",
    "count", "sum", "avg", "min", "max")

  /** Returns (offsets, types), parallel arrays like the reference wire form. */
  def tokenize(sql: String): (Seq[Int], Seq[Int]) = {
    val offsets = ArrayBuffer[Int]()
    val types = ArrayBuffer[Int]()
    var i = 0
    val n = sql.length
    def emit(start: Int, tpe: Int): Unit = { offsets += start; types += tpe }

    while (i < n) {
      val c = sql.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        val start = i
        while (i < n && sql.charAt(i) != '\n') i += 1
        emit(start, Comment)
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        val start = i
        i += 2
        while (i + 1 < n && !(sql.charAt(i) == '*' && sql.charAt(i + 1) == '/')) i += 1
        i = math.min(i + 2, n)
        emit(start, Comment)
      } else if (c == '\'') {
        val start = i
        i += 1
        while (i < n && sql.charAt(i) != '\'') i += 1
        i = math.min(i + 1, n)
        emit(start, StringConst)
      } else if (c == '"') { // quoted identifier
        val start = i
        i += 1
        while (i < n && sql.charAt(i) != '"') i += 1
        i = math.min(i + 1, n)
        emit(start, Identifier)
      } else if (c.isDigit || (c == '.' && i + 1 < n && sql.charAt(i + 1).isDigit)) {
        val start = i
        while (i < n && (sql.charAt(i).isDigit || sql.charAt(i) == '.' ||
          sql.charAt(i) == 'e' || sql.charAt(i) == 'E')) i += 1
        emit(start, Numeric)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '_' ||
          sql.charAt(i) == '$')) i += 1
        val word = sql.substring(start, i).toLowerCase
        emit(start, if (keywords(word)) Keyword else Identifier)
      } else {
        emit(i, Operator)
        i += 1
      }
    }
    (offsets.toSeq, types.toSeq)
  }
}
