package graft.dialect

/** Literal-aware SQL text utilities: keyword rewrites and parameter counting
  * must not touch the inside of single-quoted string constants ('' is the
  * SQL escape for a quote within a literal). */
object SqlText {

  /** End index (exclusive) of the literal starting at `start` (which must
    * point at the opening quote). */
  def literalEnd(sql: String, start: Int): Int = {
    var i = start + 1
    while (i < sql.length) {
      if (sql.charAt(i) == '\'') {
        if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') i += 2 // escaped ''
        else return i + 1
      } else i += 1
    }
    sql.length
  }

  /** End index (exclusive) of the comment starting at `start`, which must
    * point at `--` (runs to but NOT including the newline, so the newline
    * still reads as whitespace) or `/*` (to the matching `*/`; bracketed
    * comments nest, per both DuckDB/Postgres and Spark's lexer). Returns
    * `start` when no comment opens there, so callers can use it as a
    * no-op-safe probe. */
  def commentEnd(sql: String, start: Int): Int = {
    if (start + 1 >= sql.length) return start
    val c0 = sql.charAt(start); val c1 = sql.charAt(start + 1)
    if (c0 == '-' && c1 == '-') {
      var i = start + 2
      while (i < sql.length && sql.charAt(i) != '\n') i += 1
      i
    } else if (c0 == '/' && c1 == '*') {
      var depth = 1
      var i = start + 2
      while (i < sql.length && depth > 0) {
        if (i + 1 < sql.length && sql.charAt(i) == '/' && sql.charAt(i + 1) == '*') {
          depth += 1; i += 2
        } else if (i + 1 < sql.length && sql.charAt(i) == '*' && sql.charAt(i + 1) == '/') {
          depth -= 1; i += 2
        } else i += 1
      }
      i
    } else start
  }

  /** First index at or after `start` that is neither whitespace nor inside
    * a comment. */
  def skipWsAndComments(sql: String, start: Int): Int = {
    var i = start
    var moved = true
    while (moved && i < sql.length) {
      moved = false
      while (i < sql.length && sql.charAt(i).isWhitespace) { i += 1; moved = true }
      val ce = commentEnd(sql, i)
      if (ce > i) { i = ce; moved = true }
    }
    i
  }

  /** Length-preserving copy with the INSIDES of string literals (quote
    * delimiters kept) and the entirety of comments blanked to spaces, so
    * offset-based regex rewriters match keywords against code only and
    * splice replacements back into the ORIGINAL text by offset. */
  def maskLitsAndComments(sql: String): String = {
    val sb = new StringBuilder(sql)
    var i = 0
    while (i < sql.length) {
      if (sql.charAt(i) == '\'') {
        val e = literalEnd(sql, i)
        var j = i + 1
        while (j < e - 1) { sb.setCharAt(j, ' '); j += 1 }
        i = e
      } else {
        val ce = commentEnd(sql, i)
        if (ce > i) {
          var j = i
          while (j < ce) { sb.setCharAt(j, ' '); j += 1 }
          i = ce
        } else i += 1
      }
    }
    sb.toString
  }

  /** Exclusive end of the balanced paren group opening at `open`
    * (literal- and comment-aware); `sql.length + 1` when unbalanced. */
  def groupEnd(sql: String, open: Int): Int = {
    var depth = 1
    var j = open + 1
    while (j < sql.length && depth > 0) {
      val ce = commentEnd(sql, j)
      if (ce > j) j = ce
      else sql.charAt(j) match {
        case '\'' => j = literalEnd(sql, j)
        case '(' => depth += 1; j += 1
        case ')' => depth -= 1; j += 1
        case _ => j += 1
      }
    }
    if (depth == 0) j else sql.length + 1
  }

  /** Apply `f` to every segment of `sql` outside single-quoted literals,
    * leaving the literals byte-identical. */
  def mapOutsideLiterals(sql: String)(f: String => String): String = {
    val sb = new StringBuilder
    var segStart = 0
    var i = 0
    while (i < sql.length) {
      if (sql.charAt(i) == '\'') {
        sb.append(f(sql.substring(segStart, i)))
        val end = literalEnd(sql, i)
        sb.append(sql.substring(i, end))
        i = end
        segStart = end
      } else i += 1
    }
    sb.append(f(sql.substring(segStart)))
    sb.toString
  }

  /** Rewrite string-literal CONTENTS so a DuckDB-dialect literal (backslash
    * is a plain character, per the SQL standard) denotes the same string
    * under Spark's C-style escape processing: every backslash doubles.
    * Without this, `split(x, '\s+')` silently becomes a split on `s+`. */
  def escapeLiteralsForSpark(sql: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'') {
        val end = literalEnd(sql, i)
        sb.append(sql.substring(i, end).replace("\\", "\\\\"))
        i = end
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Split on top-level occurrences of `sep` (outside literals, parens and
    * brackets). */
  def splitTopLevel(text: String, sep: Char): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var depth = 0
    var start = 0
    var i = 0
    while (i < text.length) {
      text.charAt(i) match {
        case '\'' => i = literalEnd(text, i) - 1
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case c if c == sep && depth == 0 =>
          out += text.substring(start, i)
          start = i + 1
        case _ => ()
      }
      i += 1
    }
    out += text.substring(start)
    out.filter(_.trim.nonEmpty).map(_.trim).toSeq
  }

  /** Count occurrences of `c` outside single-quoted literals. */
  def countOutsideLiterals(sql: String, c: Char): Int = {
    var n = 0
    var i = 0
    while (i < sql.length) {
      val ch = sql.charAt(i)
      if (ch == '\'') i = literalEnd(sql, i)
      else { if (ch == c) n += 1; i += 1 }
    }
    n
  }
}
