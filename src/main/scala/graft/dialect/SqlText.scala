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
