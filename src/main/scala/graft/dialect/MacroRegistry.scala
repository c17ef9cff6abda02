package graft.dialect

/** DuckDB SQL macros (duckdb docs/sql/statements/create_macro): named,
  * parameterized SQL templates expanded at query time.
  *
  *  - scalar: `CREATE MACRO add1(x) AS x + 1` — a call `add1(c)` becomes
  *    `(c + 1)`;
  *  - table: `CREATE MACRO topn(n) AS TABLE SELECT * FROM t LIMIT n` — a
  *    call in FROM position becomes a parenthesized subquery;
  *  - defaults: `CREATE MACRO f(a, b := 10) AS a + b` — omitted parameters
  *    take their default, call-site named arguments (`b := 2`) override.
  *
  * Expansion is textual (literal-aware, word-boundary parameter
  * substitution, arguments parenthesized so operator precedence survives),
  * runs before the rest of the dialect chain, and iterates to a fixpoint so
  * macros may call other macros. The registry is engine-scoped like
  * DuckDB's catalog. Because expansion happens before planning, macros cost
  * nothing at execution time — the expanded text plans exactly like
  * hand-written SQL (pushdown/pruning unaffected at any scale).
  */
final class MacroRegistry {

  final case class SqlMacro(name: String, params: Seq[(String, Option[String])],
      body: String, isTable: Boolean)

  private val macros =
    new java.util.concurrent.ConcurrentHashMap[String, SqlMacro]()

  private val CreateRe =
    """(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?MACRO\s+([\w."`]+)\s*\((.*?)\)\s*AS\s+(TABLE\s+)?(.+?)\s*;?\s*""".r
  private val DropRe = """(?is)\s*DROP\s+MACRO\s+(IF\s+EXISTS\s+)?([\w."`]+)\s*;?\s*""".r

  /** Handle a CREATE/DROP MACRO statement; None when `sql` is neither. */
  def dispatch(sql: String): Option[String] = sql match {
    case CreateRe(orReplace, name, params, table, body) =>
      val key = unquote(name).toLowerCase
      if (orReplace == null && macros.containsKey(key))
        throw new IllegalArgumentException(s"macro $key already exists")
      macros.put(key, SqlMacro(key, parseParams(params), body.trim, table != null))
      Some(key)
    case DropRe(ifExists, name) =>
      val key = unquote(name).toLowerCase
      if (macros.remove(key) == null && ifExists == null)
        throw new IllegalArgumentException(s"no macro $key")
      Some(key)
    case _ => None
  }

  def names: Seq[String] = {
    import scala.jdk.CollectionConverters._
    macros.keySet().asScala.toSeq.sorted
  }

  /** Expand every registered macro call in `sql` to a fixpoint. */
  def expand(sql: String): String = {
    if (macros.isEmpty) return sql
    var cur = sql
    var guard = 0
    var changed = true
    while (changed && guard < 16) {
      changed = false
      guard += 1
      val it = macros.values().iterator()
      while (it.hasNext && !changed) {
        val m = it.next()
        expandOne(cur, m) match {
          case Some(next) => cur = next; changed = true
          case None => ()
        }
      }
    }
    cur
  }

  /** Expand the FIRST call of macro `m` in `sql`, if any. */
  private def expandOne(sql: String, m: SqlMacro): Option[String] = {
    val re = java.util.regex.Pattern
      .compile("(?i)\\b" + java.util.regex.Pattern.quote(m.name) + "\\s*\\(")
    val mm = re.matcher(sql)
    var search = 0
    while (mm.find(search)) {
      if (insideLiteral(sql, mm.start())) search = mm.end()
      else {
        val close = matchingParen(sql, mm.end() - 1)
        if (close < 0) return None
        val args = splitTopLevel(sql.substring(mm.end(), close))
        bind(m, args) match {
          case Some(binding) =>
            val expanded = substitute(m.body, binding)
            val wrapped = s"($expanded)"
            return Some(sql.substring(0, mm.start()) + wrapped +
              sql.substring(close + 1))
          case None => search = mm.end() // arity mismatch: not this macro
        }
      }
    }
    None
  }

  /** Bind call arguments (positional then `name := value`) to parameters,
    * filling defaults; None when the call doesn't fit the signature. */
  private def bind(m: SqlMacro, args: Seq[String]): Option[Map[String, String]] = {
    val named = scala.collection.mutable.Map[String, String]()
    var positional = List.empty[String]
    val NamedArg = """(?s)^\s*([A-Za-z_]\w*)\s*:=\s*(.+)$""".r
    args.filter(_.nonEmpty).foreach {
      case NamedArg(k, v) => named(k.toLowerCase) = v.trim
      case pos => positional = pos :: positional
    }
    positional = positional.reverse
    val out = scala.collection.mutable.Map[String, String]()
    m.params.foreach { case (p, default) =>
      if (positional.nonEmpty && !named.contains(p)) {
        out(p) = positional.head
        positional = positional.tail
      } else named.get(p).orElse(default) match {
        case Some(v) => out(p) = v
        case None => return None // missing required parameter
      }
    }
    if (positional.nonEmpty) return None // too many arguments
    Some(out.toMap)
  }

  /** Word-boundary, literal-aware parameter substitution; arguments are
    * parenthesized so `x + 1` bound into `x * 2` stays `(x + 1) * 2`. */
  private def substitute(body: String, binding: Map[String, String]): String =
    SqlText.mapOutsideLiterals(body) { seg =>
      binding.foldLeft(seg) { case (s, (p, v)) =>
        ("(?i)\\b" + java.util.regex.Pattern.quote(p) + "\\b").r
          .replaceAllIn(s, java.util.regex.Matcher.quoteReplacement(s"($v)"))
      }
    }

  private def parseParams(text: String): Seq[(String, Option[String])] =
    splitTopLevel(text).filter(_.nonEmpty).map { p =>
      val i = p.indexOf(":=")
      if (i < 0) (p.trim.toLowerCase, None)
      else (p.substring(0, i).trim.toLowerCase, Some(p.substring(i + 2).trim))
    }

  private def unquote(id: String): String =
    id.replaceAll("[`\"]", "")

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
