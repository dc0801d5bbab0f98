package graft.io

/** Shared driver-side collect guard for CLI/export output: interchange
  * printing must fail fast on huge results instead of OOMing the driver. */
private[graft] object CliLimits {
  def maxResultRows: Int =
    sys.env.get("GRAFT_MAX_RESULT_ROWS").map(_.toInt).getOrElse(1000000)

  /** Split a SQL script into statements on ';'. The scanner tracks
    * single-quoted literals ('' escapes a quote), double-quoted and
    * backtick-quoted identifiers, `--` line comments, and `/* */` block
    * comments, so a ';' inside any of those never splits a statement
    * mid-token. */
  def splitSql(text: String): Seq[String] = {
    val stmts = Seq.newBuilder[String]
    val cur = new StringBuilder
    var quote: Char = 0       // active quote char: ', " or `
    var lineComment = false
    var commentDepth = 0      // bracketed comments nest in Spark SQL
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      val next = if (i + 1 < text.length) text.charAt(i + 1) else 0.toChar
      if (lineComment) {
        cur.append(c); if (c == '\n') lineComment = false
      } else if (commentDepth > 0) {
        // consume open/close pairs whole so '/*/' cannot self-close and the
        // '*' of one marker never doubles as half of another
        if (c == '/' && next == '*') { cur.append("/*"); i += 1; commentDepth += 1 }
        else if (c == '*' && next == '/') { cur.append("*/"); i += 1; commentDepth -= 1 }
        else cur.append(c)
      } else if (quote != 0) {
        cur.append(c)
        if (c == quote) {
          // a doubled quote char inside its own quoting is an escape, not a
          // close — '' in literals, "" and `` in quoted identifiers
          if (next == quote) { cur.append(next); i += 1 }
          else quote = 0
        }
      } else c match {
        case '\'' | '"' | '`'        => quote = c; cur.append(c)
        case '-' if next == '-'      => lineComment = true; cur.append(c)
        case '/' if next == '*'      => commentDepth = 1; cur.append("/*"); i += 1
        case ';'                     => stmts += cur.toString; cur.clear()
        case _                       => cur.append(c)
      }
      i += 1
    }
    stmts += cur.toString
    stmts.result().map(_.trim).filter(_.nonEmpty)
  }
}
