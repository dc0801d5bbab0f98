package graft.io

/** Shared driver-side collect guard for CLI/export output: interchange
  * printing must fail fast on huge results instead of OOMing the driver. */
private[io] object CliLimits {
  def maxResultRows: Int =
    sys.env.get("GRAFT_MAX_RESULT_ROWS").map(_.toInt).getOrElse(1000000)

  /** Split a SQL script into statements on ';' — quote-aware, so semicolons
    * inside single-quoted string literals ('' escapes a quote) survive. */
  def splitSql(text: String): Seq[String] = {
    val stmts = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQuote = false
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '\'') { inQuote = !inQuote; cur.append(c) }
      else if (c == ';' && !inQuote) { stmts += cur.toString; cur.clear() }
      else cur.append(c)
      i += 1
    }
    stmts += cur.toString
    stmts.result().map(_.trim).filter(_.nonEmpty)
  }
}
