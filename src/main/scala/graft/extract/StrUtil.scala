package graft.extract

/** Small string helpers for the per-turn hot path. */
object StrUtil {

  /** lines.mkString(sep) with an exactly-sized builder (mkString's default
    * builder re-doubles through several copies on multi-KB documents). */
  def join(lines: Seq[String], sep: Char): String = {
    var total = 0
    lines.foreach(l => total += l.length + 1)
    if (total == 0) return ""
    val sb = new java.lang.StringBuilder(total)
    var first = true
    lines.foreach { l =>
      if (!first) sb.append(sep)
      first = false
      sb.append(l)
    }
    sb.toString
  }

  /** lines.map(_.trim).mkString(sep) in one pass: appends the trimmed REGION
    * of each line (no per-line trim copies, exactly-sized builder). */
  def joinTrimmed(lines: Seq[String], sep: Char): String = {
    var total = 0
    lines.foreach(l => total += l.length + 1)
    if (total == 0) return ""
    val sb = new java.lang.StringBuilder(total)
    var first = true
    lines.foreach { l =>
      if (!first) sb.append(sep)
      first = false
      var from = 0
      var to = l.length
      while (from < to && l.charAt(from) <= ' ') from += 1
      while (to > from && l.charAt(to - 1) <= ' ') to -= 1
      if (to > from) sb.append(l, from, to)
    }
    sb.toString
  }
}
