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

  /** Applies literal (target -> replacement) pairs in ONE builder pass over
    * `src`, leftmost match first (ties broken by array order). Equivalent to
    * chaining src.replace(t1,r1).replace(t2,r2)... provided no replacement
    * (or the text it joins) creates a new occurrence of another target —
    * callers encode such two-stage compositions as explicit composed pairs.
    * Allocation: one builder + the output (the chained form copies the whole
    * string once per matching pair); returns `src` itself when nothing
    * matches.
    */
  def replaceLiterals(src: String, pairs: Array[(String, String)]): String = {
    val k = pairs.length
    val next = new Array[Int](k)
    var i = 0
    var any = false
    while (i < k) {
      // an empty target would zero-width-match forever — fail fast
      require(pairs(i)._1.nonEmpty, "replaceLiterals: empty target")
      next(i) = src.indexOf(pairs(i)._1)
      if (next(i) >= 0) any = true
      i += 1
    }
    if (!any) return src
    // headroom for growth-type replacements (e.g. <strong> insertions):
    // an undersized builder re-doubles, copying the whole output
    val sb = new java.lang.StringBuilder(src.length + 256)
    var pos = 0
    var done = false
    while (!done) {
      var best = -1
      var bestIdx = Int.MaxValue
      i = 0
      while (i < k) {
        if (next(i) >= 0 && next(i) < bestIdx) { bestIdx = next(i); best = i }
        i += 1
      }
      if (best < 0) {
        sb.append(src, pos, src.length)
        done = true
      } else {
        sb.append(src, pos, bestIdx)
        sb.append(pairs(best)._2)
        pos = bestIdx + pairs(best)._1.length
        i = 0
        while (i < k) {
          if (next(i) >= 0 && next(i) < pos) next(i) = src.indexOf(pairs(i)._1, pos)
          i += 1
        }
      }
    }
    sb.toString
  }

  /** Region variant of [[replaceLiterals]]: appends the transform of
    * src[from, to) into `sb` (no intermediate string). A match counts only
    * if it lies entirely inside the region — same semantics as running the
    * chain on the substring.
    */
  def replaceLiteralsInto(sb: java.lang.StringBuilder, src: String, from: Int, to: Int,
      pairs: Array[(String, String)]): Unit = {
    val k = pairs.length
    val next = new Array[Int](k)
    var i = 0
    while (i < k) {
      require(pairs(i)._1.nonEmpty, "replaceLiterals: empty target")
      val idx = src.indexOf(pairs(i)._1, from)
      next(i) = if (idx >= 0 && idx + pairs(i)._1.length <= to) idx else -1
      i += 1
    }
    var pos = from
    var done = false
    while (!done) {
      var best = -1
      var bestIdx = Int.MaxValue
      i = 0
      while (i < k) {
        if (next(i) >= 0 && next(i) < bestIdx) { bestIdx = next(i); best = i }
        i += 1
      }
      if (best < 0) {
        sb.append(src, pos, to)
        done = true
      } else {
        sb.append(src, pos, bestIdx)
        sb.append(pairs(best)._2)
        pos = bestIdx + pairs(best)._1.length
        i = 0
        while (i < k) {
          if (next(i) >= 0 && next(i) < pos) {
            val idx = src.indexOf(pairs(i)._1, pos)
            next(i) = if (idx >= 0 && idx + pairs(i)._1.length <= to) idx else -1
          }
          i += 1
        }
      }
    }
  }

  /** Start of the trimmed region of src[from, to) (trim strips <= ' '). */
  def trimFrom(src: String, from: Int, to: Int): Int = {
    var a = from
    while (a < to && src.charAt(a) <= ' ') a += 1
    a
  }

  /** End of the trimmed region of src[from, to). */
  def trimTo(src: String, from: Int, to: Int): Int = {
    var b = to
    while (b > from && src.charAt(b - 1) <= ' ') b -= 1
    b
  }

  /** s.replaceAll("c+$", "") for a literal char: drop the trailing run of
    * `c` (no regex compile, no copy when there is nothing to strip). */
  def stripTrailingRun(s: String, c: Char): String = {
    var to = s.length
    while (to > 0 && s.charAt(to - 1) == c) to -= 1
    if (to == s.length) s else s.substring(0, to)
  }

  /** s.replaceAll("^[set]+|[set]+$", "") for a literal char set. */
  def trimCharSet(s: String, set: String): String = {
    var from = 0
    var to = s.length
    while (from < to && set.indexOf(s.charAt(from)) >= 0) from += 1
    while (to > from && set.indexOf(s.charAt(to - 1)) >= 0) to -= 1
    if (from == 0 && to == s.length) s else s.substring(from, to)
  }

  /** Java regex \s (default mode: exactly [ \t\n\x0B\f\r]). */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** s.split("\\s+").length without the regex or the array (Java split
    * keeps a leading empty token and drops trailing empties). */
  def splitWsCount(s: String): Int = {
    val n = s.length
    if (n == 0) return 1 // "".split -> [""]
    var tokens = 0
    var i = 0
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      if (i < n) { tokens += 1; while (i < n && !isWs(s.charAt(i))) i += 1 }
    }
    // all-whitespace -> [] (trailing-empty trim eats the leading "" too);
    // otherwise the leading empty token survives if s starts with whitespace
    if (tokens == 0) 0
    else if (isWs(s.charAt(0))) tokens + 1
    else tokens
  }

  /** Whole line is underscores/dashes/whitespace (or empty): equivalent to
    * reSeparatorLine("^[_\\-\\s]*$").findFirstIn(line).exists(_.length == line.length). */
  def isSeparatorLine(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '_' && c != '-' && !isWs(c)) return false
      i += 1
    }
    true
  }

  /** s.trim.isEmpty without the trim copy (trim strips chars <= ' '). */
  def isBlank(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) > ' ') return false
      i += 1
    }
    true
  }

  /** parts.mkString("") with an exactly-sized builder. */
  def concat(parts: scala.collection.Seq[String]): String = {
    var total = 0
    parts.foreach(total += _.length)
    if (total == 0) return ""
    val sb = new java.lang.StringBuilder(total)
    parts.foreach(sb.append)
    sb.toString
  }

  /** s.toLowerCase.indexOf(target, from) for a lowercase ASCII-ish target,
    * without building the lowered string (regionMatches ignoreCase). */
  def indexOfIgnoreCase(s: String, target: String, from: Int): Int = {
    val n = s.length
    val m = target.length
    if (m == 0) return math.max(0, math.min(from, n))
    var i = math.max(0, from)
    val last = n - m
    val c0 = target.charAt(0)
    val c0u = Character.toUpperCase(c0)
    while (i <= last) {
      val c = s.charAt(i)
      if ((c == c0 || c == c0u || Character.toLowerCase(c) == c0) &&
          s.regionMatches(true, i, target, 0, m)) return i
      i += 1
    }
    -1
  }

  /** s.matches("^[\\s_]*$") — only whitespace/underscore (empty ok). */
  def allWsOrUnderscore(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '_' && !isWs(c)) return false
      i += 1
    }
    true
  }

  /** s.matches("^\\d+\\..*") — digits then a literal dot. */
  def startsDigitsDot(s: String): Boolean = {
    var i = 0
    val n = s.length
    while (i < n && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
    i > 0 && i < n && s.charAt(i) == '.'
  }
}
