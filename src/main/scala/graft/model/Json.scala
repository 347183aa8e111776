package graft.model

/** Minimal ordered JSON tree + renderer reproducing Python's
  * `json.dump(spec, f, indent=2, ensure_ascii=False)` byte layout, which is
  * what the reference uses for its golden outputs
  * (/root/reference/pdf_to_json_converter.py:5361-5363). Key order is
  * insertion order (Python dict semantics), so the tree is built with
  * explicitly ordered key/value sequences.
  */
sealed trait JVal
final case class JStr(s: String) extends JVal
final case class JBool(b: Boolean) extends JVal
final case class JInt(i: Long) extends JVal
final case class JNum(d: Double) extends JVal
case object JNull extends JVal
final case class JArr(items: Vector[JVal]) extends JVal
final case class JObj(fields: Vector[(String, JVal)]) extends JVal {
  def get(k: String): Option[JVal] = Option(getOrNull(k))

  /** Allocation-free lookup for hot callers (null when absent). */
  def getOrNull(k: String): JVal = {
    var i = 0
    while (i < fields.length) {
      val f = fields(i)
      if (f._1 == k) return f._2
      i += 1
    }
    null
  }
  def updated(k: String, v: JVal): JObj =
    if (fields.exists(_._1 == k)) JObj(fields.map { case (kk, vv) => if (kk == k) (kk, v) else (kk, vv) })
    else JObj(fields :+ (k -> v))
  def without(k: String): JObj = JObj(fields.filterNot(_._1 == k))
}

object JObj { def of(kvs: (String, JVal)*): JObj = JObj(kvs.toVector) }

object Json {

  /** Python json escape with ensure_ascii=False: only `"` `\` and control
    * chars (<0x20) are escaped; \b \f \n \r \t get short forms.
    */
  def escape(s: String): String = {
    if (!needsEscape(s)) return s // fast path: typical field text
    val sb = new StringBuilder(s.length + 8)
    escapeInto(s, sb)
    sb.toString
  }

  private def needsEscape(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '"' || c == '\\' || c < ' ') return true
      i += 1
    }
    false
  }

  /** Escape directly into the render buffer: bulk-copies the (typically
    * long) runs between escapable chars instead of appending per char. */
  private def escapeInto(s: String, sb: StringBuilder): Unit = {
    val jsb = sb.underlying
    var i = 0
    var flushed = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '"' || c == '\\' || c < ' ') {
        if (i > flushed) jsb.append(s, flushed, i)
        c match {
          case '"'  => jsb.append("\\\"")
          case '\\' => jsb.append("\\\\")
          case '\n' => jsb.append("\\n")
          case '\r' => jsb.append("\\r")
          case '\t' => jsb.append("\\t")
          case '\b' => jsb.append("\\b")
          case '\f' => jsb.append("\\f")
          case _    => jsb.append(f"\\u${c.toInt}%04x")
        }
        flushed = i + 1
      }
      i += 1
    }
    if (n > flushed) jsb.append(s, flushed, n)
  }

  /** `"escaped"` — quoted + escaped append (public for the direct spec
    * renderer, which writes fields without building a JVal tree). */
  def appendStr(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    // escapeInto bulk-copies between escapes, so no needsEscape pre-scan:
    // a clean string is one bulk append either way
    escapeInto(s, sb)
    sb.append('"')
  }

  // one reusable builder per thread: the render builder was one of the
  // largest per-turn allocations (tens of KB per document). Re-entrancy
  // (render inside render) falls back to a fresh builder via the in-use flag.
  private val tlBuilder = ThreadLocal.withInitial[StringBuilder](() => new StringBuilder(1 << 16))
  private val tlInUse = ThreadLocal.withInitial[java.lang.Boolean](() => java.lang.Boolean.FALSE)

  /** Run `f` against the reusable thread-local render builder (public for
    * the direct spec renderer). */
  def withBuilder(sizeHint: Int)(f: StringBuilder => Unit): String = {
    if (tlInUse.get()) { // re-entrant render: fresh builder
      val sb = new StringBuilder(sizeHint)
      f(sb)
      sb.toString
    } else {
      tlInUse.set(true)
      try {
        val sb = tlBuilder.get()
        sb.setLength(0)
        sb.ensureCapacity(sizeHint)
        f(sb)
        sb.toString
      } finally tlInUse.set(false)
    }
  }

  /** Render like json.dump(..., indent=2, ensure_ascii=False). */
  def render(v: JVal, indent: Int = 2): String =
    withBuilder(estimateSize(v) + 256)(sb => renderInto(v, sb, 0, indent))

  /** Indent-2 render of one value at `level` into an existing builder
    * (public for the direct spec renderer). */
  private val padSpaces = " " * 64

  def renderInto(v: JVal, sb: StringBuilder, level: Int, indent: Int = 2): Unit = {
    def pad(l: Int): Unit = {
      // NB: the 3-arg region append exists only on the java builder (the
      // Scala wrapper auto-tuples the arguments into append(Any))
      val jsb = sb.underlying
      var n = indent * l
      while (n > 0) { val k = math.min(n, padSpaces.length); jsb.append(padSpaces, 0, k); n -= k }
    }
    v match {
      case JStr(s)  => appendStr(s, sb)
      case JBool(b) => sb.append(if (b) "true" else "false")
      case JInt(i)  => sb.append(i.toString)
      case JNum(d)  => sb.append(pyFloat(d))
      case JNull    => sb.append("null")
      case JArr(items) =>
        if (items.isEmpty) sb.append("[]")
        else {
          sb.append("[\n")
          var i = 0
          while (i < items.length) {
            pad(level + 1); renderInto(items(i), sb, level + 1, indent)
            if (i < items.length - 1) sb.append(',')
            sb.append('\n')
            i += 1
          }
          pad(level); sb.append(']')
        }
      case JObj(fields) =>
        if (fields.isEmpty) sb.append("{}")
        else {
          sb.append("{\n")
          var i = 0
          while (i < fields.length) {
            val f = fields(i)
            pad(level + 1)
            appendStr(f._1, sb); sb.append(": ")
            renderInto(f._2, sb, level + 1, indent)
            if (i < fields.length - 1) sb.append(',')
            sb.append('\n')
            i += 1
          }
          pad(level); sb.append('}')
        }
    }
  }

  /** Render like json.dumps(..., separators=(",", ":"), ensure_ascii=False)
    * — the minified layout of the NPF golden. */
  def renderCompact(v: JVal): String = withBuilder(estimateSize(v) + 256) { sb =>
    def go(v: JVal): Unit = v match {
      case JStr(s)  => appendStr(s, sb)
      case JBool(b) => sb.append(if (b) "true" else "false")
      case JInt(i)  => sb.append(i.toString)
      case JNum(d)  => sb.append(pyFloat(d))
      case JNull    => sb.append("null")
      case JArr(items) =>
        sb.append('[')
        var i = 0
        while (i < items.length) {
          if (i > 0) sb.append(',')
          go(items(i))
          i += 1
        }
        sb.append(']')
      case JObj(fields) =>
        sb.append('{')
        var i = 0
        while (i < fields.length) {
          val f = fields(i)
          if (i > 0) sb.append(',')
          appendStr(f._1, sb); sb.append(':'); go(f._2)
          i += 1
        }
        sb.append('}')
    }
    go(v)
  }

  /** Public size-estimate hook for the direct spec renderer. */
  def estimate(v: JVal): Int = estimateSize(v)

  /** Upper-bound estimate of the rendered size INCLUDING indent-2 padding —
    * an undersized builder re-doubles through ~3 copies on a large spec,
    * which dominated the render's allocation (render of a 21 KB document
    * allocated ~200 KB before depth was accounted for). */
  private def estimateSize(v: JVal, depth: Int = 1): Int = v match {
    case JStr(s) => s.length + 8
    case JArr(items) =>
      8 + 2 * depth + items.foldLeft(0)((a, it) => a + estimateSize(it, depth + 1) + 2 * depth + 6)
    case JObj(fields) =>
      8 + 2 * depth + fields.foldLeft(0) { case (a, (k, fv)) =>
        a + k.length + estimateSize(fv, depth + 1) + 2 * depth + 10 }
    case _ => 8
  }

  /** Python repr of a float (shortest round-trip); ints stay JInt so this is
    * only for genuinely fractional values.
    */
  private def pyFloat(d: Double): String = {
    if (d == d.toLong.toDouble) s"${d.toLong}.0"
    else {
      val s = d.toString
      s
    }
  }
}
