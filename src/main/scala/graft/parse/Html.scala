package graft.parse

import scala.collection.mutable

/** Streaming HTML tag tokenizer + text/link-density boilerplate removal —
  * the from-scratch parse layer mandated by the north star (BASELINE.json):
  * per-turn HTML boilerplate stripping via DOM-free densitometric heuristics
  * (Kohlschütter-style, "Boilerplate Detection using Shallow Text Features",
  * WSDM 2010 — see PAPERS.md). No HTML library: a single-pass tokenizer
  * feeds a block builder; blocks are kept or dropped by link density,
  * element context, and text mass.
  */
object Html {

  sealed trait Token
  final case class StartTag(name: String, selfClosing: Boolean) extends Token
  final case class EndTag(name: String) extends Token
  final case class Text(content: String) extends Token

  /** Single-pass tokenizer: handles comments, CDATA-ish, script/style raw
    * text, attribute quoting. Never allocates a DOM.
    */
  def tokenize(html: String): Iterator[Token] = new Iterator[Token] {
    private var i = 0
    private var pending: Token = _
    private var rawTextEnd: String = null // inside <script>/<style>: scan to this

    private def advance(): Token = {
      while (i < html.length) {
        if (rawTextEnd != null) {
          // case-insensitive forward scan (no whole-document lowercase copy)
          var k = i
          while (k <= html.length - rawTextEnd.length &&
            !html.regionMatches(true, k, rawTextEnd, 0, rawTextEnd.length)) k += 1
          i = if (k > html.length - rawTextEnd.length) html.length else k
          rawTextEnd = null
          // raw text content of script/style is never content text: skip it
        } else if (html.charAt(i) == '<') {
          if (html.startsWith("<!--", i)) {
            val end = html.indexOf("-->", i + 4)
            i = if (end < 0) html.length else end + 3
          } else if (i + 1 < html.length && (html.charAt(i + 1).isLetter || html.charAt(i + 1) == '/')) {
            val closing = html.charAt(i + 1) == '/'
            var j = i + (if (closing) 2 else 1)
            val nameStart = j
            while (j < html.length && (html.charAt(j).isLetterOrDigit || html.charAt(j) == '-')) j += 1
            val name = html.substring(nameStart, j).toLowerCase
            // scan to '>' honoring quotes
            var quote: Char = 0
            var selfClosing = false
            while (j < html.length && (quote != 0 || html.charAt(j) != '>')) {
              val c = html.charAt(j)
              if (quote != 0) { if (c == quote) quote = 0 }
              else if (c == '"' || c == '\'') quote = c
              else if (c == '/' && j + 1 < html.length && html.charAt(j + 1) == '>') selfClosing = true
              j += 1
            }
            i = math.min(html.length, j + 1)
            if (name.nonEmpty) {
              if (closing) return EndTag(name)
              if (!selfClosing && (name == "script" || name == "style"))
                rawTextEnd = s"</$name"
              return StartTag(name, selfClosing)
            }
          } else {
            // bare '<' in text
            val next = html.indexOf('<', i + 1)
            val stop = if (next < 0) html.length else next
            val t = html.substring(i, stop)
            i = stop
            if (t.trim.nonEmpty) return Text(t)
          }
        } else {
          val next = html.indexOf('<', i)
          val stop = if (next < 0) html.length else next
          val t = html.substring(i, stop)
          i = stop
          if (t.trim.nonEmpty) return Text(t)
        }
      }
      null
    }

    def hasNext: Boolean = {
      if (pending == null) pending = advance()
      pending != null
    }
    def next(): Token = {
      if (pending == null) pending = advance()
      val t = pending; pending = null; t
    }
  }

  /** A text block with densitometric features. */
  final case class Block(text: String, kind: String, words: Int, linkedWords: Int, depthDropped: Boolean) {
    def linkDensity: Double = if (words == 0) 1.0 else linkedWords.toDouble / words
  }

  private val blockTags = Set("p", "div", "li", "h1", "h2", "h3", "h4", "h5", "h6",
    "td", "th", "tr", "table", "ul", "ol", "section", "article", "main", "body",
    "blockquote", "pre", "br", "form", "fieldset")
  private val dropTags = Set("nav", "header", "footer", "aside", "script", "style",
    "noscript", "iframe", "svg", "button", "select", "option", "label")
  private val entityMap = Map("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ")

  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    var out = s
    entityMap.foreach { case (e, r) => out = out.replace(e, r) }
    out
  }

  /** Tokenize -> blocks with word/link counts. Content inside drop-listed
    * elements is flagged; <a> runs count toward linkedWords.
    */
  def blocks(html: String): Vector[Block] = {
    val out = mutable.ArrayBuffer[Block]()
    val sb = new StringBuilder
    var words = 0
    var linkedWords = 0
    var dropDepth = 0
    var linkDepth = 0
    var currentKind = "p"

    def flush(): Unit = {
      val text = decodeEntities(sb.toString.trim.replaceAll("\\s+", " "))
      if (text.nonEmpty)
        out += Block(text, currentKind, words, linkedWords, dropDepth > 0)
      sb.clear(); words = 0; linkedWords = 0
    }

    tokenize(html).foreach {
      case StartTag(name, selfClosing) =>
        if (blockTags.contains(name)) { flush(); currentKind = name }
        if (!selfClosing) {
          if (dropTags.contains(name)) dropDepth += 1
          if (name == "a") linkDepth += 1
        }
      case EndTag(name) =>
        if (blockTags.contains(name)) { flush(); currentKind = "p" }
        if (dropTags.contains(name) && dropDepth > 0) dropDepth -= 1
        if (name == "a" && linkDepth > 0) linkDepth -= 1
      case Text(t) =>
        val clean = t.replaceAll("\\s+", " ")
        if (clean.trim.nonEmpty) {
          if (sb.nonEmpty && !sb.last.isWhitespace) sb.append(' ')
          sb.append(clean.trim)
          val w = clean.trim.split("\\s+").length
          words += w
          if (linkDepth > 0) linkedWords += w
        }
    }
    flush()
    out.toVector
  }

  /** Densitometric content filter: drop drop-listed context, link-dense
    * blocks (nav bars), and word-sparse blocks that neighbor link-dense ones
    * (footer crumbs). Headings attached to kept content are kept.
    */
  def contentBlocks(all: Vector[Block]): Vector[Block] = {
    val n = all.length
    all.zipWithIndex.filter { case (b, idx) =>
      if (b.depthDropped) false
      else if (b.linkDensity > 0.33) false
      else if (b.kind.matches("h[1-6]")) true // headings resolved with body text
      else {
        val isShort = b.words < 4
        if (!isShort) true
        else {
          // short blocks survive only next to substantial content
          val prevOk = idx > 0 && !all(idx - 1).depthDropped &&
            all(idx - 1).words >= 4 && all(idx - 1).linkDensity <= 0.33
          val nextOk = idx < n - 1 && !all(idx + 1).depthDropped &&
            all(idx + 1).words >= 4 && all(idx + 1).linkDensity <= 0.33
          prevOk || nextOk
        }
      }
    }.map(_._1)
  }

  /** Full pipeline: HTML -> docling-markdown-compatible lines
    * (## headings, "- " bullets, plain paragraph lines) — the LineEmitter of
    * SURVEY.md §7.1, so downstream extraction sees the same line shapes as
    * pre-extracted text.
    */
  def extractLines(html: String): Vector[String] =
    contentBlocks(blocks(html)).map { b =>
      b.kind match {
        case "h1" | "h2" => s"## ${b.text}"
        case "h3" | "h4" | "h5" | "h6" => s"### ${b.text}"
        case "li" => s"- ${b.text}"
        case _ => b.text
      }
    }

  def extractMainText(html: String): String = extractLines(html).mkString("\n")
}
