package graft.extract

import scala.collection.mutable

/** NPF policy-text (text_3) renderers.
  *
  * The reference formats this block twice (pdf_to_json_converter.py:1637-2021):
  * `html_text` (final, typographic fixes applied) and `temporary_html_text`
  * (bullets preserved, "IS N OT" left unfixed). The golden
  * (references/Matching JSON References/npf.json) is the byte-level contract;
  * split anchors and emphasis rules below are derived from it (the repo's own
  * current code has drifted from its golden — e.g. the golden's
  * "&nbsp;" after "Scheduling of Appointments:" appears in no code path).
  */
object Text3Formatter {

  private val headerBold = Vector(
    "Patient Responsibilities:", "Payment:", "Dental Benefit Plans:", "Authorizations:")
  // (header, replacement) precomputed: the interpolated replacement was
  // rebuilt on every call (Java replace is a no-op-returns-this when the
  // target is absent, so only the pairs allocate on miss)
  private val headerBoldPairs =
    headerBold.map(h => (h, "<strong>" + h + "</strong>")) :+
      ("Payment is due at the time services are rendered",
        "<strong>Payment is due at the time services are rendered</strong>")

  private def boldHeaders(text0: String): String = {
    var text = text0
    headerBoldPairs.foreach { case (h, repl) => text = text.replace(h, repl) }
    text
  }

  /** temporary_html_text: bullets preserved (`- `), IS N OT unfixed,
    * If-we-are sentences unbolded, Scheduling/Authorizations sections absent.
    */
  // paragraph split anchors (golden-derived)
  private val tempAnchors = Vector("Toward these goals", "Financial arrangements",
    "Non-sufficient funds", "Benefits and payments", "We are required to collect",
    "If your plan allows", "If you choose to not")

  def formatTemporaryHtml(src0: String): String = {
    var src = src0.replace("\\_", "").replace("(initial)", "").trim
    // drop the trailing Scheduling + Authorizations sections
    val schedIdx = src.indexOf("- Scheduling of Appointments:")
    if (schedIdx >= 0) src = src.substring(0, schedIdx).trim
    // bullet markers -> "- <glyph> " prefix
    src = src.replace("- Patient Responsibilities:", "-  Patient Responsibilities:")
    src = src.replace("- Payment:", "-  Payment:")
    src = src.replace("- Dental Benefit Plans:", "-  Dental Benefit Plans:")
    src = boldHeaders(src)
    val paras = splitAtAnchors(src, tempAnchors)
    // <p><br></p> after the 1st and 4th paragraphs (section-intro ends)
    val out = new StringBuilder
    paras.zipWithIndex.foreach { case (p, idx) =>
      out.append("<p>").append(p).append("</p>")
      if (idx == 0 || idx == 3) out.append("<p><br></p>")
    }
    out.toString
  }

  /** html_text: sections re-joined into one paragraph each with trailing
    * spaces, IS N OT fixed, If-we-are sentences bolded (with <u>not</u>),
    * Scheduling split at the reference's line-wrap point, &nbsp; after the
    * Scheduling header.
    */
  private val sectionSplitPat = java.util.regex.Pattern.compile(
    "- (?=Patient Responsibilities:|Payment:|Dental Benefit Plans:|Scheduling of Appointments:|Authorizations:)")
  private val lateNoticePat =
    "(With less than 24 hour notice[^.]*\\.)".r

  def formatHtml(src0: String): String = {
    var src = src0.replace("\\_", "").replace("(initial)", "").trim
    src = src.replace("IS N OT", "IS NOT")
    src = src.replace("co -insurance", "co-insurance")

    // split into the five '- ' sections
    val sections = sectionSplitPat.split(src)
      .map(_.trim).filter(_.nonEmpty).toVector

    val paras = mutable.ArrayBuffer[(String, Boolean)]() // (content, brAfter)
    sections.foreach { section =>
      if (section.startsWith("Patient Responsibilities:") || section.startsWith("Payment:")) {
        paras += ((boldHeaders(section) + " ", true))
      } else if (section.startsWith("Dental Benefit Plans:")) {
        val ourIdx = section.indexOf("Our practice")
        val intro = section.substring(0, ourIdx).trim
        paras += ((boldHeaders(intro) + " ", true))
        val rest = section.substring(ourIdx)
        val contractedIdx = rest.indexOf("If we are a contracted provider")
        val ourPractice = rest.substring(0, contractedIdx).trim
        paras += ((ourPractice + " ", true))
        val rest2 = rest.substring(contractedIdx)
        val notIdx = rest2.indexOf("If we are not a contracted provider")
        val contractedPart = rest2.substring(0, notIdx).trim
        val p5 = contractedPart.replace(
          "If we are a contracted provider with your plan ,",
          "<strong>If we are a contracted provider with your plan,</strong>")
        paras += ((p5 + " ", true))
        val notPart = rest2.substring(notIdx).trim
        val p6 = notPart.replace(
          "If we are not a contracted provider with your dental benefit plan , ",
          "<strong>If we are <u>not</u> a contracted provider with your dental benefit plan, </strong>")
        paras += ((p6, true))
      } else if (section.startsWith("Scheduling of Appointments:")) {
        var s = section.replace("Scheduling of Appointments: ",
          "<strong>Scheduling of Appointments:&nbsp;</strong>")
        s = lateNoticePat
          .replaceAllIn(s, m => "<strong>" + java.util.regex.Matcher.quoteReplacement(m.group(1)) + "</strong>")
        // split at the reference's PDF line-wrap point
        val wrapAnchor = " appointment time again, may be required."
        val wrapIdx = s.lastIndexOf(wrapAnchor)
        if (wrapIdx >= 0 && !s.substring(wrapIdx).contains("</strong>")) {
          paras += ((s.substring(0, wrapIdx), false))
          paras += ((s.substring(wrapIdx + 1), true))
        } else paras += ((s, true))
      } else if (section.startsWith("Authorizations:")) {
        paras += ((boldHeaders(section), false))
      } else {
        paras += ((boldHeaders(section) + " ", true))
      }
    }
    val out = new StringBuilder
    paras.foreach { case (p, br) =>
      out.append("<p>").append(p).append("</p>")
      if (br) out.append("<p><br></p>")
    }
    // no trailing <p><br></p> after the final paragraph
    val res = out.toString
    if (res.endsWith("<p><br></p>")) res.substring(0, res.length - "<p><br></p>".length) else res
  }

  // ---- v2 variant (golden: /root/reference/pdfs/npf.json) ----
  // Newer docling extractions of the same form carry PDF bullet glyphs
  // (), checkbox glyphs (), markdown bold runs and curly
  // apostrophes in the policy text. Those route to the v2 renderers below,
  // whose paragraph structure mirrors the extracted lines (temporary) and
  // the v2 golden's re-segmentation anchors (final html).

  /** v2 detection: the PDF bullet glyph only appears in the newer extraction. */
  def isV2(source: String): Boolean = source.indexOf('') >= 0

  private val boldRunRe = "\\*\\*(.+?)\\*\\*".r

  /** Markdown bold runs -> <strong>, plus the reference's <u>not</u>
    * typography inside the not-contracted phrase
    * (pdf_to_json_converter.py:1878-1882). */
  private def inlineBold(s: String): String = {
    val b = boldRunRe.replaceAllIn(s,
      m => "<strong>" + java.util.regex.Matcher.quoteReplacement(m.group(1)) + "</strong>")
    b.replace("<strong>If we are not a contracted provider</strong>",
      "<strong>If we are <u>not</u> a contracted provider</strong>")
  }

  /** v2 temporary_html_text: one <p> per extracted line (empty lines were
    * already dropped by the scan-stage cleaner), a blank paragraph before
    * every line from the 3rd on (the v2 golden's section-gap structure);
    * bullets/glyphs/apostrophes/"(initial)" kept as extracted. */
  def formatTemporaryHtmlV2(rawLines: Seq[String]): String = {
    val ls = rawLines.map(_.trim.replace("\\_", "")).filter(_.nonEmpty)
    val out = new StringBuilder
    ls.zipWithIndex.foreach { case (l, idx) =>
      if (idx >= 2) out.append("<p><br></p>")
      out.append("<p>").append(inlineBold(l)).append("</p>")
    }
    out.toString
  }

  /** v2 html_text: bullets dropped, "(initial)" dropped, bold-run space
    * before a period collapsed, paragraphs re-segmented at the v2 golden's
    * anchors (flag = blank paragraph inserted before the anchor). */
  def formatHtmlV2(src0: String): String = {
    var src = src0.replace("\\_", "").replace("(initial)", "").trim
    src = src.replace("-  ", "")
    src = inlineBold(src)
    src = src.replace("</strong> .", "</strong>.")
    val anchors = Vector(
      ("Toward these goals", true), ("Financial arrangements", false),
      ("Personal checks", false), ("Benefits and payments", true),
      ("<strong>If we are a contracted provider", false), ("If our estimate", false),
      ("If your plan allows", false), ("If you choose to not", false),
      ("Because of this courtesy", true), ("To serve all of our patients", false),
      ("<strong>Authorizations:", false), ("I authorize this dental team", true))
    val out = new StringBuilder
    var pos = 0
    val cuts = anchors.flatMap { case (a, br) =>
      val idx = src.indexOf(a, pos)
      // idx == 0 is a genuine match (document starting at an anchor): the
      // duplicate (0, _) bound produces an empty leading paragraph which is
      // skipped, while the anchor's blank-paragraph flag is preserved
      if (idx >= 0) { pos = idx; Some((idx, br)) } else None
    }
    val bounds = ((0, false) +: cuts) :+ ((src.length, false))
    bounds.sliding(2).foreach { case Seq((a, _), (b, _)) =>
      val para = src.substring(a, b).trim
      val brBefore = cuts.find(_._1 == a).exists(_._2)
      if (para.nonEmpty) {
        if (brBefore) out.append("<p><br></p>")
        out.append("<p>").append(para).append("</p>")
      }
    }
    out.toString
  }

  private def splitAtAnchors(text: String, anchors: Vector[String]): Vector[String] = {
    val cuts = anchors.flatMap { a =>
      val idx = text.indexOf(a)
      if (idx >= 0) Some(idx) else None
    }.sorted
    val bounds = (0 +: cuts) :+ text.length
    bounds.sliding(2).map { case Seq(a, b) => text.substring(a, b).trim }.filter(_.nonEmpty).toVector
  }
}
