package graft.extract

import graft.model._
import scala.collection.mutable

/** Enhanced DOCX consent processor, reconstructed from its golden outputs
  * (docx/ZOOMConsentFINAL122024.json, DentureProcessingConsentFINAL122024.json,
  * "Informed Consent Crown & Bridge Prosthetic.json"): the producing module
  * (`enhanced_docx_processor`) is absent from the reference repo — its import
  * always fails (pdf_to_json_converter.py:5164-5172) — so the goldens are the
  * spec. Input model: one line per DOCX paragraph; empty line = empty
  * paragraph; markdown bold (**text**) marks bold paragraphs.
  *
  * Output shape: form_1 with one <p> per paragraph (<p><br></p> for empty,
  * <p><strong>..</strong></p> for bold), title paragraph(s) in the centered
  * <strong> header; signature-area fields in document order; signature +
  * date_signed(past) injected when absent; bypasses the manager/validator
  * passes (the reference shortcut returns early).
  */
object EnhancedDocxConsent {

  /** Equivalent of the date-colon whole-line regex match without the
    * per-call Pattern.compile: "date", then regex-whitespace chars, then
    * ':', and no line terminator afterwards (`.` excludes them in a
    * whole-string match). */
  private def isDateColonLine(lower: String): Boolean = {
    if (!lower.startsWith("date")) return false
    var i = 4
    while (i < lower.length && {
      val c = lower.charAt(i)
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    }) i += 1
    if (i >= lower.length || lower.charAt(i) != ':') return false
    var j = i + 1
    while (j < lower.length) {
      val c = lower.charAt(j)
      if (c == '\n' || c == '\r' || c == '\u0085' || c == '\u2028' || c == '\u2029') return false
      j += 1
    }
    true
  }

  private case class Pat(anchor: String, key: String, title: String,
                         fieldType: String, inputType: Option[String])
  // ordered: most specific anchors first; all lowercase-contains matches
  private val patterns = Vector(
    Pat("print patient name", "printed_name", "Patient Name", "input", Some("name")),
    Pat("patient's name (please print)", "patient_name_please_print", "Patient's Name (Please Print)", "input", Some("name")),
    Pat("printed name if signed on behalf", "printed_name_if_signed_on_behalf", "Printed Name", "input", Some("name")),
    Pat("patient's name", "patient_name", "Patient's Name", "input", Some("name")),
    Pat("patient date of birth", "patient_date_of_birth", "Patient Date of Birth", "date", Some("past")),
    Pat("authorized representative", "authorized_representative", "Authorized Representative", "input", Some("name")),
    Pat("signature of parent/guardian", "signature_of_parent_guardian", "Signature of Parent/Guardian", "input", Some("name")),
    Pat("patient name", "patient_name", "Patient Name", "input", Some("name")),
    Pat("relationship", "relationship", "Relationship", "input", Some("name")))

  private val boldRe = "^\\*\\*(.*)\\*\\*$".r

  // fold-scan bank for the per-line checks (anchors are lowercase):
  // indices 0..patterns.length-1 = anchors, patterns.length = "signature";
  // containsAnyFold == patterns.exists(lower.contains) || lower.contains("signature")
  private val fieldAnchorAC = MultiSubstring(patterns.map(_.anchor) :+ "signature")

  /** isDateColonLine(l.toLowerCase) without the lowered copy ("date" is the
    * only cased part; the rest is whitespace/colon/terminator logic). */
  private def isDateColonLineRaw(l: String): Boolean = {
    if (l.length < 4 || !l.regionMatches(true, 0, "date", 0, 4)) return false
    var i = 4
    while (i < l.length && {
      val c = l.charAt(i)
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    }) i += 1
    if (i >= l.length || l.charAt(i) != ':') return false
    var j = i + 1
    while (j < l.length) {
      val c = l.charAt(j)
      if (c == '\n' || c == '\r' || c == '\u0085' || c == '\u2028' || c == '\u2029') return false
      j += 1
    }
    true
  }

  def convert(lines0: Seq[String]): String =
    convertFields(lines0)._2

  /** Returns (fields, rendered json) — callers needing counts avoid a second
    * extraction pass. */
  def convertFields(lines0: Seq[String]): (Vector[FieldInfo], String) = {
    val lines = lines0.toVector
    val fields = mutable.ArrayBuffer[FieldInfo]()
    val processed = mutable.Set[String]()

    // ---- content/title area ----
    // content ends at the first fill-in line: a field/signature/date label
    // WITH underscores. A label line without a blank (e.g. Denture's
    // "Patient's Name (Please Print) : Date:") stays in the content html,
    // matching the goldens.
    val firstIdx = lines.indexWhere(_.trim.nonEmpty)
    if (firstIdx < 0) {
      // degenerate input (empty / whitespace-only docx): minimal spec, same
      // shape as the non-empty path's fallback — form_1 + injected signature
      // + date_signed — so one blank row can't kill a whole batch.
      fields += FieldInfo("form_1", "", "text", "Form", optional = false,
        control = JObj.of("html_text" ->
          JStr("""<div style="text-align:center"><strong></strong><br></div>""")),
        lineIdx = 0)
      fields += FieldInfo("signature", "Signature", "signature", "Signature",
        optional = false, control = JObj(Vector.empty), lineIdx = 1)
      fields += FieldInfo("date_signed", "Date Signed", "date", "Signature",
        optional = false, control = JObj.of("input_type" -> JStr("past")), lineIdx = 2)
      return (fields.toVector, Spec.render(fields.toSeq, includeOptional = true))
    }
    def isFillIn(l: String): Boolean =
      l.indexOf('_') >= 0 && (fieldAnchorAC.containsAnyFold(l) || isDateColonLineRaw(l))
    val sigStart = lines.indexWhere(isFillIn)
    val contentEnd = if (sigStart >= 0) sigStart else lines.length

    var titleParts = Vector(stripBold(lines(firstIdx).trim))
    var contentFrom = firstIdx + 1
    // multi-line title continuation: short capitalized unpunctuated next line
    while (contentFrom < contentEnd && {
      val n = lines(contentFrom).trim
      n.nonEmpty && n.length < 40 && StrUtil.splitWsCount(n) <= 4 &&
        n.head.isUpper && !n.endsWith(".") && !n.endsWith(":") && !n.contains("_")
    }) {
      titleParts = titleParts :+ stripBold(lines(contentFrom).trim)
      contentFrom += 1
    }
    val title = titleParts.mkString("<br>")

    // presized builder + direct appends (an interpolated s"<p>$t</p>" would
    // build a throwaway string per line before the append)
    var bodyCap = 0
    var bi = contentFrom
    while (bi < contentEnd) { bodyCap += lines(bi).length + 24; bi += 1 }
    val body = new StringBuilder(bodyCap)
    bi = contentFrom
    while (bi < contentEnd) {
      val t = lines(bi).trim
      if (t.isEmpty) body.append("<p><br></p>")
      else if (!(t.length >= 4 && t.startsWith("**") && t.endsWith("**")))
        body.append("<p>").append(t).append("</p>")
      else boldRe.findFirstMatchIn(t) match {
        case Some(m) => body.append("<p><strong>").append(m.group(1)).append("</strong></p>")
        case None => body.append("<p>").append(t).append("</p>")
      }
      bi += 1
    }
    fields += FieldInfo("form_1", "", "text", "Form", optional = false,
      control = JObj.of("html_text" ->
        JStr(s"""<div style="text-align:center"><strong>$title</strong><br>$body</div>""")),
      lineIdx = 0)

    // ---- field pass over the whole document (document order == output
    // order) ---- index loop + per-line fold flags: no tuple vector and no
    // per-line toLowerCase copy
    var idx = contentFrom
    val sigFlag = patterns.length
    while (idx < lines.length) {
      val raw = lines(idx)
      if (!StrUtil.isBlank(raw)) {
        val flags = fieldAnchorAC.matchedSetFold(raw)
        var pi = 0
        var hit = -1
        while (pi < patterns.length && hit < 0) {
          if (flags(pi) && !processed.contains(patterns(pi).key)) hit = pi
          pi += 1
        }
        if (hit >= 0) {
          val p = patterns(hit)
          val control = p.fieldType match {
            case "date" => JObj.of("input_type" -> JStr(p.inputType.getOrElse("past")))
            case _ => JObj.of("input_type" -> JStr(p.inputType.getOrElse("name")))
          }
          fields += FieldInfo(p.key, p.title, p.fieldType, "Signature",
            optional = false, control = control, lineIdx = idx)
          processed += p.key
        } else if (flags(sigFlag) && !processed.contains("signature")) {
          fields += FieldInfo("signature", "Signature", "signature", "Signature",
            optional = false, control = JObj(Vector.empty), lineIdx = idx)
          processed += "signature"
        } else if (isDateColonLineRaw(raw) && !processed.contains("date_signed")) {
          fields += FieldInfo("date_signed", "Date Signed", "date", "Signature",
            optional = false, control = JObj.of("input_type" -> JStr("past")), lineIdx = idx)
          processed += "date_signed"
        }
      }
      idx += 1
    }

    if (!processed.contains("signature"))
      fields += FieldInfo("signature", "Signature", "signature", "Signature",
        optional = false, control = JObj(Vector.empty), lineIdx = lines.length)
    if (!processed.contains("date_signed"))
      fields += FieldInfo("date_signed", "Date Signed", "date", "Signature",
        optional = false, control = JObj.of("input_type" -> JStr("past")), lineIdx = lines.length + 1)

    (fields.toVector, Spec.render(fields.toSeq, includeOptional = true))
  }

  private def stripBold(s: String): String =
    if (s.length >= 4 && s.startsWith("**") && s.endsWith("**"))
      boldRe.findFirstMatchIn(s).map(_.group(1)).getOrElse(s)
    else s
}
