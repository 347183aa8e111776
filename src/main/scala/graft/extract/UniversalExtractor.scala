package graft.extract

import graft.model._
import scala.util.matching.Regex
import scala.collection.mutable

/** Universal extraction fallback (pdf_to_json_converter.py:3401-3576) with
  * its section-header map (#18, 3578-3631), current-section lookup (#19,
  * 3632-3641) and universal input detection (#21, 3852-4026).
  */
object UniversalExtractor {

  import MainExtractor.detectInputType
  import PatientInfoMachine.{detectRadioOptionsUniversal, getRadioKeyForQuestion}

  // ---- #18 section-header map ----
  private val headerKeywords = Vector(
    "patient information", "medical history", "dental history", "emergency contact",
    "signature", "consent", "for children", "minors only", "primary dental plan",
    "secondary dental plan", "benefit plan", "registration")
  private val headerExcludes = Vector(
    "insurance company", "__", "phone", "name of insured", "plan name")

  def detectSectionHeaders(textLines: Seq[String]): Map[Int, String] = {
    val out = mutable.LinkedHashMap[Int, String]()
    textLines.zipWithIndex.foreach { case (line, i) =>
      val stripped = line.trim
      val lower = stripped.toLowerCase
      val isHeader = line.startsWith("##") ||
        (stripped.length < 80 && headerKeywords.exists(lower.contains))
      if (isHeader && !headerExcludes.exists(lower.contains)) {
        val name0 = stripped.replace("##", "").trim
        if (name0.nonEmpty) {
          val name =
            if (lower.contains("patient information") || lower.contains("registration")) "Patient Information Form"
            else if (lower.contains("medical history")) "Medical History"
            else if (lower.contains("dental history")) "Dental History"
            else if (lower.contains("children") || lower.contains("minors")) "FOR CHILDREN/MINORS ONLY"
            else if (lower.contains("primary dental") || lower.contains("primary insurance") ||
              lower.contains("dental benefit plan information primary")) "Primary Dental Plan"
            else if (lower.contains("secondary dental") || lower.contains("secondary insurance")) "Secondary Dental Plan"
            else if (lower.contains("signature") || lower.contains("consent")) "Signature"
            else if (lower.contains("emergency")) "Emergency Contact"
            else if (lower.contains("p a t i e n t") || lower.contains("r e g i s t r a t i o n")) "Patient Information Form"
            else name0
          out(i) = name
        }
      }
    }
    out.toMap
  }

  /** #19: most recent header at or before lineIdx — the row-local analog of
    * `last_value(...) OVER (ORDER BY idx ROWS UNBOUNDED PRECEDING)`. */
  def currentSection(lineIdx: Int, sections: Map[Int, String],
                     default: String = "Patient Information Form"): String =
    sections.filter(_._1 <= lineIdx) match {
      case m if m.isEmpty => default
      case m => m.maxBy(_._1)._2
    }

  // ---- #21 universal input-field detection ----
  private val exactUnderscore: Vector[(Regex, Vector[String])] = Vector(
    "First\\s*_{10,}.*?MI\\s*_{2,}.*?Last\\s*_{10,}.*?Nickname\\s*_{5,}" ->
      Vector("First Name", "Middle Initial", "Last Name", "Nickname"),
    "Street\\s*_{30,}.*?Apt/Unit/Suite\\s*_{5,}" -> Vector("Street", "Apt/Unit/Suite"),
    "City\\s*_{20,}.*?State\\s*_{5,}.*?Zip\\s*_{10,}" -> Vector("City", "State", "Zip"),
    "Mobile\\s*_{10,}.*?Home\\s*_{10,}.*?Work\\s*_{10,}" -> Vector("Mobile", "Home", "Work"),
    "E-Mail\\s*_{20,}.*?Drivers License #" -> Vector("E-Mail", "Drivers License #")
  ).map { case (p, v) => (("(?i)" + p).r, v) }

  private val genericUnderscore: Vector[Regex] = Vector(
    "([A-Za-z\\s]+?)(?:(?:\\\\_|_){2,})",
    "([A-Za-z\\s]+?)(?:\\s+(?:\\\\_|_){2,})",
    "([A-Za-z\\s]+?)\\s+(?:\\\\_|_)+",
    "([A-Za-z\\s/\\(\\)#\\.]+?)\\s*(?:\\\\_|_){2,}",
    "([A-Za-z\\s]+?)\\s*:\\s*(?:\\\\_|_){2,}",
    "([A-Za-z\\s]+?)\\s*-:\\s*(?:\\\\_|_){2,}",
    "([A-Za-z\\s/\\(\\)#\\.]+?)\\s+(?:\\\\_|_){8,}").map(_.r)
  private val parenUnderscoreRe = "([A-Za-z\\s]+?)\\s*\\(\\s*(?:\\\\_|_)+\\s*\\)".r
  private val labelStopWords = Set("and", "or", "the", "of", "to", "in", "for", "with")
  private val spaceFieldRe = "([A-Za-z\\s]+?)\\s{4,}".r
  private val sentenceWordRe = "(?i)\\b(the|there|are|is|was|were|have|has|had|will|would|shall|should)\\b".r

  def detectInputFieldUniversal(line: String): Vector[(String, String)] = {
    val fields = mutable.ArrayBuffer[(String, String)]()
    exactUnderscore.foreach { case (re, titles) =>
      if (fields.isEmpty && re.findFirstIn(line).isDefined) {
        titles.foreach(t => fields += ((t, line)))
        return fields.toVector
      }
    }
    // Label: pattern
    val colonIdx = line.indexOf(':')
    if (colonIdx >= 0 && !line.trim.startsWith("##")) {
      val label = line.substring(0, colonIdx).trim
      if (label.nonEmpty && label.length < 50 && !label.toLowerCase.startsWith("http") &&
          (!label.contains(".") || label.count(_ == '.') <= 1)) {
        val remainder = line.substring(colonIdx + 1).trim
        if (remainder.isEmpty || remainder.length < 10 || StrUtil.allWsOrUnderscore(remainder))
          fields += ((label, line))
      }
    }
    // underscore patterns
    if (line.indexOf('_') >= 0) {
      genericUnderscore.foreach { re =>
        re.findAllMatchIn(line).foreach { m =>
          val label = m.group(1).trim
          if (label.length > 1 && label.length < 60 && !label.startsWith("_") &&
              !label.toLowerCase.startsWith("page") && !label.toLowerCase.startsWith("form") &&
              !label.toLowerCase.startsWith("see ") && !label.toLowerCase.startsWith("the ") &&
              !(label.nonEmpty && StrUtil.allWsOrUnderscore(label)) &&
              !StrUtil.startsDigitsDot(label.trim) &&
              !labelStopWords.contains(label.toLowerCase.trim))
            fields += ((label, line))
        }
      }
      parenUnderscoreRe.findAllMatchIn(line).foreach { m =>
        val label = m.group(1).trim
        if (label.length > 1 && label.length < 50) fields += ((label, line))
      }
    }
    // 4+-space layout
    if (line.length > 20) {
      spaceFieldRe.findAllMatchIn(line).foreach { m =>
        val label = m.group(1).trim
        if (label.length > 2 && label.length < 50 &&
            !Set("the", "and", "for", "with", "this", "that").contains(label.toLowerCase))
          fields += ((label, line))
      }
    }
    // consent-specific patterns
    if ("(?i)dr\\.\\s+to\\s+perform".r.findFirstIn(line).isDefined) fields += (("Doctor Name", line))
    if ("(?i)patient'?s?\\s+name\\s*\\(.*print.*\\)".r.findFirstIn(line).isDefined) fields += (("Patient's Name", line))
    if ("(?i)\\bdate\\s*:\\s*$".r.findFirstIn(line).isDefined && line.trim.length < 30) fields += (("Date", line))
    val lower = line.toLowerCase
    if (lower.contains("signature:") && lower.contains("printed name:") && lower.contains("date:") &&
        "(?i)signature:\\s*\\t+\\s*printed name:\\s*\\t+\\s*date:".r.findFirstIn(line).isDefined) {
      fields += (("Signature", line)); fields += (("Printed Name", line)); fields += (("Date", line))
    }
    if ("(?i)\\(patient.*parent.*guardian\\).*relationship".r.findFirstIn(line).isDefined)
      fields += (("Relationship", line))
    if ("(?i)patient\\s+date\\s+of\\s+birth\\s*:".r.findFirstIn(line).isDefined)
      fields += (("Patient Date of Birth", line))
    if ("(?i)authorized\\s+representative\\s*:".r.findFirstIn(line).isDefined)
      fields += (("Authorized Representative", line))
    if ("(?i)dentist'?s?\\s+signature\\s*:".r.findFirstIn(line).isDefined)
      fields += (("Dentist's Signature", line))
    // sentence filter (3997-4024)
    fields.toVector.filter { case (name, _) =>
      name.length <= 60 &&
        sentenceWordRe.findFirstIn(name).isEmpty &&
        !(name == name.toLowerCase && name.length > 10)
    }
  }

  // ---- #36 the universal fallback machine ----
  def extract(textLines0: Seq[String]): Vector[FieldInfo] = {
    val textLines = textLines0.toIndexedSeq
    val fields = mutable.ArrayBuffer[FieldInfo]()
    val processed = mutable.Set[String]()
    val sections = detectSectionHeaders(textLines)
    var i = 0
    while (i < textLines.length) {
      val line = textLines(i)
      val section = currentSection(i, sections)
      if (line.trim.isEmpty || sections.contains(i)) { i += 1 }
      else {
        detectRadioOptionsUniversal(textLines, i) match {
          case Some((question, options, nextI)) =>
            val key = getRadioKeyForQuestion(question, section)
            if (!processed.contains(key)) {
              fields += FieldInfo(key, question, "radio", section, optional = false,
                JObj.of("options" -> options), i)
              processed += key
            }
            i = nextI
          case None =>
            detectInputFieldUniversal(line).foreach { case (fieldName, fullLine) =>
              val key = Slugify.slugify(fieldName)
              if (!processed.contains(key)) {
                val lower = fieldName.toLowerCase
                val (fieldType, control0) =
                  if (lower.contains("state") && !lower.contains("estate")) ("states", JObj(Vector.empty))
                  else if (lower.contains("date")) ("date", JObj.of("input_type" -> JStr("past")))
                  else if (lower.contains("signature")) ("signature", JObj(Vector.empty))
                  else {
                    var c = JObj.of("input_type" -> JStr(detectInputType(fieldName)))
                    val ctx = textLines.slice(math.max(0, i - 3), math.min(textLines.length, i + 3))
                      .mkString(" ").toLowerCase
                    val hint =
                      if (fullLine.toLowerCase.contains("if different"))
                        Some(if (fullLine.toLowerCase.contains("patient")) "If different from patient"
                        else "(if different from above)")
                      else if (ctx.contains("insurance") &&
                        Set("phone", "street", "city", "zip").contains(lower)) Some("Insurance Company")
                      else if (ctx.contains("emergency")) Some("Emergency Contact")
                      else None
                    hint.foreach(h => c = c.updated("hint", JStr(h)))
                    ("input", c)
                  }
                fields += FieldInfo(key, fieldName, fieldType, section, optional = false, control0, i)
                processed += key
              }
            }
            if ("(?i)signature.*date".r.findFirstIn(line).isDefined) {
              if (!processed.contains("signature")) {
                fields += FieldInfo("signature", "Signature", "signature", section,
                  optional = false, JObj(Vector.empty), i)
                processed += "signature"
              }
              if (!processed.contains("date_signed")) {
                fields += FieldInfo("date_signed", "Date Signed", "date", section,
                  optional = false, JObj.of("input_type" -> JStr("past")), i)
                processed += "date_signed"
              }
            }
            i += 1
        }
      }
    }
    fields.toVector
  }
}
