package graft.extract

import scala.util.matching.Regex

/** Main-pipeline header/footer manager — the reference's boilerplate-removal
  * analog (field_processing/header_footer_manager.py, SURVEY.md §2.2 #7,#10):
  * 25+ practice-info patterns guarded by a form-content whitelist, mixed-line
  * form-title extraction, and the positional first/last-5% heuristic.
  */
object HeaderFooterMain {

  private val practicePatterns: Vector[Regex] = Vector(
    ".*\\b\\d{3}[-.\\s]?\\d{3}[-.\\s]?\\d{4}\\b.*",
    ".*@.*\\.(com|org|net|edu).*",
    ".*www\\..*\\.com.*",
    ".*\\b\\d+\\s+[A-Za-z\\s]+(?:street|st|avenue|ave|road|rd|drive|dr|lane|ln|blvd|boulevard)\\b.*",
    ".*\\b[A-Za-z\\s]+,\\s*[A-Z]{2}\\s+\\d{5}.*",
    ".*\\b(family\\s+dental|cosmetic\\s+dentistry|pediatric\\s+dentistry|general\\s+dentistry)\\b.*",
    ".*\\b(orthodontic\\s+office|endodontic\\s+practice|periodontal\\s+office)\\b.*",
    ".*\\b(clinic|center|associates|group|practice|office|care|solutions)\\b.*",
    ".*•.*•.*•.*",
    ".*[Ss]mile.*[Dd]ental.*",
    ".*[Kk]ingery.*[Dd]ental.*",
    ".*[Dd]arien.*IL.*",
    "^[^a-zA-Z]*$",
    "^\\s*•\\s*$",
    ".*page\\s+\\d+.*",
    ".*©.*\\d{4}.*",
    ".*all\\s+rights\\s+reserved.*",
    ".*form\\s*(id|number|version).*",
    ".*revised.*\\d{4}.*").map(p => ("(?i)" + p).r)

  private val practiceKeywords = Vector(
    "smile solutions", "dental office", "family dentistry", "cosmetic dentistry",
    "orthodontics", "endodontics", "periodontics", "oral surgery", "implant dentistry")

  /** Form-content whitelist: content that must never be removed
    * (header_footer_manager.py:114-141). */
  private val formContentWhitelist = Vector(
    "patient responsibilities", "dental benefit plans", "payment is due",
    "scheduling of appointments", "authorizations", "we are committed",
    "if we are a contracted provider", "assign benefits",
    "financial and scheduling terms", "plan/group number", "our practice",
    "is not (check one)", "i authorize the release",
    "personal information necessary to process", "yes  n o (check one)",
    "check one", "(initial)", "contracted provider")

  def isFormContent(line: String): Boolean = {
    val lower = line.trim.toLowerCase
    formContentWhitelist.exists(lower.contains)
  }

  def isPracticeInformation(line0: String): Boolean = {
    val line = line0.trim
    if (isFormContent(line)) return false
    // pattern.match in Python anchors at the start; these patterns are
    // .*-wrapped so findPrefix via regex matches(start) == findFirstIn at 0
    if (practicePatterns.exists(p => p.findPrefixOf(line).isDefined)) return true
    val lower = line.toLowerCase
    practiceKeywords.exists(lower.contains)
  }

  private val mixedConsentRe = "(?i)(informed\\s+consent[^•]*)".r

  def hasMixedPracticeContent(line: String): Boolean = {
    val lower = line.toLowerCase
    (lower.contains("smile@") || lower.contains("www.")) && lower.contains("informed consent")
  }

  def extractFormContent(line: String): String =
    mixedConsentRe.findFirstMatchIn(line).map(_.group(1).trim).getOrElse("")

  /** Universal header/footer removal (the main-profile line-cleaning stage,
    * applied before field extraction — pdf_to_json_converter.py:792-793). */
  def removePracticeHeadersFooters(lines: Seq[String]): Seq[String] =
    lines.flatMap { line =>
      if (line.trim.isEmpty) None
      else if (isPracticeInformation(line)) None
      else if (hasMixedPracticeContent(line)) {
        val extracted = extractFormContent(line)
        if (extracted.nonEmpty) Some(extracted) else None
      } else Some(line)
    }

  /** Positional heuristic (header_footer_manager.py:185-215): first/last 5%
    * of lines + practice info → header/footer. */
  def isLikelyHeaderFooter(line: String, lineIndex: Int, totalLines: Int): Boolean = {
    val headerThreshold = math.max(1, (totalLines * 0.05).toInt)
    val footerThreshold = totalLines - headerThreshold
    val positional = lineIndex < headerThreshold || lineIndex >= footerThreshold
    if (positional && isPracticeInformation(line)) return true
    val lower = line.toLowerCase.trim
    val indicators = Vector("page ", "of ", "©", "copyright", "all rights reserved",
      "confidential", "proprietary", "revised", "version", "form id", "document id")
    positional && indicators.exists(lower.contains)
  }
}
