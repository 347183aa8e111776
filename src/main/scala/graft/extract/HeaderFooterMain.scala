package graft.extract

import scala.util.matching.Regex

/** Main-pipeline header/footer manager — the reference's boilerplate-removal
  * analog (field_processing/header_footer_manager.py, SURVEY.md §2.2 #7,#10):
  * 25+ practice-info patterns guarded by a form-content whitelist, mixed-line
  * form-title extraction, and the positional first/last-5% heuristic.
  */
object HeaderFooterMain {

  // The reference's .*-wrapped pattern.match() checks reduce to "line
  // contains a match of the inner pattern" — each regex below is the
  // unwrapped inner pattern, gated behind a cheap substring/char precheck so
  // ordinary content lines skip the regex engine entirely. Semantics are
  // identical: isPracticeInformation is an order-independent any-match.
  private val phoneRe = "(?i)\\b\\d{3}[-.\\s]?\\d{3}[-.\\s]?\\d{4}\\b".r
  private val emailRe = "(?i)@.*\\.(com|org|net|edu)".r
  private val wwwRe = "(?i)www\\..*\\.com".r
  private val streetAddrRe = "(?i)\\b\\d+\\s+[A-Za-z\\s]+(?:street|st|avenue|ave|road|rd|drive|dr|lane|ln|blvd|boulevard)\\b".r
  private val cityStateZipRe = "(?i)\\b[A-Za-z\\s]+,\\s*[A-Z]{2}\\s+\\d{5}".r
  private val dentistryRe = "(?i)\\b(family\\s+dental|cosmetic\\s+dentistry|pediatric\\s+dentistry|general\\s+dentistry)\\b".r
  private val specialtyRe = "(?i)\\b(orthodontic\\s+office|endodontic\\s+practice|periodontal\\s+office)\\b".r
  private val facilityWords = Vector("clinic", "center", "associates", "group", "practice", "office", "care", "solutions")
  private val facilityRe = "(?i)\\b(clinic|center|associates|group|practice|office|care|solutions)\\b".r
  private val tripleBulletRe = "•.*•.*•".r
  private val smileDentalRe = "(?i)smile.*dental".r
  private val kingeryRe = "(?i)kingery.*dental".r
  private val darienRe = "(?i)darien.*il".r
  private val pageNumRe = "(?i)page\\s+\\d+".r
  private val copyrightRe = "©.*\\d{4}".r
  private val rightsRe = "(?i)all\\s+rights\\s+reserved".r
  private val formIdRe = "(?i)form\\s*(id|number|version)".r
  private val revisedRe = "(?i)revised.*\\d{4}".r

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

  // one-pass Aho-Corasick DFAs over the per-line keyword banks (the
  // per-line exists(contains) scans were the hottest part of line cleaning)
  private val formContentAC = MultiSubstring(formContentWhitelist)
  private val practiceKeywordsAC = MultiSubstring(practiceKeywords)
  private val facilityWordsAC = MultiSubstring(facilityWords)

  // fold scans: no pattern in these banks has edge whitespace, so presence
  // in trim+toLowerCase == presence under the case-folded scan of the raw
  // line (trim only strips edge ws; matches begin/end on non-ws chars)
  def isFormContent(line: String): Boolean =
    formContentAC.containsAnyFold(line)

  def isPracticeInformation(line0: String): Boolean = {
    // common case (real form content) exits before any per-line copies
    if (formContentAC.containsAnyFold(line0)) return false
    val line = line0.trim
    val lower = line.toLowerCase
    // anchored specials: ^[^a-zA-Z]*$ (subsumes ^\s*•\s*$)
    var hasLetter = false
    var hasDigit = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c.isLetter) hasLetter = true
      if (c.isDigit) hasDigit = true
      i += 1
    }
    if (!hasLetter) return true
    if (hasDigit) {
      if (phoneRe.findFirstIn(line).isDefined) return true
      if (streetAddrRe.findFirstIn(line).isDefined) return true
      if (line.indexOf(',') >= 0 && cityStateZipRe.findFirstIn(line).isDefined) return true
      if (lower.contains("page") && pageNumRe.findFirstIn(line).isDefined) return true
      if (line.indexOf('©') >= 0 && copyrightRe.findFirstIn(line).isDefined) return true
      if (lower.contains("revised") && revisedRe.findFirstIn(line).isDefined) return true
    }
    if (line.indexOf('@') >= 0 && emailRe.findFirstIn(line).isDefined) return true
    if (lower.contains("www.") && wwwRe.findFirstIn(line).isDefined) return true
    if ((lower.contains("dental") || lower.contains("dentistry")) &&
        dentistryRe.findFirstIn(line).isDefined) return true
    if ((lower.contains("dontic") || lower.contains("periodont")) &&
        specialtyRe.findFirstIn(line).isDefined) return true
    if (facilityWordsAC.containsAny(lower) && facilityRe.findFirstIn(line).isDefined) return true
    if (line.indexOf('•') >= 0 && tripleBulletRe.findFirstIn(line).isDefined) return true
    if (lower.contains("smile") && smileDentalRe.findFirstIn(line).isDefined) return true
    if (lower.contains("kingery") && kingeryRe.findFirstIn(line).isDefined) return true
    if (lower.contains("darien") && darienRe.findFirstIn(line).isDefined) return true
    if (lower.contains("rights") && rightsRe.findFirstIn(line).isDefined) return true
    if (lower.contains("form") && formIdRe.findFirstIn(line).isDefined) return true
    practiceKeywordsAC.containsAny(lower)
  }

  private val mixedConsentRe = "(?i)(informed\\s+consent[^•]*)".r

  private val mixedGateAC = MultiSubstring(Vector("smile@", "www."))
  private val informedConsentAC = MultiSubstring(Vector("informed consent"))

  def hasMixedPracticeContent(line: String): Boolean =
    mixedGateAC.containsAnyFold(line) && informedConsentAC.containsAnyFold(line)

  def extractFormContent(line: String): String =
    mixedConsentRe.findFirstMatchIn(line).map(_.group(1).trim).getOrElse("")

  /** Universal header/footer removal (the main-profile line-cleaning stage,
    * applied before field extraction — pdf_to_json_converter.py:792-793). */
  def removePracticeHeadersFooters(lines: Seq[String]): Seq[String] =
    lines.flatMap { line =>
      if (StrUtil.isBlank(line)) None
      else if (isPracticeInformation(line)) None
      else if (hasMixedPracticeContent(line)) {
        val extracted = extractFormContent(line)
        if (extracted.nonEmpty) Some(extracted) else None
      } else Some(line)
    }

  /** Positional heuristic (header_footer_manager.py:185-215): first/last 5%
    * of lines + practice info → header/footer. */
  private val positionIndicatorsAC = MultiSubstring(Vector("page ", "of ", "©",
    "copyright", "all rights reserved", "confidential", "proprietary",
    "revised", "version", "form id", "document id"))

  def isLikelyHeaderFooter(line: String, lineIndex: Int, totalLines: Int): Boolean = {
    val headerThreshold = math.max(1, (totalLines * 0.05).toInt)
    val footerThreshold = totalLines - headerThreshold
    val positional = lineIndex < headerThreshold || lineIndex >= footerThreshold
    if (!positional) return false
    if (isPracticeInformation(line)) return true
    // "page "/"of " end in a space, so the trim matters; fold spares the
    // lowercase copy and this runs only on the positional 10% of lines
    positionIndicatorsAC.containsAnyFold(line.trim)
  }
}
