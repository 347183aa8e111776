package graft.extract

import scala.util.matching.Regex

/** Form-type detection, re-expressed from
  * /root/reference/pdf_to_json_converter.py:815-886 (detect_form_type) with
  * the classification pattern banks from lines 600-622.
  */
object FormClassifier {

  // NO (?i): these banks only ever scan the pre-lowered fullText /
  // analysisText, and the case flag would disable java.util.regex's fast
  // literal-prefix scan (Boyer-Moore) — the patterns are all-lowercase, so
  // matching the lowered text case-sensitively is identical
  private val recordsRelease: Vector[Regex] = Vector(
    "release\\s*of\\s*(?:patient\\s*)?records",
    "(?:medical|dental|patient)\\s*records?\\s*release",
    "authorization\\s*to\\s*release",
    "consent\\s*for\\s*release",
    "section\\s*a:\\s*patient\\s*information",
    "select\\s*information\\s*to\\s*be\\s*released").map(_.r)

  private val structuredConsent: Vector[Regex] = Vector(
    "informed\\s*consent", "treatment\\s*consent", "procedure\\s*consent")
    .map(_.r)

  private val narrativeConsent: Vector[Regex] = Vector(
    "risks?\\s*and\\s*benefits?", "complications", "side\\s*effects?")
    .map(_.r)

  private val consentKeywords = Vector(
    "informed consent", "consent form", "risks", "complications",
    "agree to", "acknowledge", "understand that", "voluntary",
    "authorize", "treatment consent", "procedure consent")

  private val patientInfoKeywords = Vector(
    "patient information", "personal information", "contact information",
    "first name", "last name", "date of birth", "address", "phone",
    "email", "insurance", "dental plan", "medical history",
    "emergency contact", "ssn", "social security")

  private val signaturePatternRe = "signature.*date|date.*signature".r

  private val fieldPatternRe = "_+|\\.\\.\\.+|\\[\\s*\\]".r

  // ---- modular subtype classifier ----
  // Port of the reference's modular variant
  // (document_processing/form_classifier.py:37-128): same three pattern
  // banks, then NPF indicators and per-procedure consent subtypes
  // (biopsy/endodontic/crown-bridge/composite/implant/denture), with the
  // length-based fallback ladder. The modular path delegates extraction to
  // the monolith, so this is exposed as enrichment metadata (form_subtype).

  private val patientInfoIndicators = Vector(
    "patient name", "first name", "last name", "date of birth",
    "address", "phone", "insurance", "dental plan", "emergency contact")
  private val recordsKeywords = Vector("release", "authorization", "medical records", "dental records")
  private val consentSubKeywords = Vector("consent", "procedure", "treatment", "risks", "benefits")
  private val narrativeSubKeywords = Vector("complications", "side effects", "risks and benefits")
  private val npfIndicators = Vector(
    "preferred method of contact", "marital status", "employed by",
    "in case of emergency", "is the patient a minor")
  private val subtypeBanks: Vector[(String, Vector[String], Vector[String])] = Vector(
    // (label, any-of trigger words, all-of companion words)
    ("biopsy_consent", Vector("biopsy"), Vector("consent", "procedure")),
    ("endodontic_consent", Vector("endodontic", "root canal"), Vector("consent")),
    ("crown_bridge_consent", Vector("crown", "bridge", "prosthetic"), Vector("consent")),
    ("composite_consent", Vector("composite", "restoration", "filling"), Vector("consent")),
    ("implant_consent", Vector("implant", "implant supported"), Vector("consent")),
    ("denture_consent", Vector("denture", "dentures", "partial denture", "complete denture"), Vector("consent")))

  // ONE merged Aho-Corasick DFA per classification phase: classification
  // used to scan the full joined document text once per keyword, then once
  // per bank; a merged automaton computes per-pattern presence flags for
  // every bank in a single pass over the text. Segments are concatenated
  // pattern ranges; duplicate keywords across banks get distinct ids so
  // per-bank counts stay exact.
  private val typeSegments: Vector[Vector[String]] =
    Vector(consentKeywords, patientInfoKeywords)

  // subtype phase: indicator banks, the regex-bank gate tokens, and the
  // per-procedure anyOf/companion word lists
  private val subtypeGateTokens = Vector("release", "section", "consent",
    "risk", "complication", "side")
  private val subtypeSegments: Vector[Vector[String]] =
    Vector(patientInfoIndicators, recordsKeywords, consentSubKeywords,
      narrativeSubKeywords, npfIndicators, subtypeGateTokens) ++
      subtypeBanks.flatMap { case (_, anyOf, companions) => Vector(anyOf, companions) }

  // BOTH phases in one automaton: classify() walks the joined text ONCE
  // (prefix+full flags) and both detectors read their segment ranges.
  // subtype segment s lives at combined segment subBase + s.
  private val allSegments: Vector[Vector[String]] = typeSegments ++ subtypeSegments
  private val allOffsets: Vector[Int] = allSegments.scanLeft(0)(_ + _.length)
  private val allAC = MultiSubstring(allSegments.flatten)
  private val subBase = typeSegments.length

  @inline private def segCount(flags: Array[Boolean], offsets: Vector[Int], seg: Int): Int = {
    var i = offsets(seg)
    val end = offsets(seg + 1)
    var c = 0
    while (i < end) { if (flags(i)) c += 1; i += 1 }
    c
  }
  @inline private def segAny(flags: Array[Boolean], offsets: Vector[Int], seg: Int): Boolean = {
    var i = offsets(seg)
    val end = offsets(seg + 1)
    while (i < end) { if (flags(i)) return true; i += 1 }
    false
  }

  def detectFormSubtype(textLines: Seq[String]): String =
    detectFormSubtype(StrUtil.join(textLines, ' ').toLowerCase, textLines.length)

  /** Hot-path variant taking the pre-joined lowercase text (one join +
    * lowercase per turn, shared with detectFormType). Only pattern presence
    * matters, so banks short-circuit on first hit, and each regex bank is
    * gated behind a cheap substring precheck.
    */
  def detectFormSubtype(fullText: String, nLines: Int): String =
    detectFormSubtypeFlags(fullText, nLines, allAC.matchedSet(fullText))

  /** Flags variant: `flags` is an allAC presence array over the text. */
  private def detectFormSubtypeFlags(fullText: String, nLines: Int, flags: Array[Boolean]): String = {
    @inline def cnt(seg: Int) = segCount(flags, allOffsets, subBase + seg)
    @inline def any(seg: Int) = segAny(flags, allOffsets, subBase + seg)
    // gate tokens (segment 5): release, section, consent, risk, complication, side
    @inline def gate(i: Int) = flags(allOffsets(subBase + 5) + i)
    def bankHit(patterns: Vector[Regex], gateOk: Boolean): Boolean =
      gateOk && patterns.exists(_.findFirstIn(fullText).isDefined)
    if (cnt(0) >= 3) return "patient_info"
    if (bankHit(recordsRelease, gate(0) || gate(1)) && cnt(1) >= 2)
      return "records_release"
    if (bankHit(structuredConsent, gate(2)) && cnt(2) >= 2)
      return "structured_consent"
    if (bankHit(narrativeConsent, gate(3) || gate(4) || gate(5)) && cnt(3) >= 1)
      return "narrative_consent"
    if (cnt(4) >= 2) return "patient_info"
    var b = 0
    while (b < subtypeBanks.length) {
      if (any(6 + 2 * b) && any(7 + 2 * b)) return subtypeBanks(b)._1
      b += 1
    }
    if (nLines > 100) "detailed_consent"
    else if (nLines > 50) "structured_form"
    else "simple_form"
  }

  /** Compute (form_type, form_subtype) with one text join + lowercase AND
    * one DFA pass over it (combined prefix+full flags feed both phases). */
  def classify(textLines: Seq[String]): (String, String) = {
    val fullText = StrUtil.join(textLines, ' ').toLowerCase
    val prefixEnd = typePrefixEnd(fullText, textLines)
    val (preFlags, fullFlags) = allAC.matchedSetPrefixAndFull(fullText, prefixEnd)
    (detectFormTypeFlags(fullText, prefixEnd, preFlags, fullFlags),
      detectFormSubtypeFlags(fullText, textLines.length, fullFlags))
  }

  /** classify() that also returns the per-line lowercase views it lowered
    * anyway (joined, they ARE the classify text: Java lowercases per
    * codepoint) — the patient-info machine reuses them instead of
    * re-lowering every line. A variant that additionally collected the
    * machine's context-token end positions in this walk was measured and
    * rejected: two thirds of docling documents never query a context
    * window, and for them the fatter union automaton plus per-hit position
    * appends cost more than the machine's own small lazy pass saves. */
  def classifyWithLowers(textLines: Seq[String])
  : (String, String, IndexedSeq[String]) = {
    val lowers: IndexedSeq[String] = textLines.map(_.toLowerCase).toIndexedSeq
    val fullText = StrUtil.join(lowers, ' ')
    val prefixEnd = typePrefixEnd(fullText, lowers) // offsets are into the lowered join
    val (preFlags, fullFlags) = allAC.matchedSetPrefixAndFull(fullText, prefixEnd)
    (detectFormTypeFlags(fullText, prefixEnd, preFlags, fullFlags),
      detectFormSubtypeFlags(fullText, textLines.length, fullFlags), lowers)
  }

  def detectFormType(textLines: Seq[String]): String =
    detectFormType(StrUtil.join(textLines, ' ').toLowerCase, textLines)

  /** First-50-line analysis window = a prefix of the full join (same
    * separator): build/lowercase once, slice the window. */
  private def typePrefixEnd(fullText: String, textLines: Seq[String]): Int =
    if (textLines.lengthCompare(50) <= 0) fullText.length
    else textLines.take(50).foldLeft(-1)((acc, l) => acc + l.length + 1).max(0)

  private def detectFormType(fullText: String, textLines: Seq[String]): String = {
    val prefixEnd = typePrefixEnd(fullText, textLines)
    val (preFlags, fullFlags) = allAC.matchedSetPrefixAndFull(fullText, prefixEnd)
    detectFormTypeFlags(fullText, prefixEnd, preFlags, fullFlags)
  }

  private def detectFormTypeFlags(fullText: String, prefixEnd: Int,
                                  preFlags: Array[Boolean], fullFlags: Array[Boolean]): String = {
    // a pattern occurs in the prefix substring iff a full-text occurrence
    // ends at or before the boundary — the pre flags ARE the prefix gates
    @inline def gatePre(i: Int) = preFlags(allOffsets(subBase + 5) + i)
    var analysisText0: String = null
    def analysisText: String = {
      if (analysisText0 == null)
        analysisText0 =
          if (prefixEnd == fullText.length) fullText else fullText.substring(0, prefixEnd)
      analysisText0
    }
    // regex banks gated behind the prefix presence flags (the gate tokens
    // are necessary conditions of the inner patterns)
    if ((gatePre(0) || gatePre(1)) &&
        recordsRelease.exists(_.findFirstIn(analysisText).isDefined)) return "records_release"
    if (gatePre(2) &&
        structuredConsent.exists(_.findFirstIn(analysisText).isDefined)) return "structured_consent"
    if ((gatePre(3) || gatePre(4) || gatePre(5)) &&
        narrativeConsent.exists(_.findFirstIn(analysisText).isDefined)) return "narrative_consent"

    var consent = 2 * segCount(preFlags, allOffsets, 0) + segCount(fullFlags, allOffsets, 0)
    var patientInfo = 2 * segCount(preFlags, allOffsets, 1) + segCount(fullFlags, allOffsets, 1)
    if (fullText.contains("signature") && fullText.contains("date"))
      consent += countSignatureDatePairs(fullText) * 2
    if (countFieldPatterns(fullText, stopAfter = 11) > 10) patientInfo += 3

    if (consent > patientInfo && consent >= 3) "consent"
    else if (patientInfo > consent && patientInfo >= 5) "patient_info"
    else "patient_info"
  }

  /** Exact emulation of `signaturePatternRe.findAllIn(s).size` ("signature
    * .*date|date.*signature", greedy, no DOTALL — the classifier text is a
    * space-joined single line) with indexOf arithmetic instead of regex
    * backtracking. Leftmost match start is the first "signature" with a
    * "date" after it or the first "date" with a "signature" after it,
    * whichever is earlier; greedy `.*` extends each match to the LAST
    * occurrence of its closing word; scanning resumes at the match end.
    * Property-tested equivalent against the regex.
    */
  private[graft] def countSignatureDatePairs(s: String): Int = {
    var count = 0
    var pos = 0
    var going = true
    while (going) {
      val iSig = s.indexOf("signature", pos)
      val iDate = s.indexOf("date", pos)
      val valid1 = iSig >= 0 && s.indexOf("date", iSig + 9) >= 0
      val valid2 = iDate >= 0 && s.indexOf("signature", iDate + 4) >= 0
      if (valid1 && (!valid2 || iSig < iDate)) {
        count += 1
        pos = s.lastIndexOf("date") + 4
      } else if (valid2) {
        count += 1
        pos = s.lastIndexOf("signature") + 9
      } else going = false
    }
    count
  }

  /** Manual count of `_+` | `\.\.\.+` | `\[\s*\]` runs (the fill-in-field
    * pattern) with early exit — equivalent to fieldPatternRe.findAllIn.size
    * capped at stopAfter, without the regex engine. */
  private[graft] def countFieldPatterns(s: String, stopAfter: Int): Int = {
    def isWs(c: Char) = c == ' ' || c == '\t' || c == '\n' || c == '' || c == '\f' || c == '\r'
    var count = 0
    var i = 0
    val n = s.length
    while (i < n && count < stopAfter) {
      val c = s.charAt(i)
      if (c == '_') {
        count += 1
        while (i < n && s.charAt(i) == '_') i += 1
      } else if (c == '.' && i + 2 < n && s.charAt(i + 1) == '.' && s.charAt(i + 2) == '.') {
        count += 1
        i += 3
        while (i < n && s.charAt(i) == '.') i += 1
      } else if (c == '[') {
        var j = i + 1
        while (j < n && isWs(s.charAt(j))) j += 1
        if (j < n && s.charAt(j) == ']') { count += 1; i = j + 1 } else i += 1
      } else i += 1
    }
    count
  }
}
