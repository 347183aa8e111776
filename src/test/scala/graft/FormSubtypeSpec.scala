package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.FormClassifier

/** Modular subtype classifier
  * (document_processing/form_classifier.py:37-128): each subtype keyword
  * bank maps to its label, with the priority and fallback ladder preserved.
  */
class FormSubtypeSpec extends AnyFunSuite {
  private def sub(lines: String*) = FormClassifier.detectFormSubtype(lines)

  test("patient-info indicators (>=3) win before everything else") {
    assert(sub("Patient Name:", "Date of Birth:", "Phone:", "biopsy consent") == "patient_info")
  }

  test("records release needs a pattern hit plus two records keywords") {
    assert(sub("Authorization to Release dental records", "release of information") == "records_release")
  }

  test("structured consent needs informed-consent plus two consent keywords") {
    assert(sub("Informed Consent", "risks of the procedure") == "structured_consent")
  }

  test("narrative consent via risks-and-benefits bank") {
    assert(sub("This form lists risks and benefits", "side effects may occur") == "narrative_consent")
  }

  test("NPF indicators (>=2) classify as patient_info") {
    assert(sub("Marital Status", "Employed By", "something else") == "patient_info")
  }

  test("procedure subtypes: biopsy/endodontic/crown-bridge/composite/implant/denture") {
    assert(sub("biopsy of the lesion", "procedure notes") == "biopsy_consent")
    assert(sub("root canal therapy", "patient consent obtained") == "endodontic_consent")
    assert(sub("crown placement", "consent on file") == "crown_bridge_consent")
    assert(sub("composite filling", "consent on file") == "composite_consent")
    assert(sub("implant supported denture plan", "consent on file") == "implant_consent")
    assert(sub("complete denture delivery", "consent on file") == "denture_consent")
  }

  test("length fallback ladder: simple/structured/detailed") {
    assert(sub("short doc") == "simple_form")
    assert(FormClassifier.detectFormSubtype(Vector.fill(60)("filler line")) == "structured_form")
    assert(FormClassifier.detectFormSubtype(Vector.fill(120)("filler line")) == "detailed_consent")
  }

  test("manual field-pattern counter equals the regex on edge cases") {
    val re = "_+|\\.\\.\\.+|\\[\\s*\\]".r
    val cases = Vector(
      "", "_", "___ __ _", "..", "...", "....", ".. ... ....", "[]", "[  ]", "[x]",
      "[___]", "name: ___ date: ... [ ] sig", "a.b..c...d", "[ [ ] ]", "...[...]_",
      "_" * 30, "plain text with no fields at all", "[\t]", "[\n ]")
    cases.foreach { s =>
      val want = math.min(re.findAllIn(s).size, 11)
      val got = graft.extract.FormClassifier.countFieldPatterns(s, stopAfter = 11)
      assert(got == want, s"mismatch on ${s.take(30)}: got $got want $want")
    }
  }

  test("subtype priority: implant listed before denture wins on combined text") {
    // "implant supported denture" hits implant first (reference order)
    assert(sub("implant supported denture", "consent") == "implant_consent")
  }

  test("main-profile subtype is classified on header/footer-CLEANED lines") {
    // Pins the intended semantics: convertToSpecFull cleans practice
    // headers/footers first, and the cleaned line count feeds the >100/>50
    // length fallback. 46 content lines + 10 practice (www.) lines = 56 raw
    // lines (raw would classify structured_form); cleaned = 46 lines ->
    // simple_form.
    val content = Vector.tabulate(46)(i => s"plain narrative filler sentence $i")
    val practice = Vector.fill(10)("www.brightsmilepractice.com")
    val doc = (content.take(23) ++ practice ++ content.drop(23))
    assert(FormClassifier.detectFormSubtype(doc) == "structured_form")
    val (_, subCleaned, _) = graft.extract.MainExtractor.convertToSpecFull(doc)
    assert(subCleaned == "simple_form")
  }
}
