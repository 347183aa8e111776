package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.MainExtractor
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Main-profile golden tests (pdf_to_json_converter.py flow): fixture lines
  * -> main pipeline -> JSON byte-equal to the docx goldens.
  */
class MainGoldenSpec extends AnyFunSuite {

  private def res(p: String): String = {
    val url = getClass.getClassLoader.getResource(p)
    require(url != null, s"missing resource $p")
    new String(Files.readAllBytes(Paths.get(url.toURI)), StandardCharsets.UTF_8)
  }

  private def runGolden(name: String): Unit = {
    val lines = res(s"fixtures/$name.txt").split("\n", -1).toSeq
    val golden = res(s"golden/$name.json").stripLineEnd
    val out = MainExtractor.convert(lines)
    if (out != golden) {
      val a = out.split("\n")
      val b = golden.split("\n")
      val firstDiff = a.zip(b).indexWhere { case (x, y) => x != y }
      fail(s"golden mismatch at line $firstDiff\n got: ${a.lift(firstDiff)}\nwant: ${b.lift(firstDiff)}\n(lengths ${a.length} vs ${b.length})")
    }
  }

  test("pediatric extraction (consent route) matches golden byte-for-byte") {
    runGolden("pediatric_extraction")
  }

  test("records release template (generated-once golden, FIXTURES.md 2.4)") {
    runGolden("records_release")
  }

  private def runDocxGolden(name: String): Unit = {
    val lines = res(s"fixtures/$name.txt").split("\n", -1).toSeq
    val golden = res(s"golden/$name.json").stripLineEnd
    val out = graft.extract.EnhancedDocxConsent.convert(lines)
    if (out != golden) {
      val a = out.split("\n"); val b = golden.split("\n")
      val d = a.zip(b).indexWhere { case (x, y) => x != y }
      fail(s"golden mismatch at line $d\n got: ${a.lift(d)}\nwant: ${b.lift(d)}\n(lengths ${a.length} vs ${b.length})")
    }
  }

  test("ZOOM docx consent matches golden byte-for-byte") { runDocxGolden("zoom_consent") }
  test("Denture docx consent matches golden byte-for-byte") { runDocxGolden("denture_consent") }
  test("Crown & Bridge docx consent matches golden byte-for-byte") { runDocxGolden("crown_bridge_docx") }

  test("Crown & Bridge v2 (pdfs/consent_crown_bridge_prosthetics.json: 3-field enhanced route) matches golden byte-for-byte") {
    // second docling extraction: markdown heading + body without numbered
    // risk headers; routes via structured_consent -> enhanced consent html
    runGolden("consent_crown_bridge_v2")
  }

  test("NPF v2 variant (pdfs/npf.json: glyph-bearing extraction, Secondary street block) matches golden byte-for-byte") {
    // second docling extraction of the same form: bullet/checkbox glyphs,
    // bold runs, curly apostrophes, no filler between Primary block and
    // Secondary header (flips street_4..zip_5 to Secondary Dental Plan)
    runGolden("npf_v2")
  }

  test("NPF 86-field patient-info machine matches golden byte-for-byte") {
    val lines = res("fixtures/npf.txt").split("\n", -1).toSeq
    val golden = res("golden/npf.json").stripLineEnd
    val (formType, spec) = MainExtractor.convertToSpec(lines)
    assert(formType == "patient_info")
    // the NPF golden is minified (json.dumps separators=(",",":"))
    val out = graft.model.Json.renderCompact(graft.model.JArr(spec.map(_.render)))
    if (out != golden) {
      val i = out.zip(golden).indexWhere { case (a, b) => a != b }
      val p = if (i < 0) math.min(out.length, golden.length) else i
      fail(s"golden mismatch at char $p\n got: ...${out.slice(p - 60, p + 90)}...\nwant: ...${golden.slice(p - 60, p + 90)}...\n(lengths ${out.length} vs ${golden.length})")
    }
  }
}
