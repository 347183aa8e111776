package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parse.{Html, XYCut}
import graft.spark.Transcripts
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** North-star parse layer: HTML boilerplate strip (streaming tokenizer +
  * text/link density) and XY-cut reading order must recover document lines
  * such that the downstream extraction still matches the goldens
  * (FIXTURES.md §2.5-2.6).
  */
class ParseLayerSpec extends AnyFunSuite {

  private def res(p: String): String = {
    val url = getClass.getClassLoader.getResource(p)
    require(url != null, s"missing resource $p")
    new String(Files.readAllBytes(Paths.get(url.toURI)), StandardCharsets.UTF_8)
  }

  test("HTML-wrapped tooth consent: boilerplate stripped, golden preserved") {
    val lines = res("fixtures/tooth_removal_consent.txt").split("\n", -1).toSeq
    val html = Transcripts.wrapInBoilerplateHtml(lines)
    val recovered = Html.extractLines(html)
    // boilerplate gone
    assert(!recovered.exists(_.contains("Bright Smiles")), "practice header must be stripped")
    assert(!recovered.exists(_.contains("Privacy")), "footer nav must be stripped")
    assert(!recovered.exists(_.contains("not content")), "script text must be stripped")
    // end-to-end through the wrapped payload path
    val e = graft.extract.Extractor.extractTurn(html, "html:consent_txt")
    val golden = res("golden/tooth_removal_consent.json").stripLineEnd
    assert(e.fieldsJson == golden, "wrapped-HTML turn must still match the golden bytes")
  }

  test("two-column PDF runs: XY-cut restores reading order, golden preserved") {
    val lines = res("fixtures/pediatric_extraction.txt").split("\n", -1).toSeq
    val runs = XYCut.synthesizeColumns(lines, cols = 2)
    // shuffle deterministically to prove order recovery
    val shuffled = runs.sortBy(r => (r.text.hashCode * 31 + r.x0).toInt)
    assert(XYCut.toLines(shuffled) == lines.toVector, "reading order must be recovered")
    val payload = XYCut.renderRuns(shuffled)
    val e = graft.extract.Extractor.extractTurn(payload, "pdf_runs:docling_md")
    val golden = res("golden/pediatric_extraction.json").stripLineEnd
    assert(e.fieldsJson == golden, "pdf_runs turn must still match the golden bytes")
  }

  test("single-column runs preserve order") {
    val lines = Vector("Line one of text", "Line two of text", "Line three")
    val runs = XYCut.synthesizeColumns(lines, cols = 1)
    assert(XYCut.toLines(runs.reverse) == lines)
  }

  test("tokenizer handles quoted '>' in attributes, comments, script content") {
    val html = """<div data-x="a>b"><!-- <p>nope</p> --><p>Real content here with words</p><script>if (a<b) { x = "<p>no</p>"; }</script></div>"""
    val lines = Html.extractLines(html)
    assert(lines == Vector("Real content here with words"), lines.toString)
  }

  test("link-dense blocks are boilerplate; short blocks survive near content") {
    val html = "<body><div><a href='/a'>One</a> <a href='/b'>Two</a> <a href='/c'>Three</a></div>" +
      "<p>This paragraph has plenty of ordinary words in it to count as content.</p>" +
      "<p>Short tail.</p></body>"
    val lines = Html.extractLines(html)
    assert(lines.exists(_.startsWith("This paragraph")), lines.toString)
    assert(lines.exists(_ == "Short tail."), "short block adjacent to content survives")
    assert(!lines.exists(_.contains("One")), "link bar must be dropped")
  }
}
