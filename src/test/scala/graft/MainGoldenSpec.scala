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
}
