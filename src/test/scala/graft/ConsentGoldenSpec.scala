package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.ConsentExtractor
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Byte-for-byte golden tests: fixture lines -> consent pipeline -> JSON must
  * equal the reference goldens verbatim (SURVEY.md §5.2; goldens from
  * /root/reference/references/Matching JSON References/).
  */
class ConsentGoldenSpec extends AnyFunSuite {

  private def res(p: String): String = {
    val url = getClass.getClassLoader.getResource(p)
    require(url != null, s"missing resource $p")
    new String(Files.readAllBytes(Paths.get(url.toURI)), StandardCharsets.UTF_8)
  }

  private def runGolden(name: String): Unit = {
    val lines = res(s"fixtures/$name.txt").split("\n", -1).toSeq
    val golden = res(s"golden/$name.json").stripLineEnd
    val out = ConsentExtractor.convert(lines)
    if (out != golden) {
      val a = out.split("\n")
      val b = golden.split("\n")
      val firstDiff = a.zip(b).indexWhere { case (x, y) => x != y }
      fail(s"golden mismatch at line $firstDiff\n got: ${a.lift(firstDiff)}\nwant: ${b.lift(firstDiff)}\n(lengths ${a.length} vs ${b.length})")
    }
  }

  test("tooth removal consent matches golden byte-for-byte") {
    runGolden("tooth_removal_consent")
  }

  test("crown & bridge consent matches golden byte-for-byte") {
    runGolden("consent_crown_bridge")
  }
}
