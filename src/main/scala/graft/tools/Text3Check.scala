package graft.tools
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets
object Text3Check {
  def main(args: Array[String]): Unit = {
    val src = new String(Files.readAllBytes(Paths.get(args(0))), StandardCharsets.UTF_8)
    Files.write(Paths.get("/tmp/t3_temp_out.txt"),
      graft.extract.Text3Formatter.formatTemporaryHtml(src).getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get("/tmp/t3_html_out.txt"),
      graft.extract.Text3Formatter.formatHtml(src).getBytes(StandardCharsets.UTF_8))
    println("written")
  }
}
