package graft.tools

import graft.extract.ConsentExtractor
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** CLI entry point mirroring the reference's `python consent_converter.py
  * <file>` (consent_converter.py:1127+): reads a plain-text document (one
  * line per extracted text line), prints the Modento JSON spec to stdout or
  * writes it to --output.
  */
object Convert {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: graft.tools.Convert <textfile> [--output <path>]")
      sys.exit(1)
    }
    val path = Paths.get(args(0))
    if (!Files.exists(path)) {
      System.err.println(s"error: file not found: $path")
      sys.exit(1)
    }
    val lines = new String(Files.readAllBytes(path), StandardCharsets.UTF_8).split("\n", -1).toSeq
    val profile = {
      val i = args.indexOf("--profile")
      if (i >= 0 && i + 1 < args.length) args(i + 1) else "consent"
    }
    val minify = args.contains("--minify")
    val json = profile match {
      case "main" if minify =>
        // NPF-style goldens are minified (reference json.dumps separators)
        val (_, spec) = graft.extract.MainExtractor.convertToSpec(lines)
        graft.model.Json.renderCompact(graft.model.JArr(spec.map(_.render)))
      case "main" => graft.extract.MainExtractor.convert(lines)
      case "docx" => graft.extract.EnhancedDocxConsent.convert(lines)
      case "consent" => ConsentExtractor.convert(lines)
      case other =>
        System.err.println(s"error: unknown profile '$other' (use main|consent|docx)")
        sys.exit(1); ""
    }
    val outIdx = args.indexOf("--output")
    if (outIdx >= 0 && outIdx + 1 < args.length) {
      Files.write(Paths.get(args(outIdx + 1)), (json + "\n").getBytes(StandardCharsets.UTF_8))
      System.err.println(s"wrote ${args(outIdx + 1)}")
    } else println(json)
  }
}
