package graft.spark

import org.apache.spark.sql.{Dataset, SparkSession}
import java.sql.Timestamp

/** Input row of the transcripts table — schema per BASELINE.json input_hint:
  * (conv_id string, turn_idx int, role string, text string, tool string,
  * ts timestamp).
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

/** Output row per FIXTURES.md §4. */
final case class ExtractedTurn(
    conv_id: String,
    turn_idx: Int,
    form_type: String,
    form_subtype: String,
    main_text: String,
    spans: Seq[graft.extract.Span],
    fields_json: String,
    field_count: Int,
    section_count: Int)

/** Deterministic synthetic transcript generator (FIXTURES.md §1): seeded by
  * conversation ordinal only — no RNG state, so any slice of the table can be
  * regenerated independently on any executor (the property that lets the same
  * generator produce a 10^12-turn table on a real cluster).
  *
  * Conversation lengths are heavy-tailed: 90% short (2-8 turns), 10% long
  * (100-500 turns) to exercise salted repartitioning.
  */
object Transcripts {

  val Epoch: Long = 1704067200L // 2024-01-01T00:00:00Z, fixed

  private val roles = Array("user", "assistant", "tool")

  /** Fixture payloads shipped in the jar (round-robin per turn); the tag
    * selects the extraction profile (consent converter vs main monolith). */
  lazy val payloads: IndexedSeq[(String, String)] = {
    val names = Vector(
      "tooth_removal_consent" -> "consent_txt",
      "consent_crown_bridge" -> "consent_txt",
      "pediatric_extraction" -> "docling_md",
      "npf" -> "docling_md",
      "records_release" -> "docling_md",
      "zoom_consent" -> "docx",
      "denture_consent" -> "docx")
    val base = names.map { case (n, tag) =>
      val in = getClass.getClassLoader.getResourceAsStream(s"fixtures/$n.txt")
      require(in != null, s"missing fixture $n")
      val text = new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      in.close()
      (tag, text)
    }
    // wrapped variants exercising the parse layer (FIXTURES.md §2.5-2.6):
    // the tooth consent inside boilerplate HTML, the pediatric consent as
    // two-column PDF text runs
    val toothHtml = ("html:consent_txt", wrapInBoilerplateHtml(base(0)._2.split("\n", -1).toSeq))
    val pedRuns = ("pdf_runs:docling_md", graft.parse.XYCut.renderRuns(
      graft.parse.XYCut.synthesizeColumns(base(2)._2.split("\n", -1).toSeq, cols = 2)))
    base :+ toothHtml :+ pedRuns
  }

  /** Deterministic HTML wrapper: nav/header/footer noise with high link
    * density around the document content (plain lines -> <p>, "- " -> <li>,
    * "## " -> <h2>). */
  def wrapInBoilerplateHtml(lines: Seq[String]): String = {
    val sb = new StringBuilder
    sb.append("<html><head><title>Practice Portal</title><style>p{margin:0}</style>")
    sb.append("<script>var t = \"<p>not content</p>\";</script></head><body>")
    sb.append("<nav><a href=\"/\">Home</a> <a href=\"/forms\">Forms</a> <a href=\"/about\">About us</a> <a href=\"/contact\">Contact</a></nav>")
    sb.append("<header><div>Bright Smiles Dental Group</div><div>Call (555) 123-4567 or visit www.example.com</div></header>")
    sb.append("<main>")
    var inList = false
    lines.foreach { l =>
      if (l.startsWith("- ")) {
        if (!inList) { sb.append("<ul>"); inList = true }
        sb.append("<li>").append(escapeHtml(l.substring(2))).append("</li>")
      } else {
        if (inList) { sb.append("</ul>"); inList = false }
        if (l.startsWith("## ")) sb.append("<h2>").append(escapeHtml(l.substring(3))).append("</h2>")
        else if (l.trim.nonEmpty) sb.append("<p>").append(escapeHtml(l)).append("</p>")
      }
    }
    if (inList) sb.append("</ul>")
    sb.append("</main>")
    sb.append("<footer><a href=\"/privacy\">Privacy</a> <a href=\"/terms\">Terms</a> <div>© 2024 Bright Smiles</div></footer>")
    sb.append("</body></html>")
    sb.toString
  }

  private def escapeHtml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  def convLength(ordinal: Long): Int =
    if (ordinal % 10 == 9) (100 + (ordinal * 37) % 400).toInt
    else (2 + ordinal % 7).toInt

  def turnsFor(ordinal: Long): Seq[Turn] = {
    val convId = f"c$ordinal%08d"
    val len = convLength(ordinal)
    val pls = payloads
    (0 until len).map { t =>
      val (tool, text) = pls(((ordinal + t) % pls.size).toInt)
      Turn(convId, t, roles(t % roles.length), text, tool,
        new Timestamp((Epoch + ordinal * 3600 + t * 60) * 1000L))
    }
  }

  /** Distributed generation: one task per ordinal range; flatMap stays
    * row-local so generation scales linearly with executors. Long (heavy-
    * tail) conversations are spread uniformly over ordinals, so contiguous
    * ordinal ranges are load-balanced without a shuffle.
    */
  def generate(spark: SparkSession, numConversations: Long,
               numPartitions: Int = 0): Dataset[Turn] = {
    import spark.implicits._
    val slices = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    spark.range(0, numConversations, 1, slices).flatMap(ord => turnsFor(ord))
  }
}
