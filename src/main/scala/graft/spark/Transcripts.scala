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

  /** Fixture payloads shipped in the jar (round-robin per turn). */
  lazy val payloads: IndexedSeq[(String, String)] = {
    val names = Vector("tooth_removal_consent", "consent_crown_bridge")
    names.map { n =>
      val in = getClass.getClassLoader.getResourceAsStream(s"fixtures/$n.txt")
      require(in != null, s"missing fixture $n")
      val text = new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      in.close()
      ("docling_md", text)
    }
  }

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
