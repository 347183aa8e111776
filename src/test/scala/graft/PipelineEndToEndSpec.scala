package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import graft.functions.NativeFns
import graft.spark.{SnapshotManifestFormat, StreamingExtraction, Transcripts}
import java.nio.file.Files

/** End-to-end incremental pipeline: the three streaming pieces composed
  * into the full loop a production deployment runs —
  *
  *   raw turn files --(exactly-once stream ingest)--> extraction table
  *   extraction table --(graft-table stream source)--> derived token index
  *
  * Each hop is incremental (per-cycle work scales with NEW data, never
  * with table size) and exactly-once across restarts (table marker on the
  * ingest hop, engine-checkpointed snapshot offsets on the tail hop), so
  * the composition is exactly-once end-to-end: every raw turn appears in
  * the derived index exactly once, with content equal to a from-scratch
  * batch recomputation.
  */
class PipelineEndToEndSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val fmt = SnapshotManifestFormat

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** The derived projection both the streaming tail and the batch oracle
    * compute: a per-turn token/language index over the EXTRACTED text —
    * the downstream table a tokenization or data-mixing stage consumes. */
  private def tokenIndex(df: org.apache.spark.sql.DataFrame) =
    df.select(
      col("conv_id"), col("turn_idx"),
      NativeFns.bpeTokenCount(col("main_text")).as("tokens"),
      NativeFns.langId(col("main_text")).as("lang"),
      NativeFns.hash64(col("main_text")).as("content_hash"))

  /** One AvailableNow pass of the derived hop (fresh query, resumes from
    * `ckpt`): tail the extraction table, compute the index, append. */
  private def drainDerived(tableDir: String, derivedDir: String, ckpt: String): Unit = {
    val q = tokenIndex(spark.readStream.format("graft-table").load(tableDir))
      .writeStream.format("parquet")
      .option("path", derivedDir).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  private def derivedRows(derivedDir: String): Seq[(String, Int, Long, String, Long)] =
    spark.read.parquet(derivedDir)
      .collect().toSeq.map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getString(3), r.getLong(4)))

  private def expectedTurns(ordinals: Range): Long =
    ordinals.map(o => Transcripts.convLength(o.toLong).toLong).sum

  test("ingest -> extraction table -> derived index is incremental and exactly-once end-to-end") {
    val sp = spark
    import sp.implicits._
    val base = Files.createTempDirectory("graft-e2e").toString
    val in = s"$base/in"
    val table = s"$base/table"
    val derived = s"$base/derived"
    val ckptIngest = s"$base/ckpt-ingest"
    val ckptTail = s"$base/ckpt-tail"

    // ---- wave 1: raw turns land; ingest them; build the derived index
    sp.range(0, 8).flatMap(o => Transcripts.turnsFor(o))
      .write.mode("append").parquet(in)
    val r1 = StreamingExtraction.runAvailableNowToTable(spark, in, table, ckptIngest, buckets = 4)
    assert(r1 == expectedTurns(0 until 8))
    drainDerived(table, derived, ckptTail)

    val w1 = derivedRows(derived)
    assert(w1.size.toLong == expectedTurns(0 until 8),
      s"derived index must hold one row per ingested turn, got ${w1.size}")
    val batch1 = tokenIndex(fmt.readCommitted(spark, table))
      .collect().toSeq.map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
    assert(w1.toSet == batch1.toSet,
      "streamed index must equal the batch recomputation over the committed table")

    // idle cycles move nothing on either hop (no empty snapshots, no rows)
    assert(StreamingExtraction.runAvailableNowToTable(spark, in, table, ckptIngest,
      buckets = 4) == 0L)
    drainDerived(table, derived, ckptTail)
    assert(derivedRows(derived).size == w1.size, "idle cycle must append nothing")

    // ---- wave 2: more raw turns; both hops advance by exactly the delta
    sp.range(8, 12).flatMap(o => Transcripts.turnsFor(o))
      .write.mode("append").parquet(in)
    val r2 = StreamingExtraction.runAvailableNowToTable(spark, in, table, ckptIngest, buckets = 4)
    assert(r2 == expectedTurns(8 until 12), "ingest hop must process only the new files")
    drainDerived(table, derived, ckptTail)

    val w2 = derivedRows(derived)
    assert(w2.size.toLong == expectedTurns(0 until 12),
      s"tail hop must append exactly the new turns, got ${w2.size - w1.size} new")
    // exactly-once end-to-end: no duplicates, content equals a full batch run
    assert(w2.distinct.size == w2.size, "no turn may reach the index twice")
    val batch2 = tokenIndex(fmt.readCommitted(spark, table))
      .collect().toSeq.map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
    assert(w2.toSet == batch2.toSet)

    // the derived values are REAL extraction output: a known conversation's
    // rows carry nonzero token counts and the lang-id verdict
    val c0turns = w2.filter(_._1 == "c00000000")
    assert(c0turns.nonEmpty && c0turns.forall(_._3 > 0L))
    assert(c0turns.forall(_._4 == "en"))
  }

  test("a crash-replayed ingest batch does not reach the derived index twice") {
    val sp = spark
    import sp.implicits._
    val base = Files.createTempDirectory("graft-e2e-replay").toString
    val table = s"$base/table"
    val derived = s"$base/derived"
    val ckptTail = s"$base/ckpt-tail"

    // batch 0 lands, then crash-replays (commit succeeded, checkpoint write
    // didn't): the marker fences it, so the TABLE stays single-copy and the
    // tail hop therefore cannot over-serve
    val b0 = sp.range(0, 5).flatMap(o => Transcripts.turnsFor(o))
    val n1 = StreamingExtraction.appendBatchToTable(spark, b0, batchId = 0L,
      table, buckets = 4, queryKey = "q", fmt)
    assert(n1 == expectedTurns(0 until 5))
    drainDerived(table, derived, ckptTail)
    val afterFirst = derivedRows(derived)

    assert(StreamingExtraction.appendBatchToTable(spark, b0, batchId = 0L,
      table, buckets = 4, queryKey = "q", fmt) == 0L)
    drainDerived(table, derived, ckptTail)
    assert(derivedRows(derived).toSet == afterFirst.toSet,
      "a fenced replay must be invisible downstream")

    // the NEXT batch flows through: end-to-end still advancing
    val b1 = sp.range(5, 7).flatMap(o => Transcripts.turnsFor(o))
    assert(StreamingExtraction.appendBatchToTable(spark, b1, batchId = 1L,
      table, buckets = 4, queryKey = "q", fmt) == expectedTurns(5 until 7))
    drainDerived(table, derived, ckptTail)
    assert(derivedRows(derived).size.toLong == expectedTurns(0 until 7))
  }
}
