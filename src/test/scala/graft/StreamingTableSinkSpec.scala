package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import graft.spark.{SnapshotManifestFormat, StreamingExtraction, Transcripts}
import java.nio.file.Files

/** Exactly-once streaming ingestion into the snapshot-manifest table:
  * micro-batches commit additive snapshots carrying `stream.query` /
  * `stream.batch_id` markers; a replayed batch (crash between table commit
  * and checkpoint write) is detected by marker comparison and skipped, so
  * the table never double-appends.
  */
class StreamingTableSinkSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def expectedRows(ordinals: Range): Long =
    ordinals.map(o => Transcripts.convLength(o.toLong).toLong).sum

  test("AvailableNow stream commits snapshots with exactly-once markers; restart appends only new data") {
    val sp = spark
    import sp.implicits._
    val in = Files.createTempDirectory("tsink-in").toString
    val table = Files.createTempDirectory("tsink-table").toString
    val ckpt = Files.createTempDirectory("tsink-ckpt").toString

    Transcripts.generate(spark, 8).write.mode("append").parquet(in)
    StreamingExtraction.runAvailableNowToTable(spark, in, table, ckpt, buckets = 4)
    val n1 = fmt.readCommitted(spark, table).count()
    assert(n1 == expectedRows(0 until 8), s"first run rows $n1")
    val man1 = fmt.readManifest(table).get
    assert(man1.props.get("stream.query").contains("stream"))
    val lastBatch1 = man1.props("stream.batch_id").toLong

    // restart with more input: only the new files are extracted and appended
    sp.range(8, 14).flatMap(o => Transcripts.turnsFor(o))
      .write.mode("append").parquet(in)
    StreamingExtraction.runAvailableNowToTable(spark, in, table, ckpt, buckets = 4)
    val all = fmt.readCommitted(spark, table)
    assert(all.count() == expectedRows(0 until 14))
    assert(all.select("conv_id", "turn_idx").distinct().count() == expectedRows(0 until 14))
    val man2 = fmt.readManifest(table).get
    assert(man2.props("stream.batch_id").toLong > lastBatch1)
    assert(man2.operation.contains("append"))

    // a third run with no new input commits nothing (no empty snapshots)
    StreamingExtraction.runAvailableNowToTable(spark, in, table, ckpt, buckets = 4)
    assert(fmt.readManifest(table).get.snapshotId == man2.snapshotId)
  }

  test("replayed micro-batch is skipped: same batch id appended twice lands once") {
    val sp = spark
    import sp.implicits._
    val table = Files.createTempDirectory("tsink-replay").toString
    val batch = sp.range(0, 5).flatMap(o => Transcripts.turnsFor(o))

    val n1 = StreamingExtraction.appendBatchToTable(spark, batch, batchId = 0L,
      table, buckets = 4, queryKey = "q", fmt)
    assert(n1 == expectedRows(0 until 5))
    val snapAfterFirst = fmt.readManifest(table).get.snapshotId

    // crash-replay of the same batch id: detected, skipped, table unchanged
    val n2 = StreamingExtraction.appendBatchToTable(spark, batch, batchId = 0L,
      table, buckets = 4, queryKey = "q", fmt)
    assert(n2 == 0L)
    assert(fmt.readManifest(table).get.snapshotId == snapAfterFirst)
    assert(fmt.readCommitted(spark, table).count() == expectedRows(0 until 5))

    // the next batch id is accepted
    val later = sp.range(5, 7).flatMap(o => Transcripts.turnsFor(o))
    val n3 = StreamingExtraction.appendBatchToTable(spark, later, batchId = 1L,
      table, buckets = 4, queryKey = "q", fmt)
    assert(n3 == expectedRows(5 until 7))
  }

  test("replay detection sees past interleaved non-stream commits (maintenance between batch and replay)") {
    val sp = spark
    import sp.implicits._
    val table = Files.createTempDirectory("tsink-mixed").toString
    val batch = sp.range(0, 4).flatMap(o => Transcripts.turnsFor(o))
    StreamingExtraction.appendBatchToTable(spark, batch, batchId = 7L,
      table, buckets = 4, queryKey = "q", fmt)

    // a maintenance-style commit without stream markers on top
    val man = fmt.readManifest(table).get
    fmt.commitWave(table, staging = table + "/no-staging", snapshotId = man.snapshotId + 1,
      buckets = man.buckets, files = man.files, lineage = Vector.empty,
      inputFps = man.inputFps, additive = true, convFpsDir = man.convFpsDir,
      deleteDirs = man.deleteDirs, fpMode = man.fpMode, bucketCount = man.bucketCount,
      operation = "replace")

    assert(StreamingExtraction.lastCommittedBatch(table, "q", fmt).contains(7L))
    // replay of batch 7 is still skipped despite the interleaved commit
    val n = StreamingExtraction.appendBatchToTable(spark, batch, batchId = 7L,
      table, buckets = 4, queryKey = "q", fmt)
    assert(n == 0L)
    // a different sink (query key) is independent: batch 0 of "other" lands
    val other = sp.range(4, 6).flatMap(o => Transcripts.turnsFor(o))
    assert(StreamingExtraction.lastCommittedBatch(table, "other", fmt).isEmpty)
    val nOther = StreamingExtraction.appendBatchToTable(spark, other, batchId = 0L,
      table, buckets = 4, queryKey = "other", fmt)
    assert(nOther == expectedRows(4 until 6))
  }

  test("manifest props round-trip through escaping; braces are refused at write time") {
    val table = Files.createTempDirectory("tsink-props").toString
    val props = Map("stream.query" -> "a \"quoted\" name\twith\nescapes",
      "stream.batch_id" -> "42", "k\\slash" -> "v\\end")
    fmt.commitWave(table, staging = table + "/no-staging", snapshotId = 0,
      buckets = Set.empty, files = Vector.empty, lineage = Vector.empty,
      inputFps = Map.empty, additive = true, props = props)
    assert(fmt.readManifest(table).get.props == props)

    val ex = intercept[IllegalArgumentException] {
      fmt.commitWave(table, staging = table + "/no-staging", snapshotId = 1,
        buckets = Set.empty, files = Vector.empty, lineage = Vector.empty,
        inputFps = Map.empty, additive = true, props = Map("k" -> "{bad}"))
    }
    assert(ex.getMessage.contains("braces"))
  }
}
