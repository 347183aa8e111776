package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import graft.spark.{ExtractionJob, SnapshotManifestFormat, Transcripts}
import java.nio.file.Files
import scala.collection.mutable

/** Change-feed mode of the graft-table stream source (Delta CDF analog):
  * incremental batches carry conv-grained `delete` retraction keys
  * alongside `insert` post-images, so a consumer that applies each batch's
  * deletes before its inserts maintains an exact mirror of the table —
  * including pure deletions, which are invisible to the plain
  * (append-only) stream.
  */
class ChangeFeedSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** Driver-side mirror keyed (conv_id, turn_idx) -> main_text: per batch,
    * conv-grained deletes first, then insert post-images — the documented
    * consumer contract. Test-scale only (a real consumer does the same
    * delete-then-upsert distributed, e.g. via the batch job's MOR path). */
  private final class Mirror {
    val rows = mutable.Map.empty[(String, Int), String]
    def apply(batch: Seq[Row]): Unit = {
      val (dels, ins) = batch.partition(_.getAs[String]("_change_type") == "delete")
      val deadConvs = dels.map(_.getAs[String]("conv_id")).toSet
      rows.filterInPlace { case ((c, _), _) => !deadConvs.contains(c) }
      ins.foreach { r =>
        rows((r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx"))) =
          r.getAs[String]("main_text")
      }
    }
  }

  /** One AvailableNow pass of the change feed, applied batch-by-batch to
    * the mirror (foreachBatch preserves batch boundaries; a parquet sink
    * would flatten them and lose delete-before-insert ordering). */
  private def drainCdc(tableDir: String, ckpt: String, mirror: Mirror,
                       seen: mutable.Buffer[String] = mutable.Buffer.empty): Unit = {
    val q = spark.readStream.format("graft-table")
      .option("changeFeed", "true").load(tableDir)
      .writeStream
      .foreachBatch { (df: Dataset[Row], _: Long) =>
        val batch = df.collect().toSeq
        batch.foreach(r => seen += r.getAs[String]("_change_type"))
        mirror.apply(batch)
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  private def tableState(out: String): Map[(String, Int), String] =
    fmt.readCommitted(spark, out).select("conv_id", "turn_idx", "main_text")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getString(2)).toMap

  test("mirror maintenance through correction and pure deletion; plain stream diverges on the delete") {
    val ss = spark
    import ss.implicits._
    val base = Files.createTempDirectory("graft-cdc").toString
    val out = s"$base/table"
    val cfg = ExtractionJob.Config(out, buckets = 4, waves = 2, convGrained = true,
      autoCompactDeletes = 0)
    val turns = Transcripts.generate(spark, 12)
    assert(ExtractionJob.run(spark, turns, cfg).nonEmpty)

    val mirror = new Mirror
    val kinds = mutable.Buffer.empty[String]
    drainCdc(out, s"$base/ckpt", mirror, kinds)
    assert(mirror.rows == tableState(out), "initial snapshot must seed the mirror")
    assert(kinds.toSet == Set("insert"), "the initial-snapshot batch is all-insert")

    // correction: the delta commit streams the victim's delete key + its
    // corrected post-images; the mirror converges to the corrected table
    val victim = turns.select("conv_id").as[String].head()
    val v1 = turns.map(t =>
      if (t.conv_id == victim) t.copy(text = t.text + "\ncdc fix") else t)
    assert(ExtractionJob.run(spark, v1, cfg).nonEmpty)
    kinds.clear()
    drainCdc(out, s"$base/ckpt", mirror, kinds)
    assert(kinds.contains("delete") && kinds.contains("insert"),
      s"a correction must stream both kinds, got ${kinds.toSet}")
    assert(mirror.rows == tableState(out), "mirror must carry the corrected content")

    // pure deletion: a conversation disappears upstream; the change feed
    // retracts it and the mirror matches — the case the plain stream misses
    val gone = v1.where($"conv_id" =!= victim).as[graft.spark.Turn]
    assert(ExtractionJob.run(spark, gone, cfg).nonEmpty)
    kinds.clear()
    drainCdc(out, s"$base/ckpt", mirror, kinds)
    assert(kinds.count(_ == "delete") == 1 && !kinds.contains("insert"),
      s"a pure deletion streams exactly its retraction key, got $kinds")
    assert(mirror.rows == tableState(out), "mirror must drop the deleted conversation")
    assert(!mirror.rows.keys.exists(_._1 == victim))

    // exactly-once across the restarts: every turn appears once
    assert(mirror.rows.size == tableState(out).size)
  }

  test("delete rows carry only the retraction key; schema gains _change_type last") {
    val ss = spark
    import ss.implicits._
    val base = Files.createTempDirectory("graft-cdc-shape").toString
    val out = s"$base/table"
    val cfg = ExtractionJob.Config(out, buckets = 4, waves = 1, convGrained = true,
      autoCompactDeletes = 0)
    val turns = Transcripts.generate(spark, 6)
    assert(ExtractionJob.run(spark, turns, cfg).nonEmpty)

    // the declared schema is the plain source schema + _change_type (last)
    val plainCols = spark.readStream.format("graft-table").load(out).schema.fieldNames.toSeq
    val cdcCols = spark.readStream.format("graft-table")
      .option("changeFeed", "true").load(out).schema.fieldNames.toSeq
    assert(cdcCols == plainCols :+ "_change_type")

    // capture the raw feed rows for a deletion commit
    val victim = turns.select("conv_id").as[String].head()
    val rows = mutable.Buffer.empty[Row]
    val q0 = spark.readStream.format("graft-table").option("changeFeed", "true").load(out)
      .writeStream
      .foreachBatch { (df: Dataset[Row], _: Long) => rows ++= df.collect(); () }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q0.awaitTermination()
    rows.clear()
    val gone = turns.where($"conv_id" =!= victim).as[graft.spark.Turn]
    assert(ExtractionJob.run(spark, gone, cfg).nonEmpty)
    val q1 = spark.readStream.format("graft-table").option("changeFeed", "true").load(out)
      .writeStream
      .foreachBatch { (df: Dataset[Row], _: Long) => rows ++= df.collect(); () }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination()

    val dels = rows.filter(_.getAs[String]("_change_type") == "delete")
    assert(dels.map(_.getAs[String]("conv_id")) == Seq(victim))
    // retraction keys: conv_id + bucket set, every data column null
    dels.foreach { r =>
      assert(r.getAs[String]("conv_id") == victim)
      assert(!r.isNullAt(r.fieldIndex("bucket")))
      Seq("main_text", "fields_json", "form_type").foreach(c =>
        assert(r.isNullAt(r.fieldIndex(c)), s"delete row must not carry data column $c"))
    }

    // a malformed option value is refused loudly
    val ex = intercept[Exception] {
      spark.readStream.format("graft-table").option("changeFeed", "yes").load(out)
    }
    assert(Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(_.getMessage.contains("changeFeed")), s"got: $ex")
  }
}
