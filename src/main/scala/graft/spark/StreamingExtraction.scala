package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surface (SURVEY.md §7.5): the alternative resume
  * mechanism — `readStream` over the transcripts table, the same fused
  * per-turn extraction, `writeStream` with checkpointLocation and
  * Trigger.AvailableNow. The checkpoint replaces the snapshot-manifest
  * protocol: a killed run resumes from the last committed micro-batch, and
  * files already processed are never re-extracted.
  */
object StreamingExtraction {

  /** Incremental extraction: processes exactly the files not yet recorded in
    * the checkpoint, then stops (Trigger.AvailableNow).
    */
  def runAvailableNow(spark: SparkSession, inputDir: String, outDir: String,
                      checkpointDir: String): Unit = {
    import spark.implicits._
    val turns = spark.readStream
      .schema(Encoders.product[Turn].schema)
      .parquet(inputDir)
      .as[Turn]
    val extracted = turns.map { t =>
      val e = graft.extract.Extractor.extractTurn(t.text, t.tool)
      ExtractedTurn(t.conv_id, t.turn_idx, e.formType, e.formSubtype, e.mainText, e.spans,
        e.fieldsJson, e.fieldCount, e.sectionCount)
    }
    val q = extracted.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Watermarked windowed aggregation over a turn stream: turns per
    * conversation per hour — the streaming-state shape (event-time window +
    * watermark) the engine needs for live transcript feeds.
    */
  def turnsPerConversationWindow(turns: Dataset[Turn]): DataFrame =
    turns
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("conv_id"))
      .agg(count(lit(1)).as("n_turns"), sum(length(col("text"))).as("chars"))
}
