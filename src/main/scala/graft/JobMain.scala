package graft

import org.apache.spark.sql.SparkSession

/** spark-submit entry point for the north-star extraction job:
  *
  *   spark-submit --class graft.JobMain <jar> <inputParquet> <outDir> \
  *     [buckets] [waves]
  *
  * Input: a parquet table of transcript turns with columns
  * (conv_id string, turn_idx int, role string, text string, tool string,
  * ts timestamp) — the BASELINE.json input hint. Output: the snapshot-
  * manifest table under <outDir> (data/ + snapshots/ + lineage/), resumable:
  * re-submitting after a kill skips every committed bucket.
  *
  * On a cluster the session comes from spark-submit (master/executors from
  * the launcher); builder settings here only fill local-run defaults.
  */
object JobMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: JobMain <inputParquet> <outDir> [buckets] [waves]")
    val Array(input, outDir) = args.take(2)
    val buckets = if (args.length > 2) args(2).toInt else 256
    val waves = if (args.length > 3) args(3).toInt else 8
    val preexisting = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
    val spark = SparkSession.builder()
      .appName("graft-extraction")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    import spark.implicits._
    val turns = spark.read.parquet(input).as[graft.spark.Turn]
    val done = graft.spark.ExtractionJob.run(spark, turns,
      graft.spark.ExtractionJob.Config(outDir, buckets = buckets, waves = waves))
    println(s"""{"committed_buckets_this_run":${done.size},"out":"$outDir"}""")
    if (preexisting.isEmpty) spark.stop() // don't stop a host-owned session
  }
}
