package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** The north-star batch job (SURVEY.md §3.5, §4.3):
  *
  *   scan → bucket by hash(conv_id) → skip committed buckets (resume) →
  *   salted repartition (skew-aware) → per-turn extraction (fused UDF) →
  *   per-bucket sorted write → snapshot manifest + per-partition lineage.
  *
  * "Iceberg table" semantics are provided by a thin snapshot-manifest
  * protocol over Parquet (no Iceberg jar ships in /opt/spark/jars):
  *
  *   out/data/bucket=B/part-....parquet  committed data, sorted by (conv_id, turn_idx)
  *   out/lineage/lineage-K.json       per-bucket lineage rows for snapshot K
  *   out/snapshots/snap-K.json        manifest: cumulative committed buckets
  *   out/snapshots/_latest            current snapshot id (atomic rename)
  *
  * Buckets are processed in waves; each wave commits one snapshot, so a
  * killed run resumes from the last committed snapshot and recomputes
  * nothing that was committed.
  */
object ExtractionJob {

  final case class Config(
      outDir: String,
      buckets: Int = 32,
      waves: Int = 4,
      saltTurnsPerSplit: Int = 64,
      failAfterWave: Int = -1 // test hook: simulate a kill after wave N commit
  )

  final case class LineageRow(
      snapshot_id: Long,
      bucket: Long,
      row_count: Long,
      field_count_sum: Long,
      extract_ms: Long,
      committed_at: String)

  /** Pure transform: turns -> extracted turns (no sink). The extraction is a
    * typed map — one codegen boundary, everything else stays Catalyst.
    */
  def extract(spark: SparkSession, turns: Dataset[Turn]): Dataset[ExtractedTurn] = {
    import spark.implicits._
    turns.map { t =>
      val e = graft.extract.Extractor.extractTurn(t.text, t.tool)
      ExtractedTurn(t.conv_id, t.turn_idx, e.formType, e.formSubtype, e.mainText, e.spans,
        e.fieldsJson, e.fieldCount, e.sectionCount)
    }
  }

  /** Salted shuffle key: long conversations are split into chunks of
    * `saltTurnsPerSplit` turns so a single hot conv_id cannot pin a whole
    * partition (safe: extraction is per-turn, nothing regroups on conv_id).
    */
  private def saltKey(saltTurnsPerSplit: Int) =
    xxhash64(col("conv_id"), floor(col("turn_idx") / saltTurnsPerSplit))

  def bucketOf(buckets: Int) = pmod(xxhash64(col("conv_id")), lit(buckets)).cast("int")

  // ---- snapshot manifest protocol ----

  def latestSnapshot(outDir: String): Option[Int] = {
    val p = Paths.get(outDir, "snapshots", "_latest")
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toInt)
    else None
  }

  def committedBuckets(outDir: String): Set[Int] = latestSnapshot(outDir) match {
    case None => Set.empty
    case Some(k) =>
      val manifest = new String(
        Files.readAllBytes(Paths.get(outDir, "snapshots", s"snap-$k.json")), StandardCharsets.UTF_8)
      // manifest format: {"snapshot_id":K,"committed_buckets":[..],"committed_at":".."}
      val m = "\"committed_buckets\"\\s*:\\s*\\[([0-9,\\s]*)\\]".r
        .findFirstMatchIn(manifest).map(_.group(1)).getOrElse("")
      m.split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSet
  }

  private def atomicWrite(path: Path, content: String): Unit = {
    Files.createDirectories(path.getParent)
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def commitSnapshot(outDir: String, snapshotId: Int, buckets: Set[Int],
                             lineage: Seq[LineageRow]): Unit = {
    val lineageJson = lineage.sortBy(_.bucket).map { r =>
      s"""{"snapshot_id":${r.snapshot_id},"bucket":${r.bucket},"row_count":${r.row_count},""" +
        s""""field_count_sum":${r.field_count_sum},"extract_ms":${r.extract_ms},"committed_at":"${r.committed_at}"}"""
    }.mkString("[\n", ",\n", "\n]")
    atomicWrite(Paths.get(outDir, "lineage", s"lineage-$snapshotId.json"), lineageJson)
    val manifest =
      s"""{"snapshot_id":$snapshotId,"committed_buckets":[${buckets.toSeq.sorted.mkString(",")}],""" +
        s""""committed_at":"${java.time.Instant.now()}"}"""
    atomicWrite(Paths.get(outDir, "snapshots", s"snap-$snapshotId.json"), manifest)
    atomicWrite(Paths.get(outDir, "snapshots", "_latest"), snapshotId.toString)
  }

  /** Run the job with wave-grained snapshot commits. Returns the set of
    * buckets committed by this invocation (empty if everything was already
    * committed — the resume-no-recompute property).
    */
  def run(spark: SparkSession, turns: Dataset[Turn], config: Config): Set[Int] = {
    import spark.implicits._
    val already = committedBuckets(config.outDir)
    val remaining = (0 until config.buckets).filterNot(already.contains)
    if (remaining.isEmpty) return Set.empty

    val waveSize = math.max(1, math.ceil(remaining.size.toDouble / config.waves).toInt)
    val waves = remaining.grouped(waveSize).toVector
    var committed = already
    var snapshotId = latestSnapshot(config.outDir).getOrElse(-1)
    var doneThisRun = Set.empty[Int]

    val withBucket = turns
      .withColumn("bucket", bucketOf(config.buckets))

    waves.zipWithIndex.foreach { case (waveBuckets, waveIdx) =>
      val t0 = System.nanoTime()
      val wave = withBucket
        .where(col("bucket").isin(waveBuckets: _*))
        // skew-aware compute shuffle: salted key, NOT conv_id
        .repartition(spark.sessionState.conf.numShufflePartitions,
          saltKey(config.saltTurnsPerSplit))
      val extracted = wave.as[TurnWithBucket].map { t =>
        val e = graft.extract.Extractor.extractTurn(t.text, t.tool)
        ExtractedTurnB(t.conv_id, t.turn_idx, e.formType, e.formSubtype, e.mainText, e.spans,
          e.fieldsJson, e.fieldCount, e.sectionCount, t.bucket)
      }
      // write-locality exchange: co-locate each bucket, restore stable order
      val staging = s"${config.outDir}/staging-wave-$waveIdx"
      extracted
        .repartition(waveBuckets.size, col("bucket"))
        .sortWithinPartitions("conv_id", "turn_idx")
        .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(staging)

      // per-partition lineage from the staged output
      val extractMs = (System.nanoTime() - t0) / 1000000
      val now = java.time.Instant.now().toString
      val lineage = spark.read.parquet(staging)
        .groupBy("bucket")
        .agg(count(lit(1)).as("rows"), sum("field_count").as("fsum"))
        .collect()
        .map(r => LineageRow(snapshotId + 1, r.getAs[Any]("bucket").toString.toLong,
          r.getAs[Long]("rows"), r.getAs[Long]("fsum"), extractMs, now))

      // promote staged bucket dirs into data/ then commit the snapshot
      val dataDir = Paths.get(config.outDir, "data")
      Files.createDirectories(dataDir)
      Files.list(Paths.get(staging)).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("bucket="))
        .foreach { p =>
          val target = dataDir.resolve(p.getFileName.toString)
          if (Files.exists(target)) { // only possible on dirty staging replay
            Files.walk(target).sorted(java.util.Comparator.reverseOrder())
              .iterator().asScala.foreach(Files.delete)
          }
          Files.move(p, target)
        }
      Files.walk(Paths.get(staging)).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)

      snapshotId += 1
      committed = committed ++ waveBuckets
      doneThisRun = doneThisRun ++ waveBuckets
      commitSnapshot(config.outDir, snapshotId, committed, lineage.toSeq)

      if (config.failAfterWave == waveIdx)
        throw new RuntimeException(s"simulated kill after wave $waveIdx (snapshot $snapshotId committed)")
    }
    doneThisRun
  }

  /** Read the committed table: only bucket dirs listed in the latest
    * committed manifest. A crash between bucket promotion and commitSnapshot
    * can leave promoted-but-uncommitted dirs under data/ — readers must not
    * see them (snapshot-isolation read semantics).
    */
  def readCommitted(spark: SparkSession, outDir: String): DataFrame = {
    val buckets = committedBuckets(outDir)
    require(buckets.nonEmpty, s"no committed snapshot under $outDir")
    val paths = buckets.toSeq.sorted.map(b => s"$outDir/data/bucket=$b")
    spark.read
      .option("basePath", s"$outDir/data")
      .parquet(paths: _*)
  }
}

final case class TurnWithBucket(
    conv_id: String, turn_idx: Int, role: String, text: String, tool: String,
    ts: java.sql.Timestamp, bucket: Int)

final case class ExtractedTurnB(
    conv_id: String, turn_idx: Int, form_type: String, form_subtype: String, main_text: String,
    spans: Seq[graft.extract.Span], fields_json: String, field_count: Int,
    section_count: Int, bucket: Int)
