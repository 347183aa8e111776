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
  *                                    + exact data files with row counts
  *   out/snapshots/_latest            current snapshot id (atomic rename)
  *
  * Resume verifies every manifest-listed file exists before skipping a
  * bucket; committed reads load exactly the manifest's file list.
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
      failAfterWave: Int = -1, // test hook: simulate a kill after wave N commit
      // change-detection resume: fingerprint each bucket's INPUT content and
      // recompute committed buckets whose input changed since their snapshot
      // (upstream backfill/correction). Costs one narrow aggregation scan of
      // the input per run, so it is opt-in; file-based inputs should prefer
      // file-level manifest diff (the input table's own snapshot lineage).
      fingerprintInputs: Boolean = false
  )

  final case class LineageRow(
      snapshot_id: Long,
      bucket: Long,
      row_count: Long,
      field_count_sum: Long,
      extract_ms: Long,
      committed_at: String)

  /** One committed data file: path relative to out/data plus its row count
    * (Iceberg-manifest granularity — enables file-level conflict detection
    * and exact-file snapshot reads). */
  final case class FileEntry(bucket: Int, path: String, rowCount: Long)

  /** hasFilesList distinguishes a manifest that genuinely lists zero files
    * (all-empty buckets) from a legacy manifest written before file
    * granularity existed — the two need different resume verification. */
  final case class Manifest(snapshotId: Int, buckets: Set[Int], files: Vector[FileEntry],
                            hasFilesList: Boolean, inputFps: Map[Int, Long])

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

  /** Per-bucket content fingerprint of the INPUT: order-independent XOR of
    * per-row xxhash64 over every input column, mixed with the row count
    * (XOR alone would let duplicate rows cancel; ANSI mode forbids a
    * wrapping sum). One narrow map-side-combined aggregation scan; used by
    * change-detection resume. */
  def inputFingerprints(spark: SparkSession, turns: Dataset[Turn], buckets: Int): Map[Int, Long] =
    turns.toDF()
      .groupBy(bucketOf(buckets).as("bucket"))
      .agg(
        expr("bit_xor(xxhash64(conv_id, turn_idx, role, text, tool, ts))").as("x"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => r.getAs[Int]("bucket") ->
        (r.getAs[Long]("x") ^ (r.getAs[Long]("n") * 0x9E3779B97F4A7C15L)))
      .toMap

  // ---- snapshot manifest protocol ----

  def latestSnapshot(outDir: String): Option[Int] = {
    val p = Paths.get(outDir, "snapshots", "_latest")
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toInt)
    else None
  }

  private val fpEntryRe =
    "\\{\"bucket\":(\\d+),\"fp\":(-?\\d+)\\}".r

  private val fileEntryRe =
    "\\{\"bucket\":(\\d+),\"path\":\"([^\"]+)\",\"row_count\":(\\d+)\\}".r

  /** Parse the latest committed manifest. Manifest format:
    * {"snapshot_id":K,"committed_buckets":[..],
    *  "files":[{"bucket":B,"path":"bucket=B/part-..","row_count":N},..],
    *  "committed_at":".."} — `files` lists every committed data file.
    */
  def readManifest(outDir: String): Option[Manifest] = latestSnapshot(outDir).map { k =>
    val manifest = new String(
      Files.readAllBytes(Paths.get(outDir, "snapshots", s"snap-$k.json")), StandardCharsets.UTF_8)
    val m = "\"committed_buckets\"\\s*:\\s*\\[([0-9,\\s]*)\\]".r
      .findFirstMatchIn(manifest).map(_.group(1)).getOrElse("")
    val buckets = m.split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSet
    val files = fileEntryRe.findAllMatchIn(manifest)
      .map(f => FileEntry(f.group(1).toInt, f.group(2), f.group(3).toLong)).toVector
    val fps = fpEntryRe.findAllMatchIn(manifest)
      .map(m => m.group(1).toInt -> m.group(2).toLong).toMap
    Manifest(k, buckets, files, hasFilesList = manifest.contains("\"files\""), inputFps = fps)
  }

  /** Committed = listed in the manifest AND every listed data file for the
    * bucket is still present on disk. A bucket whose files were lost (or a
    * legacy partial promote) is treated as uncommitted and recomputed on
    * resume. Buckets with zero rows legitimately list no files — but ONLY
    * when the manifest carries a files list at all; a legacy manifest
    * (pre-file-granularity, no "files" key) can't distinguish lost files
    * from empty buckets, so it falls back to bucket-directory existence.
    */
  def committedBuckets(outDir: String): Set[Int] = readManifest(outDir) match {
    case None => Set.empty
    case Some(man) =>
      val dataDir = Paths.get(outDir, "data")
      if (!man.hasFilesList)
        man.buckets.filter(b => Files.isDirectory(dataDir.resolve(s"bucket=$b")))
      else {
        val byBucket = man.files.groupBy(_.bucket)
        man.buckets.filter { b =>
          byBucket.getOrElse(b, Vector.empty)
            .forall(f => Files.exists(dataDir.resolve(f.path)))
        }
      }
  }

  /** Per-file (bucket, relative path, row count) for a staged wave, with row
    * counts taken from each parquet file's FOOTER metadata — a driver-side
    * read of a few KB per file instead of a second scan of the wave's data.
    * File count per wave is bounded by the write's partition count, so the
    * driver-side loop is manifest-sized (the same loop a real Iceberg commit
    * performs when it collects DataFile stats).
    */
  /** Materialized directory listing — closes the underlying Files.list
    * stream (each open stream holds a directory fd; long-running drivers
    * commit many waves).
    */
  private def listDir(dir: Path): Vector[Path] = {
    val s = Files.list(dir)
    try s.iterator().asScala.toVector finally s.close()
  }

  /** Recursive delete, deepest-first, with the Files.walk stream closed. */
  private def deleteRecursively(root: Path): Unit = {
    val s = Files.walk(root)
    val paths = try s.sorted(java.util.Comparator.reverseOrder())
      .iterator().asScala.toVector finally s.close()
    paths.foreach(Files.delete)
  }

  private[spark] def listStagedFiles(spark: SparkSession, staging: String): Seq[FileEntry] = {
    val hconf = spark.sessionState.newHadoopConf()
    val stagingPath = Paths.get(staging)
    if (!Files.isDirectory(stagingPath)) return Seq.empty
    listDir(stagingPath)
      .filter(p => p.getFileName.toString.startsWith("bucket="))
      .flatMap { bucketDir =>
        val bucket = bucketDir.getFileName.toString.stripPrefix("bucket=").toInt
        listDir(bucketDir)
          .filter { f =>
            val n = f.getFileName.toString
            n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
          }
          .map { f =>
            val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(f.toUri), hconf)
            val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
            val rows = try reader.getRecordCount finally reader.close()
            FileEntry(bucket, s"bucket=$bucket/${f.getFileName}", rows)
          }
      }
      .toVector.sortBy(f => (f.bucket, f.path))
  }

  private def atomicWrite(path: Path, content: String): Unit = {
    Files.createDirectories(path.getParent)
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def commitSnapshot(outDir: String, snapshotId: Int, buckets: Set[Int],
                             files: Seq[FileEntry], lineage: Seq[LineageRow],
                             inputFps: Map[Int, Long]): Unit = {
    val lineageJson = lineage.sortBy(_.bucket).map { r =>
      s"""{"snapshot_id":${r.snapshot_id},"bucket":${r.bucket},"row_count":${r.row_count},""" +
        s""""field_count_sum":${r.field_count_sum},"extract_ms":${r.extract_ms},"committed_at":"${r.committed_at}"}"""
    }.mkString("[\n", ",\n", "\n]")
    atomicWrite(Paths.get(outDir, "lineage", s"lineage-$snapshotId.json"), lineageJson)
    val filesJson = files.sortBy(f => (f.bucket, f.path)).map { f =>
      s"""{"bucket":${f.bucket},"path":"${f.path}","row_count":${f.rowCount}}"""
    }.mkString("[", ",", "]")
    val fpsJson =
      if (inputFps.isEmpty) ""
      else inputFps.toSeq.sorted.map { case (b, fp) => s"""{"bucket":$b,"fp":$fp}""" }
        .mkString(""""input_fps":[""", ",", "],")
    val manifest =
      s"""{"snapshot_id":$snapshotId,"committed_buckets":[${buckets.toSeq.sorted.mkString(",")}],""" +
        s"""$fpsJson"files":$filesJson,"committed_at":"${java.time.Instant.now()}"}"""
    atomicWrite(Paths.get(outDir, "snapshots", s"snap-$snapshotId.json"), manifest)
    atomicWrite(Paths.get(outDir, "snapshots", "_latest"), snapshotId.toString)
  }

  /** Run the job with wave-grained snapshot commits. Returns the set of
    * buckets committed by this invocation (empty if everything was already
    * committed — the resume-no-recompute property).
    */
  def run(spark: SparkSession, turns: Dataset[Turn], config: Config): Set[Int] = {
    import spark.implicits._
    // change-detection resume: a committed bucket whose INPUT fingerprint
    // differs from the one recorded at commit time is treated as
    // uncommitted and recomputed (upstream backfill semantics)
    val currentFps: Map[Int, Long] =
      if (config.fingerprintInputs) inputFingerprints(spark, turns, config.buckets)
      else Map.empty
    val verified = committedBuckets(config.outDir)
    val manFps = readManifest(config.outDir).map(_.inputFps).getOrElse(Map.empty)
    val already =
      if (config.fingerprintInputs && manFps.nonEmpty)
        verified.filter(b => manFps.get(b) == currentFps.get(b))
      else verified
    val remaining = (0 until config.buckets).filterNot(already.contains)
    if (remaining.isEmpty) return Set.empty

    val waveSize = math.max(1, math.ceil(remaining.size.toDouble / config.waves).toInt)
    val waves = remaining.grouped(waveSize).toVector
    var committed = already
    var snapshotId = latestSnapshot(config.outDir).getOrElse(-1)
    var doneThisRun = Set.empty[Int]
    // carry forward only files of buckets still verified-committed; stale
    // entries of recomputed buckets are dropped and replaced by this run's
    var committedFiles: Vector[FileEntry] = readManifest(config.outDir)
      .map(_.files.filter(f => already.contains(f.bucket))).getOrElse(Vector.empty)

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
      // lineage metrics ride the write itself: observe() collects per-bucket
      // field sums exactly once during the write action (CollectMetrics is
      // retry-safe, unlike accumulators) — no post-write re-read of the data
      val obs = org.apache.spark.sql.Observation(s"wave-$waveIdx")
      val fieldSumMetrics = waveBuckets.map(b =>
        sum(when(col("bucket") === b, col("field_count")).otherwise(lit(0L)))
          .as(s"fsum_$b"))
      // write-locality exchange: co-locate each bucket, restore stable order
      val staging = s"${config.outDir}/staging-wave-$waveIdx"
      extracted
        .observe(obs, fieldSumMetrics.head, fieldSumMetrics.tail: _*)
        .repartition(waveBuckets.size, col("bucket"))
        .sortWithinPartitions("conv_id", "turn_idx")
        .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(staging)

      val extractMs = (System.nanoTime() - t0) / 1000000
      val now = java.time.Instant.now().toString
      val fieldSums: Map[Int, Long] = waveBuckets.map { b =>
        b -> (obs.get(s"fsum_$b") match {
          case null => 0L
          case n: Number => n.longValue()
        })
      }.toMap
      // per-file row counts come from the parquet FOOTERS (pure metadata
      // reads — at 100 TB this replaces a second full-output scan with a few
      // KB per file; file paths are preserved by the promote's directory move)
      val perFile = listStagedFiles(spark, staging)
      val waveFiles = perFile.toVector
      val lineage = perFile.groupBy(_.bucket).map { case (bucket, fs) =>
        LineageRow(snapshotId + 1, bucket.toLong, fs.map(_.rowCount).sum,
          fieldSums.getOrElse(bucket, 0L), extractMs, now)
      }.toVector

      // promote staged bucket dirs into data/ then commit the snapshot
      val dataDir = Paths.get(config.outDir, "data")
      Files.createDirectories(dataDir)
      listDir(Paths.get(staging))
        .filter(p => p.getFileName.toString.startsWith("bucket="))
        .foreach { p =>
          val target = dataDir.resolve(p.getFileName.toString)
          if (Files.exists(target)) { // only possible on dirty staging replay
            deleteRecursively(target)
          }
          Files.move(p, target)
        }
      deleteRecursively(Paths.get(staging))

      snapshotId += 1
      committed = committed ++ waveBuckets
      doneThisRun = doneThisRun ++ waveBuckets
      committedFiles = committedFiles ++ waveFiles
      commitSnapshot(config.outDir, snapshotId, committed, committedFiles, lineage,
        if (config.fingerprintInputs) currentFps else Map.empty)

      if (config.failAfterWave == waveIdx)
        throw new RuntimeException(s"simulated kill after wave $waveIdx (snapshot $snapshotId committed)")
    }
    doneThisRun
  }

  /** Read the committed table: exactly the data files listed in the latest
    * committed manifest. A crash between bucket promotion and commitSnapshot
    * can leave promoted-but-uncommitted dirs (or extra files) under data/ —
    * readers must not see them (snapshot-isolation read semantics). Legacy
    * manifests without a file list fall back to committed bucket dirs.
    */
  def readCommitted(spark: SparkSession, outDir: String): DataFrame = {
    val man = readManifest(outDir)
      .getOrElse(throw new IllegalStateException(s"no committed snapshot under $outDir"))
    val paths =
      if (man.files.nonEmpty) man.files.map(f => s"$outDir/data/${f.path}")
      else man.buckets.toSeq.sorted.map(b => s"$outDir/data/bucket=$b")
    require(paths.nonEmpty, s"empty committed snapshot under $outDir")
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
