package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import graft.spark.{CommitConflictException, ExtractionJob, SnapshotManifestFormat, Transcripts}
import java.nio.file.{Files, Paths}

/** Write-audit-publish branches (Iceberg WAP analog): an incremental
  * re-extraction is staged on an unpublished branch ref, audited against
  * structural invariants, and only then atomically published — or
  * abandoned without a trace. While a branch is pending the table head is
  * frozen (the branch holds the next snapshot id), so no concurrent commit
  * can orphan the staged audit data. */
class WapBranchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(String, Int, String, String)] =
    df.select("conv_id", "turn_idx", "fields_json", "main_text")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3))).toSet

  private def dataFiles(out: String): Set[String] = {
    val root = Paths.get(out, "data")
    if (!Files.isDirectory(root)) Set.empty
    else {
      val s = Files.walk(root)
      try s.filter(p => p.getFileName.toString.endsWith(".parquet"))
        .map[String](_.toString).toArray.map(_.asInstanceOf[String]).toSet
      finally s.close()
    }
  }

  test("WAP end-to-end: staged branch is invisible, freezes the head, audits green, publishes atomically") {
    val ss = spark
    import ss.implicits._
    val out = Files.createTempDirectory("graft-wap").toString
    val cfg = ExtractionJob.Config(out, buckets = 4, waves = 2, convGrained = true,
      autoCompactDeletes = 0)
    val turns = Transcripts.generate(spark, 18)
    assert(ExtractionJob.run(spark, turns, cfg).nonEmpty)
    val s0 = ExtractionJob.latestSnapshot(out).get
    val baseline = rows(ExtractionJob.readCommitted(spark, out))

    // stage a correction on a branch
    val victim = turns.select("conv_id").as[String].head()
    val changed = turns.map(t =>
      if (t.conv_id == victim) t.copy(text = t.text + "\nAddress: 1 Main St") else t)
    val done = ExtractionJob.run(spark, changed, cfg.copy(toBranch = Some("audit")))
    assert(done.nonEmpty, "the delta must have been staged")

    // invisible to readers; head unmoved; ref pending
    assert(ExtractionJob.latestSnapshot(out).contains(s0))
    assert(rows(ExtractionJob.readCommitted(spark, out)) == baseline)
    assert(ExtractionJob.branches(out) == Map("audit" -> (s0 + 1)))

    // the branch read serves exactly the post-correction extraction
    val want = rows(ExtractionJob.extract(spark, changed).toDF())
    assert(rows(ExtractionJob.readCommittedAtBranch(spark, out, "audit")) == want)
    assert(want != baseline, "the mutation must change extraction output")

    // pending branch freezes EVERY other commit: a tag (prop commit), a
    // second branch, and a plain head run all refuse with a conflict
    intercept[CommitConflictException] {
      ExtractionJob.tagSnapshot(out, "pin", s0)
    }
    intercept[CommitConflictException] {
      ExtractionJob.run(spark, turns.map(t => t.copy(text = t.text + "\nx")),
        cfg.copy(toBranch = Some("second"), commitRetries = 0))
    }
    intercept[CommitConflictException] {
      ExtractionJob.run(spark,
        turns.map(t => t.copy(text = t.text + "\ny")), cfg.copy(commitRetries = 0))
    }

    // audit gate green
    val audit = ExtractionJob.auditBranch(spark, out, "audit")
    assert(audit.ok && audit.rows > 0 && audit.duplicateKeys == 0 && audit.nullSpecs == 0,
      s"expected a green audit, got $audit")

    // publish: atomic head swap, ref retired, readers now see the correction
    assert(ExtractionJob.publishBranch(out, "audit") == s0 + 1)
    assert(ExtractionJob.latestSnapshot(out).contains(s0 + 1))
    assert(ExtractionJob.branches(out).isEmpty)
    assert(rows(ExtractionJob.readCommitted(spark, out)) == want)
    // CDC across the published branch snapshot works like any delta
    assert(ExtractionJob.readAppendsBetween(spark, out, s0, s0 + 1)
      .where(org.apache.spark.sql.functions.col("conv_id") === victim).count() > 0)
    // time travel to the pre-publish head still serves the baseline
    assert(rows(ExtractionJob.readCommittedAsOf(spark, out, s0)) == baseline)

    // publish-crash remnant: a ref left behind pointing at the (already
    // published) snapshot is retired idempotently, with nothing touched
    Files.write(Paths.get(out, "snapshots", "branch-audit"), (s0 + 1).toString.getBytes)
    assert(ExtractionJob.publishBranch(out, "audit") == s0 + 1)
    assert(ExtractionJob.branches(out).isEmpty)
    assert(rows(ExtractionJob.readCommitted(spark, out)) == want)
  }

  test("abandon: the staged snapshot and everything only it references are GC'd; table is untouched") {
    val ss = spark
    import ss.implicits._
    val out = Files.createTempDirectory("graft-wap-abandon").toString
    val cfg = ExtractionJob.Config(out, buckets = 4, waves = 2, convGrained = true,
      autoCompactDeletes = 0)
    val turns = Transcripts.generate(spark, 15)
    assert(ExtractionJob.run(spark, turns, cfg).nonEmpty)
    val s0 = ExtractionJob.latestSnapshot(out).get
    val baseline = rows(ExtractionJob.readCommitted(spark, out))
    val filesBefore = dataFiles(out)

    val victim = turns.select("conv_id").as[String].head()
    val changed = turns.map(t =>
      if (t.conv_id == victim) t.copy(text = t.text + "\nPhone: 555-0100") else t)
    assert(ExtractionJob.run(spark, changed, cfg.copy(toBranch = Some("oops"))).nonEmpty)
    assert(dataFiles(out) != filesBefore, "the branch must have added delta files")

    ExtractionJob.abandonBranch(out, "oops")
    assert(ExtractionJob.branches(out).isEmpty)
    assert(ExtractionJob.latestSnapshot(out).contains(s0))
    assert(ExtractionJob.readManifest(out).get.snapshotId == s0)
    assert(SnapshotManifestFormat.readManifestAt(out, s0 + 1).isEmpty,
      "the staged manifest must be gone")
    assert(dataFiles(out) == filesBefore, "every branch-only data file must be GC'd")
    val delRoot = Paths.get(out, "deletes")
    assert(!Files.isDirectory(delRoot) || {
      val s = Files.list(delRoot)
      try !s.toArray.exists { p =>
        val n = p.asInstanceOf[java.nio.file.Path].getFileName.toString
        n == s"snap-${s0 + 1}" || n.startsWith(s"snap-${s0 + 1}-")
      } finally s.close()
    }, "the branch's equality-delete dir must be GC'd")
    assert(rows(ExtractionJob.readCommitted(spark, out)) == baseline)

    // the same correction still lands normally afterwards: the abandoned
    // branch left no fingerprint residue claiming the work was done
    assert(ExtractionJob.run(spark, changed, cfg).nonEmpty)
    assert(rows(ExtractionJob.readCommitted(spark, out)) ==
      rows(ExtractionJob.extract(spark, changed).toDF()))
  }

  test("audit catches a delta that landed without its equality delete (duplicate keys)") {
    val ss = spark
    import ss.implicits._
    val out = Files.createTempDirectory("graft-wap-dup").toString
    val cfg = ExtractionJob.Config(out, buckets = 2, waves = 1, convGrained = true,
      autoCompactDeletes = 0)
    assert(ExtractionJob.run(spark, Transcripts.generate(spark, 8), cfg).nonEmpty)
    val man = ExtractionJob.readManifest(out).get

    // hand-stage a branch whose delta duplicates an existing key — the
    // exact corruption a buggy writer (delta file without its delete
    // file) would produce, which the audit exists to stop
    val dup = ExtractionJob.readCommitted(spark, out).limit(1).cache()
    val b = dup.select("bucket").head().getInt(0)
    val staging = s"$out/staging-dup"
    dup.drop("bucket").write.parquet(s"$staging/bucket=$b")
    val staged = SnapshotManifestFormat.listStagedFiles(spark, staging)
      .map(_.copy(seq = man.snapshotId + 1))
    SnapshotManifestFormat.commitWave(out, staging, man.snapshotId + 1, man.buckets,
      man.files ++ staged, Seq.empty, man.inputFps, additive = true,
      convFpsDir = man.convFpsDir, deleteDirs = man.deleteDirs, fpMode = man.fpMode,
      bucketCount = man.bucketCount, operation = "delta", toBranch = Some("bad"))

    val audit = ExtractionJob.auditBranch(spark, out, "bad")
    assert(audit.duplicateKeys >= 1 && !audit.ok, s"audit must flag the duplicate, got $audit")
    // the gate holds: abandon instead of publish, table stays clean
    ExtractionJob.abandonBranch(out, "bad")
    val after = ExtractionJob.readCommitted(spark, out)
    assert(after.count() ==
      after.dropDuplicates("conv_id", "turn_idx").count())
  }

  test("retention maintenance never GCs a pending branch; publish still works after expiry") {
    val ss = spark
    import ss.implicits._
    val out = Files.createTempDirectory("graft-wap-expire").toString
    val cfg = ExtractionJob.Config(out, buckets = 4, waves = 2, convGrained = true,
      autoCompactDeletes = 0)
    val turns = Transcripts.generate(spark, 15)
    assert(ExtractionJob.run(spark, turns, cfg).nonEmpty)

    val victim = turns.select("conv_id").as[String].head()
    val changed = turns.map(t =>
      if (t.conv_id == victim) t.copy(text = t.text + "\nEmail: a@b.co") else t)
    assert(ExtractionJob.run(spark, changed, cfg.copy(toBranch = Some("hold"))).nonEmpty)
    val want = rows(ExtractionJob.readCommittedAtBranch(spark, out, "hold"))

    ExtractionJob.expireSnapshots(out, retainLast = 1)
    ExtractionJob.removeOrphanFiles(out, olderThanMs = 0)

    // staged snapshot survived both sweeps intact
    assert(rows(ExtractionJob.readCommittedAtBranch(spark, out, "hold")) == want)
    val audit = ExtractionJob.auditBranch(spark, out, "hold")
    assert(audit.ok, s"post-maintenance audit must stay green, got $audit")
    val snap = ExtractionJob.publishBranch(out, "hold")
    assert(ExtractionJob.latestSnapshot(out).contains(snap))
    assert(rows(ExtractionJob.readCommitted(spark, out)) == want)
  }

  test("a crashed ref write's .tmp leftover is not a branch: no phantom freeze, no corrupt-ref error") {
    val ss = spark
    import ss.implicits._
    val out = Files.createTempDirectory("graft-wap-tmp").toString
    val cfg = ExtractionJob.Config(out, buckets = 2, waves = 1, convGrained = true,
      autoCompactDeletes = 0)
    val turns = Transcripts.generate(spark, 8)
    assert(ExtractionJob.run(spark, turns, cfg).nonEmpty)
    val s0 = ExtractionJob.latestSnapshot(out).get

    // exactly what a kill between atomicWrite's write(tmp) and move leaves
    // behind — once with complete digits (would register a phantom branch
    // named 'ghost.tmp' freezing the table) and once with partial content
    // (would throw 'corrupt branch ref' from every later commit)
    Files.write(Paths.get(out, "snapshots", "branch-ghost.tmp"), (s0 + 1).toString.getBytes)
    assert(ExtractionJob.branches(out).isEmpty, ".tmp staging leftovers are not refs")
    Files.write(Paths.get(out, "snapshots", "branch-ghost.tmp"), "1".getBytes) // partial
    assert(ExtractionJob.branches(out).isEmpty)

    // the table is NOT frozen: a head commit and a real branch both land
    val victim = turns.select("conv_id").as[String].head()
    val changed = turns.map(t =>
      if (t.conv_id == victim) t.copy(text = t.text + "\nZip: 10001") else t)
    assert(ExtractionJob.run(spark, changed, cfg).nonEmpty)
    assert(ExtractionJob.latestSnapshot(out).contains(s0 + 1))
    val changed2 = changed.map(t =>
      if (t.conv_id == victim) t.copy(text = t.text + "\nState: NY") else t)
    assert(ExtractionJob.run(spark, changed2, cfg.copy(toBranch = Some("real"))).nonEmpty)
    assert(ExtractionJob.branches(out) == Map("real" -> (s0 + 2)))
    ExtractionJob.abandonBranch(out, "real")

    // and a branch NAMED like the staging suffix is refused outright —
    // its ref file would be indistinguishable from a crash leftover
    intercept[IllegalArgumentException] {
      ExtractionJob.run(spark, changed2, cfg.copy(toBranch = Some("x.tmp"), commitRetries = 0))
    }
  }

  test("branch refs carry a writer-unique token; legacy bare-id refs still parse") {
    val ss = spark
    import ss.implicits._
    val out = Files.createTempDirectory("graft-wap-token").toString
    val cfg = ExtractionJob.Config(out, buckets = 2, waves = 1, convGrained = true,
      autoCompactDeletes = 0)
    val turns = Transcripts.generate(spark, 8)
    assert(ExtractionJob.run(spark, turns, cfg).nonEmpty)
    val victim = turns.select("conv_id").as[String].head()
    val changed = turns.map(t =>
      if (t.conv_id == victim) t.copy(text = t.text + "\nCity: Austin") else t)
    assert(ExtractionJob.run(spark, changed, cfg.copy(toBranch = Some("tok"))).nonEmpty)
    val s1 = ExtractionJob.latestSnapshot(out).get + 1
    val content = new String(Files.readAllBytes(
      Paths.get(out, "snapshots", "branch-tok")), "UTF-8")
    // "<id> <token>": the token is what lets a stage that lost the
    // manifest race prove the ref is its OWN to delete
    assert(content.matches(s"$s1 [0-9a-f]{8}"), s"unexpected ref format: '$content'")
    assert(ExtractionJob.branches(out) == Map("tok" -> s1))
    ExtractionJob.abandonBranch(out, "tok")
    // legacy bare-id ref (pre-token tables) parses and publishes
    Files.write(Paths.get(out, "snapshots", "branch-old"), (s1 - 1).toString.getBytes)
    assert(ExtractionJob.branches(out) == Map("old" -> (s1 - 1)))
    assert(ExtractionJob.publishBranch(out, "old") == s1 - 1) // already-live remnant
    assert(ExtractionJob.branches(out).isEmpty)
  }
}
