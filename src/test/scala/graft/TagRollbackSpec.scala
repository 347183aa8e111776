package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.spark.{ExtractionJob, Transcripts}
import java.nio.file.Files

/** Snapshot refs (Iceberg tag analog) and rollback: a tag pins a table
  * version against retention so `readCommittedAtTag` reproduces the exact
  * bytes a model trained on; rollback commits an old snapshot's content
  * forward as a new replacing snapshot without rewriting history. */
class TagRollbackSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  // main_text included: a mutation that only appends prose changes the
  // extracted main content even when the field list is unaffected
  private def rows(df: org.apache.spark.sql.DataFrame): Set[(String, Int, String, String)] =
    df.select("conv_id", "turn_idx", "fields_json", "main_text")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3))).toSet

  test("tags pin snapshots through commits and expiry; readCommittedAtTag reproduces the bytes") {
    val ss = spark
    import ss.implicits._
    val out = Files.createTempDirectory("graft-tags").toString
    val cfg = ExtractionJob.Config(out, buckets = 4, waves = 2, convGrained = true,
      autoCompactDeletes = 0)
    val turns = Transcripts.generate(spark, 18)
    assert(ExtractionJob.run(spark, turns, cfg).nonEmpty)
    val s0 = ExtractionJob.latestSnapshot(out).get
    val v0Rows = rows(ExtractionJob.readCommitted(spark, out))

    // guard rails first: bad names and missing snapshots refuse
    intercept[IllegalArgumentException] { ExtractionJob.tagSnapshot(out, "", s0) }
    intercept[IllegalArgumentException] { ExtractionJob.tagSnapshot(out, "a{b}", s0) }
    intercept[IllegalArgumentException] { ExtractionJob.tagSnapshot(out, "ghost", s0 + 900) }

    // the ref.* prop namespace is tag-reserved: free-form values that would
    // wedge tags()/expiry are refused at WRITE time, as is the committed_at
    // key (it would shadow the manifest's own trailing field)
    intercept[IllegalArgumentException] {
      graft.spark.SnapshotManifestFormat.setTableProps(out, Map("ref.notes" -> "see-wiki"))
    }
    intercept[IllegalArgumentException] {
      graft.spark.SnapshotManifestFormat.setTableProps(out, Map("ref.a\"b" -> "3"))
    }
    intercept[IllegalArgumentException] {
      graft.spark.SnapshotManifestFormat.setTableProps(out, Map("committed_at" -> "bogus"))
    }

    ExtractionJob.tagSnapshot(out, "train-v1", s0)
    assert(ExtractionJob.tags(out) == Map("train-v1" -> s0))

    // two later corrections move the live table away from the tagged version
    val victim = turns.select("conv_id").as[String].head()
    val v1 = turns.map(t => if (t.conv_id == victim) t.copy(text = t.text + "\ntag fix 1") else t)
    assert(ExtractionJob.run(spark, v1, cfg).nonEmpty)
    val v2 = v1.map(t => if (t.conv_id == victim) t.copy(text = t.text + "\ntag fix 2") else t)
    assert(ExtractionJob.run(spark, v2, cfg).nonEmpty)
    val s2 = ExtractionJob.latestSnapshot(out).get

    // the tag is a sticky prop: unrelated commits carry it forward
    assert(ExtractionJob.tags(out) == Map("train-v1" -> s0))
    assert(rows(ExtractionJob.readCommittedAtTag(spark, out, "train-v1")) == v0Rows)
    assert(rows(ExtractionJob.readCommitted(spark, out)) != v0Rows)

    // expiry: the tagged snapshot survives retention; untagged history dies
    val (expired, _) = ExtractionJob.expireSnapshots(out, retainLast = 1)
    assert(expired > 0)
    assert(rows(ExtractionJob.readCommittedAtTag(spark, out, "train-v1")) == v0Rows,
      "tag must keep serving the pinned bytes after expiry")
    intercept[IllegalStateException] { // untagged intermediate snapshot is gone
      ExtractionJob.readCommittedAsOf(spark, out, s0 + 1)
    }
    assert(rows(ExtractionJob.readCommittedAsOf(spark, out, s0)) == v0Rows)

    // drop the tag: the pin is released, the next expiry collects it
    ExtractionJob.dropTag(out, "train-v1")
    assert(ExtractionJob.tags(out).isEmpty)
    intercept[IllegalArgumentException] {
      ExtractionJob.readCommittedAtTag(spark, out, "train-v1")
    }
    val (expired2, _) = ExtractionJob.expireSnapshots(out, retainLast = 1)
    assert(expired2 > 0, "formerly tagged snapshot must be expirable after dropTag")
    intercept[IllegalStateException] { ExtractionJob.readCommittedAsOf(spark, out, s0) }
    // the live table is untouched throughout
    assert(rows(ExtractionJob.readCommitted(spark, out)) ==
      rows(ExtractionJob.readCommittedAsOf(spark, out, ExtractionJob.latestSnapshot(out).get)))
    assert(s2 <= ExtractionJob.latestSnapshot(out).get)
  }

  test("rollback commits old content forward as a replace; history and resume semantics hold") {
    val ss = spark
    import ss.implicits._
    val out = Files.createTempDirectory("graft-rollback").toString
    val cfg = ExtractionJob.Config(out, buckets = 4, waves = 2, convGrained = true,
      autoCompactDeletes = 0)
    val turns = Transcripts.generate(spark, 18)
    assert(ExtractionJob.run(spark, turns, cfg).nonEmpty)
    val s0 = ExtractionJob.latestSnapshot(out).get
    val v0Rows = rows(ExtractionJob.readCommitted(spark, out))

    val victim = turns.select("conv_id").as[String].head()
    val v1 = turns.map(t => if (t.conv_id == victim) t.copy(text = t.text + "\nbad fix") else t)
    assert(ExtractionJob.run(spark, v1, cfg).nonEmpty)
    val s1 = ExtractionJob.latestSnapshot(out).get
    val v1Rows = rows(ExtractionJob.readCommitted(spark, out))
    assert(v1Rows != v0Rows)

    // rollback: live table serves the pre-correction bytes again
    val s2 = ExtractionJob.rollbackTo(out, s0)
    assert(s2 == s1 + 1, "rollback must commit a NEW snapshot, not rewrite history")
    assert(ExtractionJob.latestSnapshot(out).contains(s2))
    assert(rows(ExtractionJob.readCommitted(spark, out)) == v0Rows)
    assert(ExtractionJob.readManifest(out).get.operation.contains("replace"))

    // history is preserved: the rolled-back-over snapshot still time-travels
    assert(rows(ExtractionJob.readCommittedAsOf(spark, out, s1)) == v1Rows)
    // but CDC across the replace refuses (added-rows semantics undefined)
    val replaced = intercept[IllegalStateException] {
      ExtractionJob.readAppendsBetween(spark, out, s0, s2)
    }
    assert(replaced.getMessage.contains("replacing commit"), replaced.getMessage)

    // rollback to the current snapshot is a no-op
    assert(ExtractionJob.rollbackTo(out, s2) == s2)
    assert(ExtractionJob.latestSnapshot(out).contains(s2))
    // rollback to a never-existing snapshot reports history loss
    val gone = intercept[IllegalStateException] { ExtractionJob.rollbackTo(out, s2 + 900) }
    assert(gone.getMessage.contains("rewritten or expired"), gone.getMessage)

    // the rollback also reset the conv fingerprints: re-running with the
    // corrected input re-applies the delta instead of no-opping
    assert(ExtractionJob.run(spark, v1, cfg).nonEmpty,
      "post-rollback rerun with the changed input must re-extract the changed conv")
    assert(rows(ExtractionJob.readCommitted(spark, out)) == v1Rows)

    // roll back again, then expire everything but the rollback snapshot:
    // its (old) data files must survive GC because the latest manifest
    // references them — content still served byte-for-byte
    val s4 = ExtractionJob.rollbackTo(out, s0)
    ExtractionJob.expireSnapshots(out, retainLast = 1)
    assert(rows(ExtractionJob.readCommitted(spark, out)) == v0Rows,
      "GC must keep files referenced by the rollback manifest")
    // and the table still accepts normal incremental work afterwards
    assert(ExtractionJob.run(spark, v1, cfg).nonEmpty)
    assert(rows(ExtractionJob.readCommitted(spark, out)) == v1Rows)
    assert(s4 > s2)
  }

  test("rollback refuses when the target's files were rewritten by compaction") {
    val ss = spark
    import ss.implicits._
    val out = Files.createTempDirectory("graft-rbcompact").toString
    val cfg = ExtractionJob.Config(out, buckets = 4, waves = 2, convGrained = true,
      autoCompactDeletes = 0)
    val turns = Transcripts.generate(spark, 15)
    assert(ExtractionJob.run(spark, turns, cfg).nonEmpty)
    val s0 = ExtractionJob.latestSnapshot(out).get
    val victim = turns.select("conv_id").as[String].head()
    val v1 = turns.map(t => if (t.conv_id == victim) t.copy(text = t.text + "\nrb fix") else t)
    assert(ExtractionJob.run(spark, v1, cfg).nonEmpty)
    assert(ExtractionJob.compact(spark, out).nonEmpty) // rewrites s0's dirty-bucket files
    val e = intercept[IllegalStateException] { ExtractionJob.rollbackTo(out, s0) }
    assert(e.getMessage.contains("rewritten or expired"), e.getMessage)
    // the refusal left the table untouched and serving the corrected content
    assert(ExtractionJob.readCommitted(spark, out).count() == turns.count())
  }

  test("metadata tables: $snapshots/$files/$lineage reflect manifests without touching data") {
    val ss = spark
    import ss.implicits._
    val out = Files.createTempDirectory("graft-meta").toString
    val cfg = ExtractionJob.Config(out, buckets = 4, waves = 2, convGrained = true,
      autoCompactDeletes = 0)
    val turns = Transcripts.generate(spark, 15)
    assert(ExtractionJob.run(spark, turns, cfg).nonEmpty)
    val s0 = ExtractionJob.latestSnapshot(out).get
    ExtractionJob.tagSnapshot(out, "base", s0)
    val victim = turns.select("conv_id").as[String].head()
    val v1 = turns.map(t => if (t.conv_id == victim) t.copy(text = t.text + "\nmeta fix") else t)
    assert(ExtractionJob.run(spark, v1, cfg).nonEmpty)
    assert(ExtractionJob.compact(spark, out).nonEmpty)

    // $snapshots: one row per retained manifest, ops in lifecycle order,
    // exactly one current row, the tag attached to its snapshot
    val snaps = ExtractionJob.readSnapshotsTable(spark, out)
      .collect().sortBy(_.getInt(0))
    val mans = graft.spark.SnapshotManifestFormat.retainedManifests(out)
    assert(snaps.length == mans.size)
    assert(snaps.map(_.getString(1)).toSeq ==
      mans.map(_.operation.getOrElse("append")))
    val ops = snaps.map(_.getString(1)).toSeq
    assert(ops.head == "append" && ops.contains("props") && ops.contains("delta"), ops.toString)
    assert(snaps.last.getString(1) == "rewrite") // the compaction
    assert(snaps.count(_.getBoolean(7)) == 1 && snaps.last.getBoolean(7))
    assert(snaps.find(_.getInt(0) == s0).get.getSeq[String](8) == Seq("base"))
    assert(snaps.forall(r => r.getString(2).nonEmpty), "committed_at must be populated")
    assert(snaps.forall(r => r.getSeq[String](9).contains("fields_json")),
      "every snapshot must expose its recorded schema columns")
    // row_count column equals the served table for the current snapshot
    assert(snaps.last.getLong(4) == ExtractionJob.readCommitted(spark, out).count())

    // $files: exactly the current manifest's files, bounds included
    val files = ExtractionJob.readFilesTable(spark, out).collect()
    val man = ExtractionJob.readManifest(out).get
    assert(files.map(r => (r.getInt(1), r.getString(2), r.getLong(3))).toSet ==
      man.files.map(f => (f.bucket, f.path, f.rowCount)).toSet)
    assert(files.forall(r => !r.isNullAt(5) && !r.isNullAt(6)), "conv bounds must surface")
    // as-of a historical snapshot it serves THAT manifest's files
    val filesAt0 = ExtractionJob.readFilesTable(spark, out, Some(s0)).collect()
    assert(filesAt0.map(_.getString(2)).toSet ==
      graft.spark.SnapshotManifestFormat.readManifestAt(out, s0).get.files.map(_.path).toSet)

    // $lineage: extraction audit rows — each wave commit records its own
    // buckets, so the initial run's waves sum to the whole input
    val lin = ExtractionJob.readLineageTable(spark, out)
    assert(lin.where(org.apache.spark.sql.functions.col("snapshot_id") <= s0)
      .agg(org.apache.spark.sql.functions.sum("row_count")).as[Long].head() == turns.count())

    // expiry shrinks $snapshots to the retained set (tagged s0 survives)
    ExtractionJob.expireSnapshots(out, retainLast = 1)
    val after = ExtractionJob.readSnapshotsTable(spark, out).collect().map(_.getInt(0)).toSet
    assert(after.contains(s0) && after.contains(man.snapshotId))
    assert(after.size < snaps.length)
  }

  test("a legacy tag whose name violates the tightened charset stays droppable (tombstone exemption)") {
    val out = Files.createTempDirectory("graft-tag-legacy").toString
    val cfg = ExtractionJob.Config(out, buckets = 2, waves = 1)
    assert(ExtractionJob.run(spark, Transcripts.generate(spark, 8), cfg).nonEmpty)
    val latest = ExtractionJob.latestSnapshot(out).get

    // inject a ref prop written before the name charset tightened (names
    // with spaces were once accepted) straight into the manifest, the way
    // an old engine version left it on disk
    val manPath = java.nio.file.Paths.get(out, "snapshots", s"snap-$latest.json")
    val raw = new String(Files.readAllBytes(manPath), java.nio.charset.StandardCharsets.UTF_8)
    assert(raw.contains("\"operation\":"))
    Files.write(manPath, raw.replaceFirst("\"operation\":\"([a-z]+)\",",
      "\"operation\":\"$1\",\"props\":{\"ref.bad name\":\"0\"},")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(ExtractionJob.tags(out) == Map("bad name" -> 0))

    // creating such a tag is refused today...
    intercept[IllegalArgumentException] { ExtractionJob.tagSnapshot(out, "bad name", 0) }
    // ...but the legacy one MUST stay droppable, or its snapshot is pinned
    // against expiry forever (the tombstone's empty value is exempt from
    // the name-charset check)
    ExtractionJob.dropTag(out, "bad name")
    assert(ExtractionJob.tags(out).isEmpty)
  }
}
