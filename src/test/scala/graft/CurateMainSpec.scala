package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** CurateMain: the composed corpus-curation pipeline (gates → exact dedup
  * → near-dup clustering → mixture → epoch order) must produce a corpus
  * with every stage's invariant intact, a consistent funnel, and be
  * byte-deterministic across runs. */
class CurateMainSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("curate: funnel consistent, corpus deduped and epoch-ordered, deterministic") {
    val out = Files.createTempDirectory("graft-curate").toString
    val raw = spark.read.parquet(s"$dir/documents.parquet")
    val target = Seq("en" -> 0.50, "es" -> 0.10, "de" -> 0.15, "fr" -> 0.15, "zh" -> 0.10)
    val f = CurateMain.curate(spark, raw, out, target, shards = 4, epoch = 3,
      nearDupCap = 1000)

    // funnel monotone and consistent with the written corpus
    assert(f.input == raw.count())
    assert(f.qualityKept <= f.input && f.exactUnique <= f.qualityKept)
    assert(f.mixtureKept <= f.exactUnique - f.nearDupRemoved)
    assert(f.untargetedDropped == 0, "every fixture language is in the target")
    val corpus = spark.read.parquet(s"$out/corpus")
    assert(corpus.count() == f.mixtureKept && f.mixtureKept > 0)

    // no exact duplicates survive
    assert(corpus.select(xxhash64(col("text"))).distinct().count() == f.mixtureKept)
    // no near-dup loser survives (recomputed from the staged survivor set)
    val survivors = spark.read.parquet(s"$out/staging-dedup")
    val losers = CurateMain.nearDupLosers(spark, survivors, 1000)
    assert(losers.count() == f.nearDupRemoved)
    assert(corpus.join(losers, Seq("doc_id"), "left_semi").count() == 0)
    // gates hold on every surviving row
    assert(CurateMain.qualityGate(corpus.select("doc_id", "text", "lang", "source"))
      .count() == f.mixtureKept)

    // epoch order: every shard's positions are exactly 1..count
    corpus.groupBy("shard")
      .agg(count(lit(1)).as("n"), countDistinct("pos").as("d"),
        min("pos").as("lo"), max("pos").as("hi"))
      .collect().foreach { r =>
        val (n, d, lo, hi) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        assert(d == n && lo == 1 && hi == n, s"bad shard order: $r")
      }

    // deterministic: a second run reproduces the corpus exactly
    val out2 = Files.createTempDirectory("graft-curate2").toString
    val f2 = CurateMain.curate(spark, raw, out2, target, shards = 4, epoch = 3,
      nearDupCap = 1000)
    assert(f2 == f)
    val a = corpus.select("doc_id", "text", "lang", "source", "shard", "pos")
      .collect().map(_.toString).sorted.toSeq
    val b = spark.read.parquet(s"$out2/corpus")
      .select("doc_id", "text", "lang", "source", "shard", "pos")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)

    // a different epoch keeps membership but permutes the order
    val out3 = Files.createTempDirectory("graft-curate3").toString
    CurateMain.curate(spark, raw, out3, target, shards = 4, epoch = 4,
      nearDupCap = 1000)
    val c = spark.read.parquet(s"$out3/corpus")
    assert(c.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      corpus.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    assert(c.select("doc_id", "shard", "pos").collect().map(_.toString).sorted.toSeq !=
      corpus.select("doc_id", "shard", "pos").collect().map(_.toString).sorted.toSeq,
      "a different epoch must produce a different order")
  }

  test("CurateMain CLI prints the funnel JSON") {
    val out = Files.createTempDirectory("graft-curate-cli").toString
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf)) {
      CurateMain.main(Array(s"$dir/documents.parquet", out,
        "--shards=2", "--epoch=1", "--target=en:0.6,es:0.4"))
    }
    val line = buf.toString.linesIterator.find(_.startsWith("{")).get
    assert(line.contains("\"input\":") && line.contains("\"mixture_kept\":") &&
      line.contains("\"shards\":2"), line)
    val corpus = spark.read.parquet(s"$out/corpus")
    assert(corpus.select("lang").distinct().collect().map(_.getString(0)).toSet ==
      Set("en", "es"))
    // languages outside the 2-language target are reported as dropped,
    // not silently folded into the mixture count
    val dropped = "\"untargeted_dropped\":(\\d+)".r
      .findFirstMatchIn(line).get.group(1).toLong
    assert(dropped > 0, line)
    // a duplicated target language is refused before any work
    intercept[IllegalArgumentException] {
      CurateMain.main(Array(s"$dir/documents.parquet", out,
        "--target=en:0.5,en:0.3"))
    }
    // a typo'd flag must not silently run with defaults
    intercept[IllegalArgumentException] {
      CurateMain.main(Array(s"$dir/documents.parquet", out, "--epochs=3"))
    }
    intercept[IllegalArgumentException] {
      CurateMain.main(Array(s"$dir/documents.parquet", out, "--shards=abc"))
    }
    intercept[IllegalArgumentException] {
      CurateMain.main(Array(s"$dir/documents.parquet", out, "--target=en"))
    }
  }

  test("ingestion formats compose into curation: --input-format=jsonl end-to-end") {
    val tmp = Files.createTempDirectory("graft-curate-jsonl")
    // the documents fixture re-exported as JSONL (+ one corrupt line the
    // permissive read quarantines) — curation must land on the identical
    // clean funnel a parquet read produces
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val jsonLines = docs.toJSON.collect()
    Files.write(tmp.resolve("docs.jsonl"),
      (jsonLines :+ """{"broken json""").mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = Files.createTempDirectory("graft-curate-jsonl-out").toString
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf)) {
      CurateMain.main(Array(tmp.resolve("docs.jsonl").toString, out,
        "--input-format=jsonl", "--shards=2", "--epoch=1",
        "--target=en:0.5,es:0.1,de:0.15,fr:0.15,zh:0.1"))
    }
    val line = buf.toString.linesIterator.find(_.startsWith("{")).get
    val input = "\"input\":(\\d+)".r.findFirstMatchIn(line).get.group(1).toLong
    assert(input == docs.count(), s"corrupt line must be quarantined, not counted: $line")
    assert(spark.read.parquet(s"$out/corpus").count() > 0)
    intercept[IllegalArgumentException] {
      CurateMain.main(Array(tmp.resolve("docs.jsonl").toString, out,
        "--input-format=csvish"))
    }
  }
}
