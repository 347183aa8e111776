package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import graft.sources.CorpusJsonl
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** JSONL corpus ingestion: explicit-schema PERMISSIVE read against the
  * documents-table contract — clean rows, quarantined bad lines, and
  * counts that partition the input exactly (zero silent drops). */
class CorpusJsonlSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("clean rows, corrupt lines, and contractless rows partition the input; n_chars self-heals") {
    val dir = Files.createTempDirectory("graft-jsonl")
    val lines = Seq(
      """{"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "web", "n_chars": 10}""",
      // wrong shipped n_chars: recomputed from text
      """{"doc_id": 2, "text": "gamma", "lang": "de", "source": "web", "n_chars": 999}""",
      // missing n_chars entirely: computed
      """{"doc_id": 3, "text": "delta", "lang": "en", "source": "book"}""",
      // unparseable JSON -> corrupt capture
      """{"doc_id": 4, "text": "epsilon", BROKEN""",
      // parseable but contractless (no text) -> quarantine, not clean
      """{"doc_id": 5, "lang": "fr", "source": "web"}""")
    Files.write(dir.resolve("docs.jsonl"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    val path = dir.resolve("docs.jsonl").toString

    val clean = CorpusJsonl.read(spark, path).collect().sortBy(_.getLong(0))
    assert(clean.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(clean.map(_.getAs[Long]("n_chars")).toSeq == Seq(10L, 5L, 5L),
      "n_chars always recomputed from text (shipped values never trusted)")

    val q = CorpusJsonl.quarantine(spark, path).collect()
    assert(q.length == 2, q.mkString("; "))
    assert(q.count(_.getAs[Boolean]("unparseable")) == 1)
    assert(q.exists(r => r.getAs[Boolean]("unparseable") &&
      r.getAs[String]("line").contains("BROKEN")), "corrupt line kept verbatim")
    assert(q.exists(r => !r.getAs[Boolean]("unparseable") &&
      r.getAs[String]("line").contains("\"lang\": \"fr\"")),
      "contractless line kept VERBATIM — repair fields survive")

    val s = CorpusJsonl.stats(spark, path).collect().head
    assert(s.getAs[Long]("clean_rows") == 3 && s.getAs[Long]("corrupt_lines") == 1 &&
      s.getAs[Long]("contractless_rows") == 1, s.toString)
  }

  test("gzip JSONL reads through Spark's codec layer identically") {
    val dir = Files.createTempDirectory("graft-jsonl-gz")
    val out = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(dir.resolve("docs.jsonl.gz")))
    out.write(
      """{"doc_id": 7, "text": "zeta eta", "lang": "en", "source": "web", "n_chars": 8}"""
        .getBytes(StandardCharsets.UTF_8))
    out.close()
    val rows = CorpusJsonl.read(spark, dir.resolve("docs.jsonl.gz").toString).collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 7L &&
      rows.head.getAs[Long]("n_chars") == 8L)
  }
}
