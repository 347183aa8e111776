package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import graft.sources.WarcIngest
import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

/** WARC ingestion (Common Crawl container): response records parse into
  * documents-shaped rows from plain and per-record-gzip files; request
  * records are filtered by type; malformed records SKIP with a counter
  * and the parser resynchronizes at the next record magic — one rotten
  * record never kills the file, and the loss is never silent. */
class WarcIngestSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def record(typ: String, id: String, uri: String, payload: Array[Byte],
                     contentLengthOverride: Option[Int] = None): Array[Byte] = {
    val header =
      s"WARC/1.0\r\n" +
        s"WARC-Type: $typ\r\n" +
        s"WARC-Record-ID: <urn:uuid:$id>\r\n" +
        s"WARC-Date: 2026-08-18T00:00:00Z\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        s"Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${contentLengthOverride.getOrElse(payload.length)}\r\n" +
        "\r\n"
    val out = new ByteArrayOutputStream()
    out.write(header.getBytes(StandardCharsets.UTF_8))
    out.write(payload)
    out.write("\r\n\r\n".getBytes(StandardCharsets.US_ASCII))
    out.toByteArray
  }

  private def httpPayload(status: Int, body: String): Array[Byte] =
    (s"HTTP/1.1 $status OK\r\nContent-Type: text/html\r\n\r\n" + body)
      .getBytes(StandardCharsets.UTF_8)

  private def concat(parts: Array[Byte]*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    parts.foreach(out.write)
    out.toByteArray
  }

  private def gzipMembers(parts: Array[Byte]*): Array[Byte] = {
    // per-record gzip members concatenated — the Common Crawl layout
    val out = new ByteArrayOutputStream()
    parts.foreach { p =>
      val gz = new GZIPOutputStream(out)
      gz.write(p); gz.finish()
    }
    out.toByteArray
  }

  private val good1 = record("response", "r1", "https://example.org/a",
    httpPayload(200, "Hello corpus <b>one</b>."))
  private val req = record("request", "q1", "https://example.org/a",
    "GET /a HTTP/1.1\r\n\r\n".getBytes(StandardCharsets.UTF_8))
  private val good2 = record("response", "r2", "https://example.org/b",
    httpPayload(404, "not here"))
  private val rawText = record("response", "r3", "https://example.org/c",
    "plain text payload, no HTTP envelope".getBytes(StandardCharsets.UTF_8))

  test("plain and per-record-gzip WARC parse identically; types filter; HTTP envelopes split") {
    val dir = Files.createTempDirectory("graft-warc")
    Files.write(dir.resolve("a.warc"), concat(good1, req, good2, rawText))
    Files.write(dir.resolve("b.warc.gz"), gzipMembers(good1, req, good2, rawText))

    for (f <- Seq("a.warc", "b.warc.gz")) {
      val rows = WarcIngest.read(spark, dir.resolve(f).toString)
        .collect().sortBy(_.getAs[String]("warc_record_id"))
      assert(rows.length == 3, s"$f: ${rows.mkString("; ")}") // request filtered
      val r1 = rows.find(_.getAs[String]("warc_record_id").contains("r1")).get
      assert(r1.getAs[String]("target_uri") == "https://example.org/a")
      assert(r1.getAs[Int]("http_status") == 200)
      assert(r1.getAs[String]("text") == "Hello corpus <b>one</b>.")
      val r2 = rows.find(_.getAs[String]("warc_record_id").contains("r2")).get
      assert(r2.getAs[Int]("http_status") == 404 && r2.getAs[String]("text") == "not here")
      val r3 = rows.find(_.getAs[String]("warc_record_id").contains("r3")).get
      assert(r3.getAs[Int]("http_status") == 0)
      assert(r3.getAs[String]("text") == "plain text payload, no HTTP envelope")
      val stats = WarcIngest.fileStats(spark, dir.resolve(f).toString).collect().head
      // n_records counts EMITTED (response) rows; the request record is
      // type-filtered, not skipped
      assert(stats.getAs[Long]("n_records") == 3 && stats.getAs[Long]("skipped_records") == 0)
    }

    // the documents bridge makes crawl records drop-in corpus-operator
    // input: stable hashed ids, langid, host as the per-domain source
    val docs = WarcIngest.toDocuments(
      WarcIngest.read(spark, dir.resolve("a.warc").toString))
      .collect().sortBy(_.getAs[Long]("n_chars"))
    assert(docs.length == 3)
    assert(docs.forall(_.getAs[String]("source") == "example.org"))
    assert(docs.forall(r => r.getAs[Long]("n_chars") ==
      r.getAs[String]("text").length.toLong))
    assert(docs.map(_.getAs[Long]("doc_id")).distinct.length == 3, "stable distinct ids")
  }

  test("toDocumentsMainText strips HTML boilerplate with the engine's own parser") {
    val dir = Files.createTempDirectory("graft-warc-html")
    val html =
      """<html><head><title>t</title></head><body>
        |<nav><a href="/">Home</a> <a href="/x">About</a> <a href="/y">Contact</a></nav>
        |<div><p>The actual article body has enough words to be treated as
        |content by the density heuristics, unlike the navigation above,
        |and it keeps going for a while so the block is clearly prose with
        |no links at all inside it.</p></div>
        |</body></html>""".stripMargin
    val page = record("response", "h1", "https://example.org/page",
      httpPayload(200, html))
    Files.write(dir.resolve("h.warc"), page)
    val warc = WarcIngest.read(spark, dir.resolve("h.warc").toString)
    assert(warc.collect().head.getAs[String]("http_content_type")
      .startsWith("text/html"))
    val txt = WarcIngest.toDocumentsMainText(warc).collect().head.getAs[String]("text")
    assert(txt.contains("actual article body"), txt)
    assert(!txt.contains("<p>") && !txt.contains("<nav>"), s"tags must be gone: $txt")
    assert(!txt.contains("Home") || !txt.contains("Contact"),
      s"link-dense navigation chrome should not survive: $txt")
    // the plain bridge keeps raw payloads untouched
    val raw0 = WarcIngest.toDocuments(warc).collect().head.getAs[String]("text")
    assert(raw0.contains("<nav>"))
  }

  test("a malformed record skips WITH a counter and the parser resynchronizes") {
    val dir = Files.createTempDirectory("graft-warc-bad")
    // middle record lies about its Content-Length (way past EOF would
    // truncate; here: negative -> invalid): parser must skip to the next
    // WARC magic and still deliver the surrounding records
    val bad = record("response", "rX", "https://example.org/bad",
      httpPayload(200, "bad"), contentLengthOverride = Some(-5))
    Files.write(dir.resolve("c.warc"), concat(good1, bad, good2))
    val rows = WarcIngest.read(spark, dir.resolve("c.warc").toString).collect()
    assert(rows.map(_.getAs[String]("warc_record_id")).sorted.toSeq
      .map(s => s.contains("r1") || s.contains("r2")) == Seq(true, true), rows.mkString("; "))
    val stats = WarcIngest.fileStats(spark, dir.resolve("c.warc").toString).collect().head
    assert(stats.getAs[Long]("skipped_records") == 1, stats.toString)

    // truncated tail: the last record's payload is cut off — skip + stop
    val truncated = concat(good1, good2).dropRight(30)
    Files.write(dir.resolve("d.warc"), truncated)
    val st2 = WarcIngest.fileStats(spark, dir.resolve("d.warc").toString).collect().head
    assert(st2.getAs[Long]("n_records") == 1 && st2.getAs[Long]("skipped_records") == 1,
      st2.toString)
  }

  test("decompression is cap-bounded: past the cap it truncates WITH a counted skip, never throws") {
    // a member set whose decompressed size exceeds a small cap: the parser
    // must keep the prefix, count one broken member, and never attempt an
    // allocation past the bound (the 2 GiB whole-array ceiling fix)
    val payload = Array.fill[Byte](100000)('x')
    val gz = {
      val bos = new ByteArrayOutputStream()
      val g = new GZIPOutputStream(bos)
      g.write(payload); g.close()
      bos.toByteArray
    }
    val (prefix, broken) = WarcIngest.gunzipAllBounded(gz, cap = 4096)
    assert(broken == 1, "cap overflow must be a COUNTED truncation")
    assert(prefix.length == 4096 && prefix.forall(_ == 'x'),
      s"prefix up to the cap must be preserved (got ${prefix.length})")
    // identity below the cap: same bytes, no skip
    val (full, ok) = WarcIngest.gunzipAllBounded(gz, cap = WarcIngest.MaxDecompressedBytes)
    assert(ok == 0 && java.util.Arrays.equals(full, payload))
  }
}
