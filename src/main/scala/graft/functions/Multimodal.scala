package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder brief): image/audio/video as opaque
  * `binary` columns with typed metadata, batch-shaped decode/feature-extract.
  *
  * The decode step is REAL: blobs are genuine image containers (binary PPM
  * `P6` and 24-bit uncompressed BMP — both fully specified public formats
  * parseable without external codecs), and `decode` dispatches on the
  * container magic, parses the header, and materializes the RGB pixel data
  * (BMP rows are 4-byte padded and stored bottom-up; the decoder strips the
  * padding and restores top-down row-major order). Features are computed
  * from the decoded pixels, not from the container bytes, so swapping in a
  * JPEG/PNG codec later changes only the `decode` dispatch table.
  *
  * Spark-side contract: schema (blob + metadata struct), partition-preserving
  * batched processing via mapPartitions (the Scala analog of mapInPandas'
  * batch shape), and a fixed-width feature vector per asset.
  */
object Multimodal {

  /** Image dimensions are deterministic functions of doc_id (and therefore
    * independently recomputable by the DuckDB oracle); pixel CONTENT is a
    * deterministic function of (doc_id, text) via a splitmix64 stream, so
    * the feature vector genuinely depends on decoding the payload.
    */
  def widthOf(docId: Long): Int = 64 + (docId % 8).toInt * 16
  def heightOf(docId: Long): Int = 48 + (docId % 5).toInt * 16

  private def textSeed(text: String): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < text.length) { h = (h ^ text.charAt(i)) * 0x100000001B3L; i += 1 }
    h
  }

  private final class SplitMix(seed: Long) {
    private var s = seed
    def next(): Long = {
      s += 0x9E3779B97F4A7C15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def nextByte(): Byte = (next() >>> 56).toByte
  }

  private def pixelsOf(docId: Long, text: String, w: Int, h: Int): Array[Byte] = {
    val px = new Array[Byte](w * h * 3)
    val rng = new SplitMix(docId * 0x9E3779B97F4A7C15L ^ textSeed(text))
    var i = 0
    while (i < px.length) { px(i) = rng.nextByte(); i += 1 }
    px
  }

  /** Synthesize a REAL image container for a document: docs alternate between
    * binary PPM (P6) and 24-bit BMP so the decoder's format dispatch is
    * exercised on every batch. Pixel bytes are RGB row-major top-down before
    * encoding.
    */
  def synthesizeBlob(docId: Long, text: String): Array[Byte] = {
    val w = widthOf(docId); val h = heightOf(docId)
    val px = pixelsOf(docId, text, w, h)
    if (docId % 3 == 0) encodeBmp24(w, h, px) else encodePpm(w, h, px)
  }

  // ---- PPM (portable pixmap, binary P6) ----

  def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3)
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Parse binary PPM: `P6` magic, whitespace/comment-separated width,
    * height, maxval tokens, single whitespace, then w*h*3 raw RGB bytes. */
  def decodePpm(blob: Array[Byte]): Decoded = {
    require(blob.length >= 2 && blob(0) == 'P' && blob(1) == '6', "not a P6 PPM")
    var i = 2
    def nextInt(): Int = {
      // skip whitespace and `#` comment lines (part of the PPM spec)
      var inComment = false
      while (i < blob.length && (inComment || blob(i) == '#' ||
        Character.isWhitespace(blob(i)))) {
        if (blob(i) == '#') inComment = true
        else if (blob(i) == '\n') inComment = false
        i += 1
      }
      var v = 0
      while (i < blob.length && blob(i) >= '0' && blob(i) <= '9') {
        v = v * 10 + (blob(i) - '0'); i += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    require(maxval == 255, s"unsupported PPM maxval $maxval")
    i += 1 // the single whitespace byte after maxval
    val px = java.util.Arrays.copyOfRange(blob, i, i + w * h * 3)
    Decoded(w, h, 3, px)
  }

  // ---- BMP (Windows bitmap, uncompressed 24-bit, BITMAPINFOHEADER) ----

  def encodeBmp24(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3)
    val rowSize = (w * 3 + 3) & ~3 // rows padded to 4-byte boundaries
    val dataSize = rowSize * h
    val bb = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(54 + dataSize).putInt(0).putInt(54) // file size, reserved, data offset
    bb.putInt(40).putInt(w).putInt(h)             // info header size, dims
    bb.putShort(1).putShort(24)                   // planes, bpp
    bb.putInt(0).putInt(dataSize)                 // BI_RGB, image size
    bb.putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 DPI, palette
    // pixel data: bottom-up rows, BGR order, padded
    var row = h - 1
    while (row >= 0) {
      var x = 0
      while (x < w) {
        val p = (row * w + x) * 3
        bb.put(rgb(p + 2)).put(rgb(p + 1)).put(rgb(p)) // B, G, R
        x += 1
      }
      var pad = rowSize - w * 3
      while (pad > 0) { bb.put(0.toByte); pad -= 1 }
      row -= 1
    }
    bb.array()
  }

  def decodeBmp24(blob: Array[Byte]): Decoded = {
    require(blob.length >= 54 && blob(0) == 'B' && blob(1) == 'M', "not a BMP")
    val bb = java.nio.ByteBuffer.wrap(blob).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dataOffset = bb.getInt(10)
    val w = bb.getInt(18)
    val hRaw = bb.getInt(22)
    val bpp = bb.getShort(28)
    val compression = bb.getInt(30)
    require(bpp == 24 && compression == 0, s"unsupported BMP variant bpp=$bpp comp=$compression")
    val bottomUp = hRaw > 0
    val h = math.abs(hRaw)
    val rowSize = (w * 3 + 3) & ~3
    val px = new Array[Byte](w * h * 3)
    var row = 0
    while (row < h) {
      val srcRow = if (bottomUp) h - 1 - row else row
      var x = 0
      while (x < w) {
        val src = dataOffset + srcRow * rowSize + x * 3
        val dst = (row * w + x) * 3
        px(dst) = blob(src + 2)     // R
        px(dst + 1) = blob(src + 1) // G
        px(dst + 2) = blob(src)     // B
        x += 1
      }
      row += 1
    }
    Decoded(w, h, 3, px)
  }

  /** Decoded image: RGB row-major top-down pixel bytes plus dimensions. */
  final case class Decoded(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  final case class MediaMeta(width: Int, height: Int, channels: Int, bytes: Int)

  /** Format dispatch on container magic — the codec registry shape a real
    * JPEG/PNG decoder would slot into. */
  def decode(blob: Array[Byte]): Decoded =
    if (blob.length >= 2 && blob(0) == 'B' && blob(1) == 'M') decodeBmp24(blob)
    else decodePpm(blob)

  /** Feature extraction over DECODED pixels (8-dim): global mean R/G/B/luma
    * plus per-quadrant mean luma — a classic cheap image descriptor. Values
    * are x1000-quantized means, deterministic across platforms (integer
    * arithmetic until the final division).
    */
  def features(img: Decoded): Array[Float] = {
    val w = img.width; val h = img.height; val px = img.pixels
    val sums = new Array[Long](3)         // global R/G/B sums
    val quad = new Array[Long](4)         // per-quadrant luma sums (x1000)
    val quadN = new Array[Long](4)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = (y * w + x) * 3
        val r = px(p) & 0xFF; val g = px(p + 1) & 0xFF; val b = px(p + 2) & 0xFF
        sums(0) += r; sums(1) += g; sums(2) += b
        val luma = 299L * r + 587L * g + 114L * b // x1000 integer luma
        val q = (if (y * 2 >= h) 2 else 0) + (if (x * 2 >= w) 1 else 0)
        quad(q) += luma; quadN(q) += 1
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    val lumaAll = 299L * sums(0) + 587L * sums(1) + 114L * sums(2)
    val out = new Array[Float](8)
    out(0) = (sums(0) * 1000 / n) / 1000.0f
    out(1) = (sums(1) * 1000 / n) / 1000.0f
    out(2) = (sums(2) * 1000 / n) / 1000.0f
    out(3) = (lumaAll / n) / 1000000.0f
    var q = 0
    while (q < 4) { out(4 + q) = (quad(q) / math.max(1L, quadN(q))) / 1000000.0f; q += 1 }
    out
  }

  /** Deterministic 64-bit checksum of a feature vector (bit-exact: folds the
    * IEEE-754 bits, not the float values). The driver-facing query returns
    * this scalar instead of the raw Array[Float] — float arrays are not
    * hashable by the oracle harness — while `features` stays available for
    * internal pipelines (q23-style ANN over the feature column).
    */
  def featureChecksum(feats: Array[Float]): Long = {
    var cs = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < feats.length) {
      cs = (cs ^ java.lang.Float.floatToIntBits(feats(i)).toLong) * 0x100000001B3L
      i += 1
    }
    cs
  }

  /** The multimodal pipeline over the documents table: synthesize blob column
    * -> batched REAL decode (mapPartitions keeps the batch shape; no per-row
    * UDF dispatch) -> metadata struct + feature vector. At 100 TB the blob
    * column lives in parquet; only metadata and features shuffle. The
    * driver-facing output carries a bigint checksum of the feature vector
    * (deterministic, hashable) rather than the raw float array.
    *
    * payload_bytes = decoded RGB byte count (w*h*3), a container-independent
    * definition that the DuckDB oracle recomputes from doc_id alone; the
    * feature checksum (which requires the actual pixel decode) is verified
    * via the dumped output (oracle-the-downstream).
    */
  def pipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
    docs.mapPartitions { it =>
      it.map { case (docId, text) =>
        val blob = synthesizeBlob(docId, text)
        val img = decode(blob)
        val feats = features(img)
        (docId, img.width, img.height, img.channels, img.pixels.length,
          featureChecksum(feats))
      }
    }.toDF("doc_id", "width", "height", "channels", "payload_bytes", "feature_checksum")
      .orderBy("doc_id")
  }
}
