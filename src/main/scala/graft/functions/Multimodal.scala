package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder brief): image/audio/video as opaque
  * `binary` columns with typed metadata, batch-shaped decode/feature-extract.
  *
  * The decode step is STUBBED deterministically — the real image/audio codecs
  * are not in this container — but the Spark-side contract is real: schema
  * (blob + metadata struct), partition-preserving batched processing via
  * mapPartitions (the Scala analog of mapInPandas' batch shape), and a
  * fixed-width feature vector per asset. Swapping the stub for a real codec
  * changes only `decodeStub`.
  */
object Multimodal {

  /** Deterministic fake "media blob" derived from a document: a 16-byte
    * header (magic, width, height, channels) + payload bytes. Stands in for
    * real image bytes so the pipeline is testable end-to-end.
    */
  def synthesizeBlob(docId: Long, text: String): Array[Byte] = {
    val width = 64 + (docId % 8).toInt * 16
    val height = 48 + (docId % 5).toInt * 16
    val channels = 3
    val payload = text.take(256).getBytes("UTF-8")
    val bb = java.nio.ByteBuffer.allocate(16 + payload.length)
    bb.putInt(0x4D494D47) // "MIMG"
    bb.putInt(width); bb.putInt(height); bb.putInt(channels)
    bb.put(payload)
    bb.array()
  }

  final case class MediaMeta(width: Int, height: Int, channels: Int, bytes: Int)

  /** STUB decode: parse the synthetic header. A real decoder (JPEG, PNG...)
    * drops in here with the same signature.
    */
  def decodeStub(blob: Array[Byte]): MediaMeta = {
    val bb = java.nio.ByteBuffer.wrap(blob)
    val magic = bb.getInt
    require(magic == 0x4D494D47, "unknown media magic")
    MediaMeta(bb.getInt, bb.getInt, bb.getInt, blob.length - 16)
  }

  /** STUB feature extraction: fixed-width (8-dim) feature vector from a
    * rolling hash over payload bytes — deterministic, codec-independent
    * plumbing for the embedding column contract (Array[Float]).
    */
  def featuresStub(blob: Array[Byte], dim: Int = 8): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 0x9E3779B97F4A7C15L
    var i = 16
    while (i < blob.length) {
      h = (h ^ blob(i)) * 0x100000001B3L
      out((i - 16) % dim) += ((h >>> 32).toInt % 1000) / 1000.0f
      i += 1
    }
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
    * -> batched decode (mapPartitions keeps the batch shape; no per-row UDF
    * dispatch) -> metadata struct + feature vector. At 100 TB the blob column
    * lives in parquet; only metadata and features shuffle. The driver-facing
    * output carries a bigint checksum of the feature vector (deterministic,
    * hashable) rather than the raw float array.
    */
  def pipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
    docs.mapPartitions { it =>
      it.map { case (docId, text) =>
        val blob = synthesizeBlob(docId, text)
        val meta = decodeStub(blob)
        val feats = featuresStub(blob)
        (docId, meta.width, meta.height, meta.channels, meta.bytes,
          featureChecksum(feats))
      }
    }.toDF("doc_id", "width", "height", "channels", "payload_bytes", "feature_checksum")
      .orderBy("doc_id")
  }
}
