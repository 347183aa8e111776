package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL corpus ingestion — the interchange format public corpus
  * releases ship (Dolma, RedPajama, FineWeb dumps are JSONL.gz): one
  * document object per line, read against the repo's documents-table
  * contract (doc_id BIGINT, text, lang, source, n_chars BIGINT).
  *
  * Design choices, all about NOT losing data silently at 10^9 lines:
  *  - explicit schema (never inference — a schema-inference pass is a
  *    second full read of 100 TB, and one outlier line can silently
  *    widen a column for the whole corpus);
  *  - PERMISSIVE mode with a captured `_corrupt_record` column: a
  *    malformed line becomes a quarantine row, not an exception and not
  *    a silent drop — [[read]] returns clean rows, [[quarantine]] the
  *    bad lines for inspection, [[stats]] the counts to alert on;
  *  - `n_chars` recomputed from `text` when the line omits it (the
  *    field is derivable; a release that ships it wrong should not
  *    poison length analytics) — a shipped value is kept only if it
  *    matches, else recomputed;
  *  - `.gz`/`.zst`-style compression is Spark's text codec layer —
  *    nothing to do here; files split per-line for parallelism on
  *    uncompressed input, per-file on gzip (standard Spark behavior).
  *
  * Scale shape: one scan, row-local projection, no shuffle. The
  * corrupt-capture column is pruned away by Catalyst for callers that
  * never select it.
  */
object CorpusJsonl {

  /** The documents-table contract + the corrupt-capture column. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("_corrupt_record", StringType)))

  private def raw(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Clean documents-shaped rows. A row is clean when it parsed AND
    * carries the two load-bearing fields (doc_id, text); n_chars is
    * recomputed from text unless the shipped value already matches. */
  def read(spark: SparkSession, path: String): DataFrame =
    raw(spark, path)
      .where(col("_corrupt_record").isNull &&
        col("doc_id").isNotNull && col("text").isNotNull)
      .withColumn("n_chars",
        when(col("n_chars") === length(col("text")).cast("long"), col("n_chars"))
          .otherwise(length(col("text")).cast("long")))
      .select("doc_id", "text", "lang", "source", "n_chars")

  /** The lines [[read]] refused, verbatim, for inspection/repair:
    * unparseable JSON plus parseable-but-contractless rows (missing
    * doc_id/text). */
  def quarantine(spark: SparkSession, path: String): DataFrame =
    raw(spark, path)
      .where(col("_corrupt_record").isNotNull ||
        col("doc_id").isNull || col("text").isNull)
      .select(
        coalesce(col("_corrupt_record"),
          to_json(struct(col("doc_id"), col("text"), col("lang"),
            col("source"), col("n_chars")))).as("line"),
        col("_corrupt_record").isNotNull.as("unparseable"))

  /** Ingest health in one row: (clean_rows, corrupt_lines,
    * contractless_rows) — the alert surface; zero silent drops by
    * construction (clean + quarantine partitions the input). */
  def stats(spark: SparkSession, path: String): DataFrame = {
    raw(spark, path).select(
      count(when(col("_corrupt_record").isNull &&
        col("doc_id").isNotNull && col("text").isNotNull, 1)).as("clean_rows"),
      count(col("_corrupt_record")).as("corrupt_lines"),
      count(when(col("_corrupt_record").isNull &&
        (col("doc_id").isNull || col("text").isNull), 1)).as("contractless_rows"))
  }
}
