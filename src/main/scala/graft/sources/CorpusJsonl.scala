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
  *  - lines are read as TEXT and parsed with from_json, so the
  *    quarantine keeps every refused line VERBATIM — including fields
  *    outside the contract (a mis-keyed `content` column survives for
  *    repair); a malformed line becomes a quarantine row, not an
  *    exception and not a silent drop. [[read]] returns clean rows,
  *    [[quarantine]] the raw refused lines, [[stats]] counts that
  *    PARTITION the input;
  *  - `n_chars` is always recomputed from `text` (it is derivable, and
  *    a release that ships it wrong must not poison length analytics);
  *  - `.gz` is Spark's text codec layer — nothing to do here; files
  *    split per-line for parallelism on uncompressed input, per-file on
  *    gzip (standard Spark behavior).
  *
  * Scale shape: one scan, row-local parse + projection, no shuffle.
  */
object CorpusJsonl {

  /** The documents-table contract. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** The contract plus a corrupt-capture column: from_json's PERMISSIVE
    * mode does NOT yield a null struct for malformed input (it yields
    * all-null fields, indistinguishable from `{}`), so the capture
    * column is the only reliable unparseable signal. */
  private val parseSchema: StructType = schema.add("_corrupt_record", StringType)

  private def parsed(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .where(length(trim(col("value"))) > 0) // blank lines are not documents
      .withColumn("p", from_json(col("value"), parseSchema,
        java.util.Map.of("mode", "PERMISSIVE",
          "columnNameOfCorruptRecord", "_corrupt_record")))

  private val isUnparseable = col("p._corrupt_record").isNotNull
  private val isClean =
    !isUnparseable && col("p.doc_id").isNotNull && col("p.text").isNotNull

  /** Clean documents-shaped rows: parsed AND carrying the two
    * load-bearing fields (doc_id, text); n_chars recomputed. */
  def read(spark: SparkSession, path: String): DataFrame =
    parsed(spark, path)
      .where(isClean)
      .select(col("p.doc_id").as("doc_id"), col("p.text").as("text"),
        col("p.lang").as("lang"), col("p.source").as("source"),
        length(col("p.text")).cast("long").as("n_chars"))

  /** The lines [[read]] refused, VERBATIM (fields outside the contract
    * survive for repair): unparseable JSON plus parseable-but-
    * contractless rows (missing doc_id/text). */
  def quarantine(spark: SparkSession, path: String): DataFrame =
    parsed(spark, path)
      .where(!isClean)
      .select(col("value").as("line"), isUnparseable.as("unparseable"))

  /** Ingest health in one row: (clean_rows, corrupt_lines,
    * contractless_rows) — the alert surface; clean + quarantine
    * partition the non-blank input exactly, so nothing can vanish
    * between the two. */
  def stats(spark: SparkSession, path: String): DataFrame =
    parsed(spark, path).select(
      count(when(isClean, 1)).as("clean_rows"),
      count(when(isUnparseable, 1)).as("corrupt_lines"),
      count(when(!isUnparseable &&
        (col("p.doc_id").isNull || col("p.text").isNull), 1)).as("contractless_rows"))
}
