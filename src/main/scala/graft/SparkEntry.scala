package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: the north-star transcript extraction pipeline — synthesize a
    * deterministic multi-turn transcript table, run the salted, per-turn
    * extraction, return extracted turns. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val turns = graft.spark.Transcripts.generate(spark, numConversations = 200)
    graft.spark.ExtractionJob.extract(spark, turns).toDF()
  }
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = graft.queries.Queries.all
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = graft.queries.Queries.oracles
}
