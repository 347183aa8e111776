package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.datasources.{DataSource, LogicalRelation}
import org.apache.spark.sql.types.StructType

/** A v1 streaming `Source.getBatch` must return a DataFrame whose leaf
  * relations carry `isStreaming = true` (MicroBatchExecution splices the
  * plan in place of the StreamingExecutionRelation and asserts the flag),
  * but `spark.read.parquet` builds batch relations. This bridge does what
  * `FileStreamSource.getBatch` does internally — resolve a parquet
  * relation over an explicit file list and wrap it in a streaming-flagged
  * LogicalRelation — which is `private[sql]`, hence the
  * org.apache.spark.sql subpackage (same pattern as [[ColumnBridge]]).
  *
  * Reusing Spark's own parquet relation here (rather than hand-rolling a
  * DSv2 PartitionReader) keeps the vectorized reader, partition-column
  * discovery and whole-stage codegen on the streaming read path — the
  * batch and streaming reads of the table share one scan implementation.
  */
object StreamRelationBridge {
  def streamingParquet(spark: SparkSession, paths: Seq[String],
                       userSchema: Option[StructType], basePath: String): DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val ds = DataSource(cs, className = "parquet", paths = paths,
      userSpecifiedSchema = userSchema, options = Map("basePath" -> basePath))
    Dataset.ofRows(cs,
      LogicalRelation(ds.resolveRelation(checkFilesExist = false), isStreaming = true))
  }
}
