package graft.spark

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import java.nio.file.{Files, Path}

/** Shared helpers for PARTITIONED PARQUET STATE directories maintained by
  * the incremental operators (StreamingCurate's hb= state/curated dirs,
  * IncrementalNearDup's bp= band index) and for recursive deletes across
  * the table format. One definition so the quirks live in one place:
  * an empty partitionBy write emits only _SUCCESS (unreadable — schema
  * inference fails), and partition REPLACEMENT must be
  * materialize-then-delete-then-append because dynamic partition
  * overwrite skips partitions that emptied, leaking stale rows. */
private[graft] object StateDirs {

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally s.close()
    }

  /** True when the dir holds at least one `<partCol>=` partition dir. */
  def hasPartitions(dir: Path, partCol: String): Boolean =
    Files.isDirectory(dir) && {
      val s = Files.list(dir)
      try s.toArray.exists(
        _.asInstanceOf[Path].getFileName.toString.startsWith(partCol + "="))
      finally s.close()
    }

  /** The `values` partitions of `dir`, or `emptyLike` when the dir has
    * never been written (partition pruning keeps the read batch-sized). */
  def readPartitioned(spark: SparkSession, dir: Path, partCol: String,
                      values: Seq[Int], emptyLike: => DataFrame): DataFrame =
    if (!hasPartitions(dir, partCol)) emptyLike
    else spark.read.parquet(dir.toString)
      .where(col(partCol).isin(values.map(Integer.valueOf): _*))

  /** Rewrite exactly the `values` partitions of `dir` with `rows` — the
    * caller MUST have materialized `rows` (localCheckpoint) because they
    * were typically read from the very dirs deleted here. Replaces
    * emptied partitions too. */
  def replacePartitions(dir: Path, partCol: String, values: Seq[Int],
                        rows: DataFrame): Unit = {
    values.foreach(v => deleteRecursively(dir.resolve(s"$partCol=$v")))
    if (!rows.isEmpty)
      rows.write.mode(SaveMode.Append).partitionBy(partCol).parquet(dir.toString)
  }
}
