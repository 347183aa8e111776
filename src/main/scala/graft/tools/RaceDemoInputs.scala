package graft.tools

import org.apache.spark.sql.SparkSession
import graft.spark.{ExtractionJob, Transcripts}

/** Writes the three input tables for the two-process WAP race demo
  * (see BENCH notes): a base corpus, a branch edit touching one
  * bucket-0 conversation, and a head edit touching one bucket-1
  * conversation — so a concurrently-published branch must CHERRY-PICK
  * over the head commit with provably disjoint buckets.
  *
  * Usage: RaceDemoInputs <outRoot> [convs=24]
  * Produces <outRoot>/{base,branch_edit,head_edit} parquet dirs and
  * prints the two victim conversation ids.
  */
object RaceDemoInputs {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RaceDemoInputs <outRoot> [convs]")
    val root = args(0)
    val convs = args.lift(1).map(_.toLong).getOrElse(24L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val turns = Transcripts.generate(spark, convs).collect().toVector
    val ids = turns.map(_.conv_id).distinct.sorted
    def victim(b: Int): String =
      ids.find(c => ExtractionJob.bucketOfConvId(c, 2) == b).getOrElse(sys.error(
        s"no conversation hashes to bucket $b with $convs conversations — raise convs"))
    val vBranch = victim(0)
    val vHead = victim(1)
    spark.createDataset(turns).write.mode("overwrite").parquet(s"$root/base")
    spark.createDataset(turns.map(t =>
      if (t.conv_id == vBranch) t.copy(text = t.text + "\nSuite: 4B") else t))
      .write.mode("overwrite").parquet(s"$root/branch_edit")
    spark.createDataset(turns.map(t =>
      if (t.conv_id == vHead) t.copy(text = t.text + "\nSuite: 9C") else t))
      .write.mode("overwrite").parquet(s"$root/head_edit")
    spark.createDataset(turns.map(t =>
      if (t.conv_id == vHead) t.copy(text = t.text + "\nSuite: 9C")
      else if (t.conv_id == vBranch) t.copy(text = t.text + "\nSuite: 4B") else t))
      .write.mode("overwrite").parquet(s"$root/both_edits")
    println(s"""{"branch_victim":"$vBranch","head_victim":"$vHead","convs":${ids.size}}""")
    spark.stop()
  }
}
