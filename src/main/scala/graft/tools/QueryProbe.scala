package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timing probe under the exact Bench session settings:
  * `runMain graft.tools.QueryProbe <queryName>[,<queryName>...] [reps]`.
  * Reports every sample + min so steal outliers are visible, not hidden.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q14_minhash_lsh").split(",").toSeq
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = graft.SparkEntry.queries
    for (_ <- 1 to 2; n <- names) // warmup pass over all probed queries
      qs(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
    // interleaved like Bench (rep-major), so cross-query GC/cache context
    // is reproduced when several names are probed together
    val acc = scala.collection.mutable.Map[String, Vector[Double]]().withDefaultValue(Vector.empty)
    for (_ <- 1 to reps; n <- names) {
      val t0 = System.nanoTime()
      qs(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
      acc(n) = acc(n) :+ (System.nanoTime() - t0) / 1e9
    }
    for (n <- names) {
      val samples = acc(n)
      println(f"$n%-24s min=${samples.min}%.3f samples=${samples.map(s => f"$s%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
