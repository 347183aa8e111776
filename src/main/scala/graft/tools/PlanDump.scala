package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the executed plan of one SparkEntry query (dev tool). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q14_minhash_lsh")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    // "exec": run the query first so the ADAPTIVE final plan (with runtime
    // exchange reuse) is printed instead of the initial static plan
    if (args.lift(1).contains("exec")) df.collect()
    println(df.queryExecution.executedPlan.toString.linesIterator.take(120).mkString("\n"))
    spark.stop()
  }
}
