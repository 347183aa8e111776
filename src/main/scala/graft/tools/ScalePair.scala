package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved N-vs-4N scaling measurement in ONE JVM: alternating
  * local[lo] / local[hi] Spark sessions, several rounds, best-of per rung.
  * Separate Bench invocations at different times see different CPU-steal
  * environments, which corrupts the ratio; adjacent alternating runs see the
  * same one. Prints one JSON line with both throughputs and the efficiency
  * (T_hi / T_lo) / (hi / lo).
  */
object ScalePair {
  def main(args: Array[String]): Unit = {
    val lo = sys.env.getOrElse("SPARK_GRAFT_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_HI", "32").toInt
    val rounds = sys.env.getOrElse("SPARK_GRAFT_ROUNDS", "3").toInt
    // sized so the hi-core run takes several seconds: at ~50k turns/s on 32
    // cores a 3000-conv (~60k-turn) input finishes in ~1.3s and fixed
    // startup/scheduling costs depress the measured ratio
    val benchConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "9000").toLong

    def measure(cpus: Int): Double = {
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val turns = graft.spark.Transcripts.generate(spark, benchConvs, cpus * 16)
      val n = graft.spark.Transcripts.generate(spark, benchConvs).count()
      // JIT is shared across sessions in the JVM; small warmup per session
      graft.spark.ExtractionJob.extract(spark,
        graft.spark.Transcripts.generate(spark, 500, cpus * 4))
        .write.mode("overwrite").format("noop").save()
      val t0 = System.nanoTime()
      graft.spark.ExtractionJob.extract(spark, turns)
        .write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.stop()
      n / sec
    }

    measure(lo) // JIT warmup round (discarded)
    val pairs = (1 to rounds).map { r =>
      val tLo = measure(lo)
      val tHi = measure(hi)
      System.err.println(f"[scalepair] round $r: $lo cores $tLo%.0f t/s, $hi cores $tHi%.0f t/s, eff ${tHi / tLo / (hi.toDouble / lo)}%.3f")
      (tLo, tHi)
    }
    val bestLo = pairs.map(_._1).max
    val bestHi = pairs.map(_._2).max
    // best-of-per-rung ratio (least-contended estimate of each rung) plus the
    // per-round efficiencies for transparency
    val effs = pairs.map { case (l, h) => h / l / (hi.toDouble / lo) }
    println(
      f"""{"lo":$lo,"hi":$hi,"rounds":$rounds,"lo_tps":$bestLo%.1f,"hi_tps":$bestHi%.1f,"eff_best":${bestHi / bestLo / (hi.toDouble / lo)}%.3f,"eff_rounds":[${effs.map(e => f"$e%.3f").mkString(",")}]}""")
  }
}
