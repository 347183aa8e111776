package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query plus the
  * flagship transcript-extraction throughput measurement, printing ONE JSON
  * line. Parallelism comes from SPARK_GRAFT_CPUS — the driver (and
  * BENCH/BASELINE.md) runs this at 8 and 32 cores on the same input to
  * evidence the north rule's N-vs-4N scaling efficiency.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val benchConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "3000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // flagship: per-turn extraction throughput over the synthetic table.
    // No cache: generation is a stateless flatMap (~1% of extraction cost)
    // and caching 10^5 row objects only adds GC pressure to the timed run.
    // shuffle-free input: the generator emits pre-partitioned balanced slices
    // (long conversations are uniform over ordinals), so the timed section is
    // generate -> extract -> sink with no exchange.
    def pipeline() = graft.spark.ExtractionJob.extract(spark,
      graft.spark.Transcripts.generate(spark, benchConvs, cpus.toInt * 16))
    val nTurns = graft.spark.Transcripts.generate(spark, benchConvs).count()
    // JIT warmup so the scaling measurement compares steady-state throughput
    graft.spark.ExtractionJob.extract(spark,
      graft.spark.Transcripts.generate(spark, 1500, cpus.toInt * 4))
      .write.mode("overwrite").format("noop").save()
    // best-of-3: this VM shows 15-30% run-to-run noise (steal time); min is
    // the least-contended estimate of the engine's own throughput. When even
    // the three samples spread >2x, the whole window was contended and min-of-3
    // is not enough (BENCH_r04 lesson) — take extra samples before reporting.
    val runSecs0 = (1 to 3).map { _ =>
      time { pipeline().write.mode("overwrite").format("noop").save() }._2
    }
    val extractResampled = runSecs0.max / runSecs0.min > 2.0
    val runSecs =
      if (extractResampled)
        runSecs0 ++ (1 to 2).map { _ =>
          time { pipeline().write.mode("overwrite").format("noop").save() }._2
        }
      else runSecs0
    val extractSec = runSecs.min
    val turnsPerSec = nTurns / extractSec

    // query suite: min-of-3 per query, INTERLEAVED (three full passes over
    // the suite, not three back-to-back runs of each query) so a multi-second
    // CPU-steal spike cannot poison all samples of one query — same noise
    // protocol as the extraction measurement above.
    val names = SparkEntry.queries.keys.toSeq.sorted
    val runs = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    val okMap = scala.collection.mutable.Map[String, Boolean]()
    // one untimed warmup pass first: codegen compilation + JIT for 35
    // queries takes long enough that it bleeds past the first TIMED pass
    // into the second (per-query samples were still falling monotonically
    // at run 3) — the bench measures steady-state execution, like the
    // flagship's explicit warmup above
    for (name <- names)
      try SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch { case scala.util.control.NonFatal(e) => // surfaces again in the timed passes
        System.err.println(s"[bench] $name failed in warmup: ${e.getMessage}")
      }
    for (_ <- 1 to 3; name <- names) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      runs(name) = runs(name) :+ (System.nanoTime() - t0) / 1e9
      okMap(name) = okMap.getOrElse(name, true) && ok
    }
    // steal-outlier guard: a query whose three samples spread >3x was hit by
    // a host contention window — its min may still be contaminated. Give
    // each such query two extra interleaved samples and report them, so the
    // artifact doesn't need after-the-fact noise adjudication.
    val noisy = names.filter(n => okMap(n) && runs(n).min > 0 && runs(n).max / runs(n).min > 3.0)
    for (_ <- 1 to 2; name <- noisy) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED in resample: ${e.getMessage}"); false
        }
      // a failed resample must not contribute a fast bogus minimum — same
      // invariant as the main loop: a throwing query can never masquerade
      // as a fast healthy run
      if (ok) runs(name) = runs(name) :+ (System.nanoTime() - t0) / 1e9
      else okMap(name) = false
    }
    // Whole-suite drift detection (BENCH_r05 lesson: the round artifact
    // showed +10-30% min-of-3 drift on queries whose code hadn't changed —
    // a contended measurement window, only visible by comparing artifacts
    // after the fact). Compare this run's per-query minimums against the
    // most recent prior artifact in BENCH/ at the SAME cpus/sf: if the
    // MEDIAN drift exceeds 10%, the window is suspect — take one more full
    // interleaved pass (keep per-query min over all samples) and report
    // the residual drift + flag in the artifact so it self-annotates.
    val benchDir = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", "BENCH"))
    val qValRe = """"([a-z0-9_]+)":(-?\d+\.\d+)""".r
    def priorMins(): Map[String, Double] = {
      if (!java.nio.file.Files.isDirectory(benchDir)) return Map.empty
      val s = java.nio.file.Files.list(benchDir)
      // newest prior artifact at the SAME core count AND scale factor —
      // an ad-hoc tiny-sf run must never become the drift baseline for
      // the real suite (it would read as ~+900% drift and force the
      // re-pass / flag on a healthy run)
      val prior =
        try s.toArray.map(_.asInstanceOf[java.nio.file.Path])
          .filter { p =>
            val n = p.getFileName.toString
            n.startsWith("bench_") && n.endsWith(s"_c$cpus.json")
          }.sortBy(_.getFileName.toString).reverse
          .find { p =>
            val txt = new String(java.nio.file.Files.readAllBytes(p),
              java.nio.charset.StandardCharsets.UTF_8)
            txt.contains(s""""sf":"$sfDir"""")
          }
        finally s.close()
      prior.map { p =>
        val txt = new String(java.nio.file.Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.UTF_8)
        // restrict to the "queries" object so query_runs arrays don't match
        val qobj = txt.indexOf("\"queries\":{") match {
          case -1 => ""
          case i  => txt.substring(i, txt.indexOf("}", i) + 1)
        }
        qValRe.findAllMatchIn(qobj)
          .map(m => m.group(1) -> m.group(2).toDouble)
          .filter(_._2 > 0) // negative = failed in the prior run
          .toMap
      }.getOrElse(Map.empty)
    }
    def medianDrift(prior: Map[String, Double]): Option[Double] = {
      val ds = names.filter(n => okMap(n) && prior.contains(n))
        .map(n => runs(n).min / prior(n) - 1.0).sorted
      if (ds.size < 5) None // too few common queries to call a window
      else Some(ds(ds.size / 2))
    }
    val prior = priorMins()
    val driftBefore = medianDrift(prior)
    if (driftBefore.exists(_ > 0.10)) {
      System.err.println(f"[bench] median drift ${driftBefore.get * 100}%.1f%% vs prior " +
        "artifact — contended window suspected; taking one more interleaved pass")
      for (name <- names) {
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED in drift re-pass: ${e.getMessage}"); false
          }
        if (ok) runs(name) = runs(name) :+ (System.nanoTime() - t0) / 1e9
        else okMap(name) = false
      }
    }
    val driftAfter = medianDrift(prior)
    val driftJson = driftAfter match {
      case Some(d) =>
        f""","median_drift_vs_prior":$d%.3f,"drift_flag":${d > 0.10}"""
      case None => ""
    }
    // failed queries are reported with negative elapsed plus a failed list so
    // a throwing query can never masquerade as a fast healthy run; the
    // headline total sums ONLY healthy queries (plus extraction) so it stays
    // comparable across runs even when a query fails fast.
    val qs = names.map { k =>
      val best = runs(k).min
      "\"" + k + f"""":${if (okMap(k)) best else -best}%.3f""" }.mkString("{", ",", "}")
    val qruns = names.map { k =>
      "\"" + k + "\":[" + runs(k).map(r => f"$r%.3f").mkString(",") + "]" }
      .mkString("{", ",", "}")
    val failed = names.filterNot(okMap).map("\"" + _ + "\"").mkString("[", ",", "]")
    val resampled = (noisy ++ (if (extractResampled) Seq("extract") else Seq.empty))
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = names.filter(okMap).map(runs(_).min).sum + extractSec
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"query_runs":$qruns,"failed":$failed,"resampled":$resampled$driftJson,"sf":"$sfDir","cpus":$cpus,"extract_turns":$nTurns,"extract_sec":$extractSec%.3f,"extract_runs_sec":[${runSecs.map(r => f"$r%.3f").mkString(",")}],"turns_per_sec":$turnsPerSec%.1f}"""
    println(line)
    // durability: the driver captures stdout's tail, which truncated the
    // round-5 artifact to q26+ — every invocation also writes its full
    // JSON to BENCH/ so no artifact can lose data
    try {
      java.nio.file.Files.createDirectories(benchDir)
      java.nio.file.Files.write(
        benchDir.resolve(f"bench_${System.currentTimeMillis() / 1000}%012d_c$cpus.json"),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] artifact write failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
