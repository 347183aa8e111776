package graft.tools

/** Dev profiler: per-payload-type extraction throughput, no Spark involved
  * (isolates the row-local core from scheduling/serialization).
  */
object ProfileExtract {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val turns = graft.spark.Transcripts.generate(spark, 800).collect()
    spark.stop()
    val byTool = turns.groupBy(_.tool)
    // warmup
    turns.foreach(t => graft.extract.Extractor.extractTurn(t.text, t.tool))
    byTool.toSeq.sortBy(_._1).foreach { case (tool, ts) =>
      val reps = math.max(1, 20000 / ts.length)
      val t0 = System.nanoTime()
      var r = 0
      while (r < reps) { ts.foreach(t => graft.extract.Extractor.extractTurn(t.text, t.tool)); r += 1 }
      val sec = (System.nanoTime() - t0) / 1e9
      val n = ts.length.toLong * reps
      val chars = ts.map(_.text.length.toLong).sum / ts.length
      println(f"$tool%-28s n=${ts.length}%5d avgChars=$chars%6d turns/s=${n / sec}%9.0f")
    }
  }
}

/** Stage-level profile of the docling_md (main-profile) route. */
object ProfileMainStages {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.spark.Transcripts.generate(spark, 800).collect()
      .filter(_.tool == "docling_md").map(_.text.split("\n", -1).toSeq)
    spark.stop()
    println(s"docs=${docs.length}")
    def time(label: String)(f: Seq[String] => Any): Unit = {
      docs.foreach(f) // warmup
      val t0 = System.nanoTime()
      var r = 0
      while (r < 3) { docs.foreach(f); r += 1 }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label%-34s docs/s=${docs.length * 3 / sec}%9.0f")
    }
    time("full convertToSpec")(l => graft.extract.MainExtractor.convertToSpec(l))
    time("headerFooter clean")(l => graft.extract.HeaderFooterMain.removePracticeHeadersFooters(l))
    val cleaned = docs.map(l => graft.extract.HeaderFooterMain.removePracticeHeadersFooters(l))
    def timeC(label: String)(f: Seq[String] => Any): Unit = {
      cleaned.foreach(f)
      val t0 = System.nanoTime()
      var r = 0
      while (r < 3) { cleaned.foreach(f); r += 1 }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label%-34s docs/s=${cleaned.length * 3 / sec}%9.0f")
    }
    timeC("formClassifier.detectFormType")(l => graft.extract.FormClassifier.detectFormType(l))
    timeC("extractFieldsFromText")(l => graft.extract.MainExtractor.extractFieldsFromText(l))
    timeC("patientInfoMachine.extract")(l => graft.extract.PatientInfoMachine.extract(l))
  }
}

/** Per-helper profile inside the patient-info machine. */
object ProfileMachine {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.spark.Transcripts.generate(spark, 800).collect()
      .filter(_.tool == "docling_md")
      .map(t => graft.extract.HeaderFooterMain.removePracticeHeadersFooters(t.text.split("\n", -1).toSeq).toIndexedSeq)
    spark.stop()
    val totalLines = docs.map(_.length).sum
    println(s"docs=${docs.length} lines=$totalLines")
    def time(label: String)(f: IndexedSeq[String] => Any): Unit = {
      docs.foreach(f)
      val t0 = System.nanoTime()
      var r = 0
      while (r < 3) { docs.foreach(f); r += 1 }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label%-30s docs/s=${docs.length * 3 / sec}%9.0f")
    }
    time("machine.extract")(l => graft.extract.PatientInfoMachine.extract(l))
    time("parseInlineFields/line")(l => l.foreach(graft.extract.MainExtractor.parseInlineFields))
    time("radioLookahead/line")(l => l.indices.foreach(i => graft.extract.PatientInfoMachine.detectRadioOptionsUniversal(l, i)))
  }
}

/** Long-running loop for external stack sampling. */
object ProfileLoop {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val turns = graft.spark.Transcripts.generate(spark, 800).collect()
      .filter(_.tool == "docling_md")
    spark.stop()
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    var n = 0L
    while (System.nanoTime() < deadline) {
      turns.foreach(t => graft.extract.Extractor.extractTurn(t.text, t.tool))
      n += turns.length
    }
    println(s"done $n")
  }
}

/** Loop ONLY the heaviest payload (largest docling_md doc) for sampling. */
object ProfileHot {
  def main(args: Array[String]): Unit = {
    val (tag, text) = graft.spark.Transcripts.payloads
      .filter(_._1 == "docling_md").maxBy(_._2.length)
    println(s"payload $tag ${text.length} chars")
    val deadline = System.nanoTime() + 90L * 1000 * 1000 * 1000
    var n = 0L
    while (System.nanoTime() < deadline) {
      graft.extract.Extractor.extractTurn(text, tag)
      n += 1
    }
    println(s"done $n")
  }
}
