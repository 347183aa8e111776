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

/** Per-payload allocation profile (ThreadMXBean allocated-bytes counters). */
object AllocProfile {
  def main(args: Array[String]): Unit = {
    val mx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    val tid = Thread.currentThread().getId
    graft.spark.Transcripts.payloads.foreach { case (tag, text) =>
      (0 until 30).foreach(_ => graft.extract.Extractor.extractTurn(text, tag))
      val n = 100
      val a0 = mx.getThreadAllocatedBytes(tid)
      (0 until n).foreach(_ => graft.extract.Extractor.extractTurn(text, tag))
      val perTurn = (mx.getThreadAllocatedBytes(tid) - a0) / n
      println(f"$tag%-22s ${text.length}%7d chars  ${perTurn / 1024.0}%8.1f KB/turn")
    }
  }
}

/** Stage-level allocation breakdown for the heaviest docling_md payload. */
object AllocStages {
  def main(args: Array[String]): Unit = {
    val mx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    val tid = Thread.currentThread().getId
    val text = graft.spark.Transcripts.payloads.filter(_._1 == "docling_md").maxBy(_._2.length)._2
    val rawLines = text.split("\n", -1).toSeq
    val cleaned = graft.extract.ConsentExtractor.removePracticeHeadersFooters(rawLines)
    val hfLines = graft.extract.HeaderFooterMain.removePracticeHeadersFooters(rawLines)
    val (ft, sub, fields) = graft.extract.MainExtractor.extractFieldsAndClassify(hfLines)
    def alloc(label: String)(f: => Any): Unit = {
      (0 until 30).foreach(_ => f)
      val n = 100
      val a0 = mx.getThreadAllocatedBytes(tid)
      (0 until n).foreach(_ => f)
      println(f"$label%-34s ${(mx.getThreadAllocatedBytes(tid) - a0) / n / 1024.0}%8.1f KB/turn")
    }
    alloc("full extractTurn")(graft.extract.Extractor.extractTurn(text, "docling_md"))
    alloc("split lines")(text.split("\n", -1).toSeq)
    alloc("consent hdr/ftr clean")(graft.extract.ConsentExtractor.removePracticeHeadersFooters(rawLines))
    alloc("mainText join")(cleaned.map(_.trim).mkString("\n"))
    alloc("hf-main clean")(graft.extract.HeaderFooterMain.removePracticeHeadersFooters(rawLines))
    alloc("classify")(graft.extract.FormClassifier.classify(hfLines))
    alloc("extractFieldsAndClassify")(graft.extract.MainExtractor.extractFieldsAndClassify(hfLines))
    alloc("full convertToSpecFull")(graft.extract.MainExtractor.convertToSpecFull(rawLines))
    alloc("PatientInfo.extract")(graft.extract.PatientInfo.extract(hfLines))
  }
}

/** Allocation of machine helpers, summed over the heavy doc's lines. */
object AllocMachine {
  def main(args: Array[String]): Unit = {
    val mx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    val tid = Thread.currentThread().getId
    val text = graft.spark.Transcripts.payloads.filter(_._1 == "docling_md").maxBy(_._2.length)._2
    val lines = graft.extract.HeaderFooterMain.removePracticeHeadersFooters(
      text.split("\n", -1).toSeq).toIndexedSeq
    println(s"lines=${lines.length}")
    def alloc(label: String)(f: => Any): Unit = {
      (0 until 20).foreach(_ => f)
      val n = 50
      val a0 = mx.getThreadAllocatedBytes(tid)
      (0 until n).foreach(_ => f)
      println(f"$label%-34s ${(mx.getThreadAllocatedBytes(tid) - a0) / n / 1024.0}%8.1f KB/doc")
    }
    alloc("machine.extract")(graft.extract.PatientInfoMachine.extract(lines))
    alloc("radioUniversal/all lines")(lines.indices.foreach(i =>
      graft.extract.PatientInfoMachine.detectRadioOptionsUniversal(lines, i)))
    alloc("parseInlineFields/all lines")(lines.foreach(graft.extract.MainExtractor.parseInlineFields))
    alloc("lowers copy")(lines.map(_.toLowerCase))
    alloc("collectCheckboxRun/all")(lines.indices.foreach(i =>
      graft.extract.PatientInfoMachine.collectCheckboxRun(lines, i)))
  }
}

/** Allocation of the tail stages: spec render + spans. */
object AllocTail {
  def main(args: Array[String]): Unit = {
    val mx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    val tid = Thread.currentThread().getId
    val text = graft.spark.Transcripts.payloads.filter(_._1 == "docling_md").maxBy(_._2.length)._2
    val rawLines = text.split("\n", -1).toSeq
    val (ft, sub, spec) = graft.extract.MainExtractor.convertToSpecFull(rawLines)
    val tree = graft.model.JArr(spec.map(_.render))
    def alloc(label: String)(f: => Any): Unit = {
      (0 until 20).foreach(_ => f)
      val n = 50
      val a0 = mx.getThreadAllocatedBytes(tid)
      (0 until n).foreach(_ => f)
      println(f"$label%-34s ${(mx.getThreadAllocatedBytes(tid) - a0) / n / 1024.0}%8.1f KB/doc")
    }
    alloc("spec.map(_.render) tree")(graft.model.JArr(spec.map(_.render)))
    alloc("Json.render(tree)")(graft.model.Json.render(tree))
    alloc("full extractTurn")(graft.extract.Extractor.extractTurn(text, "docling_md"))
  }
}

/** Loop the heaviest consent_txt payload for sampling. */
object ProfileHotConsent {
  def main(args: Array[String]): Unit = {
    val (tag, text) = graft.spark.Transcripts.payloads
      .filter(_._1 == "consent_txt").maxBy(_._2.length)
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

/** Time applyPlaceholders and friends on the heavy consent content. */
object ConsentStageBench {
  def main(args: Array[String]): Unit = {
    val text = graft.spark.Transcripts.payloads.filter(_._1 == "consent_txt").maxBy(_._2.length)._2
    val lines = text.split("\n", -1).toSeq
    // rebuild the content string the way createEnhancedConsentHtml does
    val lower = text.toLowerCase
    Seq("patient", "print", "dob", "date", "planned", "diagnosis", "alternative").foreach(a =>
      println(s"anchor '$a' present: ${lower.contains(a)}"))
    def time(label: String)(f: => Any): Unit = {
      (0 until 50).foreach(_ => f)
      val n = 200
      val t0 = System.nanoTime()
      (0 until n).foreach(_ => f)
      println(f"$label%-36s ${(System.nanoTime() - t0) / 1000.0 / n}%8.1f us/call")
    }
    time("applyPlaceholders(text)")(graft.extract.ConsentExtractor.applyPlaceholders(text))
    time("full extractTurn")(graft.extract.Extractor.extractTurn(text, "consent_txt"))
  }
}

/** Loop the heaviest docx payload for sampling. */
object ProfileHotDocx {
  def main(args: Array[String]): Unit = {
    val (tag, text) = graft.spark.Transcripts.payloads
      .filter(_._1 == "docx").maxBy(_._2.length)
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

/** Direct allocation measurement of the Text3 formatters on the heavy
  * payload's actual text_3 content (reconstructed the way the machine's
  * second pass does).
  */
object AllocText3 {
  def main(args: Array[String]): Unit = {
    val mx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    val tid = Thread.currentThread().getId
    val text = graft.spark.Transcripts.payloads.filter(_._1 == "docling_md").maxBy(_._2.length)._2
    val lines = graft.extract.HeaderFooterMain.removePracticeHeadersFooters(
      text.split("\n", -1).toSeq).toIndexedSeq
    val lowers = lines.map(_.toLowerCase)
    val start = lines.indices.find(i =>
      lowers(i).contains("patient responsibilities") && lines(i).trim.length > 30)
    println(s"text_3 start line: $start  v2=${start.map(i => graft.extract.Text3Formatter.isV2(lines(i))).getOrElse(false)}")
    val content = scala.collection.mutable.ArrayBuffer[String]()
    start.foreach { s0 =>
      var j = s0
      var stop = false
      while (j < lines.length && !stop) {
        val cur = lines(j).trim
        val curLower = lowers(j).trim
        if ((curLower.contains("read") && curLower.contains("agree")) ||
            (curLower.contains("signature") && cur.contains("___")) ||
            (curLower.contains("authorize") && curLower.contains("yes") && curLower.contains("no")))
          stop = true
        else { if (cur.nonEmpty && cur.length > 10) content += cur; j += 1 }
      }
    }
    val fullText = content.mkString(" ")
    println(s"fullText chars: ${fullText.length} isV2=${graft.extract.Text3Formatter.isV2(fullText)}")
    def alloc(label: String)(f: => Any): Unit = {
      (0 until 50).foreach(_ => f)
      val n = 200
      val a0 = mx.getThreadAllocatedBytes(tid)
      (0 until n).foreach(_ => f)
      println(f"$label%-34s ${(mx.getThreadAllocatedBytes(tid) - a0) / n / 1024.0}%8.1f KB/call")
    }
    alloc("formatHtml")(graft.extract.Text3Formatter.formatHtml(fullText))
    alloc("formatTemporaryHtml")(graft.extract.Text3Formatter.formatTemporaryHtml(fullText))
  }
}

/** Steal-immune throughput: per-payload CPU-ns/turn via
  * ThreadMXBean.getCurrentThreadCpuTime (wall-clock noise from host
  * contention does not move this number). Reports per-route turns/s-of-CPU
  * and the payload-mix aggregate — the honest single-core capacity.
  */
object CpuBench {
  def main(args: Array[String]): Unit = {
    val mx = java.lang.management.ManagementFactory.getThreadMXBean
    require(mx.isCurrentThreadCpuTimeSupported)
    val payloads = graft.spark.Transcripts.payloads
    // warmup: everything JITs
    (0 until 200).foreach(_ => payloads.foreach { case (tag, text) =>
      graft.extract.Extractor.extractTurn(text, tag) })
    var mixCpu = 0.0
    payloads.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (tag, ps) =>
      var cpuPerTurn = 0.0
      ps.foreach { case (_, text) =>
        val reps = math.max(50, 200000 / math.max(1, text.length))
        val t0 = mx.getCurrentThreadCpuTime
        (0 until reps).foreach(_ => graft.extract.Extractor.extractTurn(text, tag))
        val per = (mx.getCurrentThreadCpuTime - t0).toDouble / reps
        println(f"  $tag%-20s ${text.length}%7d ch ${per / 1000.0}%9.1f us-cpu/turn")
        cpuPerTurn += per
      }
      cpuPerTurn /= ps.length
      mixCpu += cpuPerTurn * ps.length
      println(f"$tag%-22s ${cpuPerTurn / 1000.0}%9.1f us-cpu/turn  ${1e9 / cpuPerTurn}%9.0f turns/s-cpu")
    }
    val mixAvg = mixCpu / payloads.length
    println(f"MIX (uniform payloads)  ${mixAvg / 1000.0}%9.1f us-cpu/turn  ${1e9 / mixAvg}%9.0f turns/s-cpu")
  }
}
