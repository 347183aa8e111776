package graft.tools
object PayloadBench {
  def main(args: Array[String]): Unit = {
    graft.spark.Transcripts.payloads.foreach { case (tag, text) =>
      // warmup
      (0 until 20).foreach(_ => graft.extract.Extractor.extractTurn(text, tag))
      val n = 200
      val t0 = System.nanoTime()
      (0 until n).foreach(_ => graft.extract.Extractor.extractTurn(text, tag))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$tag%-22s ${text.length}%7d chars  ${n / sec}%8.1f turns/s/core")
    }
  }
}
