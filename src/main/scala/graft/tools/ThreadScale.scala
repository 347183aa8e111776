package graft.tools
/** Raw thread-scaling probe for extractTurn (no Spark): isolates core-function
  * scaling from Spark scheduling/encoding overhead. */
object ThreadScale {
  def main(args: Array[String]): Unit = {
    val texts = graft.spark.Transcripts.payloads.map(_._2)
    def run(threads: Int, perThread: Int): Double = {
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { tid =>
        new Thread(() => {
          var i = 0
          while (i < perThread) {
            graft.extract.Extractor.extractTurn(texts((tid + i) % texts.size))
            i += 1
          }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      threads.toLong * perThread / ((System.nanoTime() - t0) / 1e9)
    }
    run(4, 500) // warmup
    Seq(1, 8, 16, 32).foreach { n =>
      val tps = run(n, 3000)
      println(f"threads=$n%2d  ${tps}%.0f turns/s  (${tps / n}%.0f per thread)")
    }
  }
}
