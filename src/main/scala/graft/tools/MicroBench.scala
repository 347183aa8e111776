package graft.tools
object MicroBench {
  def main(args: Array[String]): Unit = {
    val texts = graft.spark.Transcripts.payloads.map(_._2)
    (0 until 500).foreach(i => graft.extract.Extractor.extractTurn(texts(i % texts.size)))
    val n = 3000
    val t0 = System.nanoTime()
    var acc = 0L
    (0 until n).foreach { i => acc += graft.extract.Extractor.extractTurn(texts(i % texts.size)).fieldsJson.length }
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"extractTurn: ${n / sec}%.0f turns/s/core ($acc)")
    def bench(name: String)(f: String => Any): Unit = {
      (0 until 300).foreach(i => f(texts(i % texts.size)))
      val t = System.nanoTime()
      (0 until n).foreach(i => f(texts(i % texts.size)))
      println(f"$name: ${n / ((System.nanoTime() - t) / 1e9)}%.0f per_s")
    }
    bench("classify")(t => graft.extract.FormClassifier.detectFormType(t.split("\n", -1).toSeq))
    bench("convertFields")(t => graft.extract.ConsentExtractor.convertFields(t.split("\n", -1).toSeq))
    val pre = texts.map(t => graft.extract.ConsentExtractor.convertFields(t.split("\n", -1).toSeq))
    bench("renderOnly")(t => graft.model.Spec.render(pre(t.length % pre.size), includeOptional = false))
    bench("cleanLines")(t => graft.extract.ConsentExtractor.removePracticeHeadersFooters(t.split("\n", -1).toSeq))
  }
}
