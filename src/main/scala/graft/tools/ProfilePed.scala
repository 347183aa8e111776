package graft.tools
import graft.extract._
object ProfilePed {
  def main(args: Array[String]): Unit = {
    val text = graft.spark.Transcripts.payloads(2)._2
    val lines = text.split("\n", -1).toSeq
    def time(name: String)(f: => Any): Unit = {
      (0 until 30).foreach(_ => f)
      val t0 = System.nanoTime()
      (0 until 100).foreach(_ => f)
      println(f"$name: ${(System.nanoTime() - t0) / 100 / 1000}%d us")
    }
    val (ft, fields0) = MainExtractor.extractFieldsFromText(lines)
    var fields = FieldOrdering.ensureRequiredSignatureFields(fields0)
    fields = FieldOrdering.ensureDateSignedField(fields)
    fields = FieldOrdering.orderFields(fields)
    val spec0 = fields.map(SpecAssembly.toSpecQ).toVector
    time("normalizeFieldKeys")(SpecNormalization.normalizeFieldKeys(spec0.map(q => q.copy())))
    time("applyConsentShaping")(ConsentShaping.applyConsentShaping(spec0.map(q => q.copy())))
    time("normalizeTextContent")(SpecNormalization.normalizeTextContent(spec0.map(q => q.copy())))
    time("validateAndNormalize")(MainValidator.validateAndNormalize(spec0.map(q => q.copy())))
  }
}
