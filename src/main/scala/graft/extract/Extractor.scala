package graft.extract

import graft.model._

/** One extracted field span: character offsets into `mainText`. */
final case class Span(field_key: String, start: Int, end: Int)

/** The per-turn extraction result (FIXTURES.md §4 output schema). */
final case class Extracted(
    formType: String,
    mainText: String,
    spans: Vector[Span],
    fieldsJson: String,
    fieldCount: Int,
    sectionCount: Int)

/** The fused per-turn extraction function — SURVEY.md §2's master rule: every
  * per-document operator composes into one pure Scala function applied inside
  * a typed Dataset map, because a document never spans rows.
  */
object Extractor {

  /** Extract one turn's document text (lines separated by '\n').
    *
    * main_text = boilerplate-stripped lines rejoined with '\n' (the analog of
    * the reference's cleaned text_lines view). Spans: form-text fields (whole
    * consent block) cover the full block; labeled fields map to the first
    * occurrence of their title in main_text, (-1,-1) when the title is
    * synthetic (injected signature/date fields).
    */
  def extractTurn(text: String): Extracted = {
    val lines = Option(text).getOrElse("").split("\n", -1).toSeq
    val formType = FormClassifier.detectFormType(lines)
    val cleaned = ConsentExtractor.removePracticeHeadersFooters(lines)
    val mainText = cleaned.map(_.trim).mkString("\n")
    // round-1 routing: all profiles run the consent pipeline (the patient-info
    // machine lands in a later round; formType is still reported faithfully)
    val fields = ConsentExtractor.validateAndNormalize(
      ConsentExtractor.extractFromCleaned(cleaned.toVector, Map.empty))
    val spans = fields.map { f =>
      if (f.fieldType == "text") Span(f.key, 0, mainText.length)
      else {
        val i = if (f.title.nonEmpty) mainText.indexOf(f.title) else -1
        if (i >= 0) Span(f.key, i, i + f.title.length) else Span(f.key, -1, -1)
      }
    }
    Extracted(
      formType = formType,
      mainText = mainText,
      spans = spans,
      fieldsJson = Spec.render(fields, includeOptional = false),
      fieldCount = fields.length,
      sectionCount = fields.map(_.section).distinct.length)
  }
}
