package graft.extract

import graft.model._

/** One extracted field span: character offsets into `mainText`. */
final case class Span(field_key: String, start: Int, end: Int)

/** The per-turn extraction result (FIXTURES.md §4 output schema).
  * fieldSections carries the (key, section) pair per extracted field in
  * output order — the granularity the per-field dump queries (q33/q34)
  * expose so count aggregations can be oracled downstream. */
final case class Extracted(
    formType: String,
    formSubtype: String,
    mainText: String,
    spans: Vector[Span],
    fieldsJson: String,
    fieldCount: Int,
    sectionCount: Int,
    fieldSections: Vector[(String, String)])

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
  /** Per-field view of one turn's extraction: (form_type, (key, section)
    * pairs in output order). Runs the identical pipeline as extractTurn —
    * used by the q34 per-field dump so the driver's DuckDB oracle can
    * independently re-aggregate q21's field/section counts.
    */
  def extractTurnFields(text: String, tool: String = "consent_txt"): (String, Vector[(String, String)]) = {
    val e = extractTurn(text, tool)
    (e.formType, e.fieldSections)
  }

  def extractTurn(text: String, tool: String = "consent_txt"): Extracted = {
    // payload tags: "<profile>" or "<wrapper>:<profile>" where wrapper is
    // html (boilerplate-wrapped markup -> streaming tokenizer + density
    // strip) or pdf_runs (layout runs -> XY-cut reading order)
    val (wrapper, profile) = Option(tool).getOrElse("").split(":", 2) match {
      case Array(w, pr) if w == "html" || w == "pdf_runs" => (w, pr)
      case _ => ("", Option(tool).getOrElse(""))
    }
    val raw = Option(text).getOrElse("")
    val lines: Seq[String] = wrapper match {
      case "html" => graft.parse.Html.extractLines(raw)
      case "pdf_runs" => graft.parse.XYCut.toLines(graft.parse.XYCut.parseRuns(raw))
      case _ => raw.split("\n", -1).toSeq
    }
    // profile dispatch mirrors the reference's entry points: the consent
    // converter (consent_converter.py) vs the main monolith
    // (pdf_to_json_converter.py); the payload tag selects the profile, the
    // main profile then routes internally by detected form type. main_text
    // uses each profile's own cleaned-lines view: the main route reuses the
    // lines convertToSpecFull already cleaned (its scan-stage cleaner), the
    // consent/docx routes the consent cleaner — one cleaning pass per turn
    // either way, and spans index the text their fields were extracted from.
    val (formType, formSubtype, fields, json, mainLines) =
      if (profile == "docx") {
        val cleaned = ConsentExtractor.removePracticeHeadersFooters(lines)
        val (fis, json) = EnhancedDocxConsent.convertFields(lines)
        val (ft, sub) = FormClassifier.classify(lines)
        (ft, sub, fis, json, cleaned)
      } else if (profile == "docling_md" || profile == "main") {
        // subtype comes from the same joined lowercase text as the form type
        // inside convertToSpecFull — no second whole-document join per turn
        val (ft, sub, spec, cleanedLines) = MainExtractor.convertToSpecFullWithLines(lines)
        val fis = spec.map(q => FieldInfo(q.key, q.title, q.fieldType, q.section,
          q.optional, q.control, q.lineIdx))
        (ft, sub, fis, graft.extract.SpecRender.renderArray(spec), cleanedLines)
      } else {
        val cleaned = ConsentExtractor.removePracticeHeadersFooters(lines)
        val (ft, sub) = FormClassifier.classify(lines)
        val fis = ConsentExtractor.validateAndNormalize(
          ConsentExtractor.extractFromCleaned(cleaned.toVector, Map.empty))
        (ft, sub, fis, Spec.render(fis, includeOptional = false), cleaned)
      }
    val mainText = StrUtil.joinTrimmed(mainLines, '\n')
    // per-title occurrence cursor: the second field labeled "Date:" maps to
    // the second occurrence in main_text, not an alias of the first; a field
    // whose title has no FURTHER occurrence falls back to the first one
    // (previous behavior for over-shared titles)
    val titleCursor = scala.collection.mutable.HashMap.empty[String, Int]
    val spans = fields.map { f =>
      if (f.fieldType == "text") Span(f.key, 0, mainText.length)
      else if (f.title.isEmpty) Span(f.key, -1, -1)
      else {
        val from = titleCursor.getOrElse(f.title, 0)
        val next = mainText.indexOf(f.title, from)
        if (next >= 0) titleCursor(f.title) = next + f.title.length
        val i = if (next >= 0 || from == 0) next else mainText.indexOf(f.title)
        if (i >= 0) Span(f.key, i, i + f.title.length) else Span(f.key, -1, -1)
      }
    }
    Extracted(
      formType = formType,
      formSubtype = formSubtype,
      mainText = mainText,
      spans = spans,
      fieldsJson = json,
      fieldCount = fields.length,
      sectionCount = fields.map(_.section).distinct.length,
      fieldSections = fields.map(f => (f.key, f.section)))
  }
}
