package graft.fixtures

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.core.{InputDoc, Span, SpanOps}

/** Deterministic interleaved-span corpus (the BASELINE.json input_hint
  * shape) derived from the driver-generated `documents` parquet table —
  * no external data, no randomness beyond the table itself.
  *
  * Construction rules (pure functions of (doc_id, text)):
  *  - the text splits into two text spans at the first space at/after the
  *    midpoint (single span if none);
  *  - docs with doc_id % 3 == 0 get a media span between the two text
  *    spans (media_ref = "media://img/<doc_id>");
  *  - docs with doc_id % 5 == 0 get a trailing media span
  *    (media_ref = "media://vid/<doc_id>").
  * Offsets are the char offsets in the assembled text (media spans occupy
  * zero chars). The pipeline must preserve the (kind, text, media_ref,
  * order) sequence exactly (span-sequence invariant, BASELINE.json:15).
  */
object Corpus {

  def splitPoint(text: String): Int = {
    val mid = text.length / 2
    val i = text.indexOf(' ', mid)
    if (i < 0) text.length else i + 1 // split AFTER the space, keep both non-empty-ish
  }

  def spansFor(docId: Long, text: String): Seq[Span] = {
    val sp = splitPoint(text)
    val head = text.substring(0, sp)
    val tail = text.substring(sp)
    val b = Seq.newBuilder[Span]
    b += Span("text", head, "", 0)
    if (docId % 3 == 0) b += Span("media", "", s"media://img/$docId", 0)
    if (tail.nonEmpty) b += Span("text", tail, "", 0)
    if (docId % 5 == 0) b += Span("media", "", s"media://vid/$docId", 0)
    SpanOps.withOffsets(b.result())
  }

  /** The input table: Dataset[InputDoc] over the sf directory. */
  def inputDocs(spark: SparkSession, dir: String): Dataset[InputDoc] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
      .as[(Long, String)]
      .map { case (id, text) => InputDoc(id.toString, spansFor(id, text)) }
  }
}
