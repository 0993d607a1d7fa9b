package graft.core

/** Core data model of the KB-population engine.
  *
  * Shapes follow the reference's GateNLP document model
  * (reference: documents/src/models/document.js:5-15,
  * documents/src/models/annotation.js:11-18) re-expressed as typed Spark
  * rows, and the target input-table shape from BASELINE.json:15:
  * `(doc_id string, spans array<struct<kind,text,media_ref,offset>>)`.
  *
  * All offsets are Python-style end-EXCLUSIVE, matching the reference's
  * `offset_type: "p"` convention (reference:
  * merge-annotation-sets/merge_sets.py:140).
  */

/** One span of an interleaved document. `kind` is "text" or "media";
  * text spans carry `text` (media_ref empty), media spans carry
  * `media_ref` (text empty). `offset` = char offset of this span in the
  * assembled text (media spans occupy zero chars).
  */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** The input-table row (BASELINE.json input_hint shape, exact). */
final case class InputDoc(doc_id: String, spans: Seq[Span])

/** A detected entity mention, normalized out of the per-document
  * annotation sets (reference Annotation:
  * documents/src/models/annotation.js:11-18). One row per
  * (doc_id, annset, ann_id).
  */
final case class Mention(
    doc_id: String,
    annset: String,
    ann_id: Int,
    mention_type: String,
    start: Int,
    end: Int,
    mention: String,
    score: Double,
    source: String,
    skip: Boolean,          // reference `linking.skip`
    gazetteer_id: Long      // >=0 when a single-candidate gazetteer hit, else -1
)

/** An entity-link candidate for a mention (reference indexer candidate
  * dict: indexer/main.py:175-182).
  */
final case class Candidate(
    doc_id: String,
    annset: String,
    ann_id: Int,
    entity_id: Long,
    indexer: Int,
    title: String,
    entity_type: String,
    score: Double,
    norm_score: Double,
    rank: Int
)

/** Entity-registry row (reference: postgres/init.sql:1-11 + embedding
  * column replacing the external FAISS index).
  */
final case class EntityRecord(
    id: Long,
    indexer: Int,
    wikipedia_id: Long,
    wikidata_qid: Long,
    redirects_to: Long,
    title: String,
    descr: String,
    type_ : String,
    emb: Array[Float]
)

/** A knowledge-graph triple — the engine's headline output
  * (north rule: emitted (subj, pred, obj) set).
  */
final case class Triple(doc_id: String, subj: String, pred: String, obj: String)

/** NIL-cluster record (reference cluster shape:
  * nilcluster/Packages/TimeEvolving.py:119-124 + id at
  * nilcluster/main.py:110-113).
  */
final case class ClusterRecord(
    cluster_id: Long,
    title: String,
    cluster_type: String,
    nelements: Int,
    mention_keys: Seq[String],
    center: Array[Float]
)

object SpanOps {
  /** Assemble the document text from its spans: concatenation of
    * kind='text' spans in array order. Media spans contribute no chars.
    * Inverse of the invariant check below.
    */
  def assemble(spans: Seq[Span]): String = {
    val sb = new StringBuilder
    spans.foreach { s => if (s.kind == "text") sb.append(s.text) }
    sb.toString
  }

  /** Canonical (kind, text, media_ref, order) sequence used by the
    * span-sequence invariant (BASELINE.json:15): the pipeline must emit
    * per row exactly the sequence it ingested.
    */
  def invariantSeq(spans: Seq[Span]): Seq[(String, String, String, Int)] =
    spans.zipWithIndex.map { case (s, i) => (s.kind, s.text, s.media_ref, i) }

  /** Recompute offsets so span k's offset equals the number of text chars
    * before it — normalizing generator inputs.
    */
  def withOffsets(spans: Seq[Span]): Seq[Span] = {
    var off = 0
    spans.map { s =>
      val out = s.copy(offset = off)
      if (s.kind == "text") off += s.text.length
      out
    }
  }
}
