package graft.ner

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.core.{InputDoc, Mention, SpanOps}

/** Regex/model-NER stand-in — plays the role of the reference's two
  * model NER sources (spacyner/main.py:20-62, tintner/main.py:25-99)
  * with the same annset/type/skip semantics:
  *  - DATE detections set `linking.skip = true`
  *    (reference: spacyner/main.py:51-54, tintner/main.py:39-50);
  *  - other detections go to linking.
  *
  * Patterns are deterministic and engine-owned: ISO/slash dates, and
  * qualifier-noun bigrams (e.g. "fast key") acting as novel-entity
  * surface forms that exercise the NIL path (they never hit the KB).
  * Narrow flatMap, no shuffle.
  */
object RegexNer {

  val AnnSet = "entities_regex"

  private val DateRe =
    raw"\b(\d{4}-\d{2}-\d{2}|\d{1,2}/\d{1,2}/\d{4})\b".r

  private val NovelRe =
    raw"\b(fast|slow|big|small) (key|merge|part|scan|sort|value|row|column|data|line|table|hash|batch|stream|window|vector|group|query|filter|order|join|spark|customer)\b".r

  /** Pure matcher over assembled text: (start, end, type, skip). */
  def findMatches(text: String): Seq[(Int, Int, String, Boolean)] = {
    val lower = text.toLowerCase
    val dates = DateRe.findAllMatchIn(lower)
      .map(m => (m.start, m.end, "DATE", true)).toSeq
    val novel = NovelRe.findAllMatchIn(lower)
      .map(m => (m.start, m.end, "PRODUCT", false)).toSeq
    (dates ++ novel).sortBy(m => (m._1, m._2))
  }

  /** Per-doc mentions from already-assembled text — the unit the
    * one-pass doc prep (Pipeline) composes; [[mentions]] wraps it.
    */
  def docMentions(docId: String, text: String): Seq[Mention] =
    findMatches(text).zipWithIndex.map { case ((s, e, tpe, skip), idx) =>
      Mention(docId, AnnSet, idx + 1, tpe, s, e,
        text.substring(s, e), 0.8, "regex", skip, -1L)
    }

  def mentions(spark: SparkSession, docs: Dataset[InputDoc]): Dataset[Mention] = {
    import spark.implicits._
    docs.flatMap(doc => docMentions(doc.doc_id, SpanOps.assemble(doc.spans)))
  }
}
