package graft.ner

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.core.{InputDoc, Mention, SpanOps}
import graft.fixtures.Gazetteer

/** Gazetteer NER: token-level greedy longest-match of dictionary patterns
  * against the assembled document text.
  *
  * Reference semantics (trie-ner/TrieNER.py:162-191):
  *  - text is lowercased and punctuation/newlines become spaces, with
  *    STRING LENGTH PRESERVED (1 char -> 1 char) so offsets into the
  *    original text stay valid (TrieNER.py:23,137,164);
  *  - at each position keep the LONGEST matching pattern (W2);
  *  - matches starting before the previous match's end are dropped
  *    (greedy left-to-right, TrieNER.py:183-189);
  *  - a pattern with exactly one candidate entity sets `linking.skip`
  *    (TrieNER.py:79-81).
  *
  * Scale notes: the dictionary is broadcast (driver-built, deterministic);
  * the scan is a narrow mapPartitions — no shuffle. At 100 TB this stage
  * is embarrassingly parallel over document partitions.
  */
object TrieNer {

  val AnnSet = "entities_trie"

  /** Length-preserving cleanup: lowercase; punctuation + newline -> ' '. */
  def clean(text: String): String = {
    val sb = new StringBuilder(text.length)
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      sb.append(if (c.isLetterOrDigit) c.toLower else ' ')
      i += 1
    }
    sb.toString
  }

  /** Token spans (start, endExclusive) over the cleaned text, packed as
    * (start << 32 | end) longs — r6: the tuple form allocated one boxed
    * pair per token (~300/doc, every doc, both NER passes).
    */
  def tokenSpans(cleaned: String): Array[Long] = {
    val out = Array.newBuilder[Long]
    var i = 0
    val n = cleaned.length
    while (i < n) {
      while (i < n && cleaned.charAt(i) == ' ') i += 1
      if (i < n) {
        val s = i
        while (i < n && cleaned.charAt(i) != ' ') i += 1
        out += (s.toLong << 32) | i.toLong
      }
    }
    out.result()
  }

  /** Pure matcher: returns (start, end, pattern, ids) greedily
    * left-to-right, longest pattern first at each token position.
    */
  def findMatches(
      text: String,
      patterns: Map[String, Seq[Long]],
      maxTokens: Int): Seq[(Int, Int, String, Seq[Long])] = {
    val cleaned = clean(text)
    val toks = tokenSpans(cleaned)
    // token strings materialized once (r6): the probe key for a
    // (position, len) candidate used to be substring(s, e).split(" +")
    // .mkString(" ") — a regex Pattern compile + split per probe, ~3
    // probes per token position, sampled at ~7% of pipeline task CPU.
    // The key equals the token strings joined by single spaces (s..e
    // spans whole tokens; only inter-token space runs collapse), so
    // join the precomputed tokens instead — same string, no regex.
    val tokStrs = new Array[String](toks.length)
    var k = 0
    while (k < toks.length) {
      tokStrs(k) = cleaned.substring((toks(k) >>> 32).toInt,
        (toks(k) & 0xffffffffL).toInt)
      k += 1
    }
    val out = Seq.newBuilder[(Int, Int, String, Seq[Long])]
    var i = 0
    while (i < toks.length) {
      var matched = false
      var len = math.min(maxTokens, toks.length - i)
      while (!matched && len >= 1) {
        val s = (toks(i) >>> 32).toInt
        val e = (toks(i + len - 1) & 0xffffffffL).toInt
        val pat =
          if (len == 1) tokStrs(i)
          else {
            val sb = new java.lang.StringBuilder(e - s)
            var j = i
            while (j < i + len) {
              if (j > i) sb.append(' ')
              sb.append(tokStrs(j))
              j += 1
            }
            sb.toString
          }
        patterns.get(pat) match {
          case Some(ids) =>
            out += ((s, e, pat, ids))
            i += len
            matched = true
          case None =>
            len -= 1
        }
      }
      if (!matched) i += 1
    }
    out.result()
  }

  /** Per-doc mentions from already-assembled text — the unit the
    * one-pass doc prep (Pipeline) composes; [[mentions]] wraps it.
    */
  def docMentions(docId: String, text: String,
                  patterns: Map[String, Seq[Long]],
                  types: Map[Long, String],
                  maxTokens: Int): Seq[Mention] =
    findMatches(text, patterns, maxTokens).zipWithIndex.map {
      case ((s, e, _, ids), idx) =>
        val single = ids.size == 1
        Mention(
          doc_id = docId,
          annset = AnnSet,
          ann_id = idx + 1,
          mention_type = types(ids.head),
          start = s,
          end = e,
          mention = text.substring(s, e),
          score = 1.0,
          source = "trie",
          skip = single,
          gazetteer_id = if (single) ids.head else -1L)
    }

  /** Distributed stage: InputDoc -> per-source mention rows. */
  def mentions(spark: SparkSession, docs: Dataset[InputDoc]): Dataset[Mention] = {
    import spark.implicits._
    val bcPatterns: Broadcast[Map[String, Seq[Long]]] =
      spark.sparkContext.broadcast(Gazetteer.patterns)
    val bcTypes: Broadcast[Map[Long, String]] =
      spark.sparkContext.broadcast(Gazetteer.byId.map { case (k, v) => k -> v.etype })
    val maxTok = Gazetteer.maxPatternTokens
    docs.flatMap { doc =>
      docMentions(doc.doc_id, SpanOps.assemble(doc.spans),
        bcPatterns.value, bcTypes.value, maxTok)
    }
  }
}
