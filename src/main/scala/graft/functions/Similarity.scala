package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Similarity / distance kernels used by linking and NIL clustering.
  *
  * Semantics mirror the reference (citations inline); implementations are
  * plain Scala (no Python, no external libs). Hot vector kernels are also
  * exposed as pure-Column expressions (codegen'd by Catalyst) so the
  * candidate-scoring path stays inside whole-stage codegen.
  */
object Similarity {

  /** Token-set Jaccard on lowercase whitespace tokens
    * (reference: nilpredictor/main.py:15,167-172, qval=None => word tokens).
    *
    * r6: hand-rolled tokenizer + small-array set ops. The previous
    * `split("\\s+").toSet` shape compiled a regex Pattern per call (twice)
    * and allocated two HashSets per pair — sampled at ~7% of the whole
    * pipeline's task CPU (it runs once per surviving candidate). Java's
    * `\s` is exactly [ \t\n\x0B\f\r], so the scan below produces the
    * identical token set; the pairwise loops are over a handful of tokens.
    */
  private def isRegexWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Distinct lowercased whitespace-delimited tokens, in first-seen order. */
  private def distinctTokens(s: String): Array[String] = {
    val lower = s.toLowerCase
    val out = new scala.collection.mutable.ArrayBuffer[String](4)
    var i = 0
    val n = lower.length
    while (i < n) {
      while (i < n && isRegexWs(lower.charAt(i))) i += 1
      val st = i
      while (i < n && !isRegexWs(lower.charAt(i))) i += 1
      if (i > st) {
        val t = lower.substring(st, i)
        var k = 0
        var dup = false
        while (k < out.length && !dup) { if (out(k) == t) dup = true; k += 1 }
        if (!dup) out += t
      }
    }
    out.toArray
  }

  def jaccardTokens(a: String, b: String): Double = {
    val ta = distinctTokens(a)
    val tb = distinctTokens(b)
    if (ta.isEmpty && tb.isEmpty) 1.0
    else {
      var inter = 0
      var i = 0
      while (i < ta.length) {
        var j = 0
        var found = false
        while (j < tb.length && !found) { if (ta(i) == tb(j)) found = true; j += 1 }
        if (found) inter += 1
        i += 1
      }
      val u = ta.length + tb.length - inter
      if (u == 0) 0.0 else inter.toDouble / u
    }
  }

  /** Plain Levenshtein distance (iterative two-row DP). */
  def levenshtein(a: String, b: String): Int = {
    if (a.isEmpty) return b.length
    if (b.isEmpty) return a.length
    var prev = Array.tabulate(b.length + 1)(identity)
    var cur = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      cur(0) = i
      var j = 1
      while (j <= b.length) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(b.length)
  }

  /** Normalized Levenshtein similarity `1 - lev/max(len)`
    * (reference: nilpredictor/main.py:16,173-177).
    */
  def levenshteinSim(a: String, b: String): Double = {
    val m = math.max(a.length, b.length)
    if (m == 0) 1.0 else 1.0 - levenshtein(a, b).toDouble / m
  }

  /** Damerau-Levenshtein distance (optimal string alignment variant:
    * adjacent transposition counted as one edit).
    */
  def damerauLevenshtein(a: String, b: String): Int = {
    if (a.isEmpty) return b.length
    if (b.isEmpty) return a.length
    val d = Array.ofDim[Int](a.length + 1, b.length + 1)
    var i = 0
    while (i <= a.length) { d(i)(0) = i; i += 1 }
    var j = 0
    while (j <= b.length) { d(0)(j) = j; j += 1 }
    i = 1
    while (i <= a.length) {
      j = 1
      while (j <= b.length) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        var v = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1), d(i - 1)(j - 1) + cost)
        if (i > 1 && j > 1 && a.charAt(i - 1) == b.charAt(j - 2) &&
            a.charAt(i - 2) == b.charAt(j - 1))
          v = math.min(v, d(i - 2)(j - 2) + 1)
        d(i)(j) = v
        j += 1
      }
      i += 1
    }
    d(a.length)(b.length)
  }

  /** The reference's clustering string metric with the short-token
    * penalty (reference: nilcluster/main.py:57-65, lowercased inputs):
    * if either token is shorter than 4 chars — equal tokens => 0, else
    * distance + 3; otherwise plain Damerau-Levenshtein.
    * The penalty rule is load-bearing for cluster shape.
    */
  def damLevMetric(x: String, y: String): Double = {
    val a = x.toLowerCase
    val b = y.toLowerCase
    if (a.length < 4 || b.length < 4) {
      if (a == b) 0.0 else damerauLevenshtein(a, b).toDouble + 3.0
    } else damerauLevenshtein(a, b).toDouble
  }

  /** Normalized form of [[damLevMetric]] used as an epsilon-graph edge
    * weight: metric / max(len). The reference's stage-1 threshold 0.2
    * (nilcluster/main.py:201-203) applies to this normalized value.
    */
  def damLevNorm(a: String, b: String): Double = {
    val m = math.max(a.length, b.length)
    if (m == 0) 0.0 else damLevMetric(a, b) / m
  }

  /** F5 Jaccard-of-Levenshtein distance (reference:
    * nilcluster/main.py:37-54): a soft token-set Jaccard where the
    * intersection mass is the sum of normalized Damerau-Levenshtein
    * similarities over all cross token pairs and the union is |x|+|y|.
    * (The reference's inner call routes through its cdist-shaped
    * dam_lev_metric, which indexes str[0] — a latent bug in dead code;
    * this implements the documented intent with the whole tokens.)
    */
  def jaccLevDistance(x: String, y: String): Double = {
    val sx = x.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    val sy = y.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    val union = sx.size + sy.size
    if (union == 0) return 0.0
    var inter = 0.0
    for (wx <- sx; wy <- sy)
      inter += 1.0 - damLevMetric(wx, wy) / math.max(wx.length, wy.length)
    1.0 - inter / union
  }

  /** Raw dot product — FAISS inner-product score analog
    * (reference: indexer/main.py:304, np.inner rescore).
    */
  def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))

  /** Normalized linking score `dot / max(|a|,|b|)^2`
    * (reference: indexer/main.py:313-317) — part of the output contract.
    */
  def normScore(a: Array[Float], b: Array[Float]): Double = {
    val m = math.max(norm(a), norm(b))
    if (m == 0) 0.0 else dot(a, b) / (m * m)
  }

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    val na = norm(a); val nb = norm(b)
    if (na == 0 || nb == 0) 0.0 else dot(a, b) / (na * nb)
  }

  /** Cosine distance 1 - cos (reference: nilcluster/main.py:227,269,
    * sklearn affinity='cosine').
    */
  def cosineDist(a: Array[Float], b: Array[Float]): Double = 1.0 - cosine(a, b)

  def sigmoid(x: Double): Double = 1.0 / (1.0 + math.exp(-x))

  // ---- Column-level (whole-stage-codegen'd) vector kernels -------------
  // Native Catalyst expressions (VectorExpressions): measured ~50x faster
  // than aggregate(zip_with(...)), whose higher-order functions run
  // interpreted with per-element boxing. Inputs must be array<float>.

  def dotCol(a: Column, b: Column): Column = VectorExpressions.floatDot(a, b)

  def normCol(a: Column): Column = VectorExpressions.floatNorm(a)

  def cosineCol(a: Column, b: Column): Column = VectorExpressions.floatCosine(a, b)
}
