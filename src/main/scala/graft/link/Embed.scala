package graft.link

import scala.util.hashing.MurmurHash3

/** Deterministic hashing-based text embedding — the engine's stand-in for
  * the reference's BLINK bi-encoder (reference: biencoder/main.py:42-94,
  * 1024-d float32). Same role in the plan (one vector per mention /
  * entity, inner-product scoring); fixture dimension 64.
  *
  * Properties needed by downstream semantics: deterministic across JVMs
  * (MurmurHash3 of char trigrams), unit-norm, locality-preserving on
  * surface strings (shared trigrams => high cosine), cheap enough to run
  * inside whole-stage codegen-adjacent mapPartitions batches.
  */
object Embed {
  val Dim = 64
  private val Seed = 0x9747b28c

  def embed(text: String): Array[Float] = embed(text, Dim)

  def embed(text: String, dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    val s = "" + text.toLowerCase + ""
    var i = 0
    while (i + 3 <= s.length) {
      val h = triHash(s.charAt(i), s.charAt(i + 1), s.charAt(i + 2))
      val idx = math.floorMod(h, dim)
      val sign = if ((h & 0x40000000) == 0) 1f else -1f
      v(idx) += sign
      i += 1
    }
    l2(v)
  }

  /** MurmurHash3.stringHash(s, Seed) for a 3-char string, inlined via the
    * public mix/mixLast/finalizeHash API — BIT-IDENTICAL to the substring
    * version (property-tested in EmbedSpec) but allocation-free: the
    * substring variant allocated one 3-char String per input CHARACTER,
    * i.e. hundreds of millions of young-gen objects per million mentions.
    */
  def triHash(c0: Char, c1: Char, c2: Char): Int = {
    var h = MurmurHash3.mix(Seed, (c0 << 16) + c1)
    h = MurmurHash3.mixLast(h, c2.toInt)
    MurmurHash3.finalizeHash(h, 3)
  }

  /** Mention-in-context embedding: mention dominates, context nudges —
    * mirrors the bi-encoder's (context_left, mention, context_right)
    * sample shape (reference: biencoder/main.py:63-68).
    */
  def embedMention(ctxLeft: String, mention: String, ctxRight: String): Array[Float] = {
    val m = embed(mention)
    val c = embed(ctxLeft + " " + ctxRight)
    val out = new Array[Float](m.length)
    var i = 0
    while (i < m.length) { out(i) = m(i) + 0.25f * c(i); i += 1 }
    l2(out)
  }

  def l2(v: Array[Float]): Array[Float] = {
    var n = 0.0
    var i = 0
    while (i < v.length) { n += v(i).toDouble * v(i); i += 1 }
    val d = math.sqrt(n)
    if (d > 0) {
      i = 0
      while (i < v.length) { v(i) = (v(i) / d).toFloat; i += 1 }
    }
    v
  }
}
