package graft.fixtures

/** Deterministic in-engine gazetteer over the testdata vocabulary.
  *
  * Plays the role of the reference's pickled trie KB
  * (reference: trie-ner/TrieNER.py:90-112 — entities {id, name, type} +
  * lowercased patterns). Patterns here are token sequences; multi-token
  * names also emit token permutations capped at 3 tokens, mirroring the
  * permutation pattern build (reference: trie-ner/TrieNER.py:33-38,140-145).
  *
  * The single-candidate rule matters downstream: a pattern mapping to
  * exactly one entity id short-circuits linking (`linking.skip`,
  * reference: trie-ner/TrieNER.py:79-81).
  */
object Gazetteer {

  final case class GazEntity(id: Long, name: String, etype: String)

  /** Fixed, seeded entity list over the synthetic corpus vocabulary.
    * "spark" et al. are deliberately ambiguous (two ids per surface) to
    * exercise candidate search; bigrams are unambiguous (skip path).
    */
  val entities: Seq[GazEntity] = Seq(
    GazEntity(1L, "spark", "ORG"),
    GazEntity(2L, "spark", "PRODUCT"),          // ambiguity on "spark"
    GazEntity(3L, "customer", "PER"),
    GazEntity(4L, "customer", "ROLE"),          // ambiguity on "customer"
    GazEntity(5L, "merge join", "ALG"),
    GazEntity(6L, "hash join", "ALG"),
    GazEntity(7L, "sort merge", "ALG"),
    GazEntity(8L, "table scan", "OP"),
    GazEntity(9L, "window", "OP"),
    GazEntity(10L, "vector", "TYPE"),
    GazEntity(11L, "stream", "OP"),
    GazEntity(12L, "batch", "OP"),
    GazEntity(13L, "big data", "FIELD"),
    GazEntity(14L, "query", "OP"),
    GazEntity(15L, "filter", "OP"),
    GazEntity(16L, "group", "OP")
  )

  /** Max tokens per emitted permutation pattern (reference caps name
    * length; fixture cap = 3).
    */
  val permutationCap = 3

  /** pattern (lowercased, space-joined tokens) -> sorted distinct entity
    * ids. Built deterministically; permutations only for multi-token
    * names with <= permutationCap tokens.
    */
  lazy val patterns: Map[String, Seq[Long]] = {
    val pairs = entities.flatMap { e =>
      val toks = e.name.toLowerCase.split("\\s+").toSeq
      val pats =
        if (toks.size == 1 || toks.size > permutationCap) Seq(toks)
        else toks.permutations.toSeq
      pats.map(p => p.mkString(" ") -> e.id)
    }
    pairs.groupBy(_._1).map { case (p, xs) =>
      p -> xs.map(_._2).distinct.sorted
    }
  }

  /** id -> entity, for hydration. */
  lazy val byId: Map[Long, GazEntity] = entities.map(e => e.id -> e).toMap

  /** Max pattern length in tokens (bounds the greedy scan window). */
  lazy val maxPatternTokens: Int =
    patterns.keys.map(_.split(" ").length).max
}
