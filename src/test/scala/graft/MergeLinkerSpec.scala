package graft

import graft.core.Mention
import graft.merge.MergeAnnsets
import graft.functions.Similarity
import org.apache.spark.sql.functions._

class MergeLinkerSpec extends SparkTestBase {
  import spark.implicits._

  private def m(doc: String, annset: String, src: String, tpe: String,
                s: Int, e: Int, text: String, skip: Boolean = false): Mention =
    Mention(doc, annset, 0, tpe, s, e, text, 1.0, src, skip, -1L)

  test("merge sweep: disjoint mentions all survive, ordered ann_ids") {
    val a = spark.createDataset(Seq(
      m("d", "t", "trie", "ORG", 0, 5, "spark"),
      m("d", "t", "trie", "PER", 10, 18, "customer")))
    val out = MergeAnnsets.merge(spark, Seq(a)).collect().sortBy(_.ann_id)
    assert(out.length == 2)
    assert(out(0).mention == "spark" && out(0).ann_id == 1)
    assert(out(1).mention == "customer" && out(1).ann_id == 2)
    assert(out.forall(_.annset == "entities_merged"))
  }

  test("merge sweep: longest span wins a partial overlap") {
    val a = spark.createDataset(Seq(
      m("d", "t", "regex", "PRODUCT", 0, 10, "slow merge"),
      m("d", "t", "trie", "ALG", 5, 20, "merge join plus")))
    val out = MergeAnnsets.merge(spark, Seq(a)).collect()
    assert(out.length == 1)
    assert(out(0).mention == "merge join plus") // longer wins
  }

  test("merge sweep: equal length -> source priority (trie > regex)") {
    val a = spark.createDataset(Seq(
      m("d", "t", "regex", "PRODUCT", 0, 10, "slow merge"),
      m("d", "t", "trie", "ALG", 5, 15, "merge join")))
    val out = MergeAnnsets.merge(spark, Seq(a)).collect()
    assert(out.length == 1)
    assert(out(0).source == "trie")
  }

  test("merge sweep: chained overlaps form one group (running max)") {
    // [0,10) overlaps [5,15) overlaps [12,20): all one group although
    // [0,10) and [12,20) are disjoint — single-linkage trichotomy
    val a = spark.createDataset(Seq(
      m("d", "t", "regex", "X", 0, 10, "aaaaaaaaaa"),
      m("d", "t", "regex", "X", 5, 15, "bbbbbbbbbb"),
      m("d", "t", "regex", "X", 12, 20, "cccccccc")))
    val out = MergeAnnsets.merge(spark, Seq(a)).collect()
    assert(out.length == 1)
  }

  test("similarity kernels: reference quirks") {
    // short-token penalty (nilcluster/main.py:57-65)
    assert(Similarity.damLevMetric("ab", "ab") == 0.0)
    assert(Similarity.damLevMetric("ab", "ac") == 4.0)  // dist 1 + 3
    assert(Similarity.damLevMetric("abcd", "abdc") == 1.0) // transposition
    assert(Similarity.damLevMetric("Spark", "spark") == 0.0) // lowercased
    // jaccard on word tokens (nilpredictor qval=None)
    assert(Similarity.jaccardTokens("merge join", "join merge") == 1.0)
    assert(Similarity.jaccardTokens("slow merge", "merge join") == 1.0 / 3.0)
    // levenshtein similarity
    assert(Similarity.levenshteinSim("abc", "abc") == 1.0)
    assert(Similarity.levenshteinSim("abc", "abd") == 1.0 - 1.0 / 3.0)
    // cosine of identical vectors
    val v = graft.link.Embed.embed("spark")
    assert(math.abs(Similarity.cosine(v, v) - 1.0) < 1e-6)
    assert(math.abs(Similarity.norm(v) - 1.0) < 1e-5) // unit-norm embed
  }

  test("linker: cross-encoder rerank keeps exact-title links and stays deterministic") {
    import graft.core.{InputDoc, Span, SpanOps}
    import graft.link.Linker
    import graft.ner.TrieNer
    val docs = spark.createDataset(Seq(
      InputDoc("x", SpanOps.withOffsets(Seq(Span("text", "spark and customer", "", 0))))))
    val text = Pipeline.docText(spark, docs)
    val mentions = TrieNer.mentions(spark, docs)
    val reg = graft.kb.Registry.seed(spark).toDF()
    val plain = Linker.link(spark, mentions, text, reg, rerank = false)
      .select("mention", "is_nil").collect().map(r => (r.getString(0), r.getBoolean(1))).toSet
    val rr = Linker.link(spark, mentions, text, reg, rerank = true)
      .select("mention", "is_nil").collect().map(r => (r.getString(0), r.getBoolean(1))).toSet
    assert(plain == rr)
    assert(plain == Set(("spark", false), ("customer", false)))
  }

  test("linker: exact-title match links, zero-candidate is NIL, DATE skips") {
    import graft.core.{InputDoc, Span, SpanOps}
    val docs = spark.createDataset(Seq(
      InputDoc("x", SpanOps.withOffsets(Seq(
        Span("text", "spark then fast key on 2024-01-01", "", 0))))))
    val res = Pipeline.run(spark, docs, graft.kb.Registry.seed(spark).toDF())
    val rows = res.linked.select("mention", "entity_id", "is_nil", "url")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getString(3)))
    val byMention = rows.map(r => r._1.toLowerCase -> r).toMap
    assert(byMention("spark")._2 == 1L && !byMention("spark")._3)
    assert(byMention("spark")._4 == "kb://ent/1")
    assert(byMention("fast key")._3) // NIL
    assert(byMention.get("2024-01-01").forall(r => r._2 == -1L)) // date -> no entity
  }
}
