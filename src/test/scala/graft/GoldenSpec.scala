package graft

import graft.core.{InputDoc, Span, SpanOps}
import graft.kb.Registry
import org.apache.spark.sql.functions._

/** Golden end-to-end gate (BASELINE.md): triple P/R >= 0.95 against
  * hand-computed reference-semantics expectations, and the exact
  * span-sequence invariant. Every expected triple below is derived by
  * hand from the reference semantics documented in SURVEY.md §2-3.
  */
class GoldenSpec extends SparkTestBase {
  import spark.implicits._

  private def doc(id: String, texts: Seq[(String, String)]): InputDoc =
    InputDoc(id, SpanOps.withOffsets(texts.map {
      case ("text", t) => Span("text", t, "", 0)
      case ("media", m) => Span("media", "", m, 0)
    }))

  private val corpus = Seq(
    doc("A", Seq("text" -> "spark merge join customer")),
    doc("B", Seq(
      "text" -> "fast key appears 2024-01-15 then ",
      "media" -> "media://img/B",
      "text" -> "slow part ends")),
    doc("C", Seq("text" -> "spark and fast key")),
    doc("D", Seq("text" -> "sort merge join table scan")),
    doc("E", Seq("text" -> "slow merge join works")))

  // Hand-derived golden triples (semantics spec):
  //  - greedy trie matching; merge winner = longest, then trie > regex;
  //  - exact-title candidates link (never NIL: jacc=lev=1);
  //  - zero-candidate mentions are NIL, clustered by surface;
  //  - NIL ids: base(=16, max seed registry id) + rank(cluster_key asc):
  //    "fast key" -> 17, "slow part" -> 18;
  //  - DATE mentions are skip and emit nothing;
  //  - adjacency pairs over resolved mentions ordered by start.
  private val golden: Set[(String, String, String, String)] = Set(
    // doc A: spark(amb->id1 ORG), merge join(skip id5 ALG), customer(amb->id3 PER)
    ("A", "doc:A", ":mentions", "ent:spark"),
    ("A", "doc:A", ":mentions", "ent:merge join"),
    ("A", "doc:A", ":mentions", "ent:customer"),
    ("A", "ent:spark", ":typedAs", "ORG"),
    ("A", "ent:merge join", ":typedAs", "ALG"),
    ("A", "ent:customer", ":typedAs", "PER"),
    ("A", "ent:merge join", ":coOccursWith", "ent:spark"),
    ("A", "ent:customer", ":coOccursWith", "ent:merge join"),
    // doc B: fast key (NIL17), DATE (skipped, no output), slow part (NIL18)
    ("B", "doc:B", ":mentions", "nil:fast key"),
    ("B", "doc:B", ":mentions", "nil:slow part"),
    ("B", "nil:fast key", ":typedAs", "PRODUCT"),
    ("B", "nil:slow part", ":typedAs", "PRODUCT"),
    ("B", "nil:fast key", ":sameAsCluster", "NIL17"),
    ("B", "nil:slow part", ":sameAsCluster", "NIL18"),
    ("B", "nil:fast key", ":coOccursWith", "nil:slow part"),
    ("B", "doc:B", ":hasMedia", "media://img/B"),
    // doc C: spark + fast key (same NIL cluster as B's)
    ("C", "doc:C", ":mentions", "ent:spark"),
    ("C", "doc:C", ":mentions", "nil:fast key"),
    ("C", "ent:spark", ":typedAs", "ORG"),
    ("C", "nil:fast key", ":typedAs", "PRODUCT"),
    ("C", "nil:fast key", ":sameAsCluster", "NIL17"),
    ("C", "ent:spark", ":coOccursWith", "nil:fast key"),
    // doc D: sort merge (skip id7), table scan (skip id8)
    ("D", "doc:D", ":mentions", "ent:sort merge"),
    ("D", "doc:D", ":mentions", "ent:table scan"),
    ("D", "ent:sort merge", ":typedAs", "ALG"),
    ("D", "ent:table scan", ":typedAs", "OP"),
    ("D", "ent:sort merge", ":coOccursWith", "ent:table scan"),
    // doc E: overlap "slow merge"(regex) vs "merge join"(trie): tie on
    // length -> trie priority wins -> only merge join survives
    ("E", "doc:E", ":mentions", "ent:merge join"),
    ("E", "ent:merge join", ":typedAs", "ALG"))

  test("golden triples: precision and recall >= 0.95 (exact here)") {
    val docs = spark.createDataset(corpus)
    val res = Pipeline.run(spark, docs, Registry.seed(spark).toDF())
    val got = res.triples.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    val tp = (got & golden).size.toDouble
    val precision = if (got.isEmpty) 0.0 else tp / got.size
    val recall = tp / golden.size
    val extra = got -- golden
    val missing = golden -- got
    assert(precision >= 0.95, s"precision=$precision extra=$extra")
    assert(recall >= 0.95, s"recall=$recall missing=$missing")
  }

  test("span-sequence invariant holds exactly on the golden corpus") {
    val docs = spark.createDataset(corpus)
    // the pipeline never mutates the input docs; the invariant check is
    // input vs the documents table the incremental driver persists
    val dir = java.nio.file.Files.createTempDirectory("golden-inc").toString
    Incremental.run(spark, docs, dir, numBatches = 2)
    val stored = Incremental.Tables(dir).documents.read(spark).get
      .as[InputDoc].collect().map(d => d.doc_id -> SpanOps.invariantSeq(d.spans)).toMap
    corpus.foreach { d =>
      assert(stored(d.doc_id) == SpanOps.invariantSeq(d.spans), s"doc ${d.doc_id}")
    }
  }
}
