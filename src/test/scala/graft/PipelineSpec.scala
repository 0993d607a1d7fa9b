package graft

import graft.core.{Span, SpanOps}
import graft.fixtures.Corpus
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkTestBase {

  test("span assembly round-trips the document text") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfUnit/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    docs.take(50).foreach { case (id, text) =>
      val spans = Corpus.spansFor(id, text)
      assert(SpanOps.assemble(spans) == text, s"doc $id")
      // offsets are consistent
      var off = 0
      spans.foreach { s =>
        assert(s.offset == off)
        if (s.kind == "text") off += s.text.length
      }
    }
  }

  test("span-sequence invariant: pipeline output preserves (kind,text,media_ref,order)") {
    import spark.implicits._
    val in = Corpus.inputDocs(spark, sfUnit)
    // the pipeline carries InputDoc rows through untouched; verify the
    // invariant sequence of the table read back equals the constructed one
    val seqs = in.map(d => (d.doc_id, SpanOps.invariantSeq(d.spans))).collect().toMap
    val again = Corpus.inputDocs(spark, sfUnit)
      .map(d => (d.doc_id, SpanOps.invariantSeq(d.spans))).collect().toMap
    assert(seqs == again)
    assert(seqs.nonEmpty)
    // media spans present exactly per the construction rule
    seqs.foreach { case (id, sq) =>
      val n = id.toLong
      val medias = sq.filter(_._1 == "media").map(_._3)
      val expected =
        (if (n % 3 == 0) Seq(s"media://img/$n") else Nil) ++
        (if (n % 5 == 0) Seq(s"media://vid/$n") else Nil)
      assert(medias == expected, s"doc $id")
    }
  }

  test("entry returns non-empty triples with expected columns") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSet == Set("doc_id", "subj", "pred", "obj"))
    assert(df.count() > 0)
    val preds = df.select("pred").distinct().collect().map(_.getString(0)).toSet
    assert(preds.contains(":mentions"))
    assert(preds.contains(":typedAs"))
  }

  test("triples are deterministic across runs (fresh run, no memo)") {
    import graft.fixtures.Corpus
    import graft.kb.Registry
    def fresh() = Pipeline.run(spark, Corpus.inputDocs(spark, sfUnit),
      Registry.seed(spark).toDF()).triples.collect().map(_.toString).sorted
    assert(fresh().sameElements(fresh()))
  }
}
