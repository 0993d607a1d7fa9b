package graft

import graft.kb.{DocumentStore, GateJson}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import java.nio.file.Files

class DocumentStoreSpec extends SparkTestBase {
  import spark.implicits._

  private case class Ann(id: Int, ann_type: String, start: Int, end: Int,
                         mention: String, url: String, encoding: String)
  private case class AnnSet(name: String, next_annid: Int, annotations: Seq[Ann])
  private case class Doc(doc_id: String, text: String, annsets: Seq[AnnSet])

  private def sampleDocs = Seq(
    Doc("d1", "spark merge join customer data", Seq(
      AnnSet("entities_merged", 3, Seq(
        Ann(2, "ALG", 6, 16, null, "TRIE5", "AACAPw=="),
        Ann(1, "ORG", 0, 5, "spark", "kb://ent/1", "AACAPw=="))))),
    Doc("d2", "slow part here", Seq(
      AnnSet("entities_merged", 2, Seq(
        Ann(1, "PRODUCT", 0, 9, "slow part", "", null))))))

  test("upsert / getById: sorted annotations + mention default (S1/S2/T1/P14)") {
    val root = Files.createTempDirectory("docstore").toString
    val store = DocumentStore(spark, root)
    store.upsert(spark.createDataFrame(sampleDocs))

    val d1 = store.getById("d1").collect()(0)
    val annset0 = d1.getSeq[Row](d1.fieldIndex("annsets")).head
    val anns = annset0.getSeq[Row](annset0.fieldIndex("annotations"))
    assert(anns.map(_.getAs[Int]("start")) == Seq(0, 6)) // sorted by start
    // null mention defaulted to text[start:end] end-exclusive
    assert(anns(1).getAs[String]("mention") == "merge join")

    // upsert replaces the whole row
    store.upsert(spark.createDataFrame(Seq(
      Doc("d1", "replaced", Seq.empty))))
    assert(store.getById("d1").collect()(0).getAs[String]("text") == "replaced")
    assert(store.table.read(spark).get.count() == 2)
  }

  test("list with regex + pagination, preview/name derivation (S4/F19/T4)") {
    val root = Files.createTempDirectory("docstore2").toString
    val store = DocumentStore(spark, root)
    store.upsert(spark.createDataFrame(sampleDocs))
    val rows = store.list(".*part.*", page = 0, limit = 10).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("doc_id") == "d2")
    assert(rows(0).getAs[String]("name") == "slow part here")
  }

  test("open migrates a store stamped under an older bucket spec") {
    import graft.tables.IceLite
    val root = Files.createTempDirectory("docstore-mig").toString
    // simulate a store written by the pre-bucketing code: unbucketed
    // spec stamped in PROPS — without migration every later open throws
    val legacy = IceLite(s"$root/doc_store")
    legacy.overwrite(spark.createDataFrame(sampleDocs))
    val store = DocumentStore(spark, root) // migrates on open
    assert(store.getById("d1").collect()(0).getAs[String]("text")
      .startsWith("spark"))
    assert(store.table.read(spark).get.count() == 2)
    // PROPS now carries the bucketed spec: a second open is a no-op and
    // keyed reads prune (labels are trusted again)
    val props = Files.readString(
      java.nio.file.Paths.get(root, "doc_store", "_meta", "PROPS"))
    assert(props.contains("\"numBuckets\":16"))
    store.upsert(spark.createDataFrame(Seq(Doc("d3", "new doc", Seq.empty))))
    assert(DocumentStore(spark, root).getById("d3").count() == 1)
  }

  test("cascade delete (S3)") {
    val root = Files.createTempDirectory("docstore3").toString
    val store = DocumentStore(spark, root)
    store.upsert(spark.createDataFrame(sampleDocs))
    store.delete("d1")
    assert(store.table.read(spark).get.collect().map(_.getString(0)).toSeq == Seq("d2"))
  }

  test("getByIdWithClusters: center stripped by default, returned on request") {
    val root = Files.createTempDirectory("docstore-cl").toString
    val store = DocumentStore(spark, root)
    store.upsert(spark.createDataFrame(sampleDocs))
    val center = Array(0.25f, -1.5f, 3.0f)
    val clusters = Seq(("c1", "spark", "ORG", 2L)).toDF(
        "cluster_key", "title", "cluster_type", "nelements")
      .withColumn("center", typedLit(center.toSeq))
    val assignments = Seq(("d1", "entities_merged", 1, "c1"))
      .toDF("doc_id", "annset", "ann_id", "cluster_key")
    val mentions = Seq(("d1", "entities_merged", 1, "spark"))
      .toDF("doc_id", "annset", "ann_id", "mention")
    val records = GateJson.clusterRecords(clusters, assignments, mentions)

    // default GET: center deleted from every cluster record
    val plain = store.getByIdWithClusters("d1", records, assignments)
      .select("clusters").collect()(0).getSeq[String](0)
    assert(plain.length == 1 && !plain.head.contains("center"))
    assert(plain.head.contains("\"title\":\"spark\""))
    // /clusters/:id variant: center present, base64 round-trips exactly
    val withC = store.getByIdWithClusters("d1", records, assignments,
      includeCenters = true).select("clusters").collect()(0).getSeq[String](0)
    val b64 = "\"center\":\"([^\"]+)\"".r.findFirstMatchIn(withC.head)
      .map(_.group(1)).get
    assert(graft.functions.Codec.base64ToFloats(b64).toSeq == center.toSeq)
    // a doc with no clusters gets an empty list, not null
    val none = store.getByIdWithClusters("d2", records, assignments)
      .select("clusters").collect()(0).getSeq[String](0)
    assert(none.isEmpty)
  }

  test("stripEncodings drops the vector field everywhere (P10)") {
    val df = spark.createDataFrame(sampleDocs)
    val store = DocumentStore(spark, Files.createTempDirectory("ds4").toString)
    val stripped = store.stripEncodings(df)
    val fields = stripped.schema("annsets").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
      .asInstanceOf[org.apache.spark.sql.types.StructType]("annotations").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames
    assert(!fields.contains("encoding"))
  }

  test("renameAnnsets maps old -> new names (P11)") {
    val df = spark.createDataFrame(sampleDocs)
    val store = DocumentStore(spark, Files.createTempDirectory("ds5").toString)
    val renamed = store.renameAnnsets(df, Map("entities_merged" -> "entities_v2"))
    val names = renamed.select(explode(col("annsets.name"))).collect()
      .map(_.getString(0)).toSet
    assert(names == Set("entities_v2"))
  }

  test("GateNLP JSON round-trip preserves text/features/annotations (F20)") {
    val json =
      """{"text":"spark here","offset_type":"p",
         "features":{"pipeline":"sectionator,ner","custom_key":"kept"},
         "annotation_sets":{"entities_merged":{"name":"entities_merged",
           "next_annid":2,"annotations":[
             {"id":1,"type":"ORG","start":0,"end":5,
              "features":{"mention":"spark","unknown_extra":"survives"}}]}}}"""
        .replaceAll("\n\\s*", "")
    val in = Seq(("d1", json)).toDF("doc_id", "json")
    val parsed = GateJson.ingest(in, "doc_id", "json")
    assert(parsed.select("text").collect()(0).getString(0) == "spark here")

    val out = GateJson.egress(parsed).collect()(0).getAs[String]("json")
    val reparsed = GateJson.ingest(Seq(("d1", out)).toDF("doc_id", "json"),
      "doc_id", "json").collect()(0)
    assert(reparsed.getAs[Map[String, String]]("features")("custom_key") == "kept")
    val annset = reparsed.getSeq[Row](reparsed.fieldIndex("annsets")).head
    assert(annset.getAs[Int]("next_annid") == 2)
    val ann = annset.getSeq[Row](annset.fieldIndex("annotations")).head
    assert(ann.getAs[Int]("start") == 0 && ann.getAs[Int]("end") == 5)
    assert(ann.getAs[Map[String, String]]("features")("unknown_extra") == "survives")
  }

  test("cluster records carry member mentions [{id, mention}] (TimeEvolving.py:119-124)") {
    val clusters = Seq(("k1", "acme", "ORG", 2L), ("k2", "solo", "PER", 1L))
      .toDF("cluster_key", "title", "cluster_type", "nelements")
    val assignments = Seq(("d2", "ner", 3, "k1"), ("d1", "ner", 1, "k1"),
        ("d3", "ner", 7, "k2"))
      .toDF("doc_id", "annset", "ann_id", "cluster_key")
    val mentions = Seq(("d1", "ner", 1, "Acme"), ("d2", "ner", 3, "acme inc"),
        ("d3", "ner", 7, "Solo"), ("d9", "ner", 9, "unrelated"))
      .toDF("doc_id", "annset", "ann_id", "mention")

    val recs = GateJson.clusterRecords(clusters, assignments, mentions)
      .orderBy("cluster_key").collect()
    def ms(r: Row): Seq[(Int, String)] =
      r.getSeq[Row](r.fieldIndex("mentions"))
        .map(m => (m.getAs[Int]("id"), m.getAs[String]("mention")))
    // ordered by (doc_id, ann_id); ids are the annotation ids
    assert(ms(recs(0)) == Seq((1, "Acme"), (3, "acme inc")))
    assert(ms(recs(1)) == Seq((7, "Solo")))

    val json = GateJson.clusterEgress(
        GateJson.clusterRecords(clusters, assignments, mentions))
      .orderBy("cluster_key").collect()(0).getAs[String]("json")
    assert(json.contains(""""mentions":[{"id":1,"mention":"Acme"}"""), json)
    assert(json.contains(""""type":"ORG""""), json)
  }
}
