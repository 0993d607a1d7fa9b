package graft

import graft.core.{InputDoc, Span, SpanOps}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class IncrementalSpec extends SparkTestBase {
  import spark.implicits._

  private def doc(id: String, text: String): InputDoc =
    InputDoc(id, SpanOps.withOffsets(Seq(Span("text", text, "", 0))))

  private val corpus = Seq(
    doc("d1", "spark with fast key inside"),
    doc("d2", "fast key again near customer"),
    doc("d3", "sort merge and fast key"),
    doc("d4", "slow part and merge join"),
    doc("d5", "spark customer window"),
    doc("d6", "fast key one more time"))

  private def tableState(t: Incremental.Tables, name: String): Seq[String] = {
    val df = name match {
      case "triples" => t.triples.read(spark).get
      case "registry" => t.registry.read(spark).get.drop("emb")
      case "mentions" => t.mentions.read(spark).get
      case "documents" => t.documents.read(spark).get
    }
    df.collect().map(_.toString).sorted.toSeq
  }

  test("kill/resume equals uninterrupted run (lineage checkpointing)") {
    val docs = spark.createDataset(corpus)
    val dirA = Files.createTempDirectory("incA").toString
    val dirB = Files.createTempDirectory("incB").toString

    Incremental.run(spark, docs, dirA, numBatches = 3)

    // interrupted: only 1 batch, then resume
    Incremental.run(spark, docs, dirB, numBatches = 3, upToBatch = 1)
    val doneAfterKill = Incremental.doneBatches(spark, Incremental.Tables(dirB))
    assert(doneAfterKill.size == 1)
    Incremental.run(spark, docs, dirB, numBatches = 3) // resume

    Seq("triples", "registry", "mentions", "documents").foreach { n =>
      assert(tableState(Incremental.Tables(dirA), n) ==
             tableState(Incremental.Tables(dirB), n), s"table $n differs")
    }
  }

  test("incremental visibility: NIL entity discovered once, linked later") {
    val docs = spark.createDataset(corpus)
    val dir = Files.createTempDirectory("incV").toString
    val t = Incremental.run(spark, docs, dir, numBatches = 3)

    val reg = t.registry.read(spark).get
    // exactly one KB row for the repeated novel surface
    assert(reg.filter(col("title") === "fast key").count() == 1)
    val row = reg.filter(col("title") === "fast key").collect()(0)
    assert(row.getAs[Int]("indexer") == graft.kb.Registry.RwIndexer)
    assert(row.getAs[String]("type_") == "PRODUCT")

    // every doc mentioning it resolves to the same entity (nil: or ent:)
    val objs = t.triples.read(spark).get
      .filter(col("pred") === ":mentions" &&
        (col("obj") === "nil:fast key" || col("obj") === "ent:fast key"))
    assert(objs.count() == 4) // d1, d2, d3, d6

    // replaying the whole run over the same workDir changes nothing
    val before = t.triples.read(spark).get.collect().map(_.toString).sorted.toSeq
    Incremental.run(spark, docs, dir, numBatches = 3)
    val after = t.triples.read(spark).get.collect().map(_.toString).sorted.toSeq
    assert(before == after)
  }
}
