package graft

import graft.ner.Sectionator
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SectionatorSpec extends SparkTestBase {
  import spark.implicits._

  test("line sectionator: reference-shaped markers sweep (W6/F15)") {
    val text = Seq(
      "Intestazione del documento",  // PREAMBLE
      "CONCLUSIONI delle parti",     // CONCLUSIONI opens
      "testo delle conclusioni",
      "FATTO E DIRITTO",             // FATTO opens
      "svolgimento del processo",
      "P.Q.M.",                      // MOTIVI opens
      "il tribunale decide").mkString("\n")
    val docs = Seq(("d1", text)).toDF("id", "body")
    val out = Sectionator.lineSections(docs, "id", "body")
      .select("line_no", "section").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out(0) == "PREAMBLE")
    assert(out(1) == "CONCLUSIONI" && out(2) == "CONCLUSIONI")
    assert(out(3) == "FATTO" && out(4) == "FATTO")
    assert(out(5) == "MOTIVI" && out(6) == "MOTIVI")
  }

  test("TSV mention IO round-trip with explicit schema + canonical sort (S11/T3)") {
    val dir = Files.createTempDirectory("tsv").toString
    val mentions = Seq(
      ("d2", 5, 10, "merge", 0.9, "ALG"),
      ("d1", 7, 12, "spark", 1.0, "ORG"),
      ("d1", 0, 5, "tribe", 0.5, "LOC"))
      .toDF("doc_id", "begin", "end", "text", "score", "type")
    mentions.orderBy("doc_id", "begin")
      .coalesce(1)
      .write.mode("overwrite")
      .option("sep", "\t").option("header", "true")
      .csv(dir)
    val schema = "doc_id string, begin int, end int, text string, score double, type string"
    val back = spark.read.schema(schema)
      .option("sep", "\t").option("header", "true")
      .csv(dir)
      .orderBy("doc_id", "begin")
      .collect().map(_.toString)
    assert(back.length == 3)
    assert(back(0).contains("d1") && back(0).contains("tribe"))
    assert(back(2).contains("d2") && back(2).contains("merge"))
  }
}
