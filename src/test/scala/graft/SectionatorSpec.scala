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

  test("section spans: firma_e_data heuristic + end-offset fixup, golden offsets") {
    val lines = Seq(
      "Intestazione documento\n",              // preambolo        [0, ...)
      "CONCLUSIONI delle parti\n",             // conclusioni      starts 23
      "testo\n",
      "FATTO E DIRITTO\n",                     // fatto_e_diritto  starts 53
      "svolgimento\n",
      "P.Q.M.\n",                              // dispositivo      starts 81
      "il collegio decide\n",
      "Tribunale di Milano, 12/07/2023\n",     // firma_e_data     starts 107
      "Il Giudice Dott. Rossi\n")              //   (court+year, next line judge)
    val text = lines.mkString
    assert(text.length == 162)
    val courts = Sectionator.courtNames(spark)
    assert(courts.contains("Tribunale di Milano")) // spark.read.csv path (S10)
    val got = Sectionator.identifySections(text, courts)
    // fixup: end = next section's start; last section ends at len-1
    assert(got == Seq(
      ("preambolo", 0, 23),
      ("conclusioni", 23, 53),
      ("fatto_e_diritto", 53, 81),
      ("dispositivo", 81, 107),
      ("firma_e_data", 107, 161)))
    // firma does NOT open without the judge lookahead on the next line
    val noJudge = Sectionator.identifySections(
      "intro\nTribunale di Roma 12/07/2023\nnessun magistrato qui\n", courts)
    assert(noJudge.map(_._1) == Seq("preambolo"))
    // distributed span stage over a frame
    val df = Seq(("d1", text), ("d2", "una sola riga senza marcatori"))
      .toDF("doc_id", "body")
    val spans = Sectionator.sectionSpans(spark, df, "doc_id", "body")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3)))
    assert(spans.count(_._1 == "d1") == 5)
    assert(spans.filter(_._1 == "d2").toSeq ==
      Seq(("d2", "preambolo", 0, 28))) // len-1 of the single line
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
