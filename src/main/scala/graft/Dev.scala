package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). */
object Dev {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("probe")) {
      (1 to 3).foreach(i => println(f"[dev] fault probe $i: ${Bench.probeFaultMBps()}%.0f MB/s"))
      return
    }
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[dev] $name: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }
    val docs = graft.fixtures.Corpus.inputDocs(spark, dir).cache()
    time("docs count")(println("docs=" + docs.count()))
    val trie = time("trie")(graft.ner.TrieNer.mentions(spark, docs).cache().count())
    println("trie mentions=" + trie)
    val regex = time("regex")(graft.ner.RegexNer.mentions(spark, docs).cache().count())
    println("regex mentions=" + regex)
    val merged = time("merge")(graft.merge.MergeAnnsets.merge(spark,
      Seq(graft.ner.TrieNer.mentions(spark, docs),
          graft.ner.RegexNer.mentions(spark, docs))).cache())
    println("merged=" + merged.count())
    val text = graft.Pipeline.docText(spark, docs).cache()
    val linked = time("link")(graft.link.Linker.link(spark, merged, text,
      graft.kb.Registry.seed(spark).toDF()).cache())
    println("linked=" + linked.count())
    val nil = linked.filter(col("is_nil") && col("mention_type") =!= "DATE").cache()
    println("nil=" + nil.count())
    val (asg, cl) = time("cluster")(graft.cluster.NilCluster.cluster(spark, nil))
    time("cluster materialize")(println("clusters=" + cl.count() + " asg=" + asg.count()))
    val res = time("full run")(Pipeline.run(spark, docs, graft.kb.Registry.seed(spark).toDF()))
    time("res.linked")(println("linked=" + res.linked.count()))
    time("res.clusters")(println("clusters=" + res.clusters.count()))
    time("res.newEntities")(println("newEnt=" + res.newEntities.count()))
    time("triples")(println("triples=" + res.triples.count()))
    time("triples again")(println("triples=" + res.triples.count()))
    res.triples.explain("formatted")
    spark.stop()
  }
}
