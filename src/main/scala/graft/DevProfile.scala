package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch eager-stage profiler (not part of the driver contract). */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus.toString))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", Bench.localDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val totRun = new java.util.concurrent.atomic.AtomicLong
    val totCpu = new java.util.concurrent.atomic.AtomicLong
    val totGc = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val m = i.taskMetrics
          totRun.addAndGet(m.executorRunTime)
          totCpu.addAndGet(m.executorCpuTime / 1000000L)
          totGc.addAndGet(m.jvmGCTime)
          val wall = (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1e3
          if (wall > 1.0)
            println(f"[stage] ${i.stageId}%4d wall=${wall}%6.1fs " +
              f"run=${m.executorRunTime / 1e3}%7.1fs cpu=${m.executorCpuTime / 1e9}%7.1fs " +
              f"gc=${m.jvmGCTime / 1e3}%6.1fs tasks=${i.numTasks}%4d ${i.name.take(60)}")
        }
      })
    sys.addShutdownHook(println(
      f"[totals] run=${totRun.get / 1e3}%.1f core-s cpu=${totCpu.get / 1e3}%.1f core-s gc=${totGc.get / 1e3}%.1f core-s"))
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }
    val replicate = sys.env.getOrElse("SPARK_GRAFT_REPLICATE", "1").toInt
    val parts = spark.sparkContext.defaultParallelism * 2
    val base = graft.fixtures.Corpus.inputDocs(spark, dir)
    import spark.implicits._
    val docs = (if (replicate <= 1) base
                else base.flatMap(d => (0 until replicate).map(r =>
                  d.copy(doc_id = s"${d.doc_id}_$r"))))
      .repartition(parts).cache()
    time("docs")(println("docs=" + docs.count()))
    // Full-pipeline-only mode: skip the scratch stage sections and
    // profile exactly what Bench.kbJob runs (Pipeline.run + count).
    if (sys.env.get("SPARK_GRAFT_PROF_FULL_ONLY").contains("1")) {
      val t0 = System.nanoTime()
      val res = Pipeline.run(spark, docs, graft.kb.Registry.seed(spark).toDF())
      println(f"[prof] full-run plan+checkpoints: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      time("triples count")(println("triples=" + res.triples.count()))
      println(f"[totals] run=${totRun.get / 1e3}%.1f core-s cpu=${totCpu.get / 1e3}%.1f core-s gc=${totGc.get / 1e3}%.1f core-s")
      spark.stop()
      return
    }
    val trie = graft.ner.TrieNer.mentions(spark, docs).localCheckpoint(true)
    time("trie eager")(())
    val regex = graft.ner.RegexNer.mentions(spark, docs).localCheckpoint(true)
    time("regex eager")(())
    time("trie+regex checkpoint materialized")(())
    locally {
      import org.apache.spark.sql.expressions.Window
      val union = trie.unionByName(regex)
      time("union count")(println("union=" + union.count()))
      val normed = union.withColumn("norm_type",
        when(lower(col("mention_type")) === "person",
          substring(col("mention_type"), 1, 3)).otherwise(col("mention_type")))
      val order = Window.partitionBy(col("doc_id"))
        .orderBy(col("start"), col("end"), col("norm_type"), col("source"))
      val runMax = max(col("end")).over(order.rowsBetween(Window.unboundedPreceding, -1))
      val grouped = normed
        .withColumn("prev_max_end", runMax)
        .withColumn("new_grp",
          when(col("prev_max_end").isNull || col("start") >= col("prev_max_end"), 1)
            .otherwise(0))
        .withColumn("grp", sum(col("new_grp")).over(
          order.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("chain_n", count(lit(1)).over(
          Window.partitionBy(col("doc_id"), col("grp"))))
      time("grouped count")(println("grouped=" + grouped.count()))
      time("singleton count")(println("singles=" +
        grouped.filter(col("chain_n") === 1).count()))
      time("multi kernel count")(println("multi=" +
        grouped.filter(col("chain_n") > 1).count()))
    }
    val merged = time("merge eager")(
      graft.merge.MergeAnnsets.merge(spark, Seq(trie, regex).map(_.as[graft.core.Mention](
        org.apache.spark.sql.Encoders.product[graft.core.Mention])))
        .localCheckpoint(true))
    println("merged=" + merged.count())
    val text = Pipeline.docText(spark, docs).cache()
    text.count()
    locally {
      val reg = graft.kb.Registry.seed(spark).toDF()
      val mD = merged.as[graft.core.Mention](
        org.apache.spark.sql.Encoders.product[graft.core.Mention])
      val all = graft.link.Linker.withEmbeddings(spark, mD, text).cache()
      time("embed cache")(println("all=" + all.count()))
      val linkable = all.toDF().filter(!col("skip"))
      val cands = graft.link.Linker.candidates(spark, linkable, reg)
      time("cands count")(println("cands=" + cands.count()))
      val candLists = cands
        .groupBy(col("doc_id"), col("annset"), col("ann_id"))
        .agg(array_sort(collect_list(struct(
          col("rank"), col("entity_id"), col("title"), col("type_"),
          col("bi_score"), col("norm_score"), col("jacc"), col("lev_sim"))))
          .as("candidates"))
      time("candLists ckpt")(println("cl=" + candLists.localCheckpoint(true).count()))
      all.unpersist()
    }
    val (linkedRaw, cands) = graft.link.Linker.linkWithCandidates(
      spark, merged.as[graft.core.Mention](
        org.apache.spark.sql.Encoders.product[graft.core.Mention]),
      text, graft.kb.Registry.seed(spark).toDF())
    val linked = time("link eager (incl internal ckpt)")(linkedRaw.localCheckpoint(true))
    println("linked=" + linked.count())
    val nil = linked.filter(col("is_nil") && col("mention_type") =!= "DATE")
    val (asg, cl) = graft.cluster.NilCluster.cluster(spark, nil)
    time("cluster eager")(println("clusters=" + cl.localCheckpoint(true).count()))
    time("asg eager")(println("asg=" + asg.count()))
    val t0 = System.nanoTime()
    val res = Pipeline.run(spark, docs, graft.kb.Registry.seed(spark).toDF())
    println(f"[prof] full-run plan+checkpoints: ${(System.nanoTime() - t0) / 1e9}%.1fs")
    time("triples count")(println("triples=" + res.triples.count()))
    spark.stop()
  }
}
