package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1: measure first;
  * §1.4 noop sink; §1.5 job labels). NOT part of the driver contract —
  * Bench.scala stays the frozen measurement surface; this main exists so
  * per-query isolation, per-stage metrics and plan dumps can be taken
  * without touching it.
  *
  * Usage:
  *   sbt "runMain graft.BenchExtra [q1,q2,...]"
  * env:
  *   SPARK_GRAFT_SF_DIR   data dir (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_CPUS     cores (default 32) — master local[N], like Bench
  *   SPARK_GRAFT_PLANS    when set, write .explain("formatted") of every
  *                        run query to plans/r06/<query>_<SPARK_GRAFT_PLANS>.txt
  *   SPARK_GRAFT_REPEAT   times to run each query (default 2: first =
  *                        cold-JIT cost the driver sees, second = steady)
  *   SPARK_GRAFT_NOOP     time a noop-sink write instead of count()
  *   SPARK_GRAFT_STAGES   when 1, print per-stage task metrics (wall /
  *                        run / cpu / gc) for stages over 0.2 s
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "2").toInt
    val noop = sys.env.get("SPARK_GRAFT_NOOP").contains("1")
    val stages = sys.env.get("SPARK_GRAFT_STAGES").contains("1")
    val planTag = sys.env.get("SPARK_GRAFT_PLANS")
    val names: Seq[String] =
      if (args.nonEmpty) args(0).split(",").map(_.trim).toSeq
      else Seq("q29_path2", "q30_pagerank", "kg_triples", "t6_ngram_neardup")

    // session config mirrors Bench.session (the measured environment)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", Bench.scaleParts.toString)
      .config("spark.sql.limit.initialNumPartitions", Bench.scaleParts.toString)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", Bench.localDir)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.rdd.compress", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (stages)
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val i = sc.stageInfo
            val m = i.taskMetrics
            val wall =
              (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1e3
            if (wall > 0.2)
              println(f"[stage] ${i.stageId}%4d wall=$wall%6.2fs " +
                f"run=${m.executorRunTime / 1e3}%7.1fs " +
                f"cpu=${m.executorCpuTime / 1e9}%7.1fs " +
                f"gc=${m.jvmGCTime / 1e3}%5.1fs tasks=${i.numTasks}%4d " +
                i.name.take(70))
          }
        })

    // same warm-up as Bench's query pass
    SparkEntry.queries("q1_agg")(spark, dir).count()

    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      (1 to repeat).foreach { i =>
        spark.sparkContext.setJobDescription(s"$name #$i")
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val n =
          if (noop) { df.write.format("noop").mode("overwrite").save(); -1L }
          else df.count()
        println(f"[extra] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2fs" +
          (if (n >= 0) s" rows=$n" else " (noop)"))
      }
      planTag.foreach { tag =>
        val p = new java.io.File("plans/r06")
        p.mkdirs()
        val w = new java.io.PrintWriter(s"plans/r06/${name}_$tag.txt")
        try w.println(fn(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        finally w.close()
      }
      spark.sparkContext.setJobDescription(null)
    }
    spark.stop()
  }
}
