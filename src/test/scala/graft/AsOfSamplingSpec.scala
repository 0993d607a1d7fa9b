package graft

import graft.ops.{AsOf, Sampling}
import org.apache.spark.sql.functions._

/** AsOf single-sweep join vs a brute-force oracle; Sampling determinism
  * and the hex-threshold contract the t11_splits DuckDB oracle hardcodes.
  */
class AsOfSamplingSpec extends SparkTestBase {
  import spark.implicits._

  test("asofJoin equals the brute-force most-recent-prior computation") {
    val rnd = new scala.util.Random(42)
    val lefts = (1 to 200).map(i =>
      (i.toLong, (rnd.nextInt(8) + 1).toLong, rnd.nextInt(1000).toLong))
    val rights = (1 to 150).map(i =>
      // distinct ts per key (deterministic tiebreak not under test here)
      (1000L + i, (rnd.nextInt(8) + 1).toLong, rnd.nextInt(500) * 2L + 1, i * 1.5))

    val l = lefts.toDF("l_id", "k", "l_ts")
    val r = rights.toDF("r_id", "k", "r_ts", "payload")

    val got = AsOf.asofJoin(l, r, "k", "l_ts", "r_ts")
      .select("l_id", "r_id").as[(Long, Long)].collect().toMap

    val byKey = rights.groupBy(_._2)
    val expected = lefts.flatMap { case (lid, k, lts) =>
      byKey.getOrElse(k, Nil).filter(_._3 <= lts) match {
        case Nil => None
        case ms  => Some(lid -> ms.maxBy(_._3)._1)
      }
    }.toMap
    assert(expected.nonEmpty && got == expected)
  }

  test("asofJoin: equal timestamps match; no-prior-right rows drop") {
    val l = Seq((1L, "a", 100L), (2L, "a", 50L), (3L, "b", 10L))
      .toDF("l_id", "k", "l_ts")
    val r = Seq((9L, "a", 100L), (8L, "a", 60L)).toDF("r_id", "k", "r_ts")
    val got = AsOf.asofJoin(l, r, "k", "l_ts", "r_ts")
      .select("l_id", "r_id").as[(Long, Long)].collect().toMap
    // l1 matches r9 at the same instant; l2 has no right at ts<=50; key b empty
    assert(got == Map(1L -> 9L))
  }

  test("asofJoin: equal-ts right rows resolve to the greatest payload, deterministically") {
    val l = Seq((1L, "a", 100L)).toDF("l_id", "k", "l_ts")
    val r = Seq((7L, "a", 90L), (5L, "a", 90L)).toDF("r_id", "k", "r_ts")
    (1 to 3).foreach { p =>
      val got = AsOf.asofJoin(l, r.repartition(p), "k", "l_ts", "r_ts")
        .select("r_id").as[Long].collect().toSeq
      assert(got == Seq(7L))
    }
  }

  test("splitIndex: exhaustive, partitioning-invariant, near weight proportions") {
    val docs = (1 to 4000).map(i => s"document body number $i").toDF("text")
    val w = Seq(0.8, 0.1, 0.1)
    val counts = docs.repartition(7)
      .groupBy(Sampling.splitIndex(col("text"), w).as("split"))
      .count().as[(Int, Long)].collect().toMap
    assert(counts.keySet == Set(0, 1, 2))
    assert(math.abs(counts(0) - 3200.0) / 4000 < 0.03)
    // pure function of the value: identical assignment at any parallelism
    val again = docs.repartition(1)
      .groupBy(Sampling.splitIndex(col("text"), w).as("split"))
      .count().as[(Int, Long)].collect().toMap
    assert(again == counts)
  }

  test("hexThresholds matches the SQL contract; sampled() rate behaves") {
    // the constants the t11_splits DuckDB oracle hardcodes
    assert(Sampling.hexThresholds(Seq(0.8, 0.1, 0.1)) == Seq("cccc", "e666"))
    val docs = (1 to 4000).map(i => s"row $i").toDF("v")
    val kept = docs.filter(Sampling.sampled(col("v"), 0.25)).count()
    assert(math.abs(kept - 1000.0) / 4000 < 0.03)
    assert(docs.filter(Sampling.sampled(col("v"), 1.0)).count() == 4000)
  }

  test("stratifiedSampled: per-stratum rates; stable membership within a stratum") {
    val docs = (1 to 3000)
      .map(i => (s"doc $i", if (i % 3 == 0) "en" else if (i % 3 == 1) "zh" else "fr"))
      .toDF("v", "lang")
    val keep = Sampling.stratifiedSampled(col("v"), col("lang"),
      Seq("en" -> 0.5, "zh" -> 0.25), 0.125)
    val counts = docs.filter(keep).groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(math.abs(counts("en") - 500.0) / 1000 < 0.06)   // 0.5 of 1000
    assert(math.abs(counts("zh") - 250.0) / 1000 < 0.06)   // 0.25 of 1000
    assert(math.abs(counts("fr") - 125.0) / 1000 < 0.06)   // default 0.125
    // raising a stratum's rate only ADDS rows within it (prefix property):
    val low = docs.filter(Sampling.stratifiedSampled(col("v"), col("lang"),
      Seq("en" -> 0.25), 0.125)).filter(col("lang") === "en")
      .select("v").as[String].collect().toSet
    val high = docs.filter(keep).filter(col("lang") === "en")
      .select("v").as[String].collect().toSet
    assert(low.subsetOf(high))
  }

  test("k-per-group sample plans a WindowGroupLimit (pre-shuffle prune)") {
    // the t15_group_sample shape: a rank filter over a window must let
    // Spark push a per-partition top-k BELOW the exchange, so each map
    // task ships at most k rows per group instead of the whole group
    val docs = (1 to 500)
      .map(i => (s"d$i", if (i % 2 == 0) "en" else "fr")).toDF("doc_id", "lang")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(md5(col("doc_id")), col("doc_id"))
    val q = docs
      .select(col("lang"), col("doc_id"), row_number().over(w).cast("long").as("rn"))
      .filter(col("rn") <= 5)
    assert(q.count() == 10)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("tokenBudget: exact running-sum cut per stratum; prefix property") {
    val docs = (1L to 300L)
      .map(i => (i, if (i % 3 == 0) "en" else "fr", ("tok " * (i % 7 + 1).toInt).trim))
      .toDF("doc_id", "lang", "text")
    val toks = size(split(col("text"), " "))
    val out = Sampling.tokenBudget(docs, "doc_id", "lang", toks,
      Seq("en" -> 50L), defaultBudget = 30L)
      .select("lang", "doc_id", "n_tokens", "cum_tokens")
      .as[(String, Long, Long, Long)].collect()
    // never exceeds the budget, and the kept set is the maximal prefix:
    val byLang = out.groupBy(_._1)
    assert(byLang("en").map(_._4).max <= 50L)
    assert(byLang("fr").map(_._4).max <= 30L)
    // recompute expected prefix on the driver from the same order
    def hex(id: Long) = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val rows = docs.select(col("doc_id"), col("lang"), toks.cast("long").as("n"))
      .as[(Long, String, Long)].collect()
    def expected(lang: String, budget: Long) = {
      var cum = 0L
      rows.filter(_._2 == lang).sortBy(r => (hex(r._1), r._1)).takeWhile { r =>
        cum += r._3; cum <= budget
      }.map(_._1).toSet
    }
    assert(byLang("en").map(_._2).toSet == expected("en", 50L))
    assert(byLang("fr").map(_._2).toSet == expected("fr", 30L))
    // raising a budget only ADDS docs (prefix property):
    val bigger = Sampling.tokenBudget(docs, "doc_id", "lang", toks,
      Seq("en" -> 120L), defaultBudget = 30L)
      .filter(col("lang") === "en").select("doc_id").as[Long].collect().toSet
    assert(byLang("en").map(_._2).toSet.subsetOf(bigger))
  }

  test("weightedPriority: A-ES semantics — dominant weight always sampled first, " +
       "partitioning-independent") {
    val rows = (1L to 100L).map(i => (i, if (i == 7L) 1e12 else 1.0))
    val df = rows.toDF("id", "w")
      .withColumn("pri", Sampling.weightedPriority(col("id").cast("string"), col("w")))
    // ln(u)/w with w = 1e12 is > ln(u')/1 for every representable u'
    // (max u' = 1 - 1.16e-10 -> pri' <= -1.16e-10; |ln u|/1e12 <= 2.2e-11)
    val top = df.orderBy(col("pri").desc, col("id")).select("id").as[Long].head()
    assert(top == 7L)
    // driver-side recomputation of the exact formula (the oracle contract)
    def pri(id: Long, w: Double): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val h = java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
      // Spark's Log expression evaluates via StrictMath (1 ulp off
      // Math.log for some inputs); ordering is ulp-insensitive but this
      // exact-equality check must use the same implementation
      java.lang.StrictMath.log((h + 0.5) / 4294967296.0) / w
    }
    val got = df.select("id", "pri").as[(Long, Double)].collect().toMap
    rows.foreach { case (id, w) => assert(got(id) == pri(id, w), s"id=$id") }
    // deterministic under any partitioning: top-5 identical at 1 and 13 parts
    def top5(parts: Int) = graft.ops.TopK.topKPerKey(
      df.repartition(parts).withColumn("k", lit("all")),
      Seq("k"), "pri", "id", 5).select("id", "rnk").as[(Long, Int)].collect().toSet
    assert(top5(1) == top5(13))
  }

  test("q55_assoc matches a brute-force basket recomputation at sf0.001") {
    val got = SparkEntry.queries("q55_assoc")(spark, sfUnit)
      .select("part_a", "part_b", "pair_cnt", "support", "conf_ab", "conf_ba", "lift")
      .as[(Long, Long, Long, Double, Double, Double, Double)].collect()
    assert(got.nonEmpty && got.forall(_._3 >= 2))

    val li = spark.read.parquet(s"$sfUnit/lineitem.parquet")
      .select(col("l_orderkey").as[Long], col("l_partkey").as[Long])
      .collect().distinct
    val nOrders = li.map(_._1).distinct.length.toLong
    val icnt = li.groupBy(_._2).map { case (p, xs) => p -> xs.length.toLong }
    val pairs = li.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
      .filter(_._2 >= 2L)

    assert(got.length == pairs.size)
    got.foreach { case (a, b, cnt, sup, cab, cba, lift) =>
      assert(pairs((a, b)) == cnt, s"pair ($a,$b)")
      assert(sup == cnt.toDouble / nOrders)
      assert(cab == cnt.toDouble / icnt(a) && cba == cnt.toDouble / icnt(b))
      assert(lift == (cnt * nOrders).toDouble / (icnt(a) * icnt(b)).toDouble)
    }
  }
}
