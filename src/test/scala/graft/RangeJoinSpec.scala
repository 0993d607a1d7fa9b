package graft

import graft.ops.RangeJoin
import org.apache.spark.sql.functions._

/** Bucketized point-in-interval join vs a brute-force cross-join oracle,
  * plus the properties that make the bucketing safe to use at scale:
  * bucket-width invariance (the width is a cost knob, never a semantics
  * knob), boundary inclusivity, null/empty-interval handling, and the
  * negative-domain floor behavior.
  */
class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def naive(points: Seq[(Long, java.lang.Long)],
                    ivals: Seq[(Long, java.lang.Long, java.lang.Long)]): Set[(Long, Long)] =
    (for {
      (pid, pt) <- points if pt != null
      (iid, lo, hi) <- ivals if lo != null && hi != null && lo <= hi
      if pt >= lo && pt <= hi
    } yield (pid, iid)).toSet

  test("pointInInterval equals brute force across bucket widths") {
    val rnd = new scala.util.Random(7)
    val points = (1 to 300).map(i => (i.toLong, java.lang.Long.valueOf(rnd.nextInt(2000) - 500)))
    val ivals = (1 to 80).map { i =>
      val lo = rnd.nextInt(2000) - 600
      (1000L + i, java.lang.Long.valueOf(lo), java.lang.Long.valueOf(lo + rnd.nextInt(300)))
    }
    val p = points.toDF("p_id", "pt")
    val iv = ivals.toDF("i_id", "lo", "hi")
    val expected = naive(points, ivals)
    assert(expected.nonEmpty)
    for (w <- Seq(1L, 7L, 100L, 10000L)) {
      val got = RangeJoin.pointInInterval(p, iv, "pt", "lo", "hi", w)
        .select("p_id", "i_id").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"dup pairs at width $w")
      assert(got.toSet == expected, s"mismatch at width $w")
    }
  }

  test("boundaries inclusive; hi<lo and nulls drop; overlapping intervals multi-match") {
    val p = Seq((1L, java.lang.Long.valueOf(10L)), (2L, null.asInstanceOf[java.lang.Long]))
      .toDF("p_id", "pt")
    val iv = Seq(
      (10L, java.lang.Long.valueOf(10L), java.lang.Long.valueOf(10L)), // degenerate, matches
      (11L, java.lang.Long.valueOf(0L), java.lang.Long.valueOf(10L)),  // hi boundary
      (12L, java.lang.Long.valueOf(10L), java.lang.Long.valueOf(20L)), // lo boundary
      (13L, java.lang.Long.valueOf(20L), java.lang.Long.valueOf(0L)),  // inverted: no match
      (14L, null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(99L))) // null lo
      .toDF("i_id", "lo", "hi")
    val got = RangeJoin.pointInInterval(p, iv, "pt", "lo", "hi", 4L)
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (1L, 11L), (1L, 12L)))
  }

  test("column collision and non-positive width rejected") {
    val a = Seq((1L, 2L)).toDF("x", "pt")
    val b = Seq((1L, 2L, 3L)).toDF("x", "lo", "hi")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(a, b, "pt", "lo", "hi", 10L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(a.withColumnRenamed("x", "y"), b, "pt", "lo", "hi", 0L)
    }
  }

  test("intervalOverlap equals brute force, exactly once, across bucket widths") {
    val rnd = new scala.util.Random(11)
    val as = (1 to 120).map { i =>
      val lo = rnd.nextInt(1500) - 300; (i.toLong, lo.toLong, (lo + rnd.nextInt(200)).toLong)
    }
    val bs = (1 to 90).map { i =>
      val lo = rnd.nextInt(1500) - 400; (500L + i, lo.toLong, (lo + rnd.nextInt(350)).toLong)
    }
    val a = as.toDF("a_id", "a_lo", "a_hi")
    val b = bs.toDF("b_id", "b_lo", "b_hi")
    val expected = (for {
      (ai, alo, ahi) <- as; (bi, blo, bhi) <- bs
      if alo <= bhi && blo <= ahi
    } yield (ai, bi)).toSet
    assert(expected.nonEmpty)
    for (w <- Seq(1L, 13L, 100L, 5000L)) {
      val got = RangeJoin.intervalOverlap(a, b, "a_lo", "a_hi", "b_lo", "b_hi", w)
        .select("a_id", "b_id").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"pair emitted twice at width $w")
      assert(got.toSet == expected, s"mismatch at width $w")
    }
  }

  test("plan is an equi hash join on the bucket id, not a nested-loop join") {
    val p = (1 to 50).map(i => (i.toLong, i.toLong * 3)).toDF("p_id", "pt")
    val iv = (1 to 10).map(i => (100L + i, i * 10L, i * 10L + 25L)).toDF("i_id", "lo", "hi")
    val plan = RangeJoin.pointInInterval(p, iv, "pt", "lo", "hi", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
    assert(plan.contains("HashJoin"), plan)
    val p2 = (1 to 50).map(i => (i.toLong, i * 3L, i * 3L + 20L)).toDF("a_id", "a_lo", "a_hi")
    val iv2 = (1 to 10).map(i => (100L + i, i * 10L, i * 10L + 25L)).toDF("i_id", "lo", "hi")
    val plan2 = RangeJoin.intervalOverlap(p2, iv2, "a_lo", "a_hi", "lo", "hi", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan2.contains("NestedLoop"), plan2)
    assert(plan2.contains("HashJoin"), plan2)
  }
}
