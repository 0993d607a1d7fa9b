package graft

import graft.ops.Pack
import org.apache.spark.sql.functions._

/** Sequence packing + chunking: bin-assignment invariants, partitioning
  * determinism, and loss-free text reconstruction from chunks.
  */
class PackSpec extends SparkTestBase {
  import spark.implicits._

  test("linearPack: contiguous offsets, bin-start rule, partitioning-invariant") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 400).map(i =>
      (f"d$i%04d", s"g${i % 3}", (rnd.nextInt(900) + 100).toLong))
    val df = rows.toDF("doc_id", "grp", "toks")
    def packed(parts: Int) =
      Pack.linearPack(df.repartition(parts), Seq("grp"), "doc_id", "toks", 1000L)
        .select("doc_id", "grp", "toks", "bin_offset", "bin_id")
        .as[(String, String, Long, Long, Long)].collect().sortBy(_._1)
    val p = packed(7)
    assert(p.toSeq == packed(1).toSeq, "bin assignment depends on partitioning")
    // per group: offsets are the exclusive prefix sums in doc_id order,
    // and bin_id is the bin the row STARTS in
    p.groupBy(_._2).foreach { case (_, g) =>
      val sorted = g.sortBy(_._1)
      var cum = 0L
      sorted.foreach { case (_, _, t, off, bin) =>
        assert(off == cum && bin == off / 1000)
        cum += t
      }
    }
    // a row never larger than binSize spans at most 2 bins' worth of
    // cumulative space; bins are dense 0..max per group
    p.groupBy(_._2).foreach { case (_, g) =>
      val bins = g.map(_._5).toSet
      assert(bins == (0L to bins.max).toSet)
    }
  }

  test("chunk: step/overlap arithmetic and loss-free reconstruction") {
    val docs = Seq(
      ("d1", "abcdefghijklmnopqrstuvwxyz0123456789"), // 36 chars
      ("d2", "short"),
      ("d3", "")).toDF("doc_id", "text")
    val out = Pack.chunk(docs, "text", 10, 4)
      .select("doc_id", "chunk_idx", "chunk_start", "chunk")
      .as[(String, Long, Int, String)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2) }
    val d1 = out("d1")
    assert(d1.map(_._3).toSeq == Seq(0, 6, 12, 18, 24, 30))
    assert(d1.forall { case (_, i, s, _) => s == i * 6 })
    assert(d1.init.forall(_._4.length == 10) && d1.last._4.length == 6)
    // consecutive chunks agree on the 4-char overlap; stepping 6 chars
    // through the chunks reconstructs the text exactly
    d1.sliding(2).foreach { case Array((_, _, _, a), (_, _, _, b)) =>
      assert(a.takeRight(4) == b.take(4))
    }
    assert(d1.map(_._4.take(6)).mkString + d1.last._4.drop(6) ==
      "abcdefghijklmnopqrstuvwxyz0123456789")
    assert(out("d2").map(_._4).toSeq == Seq("short"))
    assert(out("d3").map(_._4).toSeq == Seq("")) // row survives as one empty chunk
  }
}
