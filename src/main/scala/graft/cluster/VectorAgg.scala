package graft.cluster

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise vector mean as a typed Aggregator (A3 — the reference's
  * per-cluster `np.mean(encodings, axis=0)`, TimeEvolving.py:94-95).
  * Buffer = (elementwise double sums, count); merge is associative and
  * commutative, so the result is partitioning-independent up to FP
  * addition order — accepted tolerance for centroid comparisons is
  * enforced by thresholded comparisons downstream, never equality.
  */
/** Aggregation buffer — top-level public so Catalyst codegen can
  * construct it (nested private classes break generated code).
  */
final case class VecBuf(sums: Array[Double], n: Long)

object VectorAgg {
  private type Buf = VecBuf
  private def Buf(s: Array[Double], n: Long) = VecBuf(s, n)

  private val agg = new Aggregator[Seq[Float], Buf, Seq[Float]] {
    def zero: Buf = Buf(Array.empty, 0L)
    def reduce(b: Buf, v: Seq[Float]): Buf = {
      if (b.n == 0) Buf(v.map(_.toDouble).toArray, 1L)
      else {
        val s = b.sums
        var i = 0
        while (i < s.length && i < v.length) { s(i) += v(i); i += 1 }
        Buf(s, b.n + 1)
      }
    }
    def merge(a: Buf, c: Buf): Buf = {
      if (a.n == 0) c
      else if (c.n == 0) a
      else {
        val s = a.sums
        var i = 0
        while (i < s.length && i < c.sums.length) { s(i) += c.sums(i); i += 1 }
        Buf(s, a.n + c.n)
      }
    }
    def finish(b: Buf): Seq[Float] =
      if (b.n == 0) Seq.empty
      else b.sums.map(x => (x / b.n).toFloat).toSeq
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Seq[Float]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Column form: meanVec(embCol) over a group. */
  def meanVec(c: Column): Column =
    org.apache.spark.sql.functions.udaf(agg).apply(c)
}
