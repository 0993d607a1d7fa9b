package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import java.util.Base64
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** JSON-edge codecs (F10/F20): the reference moves float32 vectors as
  * base64 little-endian buffers in every document JSON
  * (biencoder/main.py:17-24, indexer/main.py:60-67,
  * nilcluster/main.py:15-21). Inside the engine vectors are
  * array<float>; these codecs exist only at ingest/egress.
  */
object Codec {

  def floatsToBase64(v: Array[Float]): String = {
    val bb = ByteBuffer.allocate(v.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    v.foreach(bb.putFloat)
    Base64.getEncoder.encodeToString(bb.array())
  }

  def base64ToFloats(s: String): Array[Float] = {
    val bytes = Base64.getDecoder.decode(s)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Float](bytes.length / 4)
    var i = 0
    while (i < out.length) { out(i) = bb.getFloat(); i += 1 }
    out
  }

  val encodeVecUdf = udf((v: Seq[Float]) =>
    if (v == null) null else floatsToBase64(v.toArray))
  val decodeVecUdf = udf((s: String) =>
    if (s == null) null else base64ToFloats(s).toSeq)

  def encodeVec(c: Column): Column = encodeVecUdf(c)
  def decodeVec(c: Column): Column = decodeVecUdf(c)
}
