package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.types._

/** Multimodal (binary) column plumbing.
  *
  * Media payloads are opaque `binary` columns with typed metadata. The
  * decode/feature-extract step runs as a partition-wise batch operator
  * (`mapPartitions`) — the Spark-side shape (schema, batching, partitioning)
  * is real; the actual media decoder is a STUB (deterministic byte-level
  * features) because no image/audio codecs ship in this environment. Swapping
  * `decodeStub` for a real decoder (JNI/ONNX/etc.) changes no plumbing.
  */
object Multimodal {

  final case class BinaryFeatures(byteLen: Long, contentMd5: String, headHex: String)

  /** STUB decoder: deterministic byte-level features standing in for a real
    * media decode (dimensions, duration, embeddings, ...).
    */
  def decodeStub(bytes: Array[Byte]): BinaryFeatures = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val md5hex = md.digest(bytes).map("%02x".format(_)).mkString
    val head = bytes.take(8).map("%02X".format(_)).mkString
    BinaryFeatures(bytes.length.toLong, md5hex, head)
  }

  /** Attach features extracted from `binaryCol` via the batch decoder.
    * One pass, no shuffle; rows stream through the decoder per partition
    * exactly as they would through a Pandas-UDF batch in PySpark.
    */
  def extractFeatures(df: DataFrame, binaryCol: String): DataFrame = {
    val idx = df.schema.fieldIndex(binaryCol)
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("byte_len", LongType),
      StructField("content_md5", StringType),
      StructField("head_hex", StringType)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val f = if (bytes == null) BinaryFeatures(0L, null, null) else decodeStub(bytes)
        Row.fromSeq(r.toSeq ++ Seq(f.byteLen, f.contentMd5, f.headHex))
      }
    }(enc)
  }
}
