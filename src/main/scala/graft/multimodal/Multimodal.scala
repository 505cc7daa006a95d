package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (harness extension): image/audio/video as
  * opaque `binary` columns with typed metadata, processed in batches.
  *
  * The container has no media codecs, so the decode step is STUBBED with a
  * deterministic fake (md5-seeded feature vector) — clearly marked below.
  * Everything around it is real Spark plumbing: schema, partition sizing,
  * batch iteration shape (mapPartitions ≈ the JVM analog of mapInPandas
  * batches), and is what you'd keep when swapping in a real decoder.
  */
object Multimodal {

  final case class MediaMeta(
      id: Long, n_bytes: Int, header_hex: String, kind: String)
  final case class MediaFeature(id: Long, feature: Array[Float])

  /** Byte-level metadata over a binary column — pure column expressions.
    * `header_hex`: first 4 bytes, the magic-number sniff a real pipeline
    * does before routing to a decoder.
    */
  def withByteStats(df: DataFrame, binCol: String, idCol: String): DataFrame =
    df.select(
      col(idCol),
      length(col(binCol)).as("n_bytes"),
      lower(hex(substring(col(binCol), 1, 4))).as("header_hex"),
      when(lower(hex(substring(col(binCol), 1, 2))) === "ffd8", "jpeg")
        .when(lower(hex(substring(col(binCol), 1, 4))) === "89504e47", "png")
        .otherwise("unknown").as("kind"))

  /** Batched "decode + featurize" over binary payloads.
    *
    * ??? STUB ???  The real implementation would decode the payload
    * (image decode / audio resample / video frame-sample) inside
    * `decodeStub`. Here it derives a deterministic 8-dim fake feature
    * from the payload's md5 so the distributed plumbing (partition-level
    * batching, fixed-size output schema, skew-neutral repartition) is
    * real and testable without codecs.
    */
  def featurize(
      df: DataFrame,
      binCol: String,
      idCol: String,
      batchPartitions: Int = 0): Dataset[MediaFeature] = {
    val spark = df.sparkSession
    import spark.implicits._
    val sized = if (batchPartitions > 0) df.repartition(batchPartitions) else df
    sized
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // One digest instance per partition — the "per-batch model load"
        // slot a real decoder/model would occupy.
        val md = java.security.MessageDigest.getInstance("MD5")
        batch.map { case (id, payload) =>
          MediaFeature(id, decodeStub(md, payload))
        }
      }
  }

  /** ??? deterministic fake decode — replace with a real codec. */
  private def decodeStub(
      md: java.security.MessageDigest,
      payload: Array[Byte]): Array[Float] = {
    md.reset()
    val d = md.digest(if (payload == null) Array.emptyByteArray else payload)
    val out = new Array[Float](8)
    var i = 0
    while (i < 8) {
      out(i) = ((d(2 * i) & 0xff) * 256 + (d(2 * i + 1) & 0xff)) / 65535.0f
      i += 1
    }
    out
  }
}
