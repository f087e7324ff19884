package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns plus typed metadata, with decode / feature-
  * extraction as partition-local batch transforms.
  *
  * The actual media decode is STUBBED (no image/audio libraries in this
  * environment): [[StubDecoder.decode]] produces deterministic fake
  * features from the bytes. Everything around it — schema, encoder,
  * batch shape, partition-local execution, no shuffle — is the real
  * Spark plumbing a codec-backed decoder would drop into.
  */
object MultiModal {

  /** A decoded-media feature row. A real pipeline would carry
    * width/height/channels from the codec and a feature vector from a
    * model; here they are deterministic functions of the payload. */
  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      channels: Int,
      checksum: Long)

  /** STUB decoder — deterministic fake in place of a codec call.
    * A real implementation replaces ONLY this object. */
  object StubDecoder {
    def decode(id: Long, payload: Array[Byte]): MediaFeatures = {
      var ck = 1125899906842597L // FNV-ish rolling checksum
      var i = 0
      while (i < payload.length) { ck = ck * 31 + (payload(i) & 0xff); i += 1 }
      MediaFeatures(
        doc_id = id,
        n_bytes = payload.length.toLong,
        width = (payload.length % 640) + 1,
        height = ((payload.length * 7) % 480) + 1,
        channels = 3,
        checksum = ck)
    }
  }

  /** Attach a binary payload column derived from text (the corpus has
    * no true media; the bytes are real, the modality is simulated). */
  def withPayload(df: DataFrame, textCol: String = "text",
      outCol: String = "payload"): DataFrame =
    df.withColumn(outCol, col(textCol).cast("binary"))

  /** Partition-local batch decode: mapPartitions over (id, payload),
    * one decoder instance per partition (where a real codec would be
    * initialized once), no shuffle, output is a typed Dataset. */
  def decodeFeatures(df: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload"): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real decoder init would happen here, once per partition
        rows.map { case (id, payload) => StubDecoder.decode(id, payload) }
      }
  }

  /** Column-only metadata extraction (no decode): payload size and
    * fake geometry as pure expressions — stays in WholeStageCodegen,
    * used by the oracle-checked query. */
  def payloadMeta(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    df.select(
      col(idCol),
      octet_length(col(textCol)).cast("long").as("n_bytes"),
      (octet_length(col(textCol)) % 640 + 1).as("width"),
      (octet_length(col(textCol)) * 7 % 480 + 1).as("height"),
      lit(3).as("channels"),
      ascii(substring(col(textCol), 1, 1)).as("first_byte"))
}
