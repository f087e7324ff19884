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

  /** Aspect-preserving resize planning: fit the (stub-decoded) source
    * geometry into a `target`×`target` box with exact integer
    * arithmetic — w·target DIV max(w,h), floored at 1 — plus the
    * proportional output byte count a stride-sampling resizer would
    * produce. The geometry math is what a real thumbnailing stage
    * computes per image before invoking the codec; all of it is pure
    * column algebra (codegen'd, zero shuffle, oracle-replayable). The
    * pixel transform itself is the stubbed codec stage. */
  def resizePlan(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", target: Int = 224): DataFrame = {
    require(target >= 1, s"target must be positive, got $target")
    df.select(col(idCol),
        octet_length(col(textCol)).cast("long").as("n_bytes"),
        (octet_length(col(textCol)) % 640 + 1).cast("long").as("w_in"),
        (octet_length(col(textCol)) * 7 % 480 + 1).cast("long").as("h_in"))
      .withColumn("w_out",
        greatest(lit(1L), expr(s"(w_in * $target) DIV greatest(w_in, h_in)")))
      .withColumn("h_out",
        greatest(lit(1L), expr(s"(h_in * $target) DIV greatest(w_in, h_in)")))
      .withColumn("n_bytes_out",
        greatest(lit(1L), expr("(n_bytes * (w_out * h_out)) DIV (w_in * h_in)")))
  }

  /** Frame-sampling plan for video-shaped payloads: treat the payload
    * as `n_bytes DIV frameSize` fixed-size frames and emit every
    * `stride`-th frame's index and byte offset — the explode a video
    * pipeline runs to fan frames out to per-frame decode/inference.
    * One generated row per SAMPLED frame (payloads too short for one
    * full frame yield no rows), pure sequence+explode column algebra:
    * zero shuffle, linear output, oracle-replayable. The byte slice
    * itself (`substring(payload, byte_off+1, frameSize)`) is the
    * stubbed codec hand-off. */
  def frameSamplePlan(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", frameSize: Int = 64,
      stride: Int = 4): DataFrame = {
    require(frameSize >= 1 && stride >= 1,
      s"frameSize/stride must be positive, got $frameSize/$stride")
    df.select(col(idCol),
        // integral DIV, not float-divide-then-truncate: exact for any
        // payload width and the codebase's stated arithmetic convention
        // (r8 ADVICE #3)
        expr(s"CAST(octet_length($textCol) AS BIGINT) DIV $frameSize")
          .as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col(idCol), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong)))
          .as("frame_idx"))
      .withColumn("byte_off", col("frame_idx") * frameSize)
  }
}
