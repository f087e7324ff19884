package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization for embedding columns.
  *
  * At vector-corpus scale the embedding column dominates storage and —
  * worse — every shuffle that carries it: a 1024-dim float32 vector is
  * 4 KiB per row. Symmetric per-vector int8 quantization cuts that 4×
  * with bounded error (max|x| / 254 per component), which is the
  * standard first step before ANN candidate generation; exact-score
  * verification dequantizes or re-reads the float column for the tiny
  * candidate set only.
  *
  * Rounding is an explicit `floor(x·scale + 0.5)` (half-up toward +∞)
  * rather than an engine `round()` so any engine — including the
  * DuckDB oracle — reproduces the quantized bytes exactly; float→
  * double widening and the IEEE division are exact, so `scale` is
  * bit-identical across engines too.
  */
object VectorQuant {

  /** Per-vector scale: 127 / max|x| (0.0 for the all-zero vector). */
  def scaleOf(vec: Column): Column = {
    val maxAbs = array_max(transform(vec, x => abs(x.cast("double"))))
    when(maxAbs > 0, lit(127.0) / maxAbs).otherwise(lit(0.0))
  }

  /** Quantized components as array<tinyint>, values in [-127, 127]. */
  def quantize(vec: Column, scale: Column): Column =
    transform(vec, x =>
      floor(x.cast("double") * scale + lit(0.5)).cast("tinyint"))

  /** Dequantized approximation (array<double>): q_i / scale. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, x =>
      when(scale > 0, x.cast("double") / scale).otherwise(lit(0.0)))

  /** Attach (`scale`, `q`) columns for `vecCol`. Per-row, codegen'd,
    * no shuffle. */
  def withQuantized(df: DataFrame, vecCol: String,
      scaleCol: String = "scale", qCol: String = "q"): DataFrame = {
    val s = scaleOf(col(vecCol))
    df.withColumn(scaleCol, s).withColumn(qCol, quantize(col(vecCol), s))
  }
}
