package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The codec paths against EXTERNALLY-encoded media (r11 VERDICT #5):
  * every other media fixture in this repo is synthesized by the same
  * JVM stack that decodes it. The payloads under
  * `src/test/resources/fixtures/media/` were written by CPython's
  * zlib (hand-assembled PNG chunks) and `wave` stdlib modules — a
  * fully independent encoder lineage — and the expected stats below
  * were computed by the Python generator from its own pixel/sample
  * formulas, never from the JVM decode. A decoder that fabricates or
  * drifts on foreign bytes cannot match them.
  */
class ExternalMediaSpec extends SparkSpec {
  import spark.implicits._

  private def bytesOf(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/media/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  test("javax.imageio decodes CPython-encoded PNGs pixel-exactly") {
    // (name, w, h, checksum) — checksum = the decoder's y/x/band
    // 31-fold, computed in Python from the generator formulas
    val expect = Seq(
      ("ext_grad_9x7.png", 9, 7, -6146626025424570757L),
      ("ext_stripe_5x5.png", 5, 5, 2890709134989712314L),
      ("ext_flat_3x2.png", 3, 2, -430664102792208667L))
    expect.foreach { case (name, w, h, ck) =>
      val f = MultiModal.ImageIODecoder.decode(1L, bytesOf(name))
      assert((f.width, f.height, f.channels) == ((w, h, 3)), name)
      assert(f.checksum == ck,
        s"$name: decoded checksum ${f.checksum} != independent $ck")
    }
  }

  test("javax.sound.sampled decodes CPython-encoded WAVs sample-exactly") {
    // (name, rate, frames, first, last, sum) from the wave-module
    // generator's own formulas
    val expect = Seq(
      ("ext_saw_300.wav", 8000, 300L, -2048, 1839, -31350L),
      ("ext_const_64.wav", 16000, 64L, 1000, 1000, 64000L),
      ("ext_alt_128.wav", 11025, 128L, 500, -500, 0L))
    expect.foreach { case (name, rate, frames, first, last, sum) =>
      val m = MultiModal.decodeWavMeta(2L, bytesOf(name))
      assert(m.sample_rate == rate && m.channels == 1 && m.bits == 16, name)
      assert(m.n_frames == frames, name)
      assert((m.first_sample, m.last_sample, m.sum_samples) ==
        ((first, last, sum)), s"$name: $m")
    }
  }

  test("the Spark decode plumbing runs external payloads end to end") {
    // same mapPartitions plan the catalog uses, fed foreign bytes via
    // a binary column — the full distributed path, not just the codec
    val rows = Seq(
      (1L, bytesOf("ext_grad_9x7.png")),
      (2L, bytesOf("ext_stripe_5x5.png")),
      (3L, bytesOf("ext_flat_3x2.png"))).toDF("doc_id", "payload")
    val out = MultiModal.decodeFeatures(rows,
        decoder = MultiModal.ImageIODecoder)
      .collect().map(f => f.doc_id -> f).toMap
    assert(out(1L).width == 9 && out(1L).height == 7)
    assert(out(1L).checksum == -6146626025424570757L)
    assert(out(2L).checksum == 2890709134989712314L)
    assert(out(3L).checksum == -430664102792208667L)
    // corrupt bytes must THROW, not fabricate (the stub's privilege
    // is exactly what a real decoder must not have)
    val corrupt = Seq((9L, Array.fill[Byte](40)(7))).toDF("doc_id", "payload")
    intercept[Exception] {
      MultiModal.decodeFeatures(corrupt,
        decoder = MultiModal.ImageIODecoder).collect()
    }
  }
}
