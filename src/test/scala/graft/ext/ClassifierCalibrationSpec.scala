package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the r12 calibration items on [[TextOps.qualityClassifierIndex]]:
  *   1. the `approx_percentile` calibration option lands within the
  *      GK rank contract of the exact-percentile operating point
  *      (VERDICT "What's wrong" #2 — the bounded-memory swap for a
  *      corpus-scale labeled slice);
  *   2. a labeled slice with NO positive doc carrying features yields
  *      an honest uncalibrated index (threshold None) whose gate keeps
  *      nothing — matching the SQL oracle's NULL-percentile behavior
  *      instead of throwing (ADVICE #1: fuzz corpora can draw that
  *      slice).
  */
class ClassifierCalibrationSpec extends SparkSpec {
  import spark.implicits._

  // Varied positive texts so the positive norm-score distribution has
  // genuine spread for the percentile to act on.
  private def fixture = {
    val pos = Seq(
      "a careful study of long run economic growth and productivity",
      "the committee reviewed detailed evidence on inflation dynamics",
      "researchers measured household savings across three decades",
      "an essay on the methods of careful empirical research",
      "monetary policy transmission through credit markets examined",
      "a detailed survey of labor force participation trends",
      "evidence based analysis of trade and industrial output",
      "the quarterly report documents capital investment patterns",
      "careful research methods applied to price index construction",
      "long run evidence on productivity and economic output growth")
    val neg = Seq(
      "click here buy now free offer limited time",
      "free offer click now buy here act fast",
      "buy free now offer click here today only",
      "winner winner claim your free prize now click",
      "cheap deals click buy free offer now now",
      "offer expires click buy free now limited stock")
    (pos.zipWithIndex.map { case (t, i) => (i.toLong, t, true) } ++
      neg.zipWithIndex.map { case (t, i) => (100L + i, t, false) })
      .toDF("doc_id", "text", "label")
  }

  test("approx_percentile calibration agrees with exact within the GK rank contract") {
    val labeled = fixture
    val exact = TextOps.qualityClassifierIndex(labeled, "label", buckets = 1 << 16)
    val approx = TextOps.qualityClassifierIndex(labeled, "label",
      buckets = 1 << 16, approxCalibration = true, approxAccuracy = 10000)
    assert(exact.threshold.isDefined && approx.threshold.isDefined)
    // Recover the positives' norm-score distribution through the
    // screen (same features, same weights join as calibration).
    val norms = TextOps.screenQualityClassifier(
        labeled.filter(col("label")), exact)
      .select(col("norm_score").cast("double")).as[Double].collect().sorted
    val n = norms.length
    val eps = 1.0 / 10000
    // GK contract: the returned value's rank is within ε·n of the
    // requested 0.1·n; exact interpolation adds at most one position.
    def rankOf(t: Double): Int = norms.count(_ <= t)
    assert(math.abs(rankOf(approx.threshold.get) - 0.1 * n) <= 1 + eps * n,
      s"approx P10 rank off: thr=${approx.threshold.get} over ${norms.toSeq}")
    // The two operating points may disagree ONLY on docs whose norm
    // lies between them (exact interpolates between observations; GK
    // returns an observation — a doc sitting exactly at the approx
    // threshold legitimately flips). Everything outside that band
    // must gate identically.
    val thrLo = math.min(exact.threshold.get, approx.threshold.get)
    val thrHi = math.max(exact.threshold.get, approx.threshold.get)
    val screenedE = TextOps.screenQualityClassifier(labeled, exact)
      .select(col("doc_id"), col("norm_score").cast("double").as("norm"),
        col("keep").as("keep_e"))
    val screenedA = TextOps.screenQualityClassifier(labeled, approx)
      .select(col("doc_id"), col("keep").as("keep_a"))
    val diverged = screenedE.join(screenedA, "doc_id")
      .filter(col("keep_e") =!= col("keep_a"))
      .filter(col("norm") < thrLo || col("norm") > thrHi)
      .count()
    assert(diverged == 0L,
      s"gating diverged outside the [$thrLo, $thrHi] threshold band")
  }

  test("no-positive labeled slice yields an uncalibrated index that keeps nothing") {
    val labeled = Seq(
      (1L, "click here buy now", false),
      (2L, "free offer act fast", false)).toDF("doc_id", "text", "label")
    val index = TextOps.qualityClassifierIndex(labeled, "label", buckets = 1 << 16)
    assert(index.threshold.isEmpty)
    val screened = TextOps.screenQualityClassifier(
      Seq((10L, "click here buy now"), (11L, "any text at all"))
        .toDF("doc_id", "text"), index)
    assert(screened.filter(col("keep")).count() == 0L,
      "an uncalibrated gate must keep nothing")
    assert(screened.count() == 2L, "every doc still gets a scored row")
  }

  test("positives without features (empty text) also yield threshold None") {
    val labeled = Seq(
      (1L, "", true),
      (2L, "click here buy now", false)).toDF("doc_id", "text", "label")
    val index = TextOps.qualityClassifierIndex(labeled, "label", buckets = 1 << 16)
    assert(index.threshold.isEmpty)
  }
}
