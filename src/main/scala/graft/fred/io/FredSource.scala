package graft.fred.io

import java.time.LocalDate
import org.apache.spark.sql.{DataFrame, SparkSession}

/** G1 — the FRED `series/observations` REST source.
  *
  * An API that returns at most thousands of rows per call must not be a
  * distributed scan: fetch on the driver, parallelize the result
  * (`extract_fred_data.py:94-139`). The trait lets tests inject fixture
  * JSON; `HttpFredSource` is the real client with the reference's retry
  * posture (3 retries, backoff, honor 429; `extract_fred_data.py:74-77,
  * 105-110`).
  */
trait FredSource {
  /** One calendar month of observations as raw FRED response JSON. */
  def fetchMonth(seriesId: String, start: LocalDate, end: LocalDate): String
}

object FredSource {

  /** C8 — split an inclusive [start, end] range into calendar-month
    * (first, last) pairs (`extract_fred_data.py:22-51`). Driver-side:
    * it parameterizes ingest, not data. */
  def monthRanges(start: LocalDate, end: LocalDate): Seq[(LocalDate, LocalDate)] = {
    Iterator.iterate(start.withDayOfMonth(1))(_.plusMonths(1))
      .takeWhile(!_.isAfter(end))
      .map { first =>
        val last = first.plusMonths(1).minusDays(1)
        (if (first.isBefore(start)) start else first,
         if (last.isAfter(end)) end else last)
      }
      .toSeq
  }

  /** Parse one raw FRED response into a DataFrame of the observation
    * array. Shape-validated like `extract_fred_data.py:116-129`: an
    * `observations` list must be present, each element carrying
    * `date` + `value`. */
  def observations(spark: SparkSession, responseJson: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val raw = spark.read.json(Seq(responseJson).toDS())
    require(raw.columns.contains("observations"),
      "FRED response missing 'observations'")
    val obs = raw.select(explode(col("observations")).as("o")).select("o.*")
    require(Seq("date", "value").forall(obs.columns.contains),
      "FRED observation missing date/value")
    obs
  }

  /** Fixture-backed source for tests. */
  class Fixture(byMonth: Map[(String, Int, Int), String]) extends FredSource {
    def fetchMonth(seriesId: String, start: LocalDate, end: LocalDate): String =
      byMonth((seriesId, start.getYear, start.getMonthValue))
  }

  /** One HTTP exchange as seen by the retry loop. */
  case class HttpReply(status: Int, retryAfter: Option[String], body: String)

  /** Real HTTP client. Retries 5xx/429 with linear backoff like the
    * reference's `urllib3.Retry(total=3, backoff_factor=1)`, and
    * spaces successive calls by `throttleMillis` — the reference's
    * inter-month politeness sleep (`extract_fred_data.py:284` sleeps
    * 5 s between calls). Kept driver-side; zero-egress environments
    * never construct it. `sleep`/`nowMillis` are injectable so the
    * timing behavior is unit-testable with a fake clock, and
    * [[request]] is overridable to fake the transport.
    */
  class Http(apiKey: String,
      baseUrl: String = "https://api.stlouisfed.org/fred/series/observations",
      maxRetries: Int = 3,
      throttleMillis: Long = 5000L,
      sleep: Long => Unit = Thread.sleep,
      nowMillis: () => Long = () => System.currentTimeMillis()) extends FredSource {
    private lazy val client = java.net.http.HttpClient.newHttpClient()
    private var lastCallAt = Long.MinValue / 2 // first call never throttles

    /** One GET exchange — the only method that touches the network. */
    protected def request(url: String): HttpReply = {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url)).GET().build()
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      val ra = resp.headers().firstValue("Retry-After")
      HttpReply(resp.statusCode(), if (ra.isPresent) Some(ra.get) else None, resp.body())
    }

    def fetchMonth(seriesId: String, start: LocalDate, end: LocalDate): String = {
      val url = s"$baseUrl?series_id=$seriesId&api_key=$apiKey&file_type=json" +
        s"&observation_start=$start&observation_end=$end"
      var attempt = 0
      var result: Option[String] = None
      while (result.isEmpty) {
        val throttle = lastCallAt + throttleMillis - nowMillis()
        if (throttle > 0) sleep(throttle)
        val resp = request(url)
        lastCallAt = nowMillis()
        resp.status match {
          case 200 => result = Some(resp.body)
          case code if (code == 429 || code >= 500) && attempt < maxRetries =>
            // Retry-After may be delta-seconds OR an HTTP-date
            // (RFC 9110 §10.2.3); a non-integer value falls back to
            // the linear backoff instead of aborting the retry loop
            val waitSec = resp.retryAfter
              .flatMap(v => scala.util.Try(v.trim.toLong).toOption)
              .getOrElse((attempt + 1).toLong)
            sleep(waitSec * 1000L)
            attempt += 1
          case code => sys.error(s"FRED API error $code for $seriesId")
        }
      }
      result.get
    }
  }
}
