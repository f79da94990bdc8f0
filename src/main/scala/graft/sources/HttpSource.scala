package graft.sources

import java.io.IOException
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S1: HTTP REST ingestion. The reference's entry point is a DRIVER-side
  * `requests.get` of the OpenWeatherMap forecast endpoint
  * (`/root/reference/src/weather_report_pipeline/weather_report_data_full_load_pipeline.py:8-12`)
  * — one city per run, the whole payload materialized on the driver.
  *
  * Here the url list (one url per city/shard) is distributed and each
  * partition fetches its urls ON EXECUTORS with bounded retries — at
  * scale the fetch fan-out is the cluster's, not the driver's, and a
  * flaky endpoint costs one task retry, not the job. This is the one
  * place imperative per-partition I/O is the right tool (network calls
  * are not expressible as Catalyst expressions); everything after the
  * payload lands is declarative ([[ForecastJsonSource.parse]]).
  */
final case class HttpJsonSource(urls: Seq[String],
    connectTimeoutMs: Int = 10000, readTimeoutMs: Int = 60000,
    maxRetries: Int = 2, retryBackoffMs: Long = 500L) extends Source {
  def load(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val parallelism = math.max(1,
      math.min(urls.size, spark.sparkContext.defaultParallelism))
    val (ct, rt, mr, bo) =
      (connectTimeoutMs, readTimeoutMs, maxRetries, retryBackoffMs)
    spark.createDataset(urls).repartition(parallelism)
      .map(u => HttpFetch.get(u, ct, rt, mr, bo))
      .toDF("payload")
  }
}

object HttpFetch {
  /** GET returning the body as UTF-8, with bounded retries + linear
    * backoff on IO errors and non-2xx responses (O4 parity: the
    * reference DAG declares `retries=1`,
    * `weather_report_data_full_load_dag.py:25`). Exhausting retries
    * throws — a dead endpoint fails the task loudly (Spark's task
    * retries add one more layer) instead of silently dropping a shard.
    */
  def get(url: String, connectTimeoutMs: Int, readTimeoutMs: Int,
      maxRetries: Int, backoffMs: Long): String = {
    var attempt = 0
    while (true) {
      try return fetchOnce(url, connectTimeoutMs, readTimeoutMs)
      catch {
        case e: IOException =>
          attempt += 1
          if (attempt > maxRetries) throw e
          Thread.sleep(backoffMs * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def fetchOnce(url: String, ct: Int, rt: Int): String = {
    val conn = URI.create(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(ct)
    conn.setReadTimeout(rt)
    conn.setRequestMethod("GET")
    try {
      val code = conn.getResponseCode
      if (code / 100 != 2) throw new IOException(s"HTTP $code from $url")
      val in = conn.getInputStream
      try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    } finally conn.disconnect()
  }
}
