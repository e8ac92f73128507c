package graft.operators

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Mid-pipeline per-row enrichment — the reference's `Common\HttpRequest`
  * (`/root/reference/src/Common/HttpRequest.php:84-144`): pooled client,
  * retry, response validation hook, per-message request. The Spark-native
  * shape is `mapPartitions` with ONE client per partition (their `use_pool`,
  * `HttpRequest.php:40-77`) — never a UDF that opens a connection per row.
  *
  * The transport is pluggable so the operator is testable offline:
  * [[httpTransport]] is a real JDK HttpClient implementation; tests inject a
  * local function.
  */
object Enrich {

  /** One client per partition; `fn` maps (client-scoped call, row) → result.
    * `mkClient` runs once per partition (executor-side), `call` once per row
    * reusing that client; `retries` failed calls are retried with backoff
    * then the `onError` fallback value is used (the reference's errHandler +
    * retry callback, `HttpRequest.php:122-126,140-142`).
    *
    * `minIntervalMs` is the reference's `throttleTime`
    * (`HttpRequest.php:87`): a per-partition rate limiter enforcing at most
    * one upstream call per interval per task. This is what keeps a
    * 1000-task cluster from presenting as a DDoS to the enrichment API —
    * the aggregate rate is bounded by partitions × 1000/minIntervalMs, so
    * size the two together.
    */
  def withPartitionClient[C](df: DataFrame, inCol: String, outCol: String,
                             mkClient: () => C,
                             call: (C, String) => String,
                             retries: Int = 2,
                             retrySleepMs: Long = 50L,
                             onError: String = null,
                             minIntervalMs: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    val inIdx = df.schema.fieldIndex(inCol)
    val outSchema = StructType(df.schema.fields :+ StructField(outCol, StringType, nullable = true))
    val rdd = df.rdd.mapPartitions { rows =>
      if (rows.isEmpty) Iterator.empty
      else {
        val client = mkClient()
        var nextAllowedNanos = 0L
        def throttle(): Unit = if (minIntervalMs > 0) {
          val now = System.nanoTime()
          if (now < nextAllowedNanos)
            Thread.sleep((nextAllowedNanos - now) / 1000000L + 1)
          nextAllowedNanos = math.max(now, nextAllowedNanos) + minIntervalMs * 1000000L
        }
        rows.map { row =>
          val in = row.get(inIdx) match { case null => null; case v => v.toString }
          var attempt = 0
          var out: String = onError
          var done = in == null
          while (!done) {
            throttle()
            try { out = call(client, in); done = true }
            catch {
              case _: Exception if attempt < retries =>
                attempt += 1; Thread.sleep(retrySleepMs * attempt)
              case _: Exception => out = onError; done = true
            }
          }
          Row.fromSeq(row.toSeq :+ out)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Real HTTP GET transport over the JDK client: `urlFor` builds the
    * request URL from the input value; response body (2xx) is the result,
    * non-2xx throws (so the retry/fallback path engages — the reference's
    * `checkResponseFunc`, `HttpRequest.php:122-126`). `minIntervalMs` is
    * the per-task throttle (the reference's `throttleTime`) — aggregate
    * upstream rate is bounded by partitions × 1000/minIntervalMs.
    */
  def httpTransport(df: DataFrame, inCol: String, outCol: String,
                    urlFor: String => String,
                    timeoutMs: Long = 5000L,
                    retries: Int = 2,
                    minIntervalMs: Long = 0L): DataFrame =
    withPartitionClient[HttpClient](df, inCol, outCol,
      mkClient = () => HttpClient.newBuilder()
        .connectTimeout(Duration.ofMillis(timeoutMs)).build(),
      call = (client, in) => {
        val req = HttpRequest.newBuilder(URI.create(urlFor(in)))
          .timeout(Duration.ofMillis(timeoutMs)).GET().build()
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() / 100 != 2)
          throw new RuntimeException(s"HTTP ${resp.statusCode()}")
        resp.body()
      },
      retries = retries,
      minIntervalMs = minIntervalMs)
}
