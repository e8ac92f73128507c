package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths}
import java.time.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** One-shot HTTP ingest — the reference's `Sources\Http`
  * (`/root/reference/src/Sources/Http.php:23-38`: one request, body becomes
  * the payload, optional parse by format or download-to-dir).
  *
  * Spark has no HTTP scan (an HTTP body has no splits to parallelize), so
  * this is a driver-side fetch to a local spool file followed by a normal
  * distributed read — the fetch is O(payload), everything after is a plain
  * DataFrame. For *per-row* HTTP calls use `graft.operators.Enrich`
  * (pooled `mapPartitions`), never this.
  */
object HttpSource {

  /** Download `url` to `downloadDir` and return the file path (the
    * reference's `download_dir` mode, `Http.php:30-35`).
    */
  def download(url: String, downloadDir: String,
               timeoutMs: Long = 30000L): Path = {
    val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(timeoutMs))
      .followRedirects(HttpClient.Redirect.NORMAL).build()
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(timeoutMs)).GET().build()
    val name = URI.create(url).getPath.split('/').lastOption
      .filter(_.nonEmpty).getOrElse("download")
    val target = Paths.get(downloadDir, name)
    Files.createDirectories(target.getParent)
    val resp = client.send(req, HttpResponse.BodyHandlers.ofFile(target))
    require(resp.statusCode() / 100 == 2, s"HTTP ${resp.statusCode()} for $url")
    target
  }

  /** Fetch `url` and read the body as a DataFrame in the given format
    * (`json` | `csv` | `text` — the reference's `getParsed$format`
    * dispatch, `Http.php:27-29`).
    */
  def read(spark: SparkSession, url: String, format: String,
           schema: Option[StructType] = None,
           options: Map[String, String] = Map.empty,
           spoolDir: String = Files.createTempDirectory("graft_http_").toString,
           timeoutMs: Long = 30000L): DataFrame = {
    val file = download(url, spoolDir, timeoutMs)
    val reader0 = spark.read.format(format).options(options)
    val reader = schema.fold(reader0)(reader0.schema)
    reader.load(file.toString)
  }
}
