package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog over the driver's parquet test tables (/root/repo/TESTDATA.md).
  *
  * In the reference every "table" lives in an external MySQL/ClickHouse
  * server named by config (`/root/reference/src/Common/BaseSyncData.php:13-41`
  * `from`/`to`/`db`); here a table is a parquet-backed DataFrame and Catalyst
  * owns pushdown (column pruning + predicate pushdown reach the scan).
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = Tables.source(spark, s"$dir/$name.parquet")

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")
  def events: DataFrame     = table("events")
  def documents: DataFrame  = table("documents")

  /** `embedding` normalized to `array<float>` whatever the fixture wrote
    * (float32 today; a float64 regeneration would otherwise break the
    * whole ANN/vector tier the way the `events.ts` nanos→µs drift broke
    * the event queries in round 10). The cast is a no-op node when the
    * type already matches — Catalyst's SimplifyCasts removes it — so the
    * insurance costs nothing on the current fixtures.
    */
  def embeddings: DataFrame = {
    import org.apache.spark.sql.functions.col
    table("embeddings")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }
}

object Tables {

  private val sources =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private val cleanupRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  /** The lazy parquet source for `path`, memoized per (session, path) —
    * METADATA caching only (schema inference + file listing), never data
    * or results: the returned DataFrame is the same unexecuted scan a
    * fresh `spark.read.parquet` yields, and every query still computes
    * from the files. Why (r19 measurement): each `read.parquet` call
    * schedules a footer-inference job (~50-100 ms at any scale — it is a
    * driver→scheduler round trip, not data work), and a bench/verify pass
    * over the registry pays it hundreds of times for the same ten
    * READ-ONLY fixture tables. This is the catalog-cache behavior a real
    * deployment gets from a metastore table (and what
    * `spark.sql.hive.filesourcePartitionFileCacheSize` exists for on
    * partitioned tables — guide §6). Keyed by session so a new session
    * (fresh bench process, different core count) re-lists and re-infers.
    *
    * Staleness contract: the memoized scan holds its InMemoryFileIndex,
    * so a path whose FILES CHANGE under a live session would serve the
    * old listing — callers point this at the read-only test fixtures
    * only; mutable paths (tmp index dirs, sink outputs) must keep using
    * `spark.read.parquet` directly. Entries evict when the session's
    * SparkContext stops (r20 — the map previously retained every session
    * forever, a leak in multi-session drivers).
    */
  private[graft] def source(spark: SparkSession, path: String): DataFrame =
    sources.computeIfAbsent((spark, path), _ => {
      if (cleanupRegistered.add(spark)) {
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onApplicationEnd(
                e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
              sources.keySet.removeIf(_._1 eq spark)
              cleanupRegistered.remove(spark)
              ()
            }
          })
      }
      spark.read.parquet(path)
    })
}
