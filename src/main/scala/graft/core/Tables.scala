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
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

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
