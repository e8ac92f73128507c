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
  def embeddings: DataFrame = table("embeddings")
}
