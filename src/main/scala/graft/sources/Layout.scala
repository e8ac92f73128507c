package graft.sources

import org.apache.spark.sql.DataFrame

/** Storage-layout writers that move work from query time to ingest time —
  * the two levers that matter most at 100 TB:
  *
  *  - hive-style partitioning: a time/tenant-range query reads only the
  *    matching directories (`PartitionFilters` in the scan), so cost tracks
  *    the RANGE, not the history;
  *  - bucketing: both sides of a recurring join pre-hashed into the same
  *    number of buckets on their join keys at write time — the join's
  *    shuffle happens once at ingest, and every subsequent SortMergeJoin
  *    runs with zero Exchange below it.
  *
  * The reference pushes this entirely onto MySQL/ClickHouse table DDL
  * (engine/partition clauses in the sink configs, e.g.
  * /root/reference/src/Sinks/Clickhouse.php); Spark-native, the layout IS
  * the parquet directory structure + catalog bucket spec.
  * [[ZOrder]] covers the third lever (multi-column clustering).
  */
object Layout {

  /** Write `df` hive-partitioned by `cols` (directory per distinct value).
    * Keep partition columns LOW-cardinality (day, source, tenant): each
    * value is a directory, and a high-cardinality partition column turns
    * the listing itself into the bottleneck.
    */
  def writePartitioned(df: DataFrame, out: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(out)

  /** Write `df` as an external bucketed parquet table (catalog entry
    * `table`, files at `path`), hashed into `buckets` buckets on
    * `bucketCol` and sorted within each bucket. Both join sides must use
    * the SAME bucket count for the co-located join to elide its shuffle.
    * Any existing catalog entry under this name is replaced.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    buckets: Int, bucketCol: String): Unit = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode("overwrite").format("parquet").option("path", path)
      .bucketBy(buckets, bucketCol).sortBy(bucketCol).saveAsTable(table)
  }
}
