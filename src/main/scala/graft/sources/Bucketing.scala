package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins — the shuffle-elimination
  * scale path. Two tables bucketed by the same key into the same bucket
  * count join with ZERO Exchange: each task reads matching bucket files
  * from both sides. At 100 TB this is the difference between an
  * all-to-all network shuffle of the fact table on every join and a pure
  * scan — pay the shuffle once at write time, reuse it on every query.
  *
  * The reference has no analogue (its joins run inside MySQL/ClickHouse);
  * this replaces the forever-repeated `equal`-key joins its sync jobs
  * generate (`/root/reference/src/Common/SynToMysql.php:47-53`).
  */
object Bucketing {

  /** Persist `df` as a bucketed table in the session catalog. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    numBuckets: Int, sortCols: Seq[String] = Nil,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w0 = df.write.mode(mode).bucketBy(numBuckets, keys.head, keys.tail: _*)
    val w = if (sortCols.nonEmpty) w0.sortBy(sortCols.head, sortCols.tail: _*) else w0
    w.saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket keys. With matching
    * bucket specs Catalyst plans a SortMergeJoin with no Exchange on
    * either side (verify with `.explain` — see BucketingSpec).
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   keys: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), keys, joinType)
}
