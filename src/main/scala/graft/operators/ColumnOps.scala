package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column algebra — the declarative re-expression of the reference
  * LineParser's per-row reshaping (`/root/reference/src/Transforms/
  * LineParser.php`): `include` (:263-274), `exclude` (:196-198,239-241),
  * `map` rename (:212-218), `addField` (:137-146,254), `idKey` (:255).
  *
  * Everything here is a pure projection: Catalyst collapses consecutive
  * projects into one and prunes unused columns all the way into the scan,
  * so chains of these ops cost one codegen'd map stage regardless of length.
  */
object ColumnOps {

  /** Keep the listed columns, each optionally rewritten by a Spark SQL
    * expression string. The reference allowed arbitrary eval'd PHP per
    * column (`LineParser.php:267`, doc/LineParser.md:19); we deliberately
    * narrow that to Catalyst-parsed `expr()` strings — declarative, safe,
    * codegen'd (SURVEY.md §7.4 documents the narrowing).
    */
  def include(cols: (String, String)*): DataFrame => DataFrame =
    df => df.select(cols.map { case (name, ex) => expr(ex).as(name) }: _*)

  /** Drop columns (negative projection, `LineParser.php:196-198`). */
  def exclude(cols: String*): DataFrame => DataFrame =
    df => df.drop(cols: _*)

  /** Rename columns for sink-field alignment (`LineParser.php:212-218`). */
  def rename(mapping: (String, String)*): DataFrame => DataFrame =
    df => df.select(df.columns.map { c =>
      mapping.collectFirst { case (from, to) if from == c => col(c).as(to) }
        .getOrElse(col(c))
    }: _*)

  /** Append constant columns (`addField`, `LineParser.php:137-146`; the
    * reference also merged per-run values from `opt['comField']` — those
    * become plan-time literals here).
    */
  def addFields(fields: (String, Column)*): DataFrame => DataFrame =
    df => fields.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }

  /** Surrogate-key column, deterministic variant: dense row_number over an
    * explicit total order (oracle-testable). The single unpartitioned window
    * funnels data through one task — fine for parity tests; at scale use
    * [[idKeyUnique]] (per-partition-unique, no shuffle) instead.
    * Mirrors the snowflake `idKey` (`LineParser.php:255`).
    */
  def idKeyOrdered(name: String, order: Column*): DataFrame => DataFrame =
    df => df.withColumn(name, row_number().over(Window.orderBy(order: _*)).cast("bigint"))

  /** Scale path for idKey: globally-unique 64-bit ids with zero shuffle
    * (partition id in high bits, like a snowflake's worker id).
    */
  def idKeyUnique(name: String): DataFrame => DataFrame =
    df => df.withColumn(name, monotonically_increasing_id())

  /** Production idKey, full snowflake semantics: time-sortable 64-bit ids
    * (`(millis << 22) | worker << seqBits | seq`, see
    * [[graft.functions.SnowflakeId]]) — zero shuffle, zero coordination,
    * and unlike [[idKeyUnique]] the ids carry a wall-clock component so
    * they sort by creation time across RUNS, exactly the property the
    * reference's `idGen` service provides (`LineParser.php:255`).
    *
    * Uniqueness holds while every partition index fits in `workerBits`:
    * the default 10-bit split covers ≤ 1024 concurrent partitions and the
    * expression FAILS FAST beyond that (no silent cross-partition
    * collisions). Wider jobs — the norm at 100 TB — pass a wider split,
    * e.g. `workerBits = 15` for 32k partitions at 128 ids/ms/partition
    * (sequence overflow borrows from the timestamp, so the rate bound is
    * soft). Nondeterministic by nature (time-based) — for oracle-
    * deterministic keys on SMALL relations use [[idKeyOrdered]]; never use
    * that variant at scale (its partition-less window funnels the whole
    * relation through one task).
    */
  def idKeySnowflake(name: String, workerBits: Int = 10): DataFrame => DataFrame =
    df => df.withColumn(name, graft.functions.SnowflakeId.snowflakeId(workerBits))

  /** First-non-null fallback across candidate columns — the XmlParser field
    * mapping where several source keys may carry the value
    * (`/root/reference/src/Transforms/XmlParser.php:42-50`).
    */
  def coalesceFallback(out: String, candidates: Column*): DataFrame => DataFrame =
    df => df.withColumn(out, coalesce(candidates: _*))

  /** Top-k rows per key by an explicit order. One window per key group —
    * and Spark's WindowGroupLimit optimization pre-filters to k rows per
    * key on the MAP side, so the shuffle carries ≤ k rows per key per input
    * partition, not the whole group (same machinery that makes
    * latestVersion scale).
    */
  def topKPerKey(keys: Seq[String], order: Seq[Column], k: Int): DataFrame => DataFrame = {
    require(k > 0)
    df => {
      val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= k)
        .withColumnRenamed("__rn", "rank_in_key")
        .withColumn("rank_in_key", col("rank_in_key").cast("bigint"))
    }
  }
}
