package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins — key salting.
  *
  * AQE's skew-join split handles most skew at runtime, but it only splits
  * *partitions*, not a single pathological key: one key holding 10% of a
  * 100 TB fact table still lands in one task. Salting fixes that at the
  * plan level: the big side gets a uniform random salt in [0, factor), the
  * small side is replicated `factor`×, and the join key becomes
  * (key, salt) — spreading the hot key over `factor` tasks.
  *
  * The cost is deliberate: `factor`× replication of the small side, so use
  * it for dimension-sized right sides with a known-skewed fact side.
  */
object Skew {

  /** Inner/left join `big ⋈ small` on `keys`, salted `factor` ways. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    // rand() is seeded per-partition by Spark: uniform, cheap, and the salt
    // value never affects results — only task placement
    val salted = big.withColumn("__salt", (rand(42) * factor).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase (salted) aggregation for skewed grouping keys: partial
    * aggregate on (keys, salt), then merge partials on keys. Spark's
    * hash-aggregate already computes map-side partials, but every partial
    * for one key still merges in ONE reduce task — a hot key at 100 TB
    * makes that task the straggler. Salting splits the merge over `factor`
    * tasks at the cost of one extra (tiny, `factor × |keys|`-row) shuffle.
    *
    * `aggs` maps output column → (partialExpr, mergeExpr) over the value
    * column — e.g. `"s" -> (sum _, sum _)` or count via `count`/`sum`.
    * [[saltedSumCount]] covers the common case.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     factor: Int, sumName: String = "sum",
                     countName: String = "cnt"): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val salted = df.withColumn("__salt", (rand(42) * factor).cast("int"))
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__ps"), count(lit(1)).as("__pc"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__ps")).as(sumName), sum(col("__pc")).as(countName))
  }

  /** Top-N most frequent key values — the diagnostic for choosing a salt
    * factor (run on a sample at scale).
    */
  def keyHistogram(df: DataFrame, keys: Seq[String], topN: Int = 20): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt")).limit(topN)
}
