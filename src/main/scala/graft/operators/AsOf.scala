package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for every left row, the latest right row with
  * `rightTs <= leftTs` in the same key group (the timeseries enrichment
  * join: price as-of trade time, account state as-of event time). Spark
  * has no native as-of join; DuckDB's `ASOF JOIN` provides the oracle.
  *
  * Implementation is compositional (SURVEY.md §7.3 preference (a)), NOT a
  * per-row range lookup: tag and union both sides, sort each key group by
  * (ts, tag) — right rows before left rows at equal ts, making the match
  * inclusive — and carry right values forward with `last(ignoreNulls)`
  * over an unbounded-preceding window. ONE shuffle + sort, linear in
  * rows; no range-join explosion, no broadcast requirement. At 100 TB
  * this is the same shape as a sort-merge join on (key, time).
  *
  * Timestamps are numeric (e.g. epoch µs) for engine-portable semantics;
  * `tolerance` (same unit) nulls matches older than `leftTs - tolerance`.
  * Right side should be unique per (keys, rightTs) — pre-dedupe with
  * `Sync.latestVersion` otherwise (ties are ambiguous in any engine).
  */
object AsOf {

  def joinBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String, rightCols: Seq[String],
                   tolerance: Option[Long] = None): DataFrame =
    joinDirected(left, right, keys, leftTs, rightTs, rightCols, tolerance,
      forward = false)

  /** Forward as-of join — the EARLIEST right row with `rightTs >= leftTs`
    * per key (next-event-after: "first fill after the order", "next
    * observation after the probe"). Same union+window shape as backward,
    * with the sort reversed; DuckDB's `ASOF ... ON l.ts <= r.ts` is the
    * oracle.
    */
  def joinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String, rightCols: Seq[String],
                  tolerance: Option[Long] = None): DataFrame =
    joinDirected(left, right, keys, leftTs, rightTs, rightCols, tolerance,
      forward = true)

  private def joinDirected(left: DataFrame, right: DataFrame, keys: Seq[String],
                           leftTs: String, rightTs: String, rightCols: Seq[String],
                           tolerance: Option[Long], forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val lTagged = left
      .withColumn("__ts", col(leftTs).cast("long"))
      .withColumn("__tag", lit(1))
    val rTagged = right.select(
      keys.map(col) ++
        Seq(col(rightTs).cast("long").as("__ts")) ++
        rightCols.map(c => col(c).as(s"__r_$c")): _*)
      .withColumn("__tag", lit(0))

    val u = lTagged.unionByName(rTagged, allowMissingColumns = true)
    // right rows sort before left rows at equal ts in BOTH directions, so
    // the match is inclusive; forward just walks time backwards
    val tsOrder = if (forward) col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tsOrder, col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = rightCols.foldLeft(
      u.withColumn("__rts", last(when(col("__tag") === 0, col("__ts")), ignoreNulls = true).over(w))
    ) { (df, c) =>
      df.withColumn(s"__f_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }

    val gap: Column =
      if (forward) col("__rts") - col("__ts") else col("__ts") - col("__rts")
    val withinTol: Column = tolerance match {
      case Some(t) => col("__rts").isNotNull && (gap <= t)
      case None    => col("__rts").isNotNull
    }
    carried.filter(col("__tag") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => when(withinTol, col(s"__f_$c")).as(c)): _*)
  }
}
