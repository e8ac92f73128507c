package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT order statistics.
  *
  * Spark's `percentile` aggregate buffers every value of a group in one
  * task (OOM/straggler at corpus scale); `approx_percentile` is bounded but
  * approximate. This computes the exact interpolated percentile with
  * bounded memory in two distributed passes:
  *
  *   1. per group: `count`, `min`/`max`, and a Greenwald–Khanna sketch
  *      (`approx_percentile`) bracket `[lo, hi]` around each target rank.
  *      GK rank error is deterministic (≤ n/accuracy), so a bracket padded
  *      by 10/accuracy in rank GUARANTEES the target order statistics lie
  *      inside — no sampling, no luck.
  *   2. one more scan: count values below `lo` per group, and window-rank
  *      ONLY the rows inside the bracket — ~20·n/accuracy rows per group,
  *      bounded by construction (accuracy=10000 → ~0.2% of the group), so
  *      the per-key window never buffers a full group.
  *
  * The value at rank k is then `below + rank-within-slice - 1 = k`, and the
  * interpolation `(k2 - pos)·x1 + (pos - k1)·x2` matches Spark's
  * `Percentile` (and DuckDB's `quantile_cont`) arithmetic exactly, so
  * results are bit-identical to the single-task aggregate.
  */
object Stats {

  /** Null-safe equi-join on `keys` (`<=>`): a NULL group key is a group
    * like any other — the plain using-columns join would silently drop its
    * rows, diverging from the `percentile` aggregate this class must match.
    */
  private def joinNullSafe(l: DataFrame, r: DataFrame, keys: Seq[String],
                           how: String = "inner"): DataFrame = {
    val rr = keys.foldLeft(r)((d, k) => d.withColumnRenamed(k, s"__r_$k"))
    val cond = keys.map(k => l(k) <=> rr(s"__r_$k")).reduce(_ && _)
    l.join(rr, cond, how).drop(keys.map(k => s"__r_$k"): _*)
  }

  /** Exact interpolated percentiles per group, one output column per
    * `(name, p)` pair. NULL values are ignored (all-null groups yield NULL,
    * matching the `percentile` aggregate); groups of ≤ `accuracy` rows use
    * the trivial `[min, max]` bracket (the slice is the whole small group).
    * NULL group keys form their own group, as in any aggregate.
    */
  def exactPercentiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                       ps: Seq[(String, Double)], accuracy: Int = 10000): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 },
      "percentiles must be in [0,1]")
    val pad = 10.0 / accuracy
    val g = groupCols.map(col)
    val v = col(valueCol).cast("double")

    // pass 1: one GK sketch per group evaluated at every padded bound
    val bounds = ps.flatMap { case (_, p) =>
      Seq(math.max(0.0, p - pad), math.min(1.0, p + pad))
    }
    // typed function, not an expr() string — survives column names that
    // would need backtick-quoting in SQL
    val st = df.groupBy(g: _*).agg(
      count(v).as("__n"), min(v).as("__min"), max(v).as("__max"),
      approx_percentile(v, array(bounds.map(lit): _*), lit(accuracy)).as("__br"))
    val smallN = col("__n") <= accuracy
    val stB = st.select(g ++ Seq(col("__n")) ++ ps.zipWithIndex.flatMap {
      case ((_, p), i) =>
        // a clamped padding (p±pad outside [0,1]) voids the GK rank
        // guarantee at the extremes — bracket with the exact min/max there
        val lo = if (p - pad <= 0.0) col("__min")
          else when(smallN, col("__min")).otherwise(element_at(col("__br"), 2 * i + 1))
        val hi = if (p + pad >= 1.0) col("__max")
          else when(smallN, col("__max")).otherwise(element_at(col("__br"), 2 * i + 2))
        Seq(lo.as(s"__lo$i"), hi.as(s"__hi$i"))
    }: _*)

    // pass 2: below-bracket counts and the in-bracket slices
    val joined = joinNullSafe(df, stB, groupCols)
    val below = joined.groupBy(g: _*).agg(
      ps.indices.map(i =>
        sum(when(v < col(s"__lo$i"), 1L).otherwise(0L)).as(s"__below$i")).head,
      ps.indices.map(i =>
        sum(when(v < col(s"__lo$i"), 1L).otherwise(0L)).as(s"__below$i")).tail: _*)

    // per percentile: rank the (small) slice, pick the bracketing order
    // statistics, interpolate like Spark's Percentile / DuckDB quantile_cont
    val perP = ps.zipWithIndex.map { case ((name, p), i) =>
      val w = Window.partitionBy(g: _*).orderBy(v)
      val pos = lit(p) * (col("__n") - 1).cast("double")
      val k1 = floor(pos).cast("bigint")
      val k2 = ceil(pos).cast("bigint")
      val slice = joinNullSafe(
        joined.filter(v >= col(s"__lo$i") && v <= col(s"__hi$i"))
          .withColumn("__rn", row_number().over(w)),
        below.select(g :+ col(s"__below$i"): _*), groupCols)
        .withColumn("__grank", col(s"__below$i") + col("__rn") - 1)
        .filter(col("__grank") === k1 || col("__grank") === k2)
      slice.groupBy(g: _*).agg(
        min(when(col("__grank") === k1, v)).as("__x1"),
        min(when(col("__grank") === k2, v)).as("__x2"),
        first(col("__n")).as("__fn"))
        .select(g ++ Seq({
          val fpos = lit(p) * (col("__fn") - 1).cast("double")
          val fk1 = floor(fpos); val fk2 = ceil(fpos)
          when(fk1 === fk2, col("__x1"))
            .otherwise((fk2 - fpos) * col("__x1") + (fpos - fk1) * col("__x2"))
            .as(name)
        }): _*)
    }

    // assemble off the group list so all-null groups survive as NULLs
    perP.foldLeft(st.select(g: _*)) { (acc, d) =>
      joinNullSafe(acc, d, groupCols, "left")
    }
  }
}
