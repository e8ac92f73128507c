package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the multi-dimension data-skipping
  * layout. Sorting by one column narrows that column's per-file min/max
  * range (so filters on it skip files) but scrambles every other column;
  * interleaving the bits of several columns' bucket ranks gives EVERY
  * listed column a narrowed per-file range, at modest cost to each.
  *
  * 100 TB shape: one tiny min/max aggregate pass (2×|cols| doubles to the
  * driver), then the z-value is a pure codegen'd expression and the
  * clustering is ONE `repartitionByRange` (range shuffle on the z-value) +
  * local sort. No global sort, no sampling job beyond the range
  * partitioner's own. Readers need nothing special: parquet row-group and
  * file min/max stats do the skipping.
  *
  * Buckets are equal-width between the observed min/max — the right
  * default for roughly-uniform dimensions (keys, timestamps, prices). For
  * heavily skewed dimensions, pre-transform the column (e.g. `log`) before
  * clustering; a quantile-based binning would need a per-value lookup
  * table that scales with `bits`, which is not worth it for a layout hint.
  */
object ZOrder {

  /** Per-column (min,max) over a numeric projection — one driver-side agg.
    * An all-NULL (or empty-input) column yields (0,0), which [[zvalueWith]]
    * treats as a constant: it contributes rank 0 instead of crashing.
    */
  private def stats(df: DataFrame, cols: Seq[String]): Seq[(Double, Double)] = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"__lo_$c"), max(col(c).cast("double")).as(s"__hi_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.map { i =>
      if (row.isNullAt(2 * i) || row.isNullAt(2 * i + 1)) (0.0, 0.0)
      else (row.getDouble(2 * i), row.getDouble(2 * i + 1))
    }
  }

  /** Morton z-value: each column binned to 2^bits equal-width buckets
    * between (lo, hi), bucket bits interleaved column-major (bit b of
    * column i lands at position b·|cols|+i). `|cols| × bits` must fit a
    * long's usable bits.
    */
  def zvalueWith(cols: Seq[String], bounds: Seq[(Double, Double)], bits: Int): Column = {
    require(cols.nonEmpty && bits >= 1 && cols.size * bits <= 60,
      s"need 1..60/|cols| bits per column, got $bits × ${cols.size} columns")
    val nBuckets = 1 << bits
    val ranks = cols.zip(bounds).map { case (c, (lo, hi)) =>
      if (lo == hi) lit(0L)
      else least(greatest(
        width_bucket(col(c).cast("double"), lit(lo), lit(hi), lit(nBuckets)) - 1,
        lit(0L)), lit(nBuckets - 1L))
    }
    val terms = for {
      b <- 0 until bits
      (r, i) <- ranks.zipWithIndex
    } yield shiftleft(shiftright(r, b).bitwiseAND(lit(1L)), b * cols.size + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** z-value with bounds computed from `df` itself. */
  def zvalue(df: DataFrame, cols: Seq[String], bits: Int = 8): Column =
    zvalueWith(cols, stats(df, cols), bits)

  /** Cluster `df` into `numPartitions` z-ordered partitions: range shuffle
    * on the z-value + local sort, so each output file covers a compact
    * z-range — i.e. a narrow min/max box in every clustered column.
    */
  def cluster(df: DataFrame, cols: Seq[String], numPartitions: Int,
              bits: Int = 8): DataFrame =
    df.withColumn("__z", zvalue(df, cols, bits))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")

  /** Cluster and write parquet — the full layout op. */
  def writeClustered(df: DataFrame, path: String, cols: Seq[String],
                     numPartitions: Int, bits: Int = 8): Unit =
    FileSink.parquet(cluster(df, cols, numPartitions, bits), path)
}
