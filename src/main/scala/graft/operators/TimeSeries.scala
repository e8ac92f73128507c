package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series reshaping: dense grids from sparse observations.
  *
  * Scale shapes: [[gapFill]] explodes one `sequence` per key spanning that
  * key's own range (never a global calendar cross join), then left-joins
  * observations back on (key, tick) — two shuffles on the key. [[ffill]]
  * is one window per key with an `ignoreNulls` running last — the shuffle
  * carries the rows it would anyway.
  */
object TimeSeries {

  /** Densify integer ticks per key: emit every tick in
    * [min(tick), max(tick)] step `step` for each key, observed rows joined
    * back (missing ticks get NULL observation columns — compose with
    * [[ffill]] or `coalesce` to impute).
    */
  def gapFill(df: DataFrame, keys: Seq[String], tickCol: String,
              step: Long = 1L): DataFrame = {
    require(step > 0)
    val keyCols = keys.map(col)
    val spans = df.groupBy(keyCols: _*)
      .agg(min(col(tickCol)).as("__lo"), max(col(tickCol)).as("__hi"))
    val grid = spans.select(keyCols :+
      explode(sequence(col("__lo"), col("__hi"), lit(step))).as(tickCol): _*)
    grid.join(df, keys :+ tickCol, "left")
  }

  /** Forward-fill NULLs in `valueCols` per key in `tickCol` order: each
    * NULL takes the most recent non-null value (rows before the first
    * observation stay NULL).
    */
  def ffill(df: DataFrame, keys: Seq[String], tickCol: String,
            valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tickCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }
}
