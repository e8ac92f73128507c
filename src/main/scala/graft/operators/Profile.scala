package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality dashboard counterpart of
  * [[Expectations]] (rules gate, profiles describe). One row per profiled
  * column: row count, null count, min/max, and the exact mean.
  *
  * Scale shape: ONE aggregation pass over the table computes every stat for
  * every column (partial aggregation map-side, a single 1-row reduce), then
  * the row unpivots driver-free via explode — profiling N columns of a
  * 100 TB table costs one scan, not N. Means accumulate in DECIMAL(28,6)
  * (exact, order-independent) and divide as doubles at the end, so the
  * result is bit-stable across engines and partitionings.
  */
object Profile {

  /** Profile numeric (or castable-to-numeric) columns. Output:
    * (col_name, n, n_null, min, max, mean) with min/max/mean as doubles;
    * mean is over non-null values (NULL when a column is entirely null).
    */
  def numeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__${c}_nn"),
      min(col(c)).cast("double").as(s"__${c}_min"),
      max(col(c)).cast("double").as(s"__${c}_max"),
      sum(col(c).cast("decimal(28,6)")).as(s"__${c}_sum")))
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    row.select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("__n").as("n"),
        col(s"__${c}_nn").as("n_null"),
        col(s"__${c}_min").as("min"),
        col(s"__${c}_max").as("max"),
        when(col("__n") - col(s"__${c}_nn") === 0, lit(null).cast("double"))
          .otherwise(col(s"__${c}_sum").cast("double") /
            (col("__n") - col(s"__${c}_nn")).cast("double")).as("mean"))): _*))
      .as("p"))
      .select("p.*")
  }
}
