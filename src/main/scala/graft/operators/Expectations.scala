package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations — declarative row-level rules evaluated in ONE
  * aggregation pass (each rule is a conditional count, so checking 50 rules
  * over 100 TB costs the same scan as checking one). The pipeline guardrail
  * tier: assert row counts and invariants before delivering to a sink.
  */
object Expectations {

  /** One row per rule: (rule, violations, total, pass). A NULL rule result
    * counts as a violation (unknown ≠ satisfied) — same convention as SQL
    * CHECK constraints are *not*; pipelines want missing data flagged.
    */
  def check(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val names = rules.map(_._1)
    require(names.distinct.size == names.size, s"duplicate rule names in $names")
    require(!names.contains("__total"), "'__total' is a reserved rule name")
    val aggs = rules.map { case (name, cond) =>
      sum(when(coalesce(cond, lit(false)), 0L).otherwise(1L)).as(name)
    } :+ count(lit(1)).as("__total")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = rules.map { case (name, _) =>
      row.select(lit(name).as("rule"), col(name).as("violations"),
        col("__total").as("total"))
    }.reduce(_ unionByName _)
    stacked.withColumn("pass", col("violations") === 0L)
  }

  /** Fail-fast gate: throw if any rule has violations; otherwise return
    * `df` unchanged for further composition.
    */
  def enforce(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val bad = check(df, rules).filter(col("violations") > 0)
      .select("rule", "violations").collect()
    if (bad.nonEmpty) {
      val detail = bad.map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(", ")
      throw new IllegalStateException(s"data-quality expectations failed: $detail")
    }
    df
  }
}
