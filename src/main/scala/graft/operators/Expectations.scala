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
    // outer coalesce: on an EMPTY input sum() is NULL, which would make
    // violations/pass NULL and sail through enforce()'s violations>0 filter
    // — an upstream bug producing zero rows must still report pass=true
    // explicitly (guard zero-row inputs themselves with enforce's minRows;
    // a row-level rule can't see them)
    val aggs = rules.map { case (name, cond) =>
      coalesce(sum(when(coalesce(cond, lit(false)), 0L).otherwise(1L)), lit(0L)).as(name)
    } :+ count(lit(1)).as("__total")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = rules.map { case (name, _) =>
      row.select(lit(name).as("rule"), col(name).as("violations"),
        col("__total").as("total"))
    }.reduce(_ unionByName _)
    stacked.withColumn("pass", col("violations") === 0L)
  }

  /** Fail-fast gate: throw if any rule has violations, or if the input has
    * fewer than `minRows` rows (row-level rules are vacuously satisfied on
    * an empty input — a dead upstream needs the count guard); otherwise
    * return `df` unchanged for further composition.
    */
  def enforce(df: DataFrame, rules: Seq[(String, Column)], minRows: Long = 0L): DataFrame = {
    val rows = check(df, rules).filter(col("violations") > 0 || col("total") < minRows)
      .select("rule", "violations", "total").collect()
    if (rows.nonEmpty) {
      val total = rows.head.getLong(2)
      val bad = rows.filter(_.getLong(1) > 0)
      val detail =
        (if (total < minRows) Seq(s"total=$total<minRows=$minRows") else Nil) ++
          bad.map(r => s"${r.getString(0)}=${r.getLong(1)}")
      throw new IllegalStateException(
        s"data-quality expectations failed: ${detail.mkString(", ")}")
    }
    df
  }
}
