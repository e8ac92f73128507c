package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimHashExpressionSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "completely different words in this one"),
    (3L, ""), (4L, "   "), (5L, "single"))
    .toDF("id", "text")

  test("native expression is bit-identical to the declarative simhash64") {
    val both = docs.select($"id",
      SimHashExpression.simhash64Native($"text").as("native"),
      TextFunctions.simhash64($"text").as("declarative"))
    assert(both.filter($"native" =!= $"declarative").count() == 0)
    // empty docs hash to 0
    assert(both.filter($"id" >= 3L && $"id" <= 4L)
      .select("native").as[Long].collect().toSeq == Seq(0L, 0L))
  }

  test("null text yields null hash") {
    val r = Seq((1L, null: String)).toDF("id", "text")
      .select(SimHashExpression.simhash64Native($"text")).collect().head
    assert(r.isNullAt(0))
  }

  test("the custom expression participates in whole-stage codegen") {
    // AQE defers stage planning and a bare local relation folds at plan
    // time — disable AQE and force an exchange to see the codegen stages
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // a `*(n)` prefix marks a WholeStageCodegen stage in the plan string
      val plan = docs.repartition(2).select(SimHashExpression.simhash64Native($"text"))
        .queryExecution.executedPlan.toString()
      assert(plan.contains("*(1) Project"), s"plan:\n$plan")
      // the declarative (higher-order) form drops the projection out of codegen
      val declPlan = docs.repartition(2).select(TextFunctions.simhash64($"text"))
        .queryExecution.executedPlan.toString()
      assert(!declPlan.split("Exchange")(0).contains("*("),
        s"declarative plan unexpectedly codegen'd:\n$declPlan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
