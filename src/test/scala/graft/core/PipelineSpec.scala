package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("observed metrics are collected by the action itself — no extra job") {
    val df = (1L to 100L).map(i => (i, i * 2)).toDF("id", "x")
    val (out, obs) = Pipeline.observed(df.filter($"id" > 50), "stage1",
      count(lit(1)).as("rows"), sum("x").as("sum_x"))
    // the metric rides the SAME action; before any action there is nothing
    out.write.mode("overwrite").format("noop").save()
    val m = obs.get
    assert(m("rows") == 50L)
    assert(m("sum_x") == (51L to 100L).map(_ * 2).sum)
  }

  test("compose + fanOut obey the documented composition laws") {
    val df = Seq(1, 2, 3).toDF("n")
    val addOne = (d: org.apache.spark.sql.DataFrame) => d.withColumn("n", $"n" + 1)
    val double = (d: org.apache.spark.sql.DataFrame) => d.withColumn("n", $"n" * 2)
    val composed = Pipeline(addOne, double)(df).as[Int].collect().sorted.toSeq
    assert(composed == Seq(4, 6, 8))            // c(b(a(df))) order
    val branches = Pipeline.fanOut(df, addOne, double)
    assert(branches.map(_.as[Int].collect().sorted.toSeq) ==
      Seq(Seq(2, 3, 4), Seq(2, 4, 6)))
  }
}
