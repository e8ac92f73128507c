package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CosineExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("native cosine is bit-identical to the declarative form on real-shaped vectors") {
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 50).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextFloat() * 2 - 1), Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "a", "b")
    val diff = vecs.select(
      VectorFunctions.cosine($"a", $"b").as("native"),
      VectorFunctions.cosineDeclarative($"a", $"b").as("decl"))
      .filter($"native" =!= $"decl")
    assert(diff.count() == 0)
  }

  test("zero-norm, null input, and double arrays") {
    val r = spark.range(1).select(
      VectorFunctions.cosine(
        array(lit(0.0f), lit(0.0f)), array(lit(1.0f), lit(2.0f))).as("zero"),
      VectorFunctions.cosine(
        lit(null).cast("array<float>"), array(lit(1.0f))).as("nul"),
      VectorFunctions.cosine(
        array(lit(3.0), lit(4.0)), array(lit(3.0), lit(4.0))).as("same"))
      .collect().head
    assert(r.getDouble(0) == 0.0)
    assert(r.isNullAt(1))
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("native cosine stays inside whole-stage codegen") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val vecs = Seq((1L, Seq(1.0f, 2.0f), Seq(2.0f, 1.0f))).toDF("id", "a", "b")
      val plan = vecs.repartition(2)
        .select(VectorFunctions.cosine($"a", $"b"))
        .queryExecution.executedPlan.toString()
      assert(plan.contains("*(1) Project"), s"plan:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
