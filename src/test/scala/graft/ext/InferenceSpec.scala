package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class InferenceSpec extends SparkSpec {
  import spark.implicits._

  test("scoreBatched calls the model in full batches plus one flush") {
    val acc = spark.sparkContext.collectionAccumulator[Int]("batchSizes")
    val df = (1L to 10L).map(i => (i, s"doc$i")).toDF("id", "text")
      .repartition(1)
    val out = Inference.scoreBatched(spark, df, "id", "text", batchSize = 4) {
      batch => { acc.add(batch.size); batch.map(_.length.toDouble) }
    }
    assert(out.count() == 10)
    val sizes = scala.jdk.CollectionConverters.ListHasAsScala(acc.value).asScala.toSeq
    assert(sizes.sorted == Seq(2, 4, 4)) // two full batches + the flush
  }

  test("scoreBatched keeps each row aligned with its own score") {
    val df = (1L to 97L).map(i => (i, "x" * (i % 13).toInt)).toDF("id", "text")
      .repartition(4)
    val out = Inference.scoreBatched(spark, df, "id", "text", batchSize = 8) {
      batch => batch.map(_.length.toDouble)
    }.as[(Long, Double)].collect().toMap
    (1L to 97L).foreach(i => assert(out(i) == (i % 13).toDouble))
  }

  test("scoreBatched fails loudly on a misaligned model") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    val ex = intercept[Exception] {
      Inference.scoreBatched(spark, df, "id", "text", batchSize = 2) {
        batch => batch.map(_.length.toDouble).tail
      }.collect()
    }
    assert(ex.getMessage.contains("model returned") ||
      ex.getCause != null)
  }

  test("scoreBatched honors the numPartitions knob") {
    val df = (1L to 50L).map(i => (i, "t")).toDF("id", "text")
    val out = Inference.scoreBatched(spark, df, "id", "text",
      batchSize = 5, numPartitions = 3)(b => b.map(_ => 1.0))
    assert(out.rdd.getNumPartitions == 3)
    assert(out.agg(sum("score")).as[Double].head() == 50.0)
  }
}
