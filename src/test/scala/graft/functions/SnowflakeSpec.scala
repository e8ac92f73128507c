package graft.functions

import graft.SparkSpec

class SnowflakeSpec extends SparkSpec {
  import spark.implicits._

  test("snowflake ids are unique across rows and partitions") {
    val ids = spark.range(0, 10000, 1, numPartitions = 8)
      .select(SnowflakeId.snowflakeId().as("id")).as[Long].collect()
    assert(ids.distinct.length == 10000)
    assert(ids.forall(_ > 0))
  }

  test("snowflake ids are time-ordered within a partition") {
    val ids = spark.range(0, 5000, 1, numPartitions = 1)
      .select(SnowflakeId.snowflakeId().as("id")).as[Long].collect()
    assert(ids.sorted.sameElements(ids), "ids must be monotonic per partition")
  }

  test("worker bits reflect the partition index") {
    val byPartition = spark.range(0, 100, 1, numPartitions = 4)
      .select(org.apache.spark.sql.functions.spark_partition_id().as("p"),
        SnowflakeId.snowflakeId().as("id"))
      .as[(Int, Long)].collect()
    byPartition.foreach { case (p, id) =>
      assert(((id >> 12) & 0x3ff) == (p & 0x3ff))
    }
  }

  test("fails fast when a partition index exceeds the worker-id space") {
    // workerBits=3 → 8 workers; 16 partitions would collide → must throw,
    // not silently reuse worker ids (the >1024-partition hazard, scaled down)
    val ex = intercept[org.apache.spark.SparkException] {
      spark.range(0, 1000, 1, numPartitions = 16)
        .select(SnowflakeId.snowflakeId(workerBits = 3).as("id")).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c => c.isInstanceOf[IllegalStateException] &&
      c.getMessage.contains("workerBits")))
  }

  test("widened workerBits keeps ids unique past the classic split") {
    // same job as the failure above, but with a wide-enough worker field
    val ids = spark.range(0, 20000, 1, numPartitions = 16)
      .select(SnowflakeId.snowflakeId(workerBits = 5).as("id")).as[Long].collect()
    assert(ids.distinct.length == 20000)
    // worker field sits at bits [17, 22) for workerBits=5 (seqBits=17)
    val workers = ids.map(id => (id >> 17) & 0x1f).distinct
    assert(workers.length == 16)
  }
}
