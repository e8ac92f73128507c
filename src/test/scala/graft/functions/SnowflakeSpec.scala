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
}
