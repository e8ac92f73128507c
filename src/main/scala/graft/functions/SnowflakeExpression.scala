package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Snowflake-style 64-bit ids: `(millis since epoch) << 22 | worker <<
  * seqBits | sequence` — time-sortable and unique across a cluster, exactly
  * the id shape the reference's `idGen` service produces
  * (`/root/reference/src/Transforms/LineParser.php:255`,
  * `Scheduler.php:163`).
  *
  * Spark's built-ins cover the neighbors but not this: `uuid()` is not
  * sortable, `monotonically_increasing_id()` is unique + per-partition
  * ordered but carries no wall-clock component. Implemented as a
  * `Nondeterministic` leaf (like rand/uuid): the worker field is the
  * partition index, so executors never coordinate; the sequence wraps by
  * borrowing from the timestamp (2^seqBits ids/ms/partition before nudging
  * time forward — the standard snowflake overflow strategy).
  *
  * UNIQUENESS BOUND: the worker field holds the PARTITION INDEX, so ids are
  * unique only while every partition index fits in `workerBits` — at the
  * classic 10/12 split that is ≤ 1024 partitions. Beyond that, partitions
  * `p` and `p + 2^workerBits` would silently share a worker id, so
  * `initializeInternal` FAILS FAST instead (clear error, no silent
  * collisions). Jobs wider than 1024 partitions — the norm at 100 TB —
  * must widen the split, e.g. `workerBits = 15` (32k partitions, still
  * 128 ids/ms/partition before time-borrowing); the 22 low bits are a
  * fixed budget split between worker and sequence, trading peak per-
  * partition rate for width.
  *
  * For oracle-deterministic surrogate keys use `ColumnOps.idKeyOrdered`;
  * this is the production id generator (nondeterministic by nature).
  */
case class SnowflakeId(epochMillis: Long = SnowflakeId.DefaultEpoch,
                       workerBits: Int = SnowflakeId.DefaultWorkerBits)
    extends LeafExpression with Nondeterministic with CodegenFallback {
  require(workerBits >= 1 && workerBits <= 21,
    s"workerBits must be in [1, 21] (22 low bits split worker|seq), got $workerBits")

  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "snowflake_id"

  private val seqBits: Int = 22 - workerBits
  private val maxSeq: Long = (1L << seqBits) - 1L

  @transient private var worker: Long = _
  @transient private var lastMillis: Long = _
  @transient private var seq: Long = _

  override protected def initializeInternal(partitionIndex: Int): Unit = {
    val maxWorker = (1L << workerBits) - 1L
    if (partitionIndex > maxWorker) {
      throw new IllegalStateException(
        s"snowflake_id(workerBits=$workerBits) supports at most ${maxWorker + 1} " +
          s"partitions, but this job has a partition index of $partitionIndex — " +
          "ids would collide across partitions sharing a worker id. Widen " +
          "workerBits (e.g. idKeySnowflake(name, workerBits = 15) for 32k " +
          "partitions) or repartition the input below the bound.")
    }
    worker = partitionIndex.toLong
    lastMillis = -1L
    seq = 0L
  }

  override protected def evalInternal(input: InternalRow): Any = {
    var now = System.currentTimeMillis() - epochMillis
    if (now < lastMillis) now = lastMillis         // clock went backwards
    if (now == lastMillis) {
      seq += 1
      if (seq > maxSeq) { lastMillis += 1; now = lastMillis; seq = 0 }
    } else {
      lastMillis = now
      seq = 0
    }
    (now << 22) | (worker << seqBits) | seq
  }
}

object SnowflakeId {
  /** 2020-01-01T00:00:00Z — epoch offset keeps ids positive for ~69 years. */
  val DefaultEpoch: Long = 1577836800000L

  /** Classic snowflake split: 10 worker bits / 12 sequence bits. */
  val DefaultWorkerBits: Int = 10

  def snowflakeId(): Column = Bridge.column(SnowflakeId())

  def snowflakeId(workerBits: Int): Column =
    Bridge.column(SnowflakeId(DefaultEpoch, workerBits))
}
