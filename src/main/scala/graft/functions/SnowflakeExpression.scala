package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Snowflake-style 64-bit ids: `(millis since epoch) << 22 | worker << 12 |
  * sequence` — time-sortable and globally unique across a cluster, exactly
  * the id shape the reference's `idGen` service produces
  * (`/root/reference/src/Transforms/LineParser.php:255`,
  * `Scheduler.php:163`).
  *
  * Spark's built-ins cover the neighbors but not this: `uuid()` is not
  * sortable, `monotonically_increasing_id()` is unique + per-partition
  * ordered but carries no wall-clock component. Implemented as a
  * `Nondeterministic` leaf (like rand/uuid): the worker field is the
  * partition index, so executors never coordinate; the 12-bit sequence
  * wraps by borrowing from the timestamp (4096 ids/ms/partition before
  * nudging time forward — the standard snowflake overflow strategy).
  *
  * For oracle-deterministic surrogate keys use `ColumnOps.idKeyOrdered`;
  * this is the production id generator (nondeterministic by nature).
  */
case class SnowflakeId(epochMillis: Long = SnowflakeId.DefaultEpoch)
    extends LeafExpression with Nondeterministic with CodegenFallback {

  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "snowflake_id"

  @transient private var worker: Long = _
  @transient private var lastMillis: Long = _
  @transient private var seq: Long = _

  override protected def initializeInternal(partitionIndex: Int): Unit = {
    worker = partitionIndex & 0x3ff
    lastMillis = -1L
    seq = 0L
  }

  override protected def evalInternal(input: InternalRow): Any = {
    var now = System.currentTimeMillis() - epochMillis
    if (now < lastMillis) now = lastMillis         // clock went backwards
    if (now == lastMillis) {
      seq += 1
      if (seq > 0xfff) { lastMillis += 1; now = lastMillis; seq = 0 }
    } else {
      lastMillis = now
      seq = 0
    }
    (now << 22) | (worker << 12) | seq
  }
}

object SnowflakeId {
  /** 2020-01-01T00:00:00Z — epoch offset keeps ids positive for ~69 years. */
  val DefaultEpoch: Long = 1577836800000L

  def snowflakeId(): Column = Bridge.column(SnowflakeId())
}
