package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a text column as ONE native codegen'd Catalyst
  * expression: whitespace tokenization, per-token xxhash64 (seed 42, same
  * as Spark's `xxhash64`), and the 64 bit votes all happen in a single
  * generated Java loop over the string's bytes — no intermediate token
  * array, no allocation beyond the vote counters.
  *
  * Why a custom `Expression` (SURVEY.md §7.3 tier (b)): the declarative
  * formulation (`TextFunctions.simhash64`, 64 `aggregate` folds) runs on
  * the higher-order-function evaluator, which is CodegenFallback —
  * interpreted per element — and any composition *containing* a
  * higher-order function drops the whole projection out of
  * WholeStageCodegen. The semantics exist declaratively; only this form
  * executes them at scan speed.
  *
  * Tokens are maximal runs of non-whitespace bytes (`\s` = space, \t, \n,
  * \x0B, \f, \r — safe to scan bytewise: UTF-8 continuation bytes are ≥
  * 0x80). For space-separated text this is bit-identical to
  * `TextFunctions.simhash64`; for text with leading tabs/newlines the
  * declarative regex-split emits an artifact empty token which this form
  * (correctly) does not.
  */
case class SimHash64Text(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash64_text needs string, got ${other.simpleString(10)}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64_text"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64Text.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.SimHash64Text.hash($s);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Text =
    copy(child = newChild)
}

object SimHash64Text {

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Single-pass simhash over the UTF8String's bytes. Called from both the
    * interpreted eval and the generated code (one tight JIT-compiled
    * method beats inlining the loop into every generated projection).
    */
  def hash(s: UTF8String): Long = {
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val n = s.numBytes()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      while (i < n && isSpace(Platform.getByte(base, offset + i))) i += 1
      val start = i
      while (i < n && !isSpace(Platform.getByte(base, offset + i))) i += 1
      if (i > start) {
        val h = XXH64.hashUnsafeBytes(base, offset + start, i - start, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column API: drop-in fast form of `TextFunctions.simhash64`. */
  def simhash64Native(text: Column): Column =
    Bridge.column(SimHash64Text(Bridge.expression(text)))
}

/** Kept name for discoverability from the object-per-concept layout. */
object SimHashExpression {
  def simhash64Native(text: Column): Column = SimHash64Text.simhash64Native(text)
}
