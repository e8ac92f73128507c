package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Sign-bit LSH bucket as a native codegen'd expression: `planes` is a
  * dense nBits×dim hyperplane matrix attached to the plan as a constant
  * reference object — one fused loop computes all bit projections per row.
  *
  * Why custom (SURVEY.md §7.3 tier (b)): the declarative form folds a
  * `zip_with` per bit through the interpreted higher-order evaluator —
  * nBits × dim boxed operations per row, and the projection drops out of
  * WholeStageCodegen. Hyperplanes are row-constants either way; here they
  * are literally one `double[][]` shared by every row.
  */
case class SignLshBucketExpr(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sign_lsh_bucket needs array<float|double>, got ${child.dataType.simpleString(10)}")

  override def dataType: DataType = LongType
  override def prettyName: String = "sign_lsh_bucket"

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    SignLshBucketExpr.bucket(planes, v, isFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.SignLshBucketExpr.bucket($planesRef, $v, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): SignLshBucketExpr =
    copy(child = newChild)
}

object SignLshBucketExpr {

  /** Shared by interpreted eval and generated code. */
  def bucket(planes: Array[Array[Double]], v: ArrayData, isFloat: Boolean): Long = {
    val n = v.numElements()
    var out = 0L
    var b = 0
    while (b < planes.length) {
      val plane = planes(b)
      val dim = math.min(plane.length, n)
      var proj = 0.0
      var i = 0
      while (i < dim) {
        val x = if (v.isNullAt(i)) 0.0
          else if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        proj += x * plane(i)
        i += 1
      }
      if (proj > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Deterministic hyperplanes from splitmix64 — same derivation as the
    * former declarative form (`ExprOps.centeredUnit`).
    */
  def planesFor(nBits: Int, dim: Int, seed: Int): Array[Array[Double]] =
    Array.tabulate(nBits, dim)((b, i) =>
      ExprOps.centeredUnit(seed.toLong * 1000003L + b * 1009L + i))

  def signLshNative(v: Column, nBits: Int, dim: Int, seed: Int = 42): Column =
    Bridge.column(SignLshBucketExpr(Bridge.expression(v), planesFor(nBits, dim, seed)))
}
