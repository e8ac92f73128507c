package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity over two numeric arrays as a native codegen'd Catalyst
  * expression — the hot scalar of the similarity-search and embedding-dedup
  * tier (`Similarity`, `Dedup.embeddingDupPairs`, `Ivf`).
  *
  * Why custom (SURVEY.md §7.3 tier (b)): the declarative form
  * (`zip_with`/`aggregate`) is a higher-order function — CodegenFallback,
  * interpreted per element, and it pulls the whole projection out of
  * WholeStageCodegen. This expression runs one fused loop: dot product and
  * both norms accumulate together, in the exact same left-to-right double
  * order as the declarative form, so scores are bit-identical (the DuckDB
  * oracle comparison relies on that).
  *
  * Zero-norm inputs score 0.0 (NaN would sort above every double and rank
  * zero embeddings first in any top-k). Mismatched lengths score over the
  * common prefix; null input → null.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity needs array<float|double> args, got " +
        s"${left.dataType.simpleString(10)}, ${right.dataType.simpleString(10)}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  private lazy val leftIsFloat = left.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }
  private lazy val rightIsFloat = right.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (x.isNullAt(i)) 0.0
        else if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (y.isNullAt(i)) 0.0
        else if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val den = na * nb
    if (den == 0.0) 0.0 else dot / math.sqrt(den)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val den = ctx.freshName("den")
      val getA = if (leftIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (rightIsFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.isNullAt($i) ? 0.0 : $getA;
         |  double $yi = $b.isNullAt($i) ? 0.0 : $getB;
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |double $den = $na * $nb;
         |${ev.value} = ($den == 0.0) ? 0.0 : $dot / Math.sqrt($den);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineExpression {
  /** Column API — drop-in fast form of `VectorFunctions.cosine`. */
  def cosineNative(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))
}
