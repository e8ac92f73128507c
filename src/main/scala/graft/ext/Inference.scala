package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batched model-inference harness: the Spark-side plumbing for running an
  * expensive batch-shaped model (embedding encoder, quality classifier, GPU
  * reranker) over a corpus. The MODEL is pluggable — any serializable
  * `Seq[String] => Seq[Double]` — because this container ships no ML
  * runtime; what the engine owns is the part that matters at 100 TB:
  *
  *  - batching: inputs are grouped into fixed-size batches per partition
  *    (the GPU-shaped unit of work), with the last partial batch flushed —
  *    a model is called once per batch, never once per row;
  *  - lifecycle: the model function is deserialized once per partition
  *    (the `mapPartitions` shape), so a real implementation can lazily open
  *    an ONNX session / codec / HTTP client per task and reuse it across
  *    batches — same pooled-client pattern as [[graft.operators.Enrich]];
  *  - alignment: outputs are zipped 1:1 with their batch's inputs, so each
  *    row keeps its own score regardless of batch boundaries, and a
  *    deterministic model makes the whole operator deterministic under any
  *    partitioning;
  *  - sizing: `numPartitions` decouples batch parallelism from input file
  *    layout (a 100 TB scan's partitioning is rarely the right inference
  *    granularity).
  */
object Inference {

  /** Named-model registry — the seam that lets pipeline-as-config (the YAML
    * layer) reference a model by name: code registers the function once at
    * startup, configs say `model: quality-v2`. Driver-side only; the
    * function itself still ships to executors through the [[scoreBatched]]
    * closure, so it must be serializable like any Spark closure.
    */
  private val models =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[String] => Seq[Double]]()

  def registerModel(name: String, model: Seq[String] => Seq[Double]): Unit =
    models.put(name, model)

  def model(name: String): Seq[String] => Seq[Double] =
    Option(models.get(name)).getOrElse(throw new IllegalArgumentException(
      s"no model registered under '$name' — call Inference.registerModel first " +
        s"(registered: ${models.keySet().toArray.mkString(", ")})"))

  /** Score `inputCol` with `model`, called once per `batchSize` rows within
    * each partition. Output: (`idCol` with its original type, `outCol`
    * double). The model MUST return exactly one output per input — a
    * mismatch fails the task rather than silently misaligning scores.
    */
  def scoreBatched(spark: SparkSession, df: DataFrame, idCol: String,
                   inputCol: String, batchSize: Int, outCol: String = "score",
                   numPartitions: Int = 0)
                  (model: Seq[String] => Seq[Double]): DataFrame = {
    require(batchSize > 0)
    val in0 = df.select(col(idCol), col(inputCol).cast("string"))
    val in = if (numPartitions > 0) in0.repartition(numPartitions) else in0
    val outSchema = StructType(Seq(
      df.schema(idCol).copy(name = idCol), StructField(outCol, DoubleType)))
    val rdd = in.rdd.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val outs = model(batch.map(_.getString(1)))
        require(outs.size == batch.size,
          s"model returned ${outs.size} outputs for a batch of ${batch.size}")
        batch.iterator.zip(outs.iterator).map { case (r, o) => Row(r.get(0), o) }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
