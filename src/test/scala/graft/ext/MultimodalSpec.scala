package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.fromText(
    Seq((1L, "short"), (2L, "x" * 200)).toDF("id", "t"), "id", "t", "image")

  test("resizeStub normalizes every payload to the target byte box") {
    val out = Multimodal.resizeStub(media, targetBytes = 64)
      .select(col("media_id"), length(col("content")).as("len"),
        col("meta.width"), col("meta.height"))
      .as[(Long, Int, Int, Int)].collect().toSeq.sortBy(_._1)
    assert(out.forall(_._2 == 64))                  // truncated AND padded
    assert(out.forall(r => r._3 == 224 && r._4 == 224))
    // padded payload preserves the original prefix
    val p = Multimodal.resizeStub(media, 64).filter($"media_id" === 1L)
      .select(col("content").cast("string")).as[String].head()
    assert(p.startsWith("short") && p.length == 64)
  }

  test("decodeStub emits fixed-dim deterministic features in [0,1)") {
    val f = Multimodal.decodeStub(media, featureDim = 4)
      .select(col("features")).as[Seq[Double]].collect()
    assert(f.forall(_.length == 4))
    assert(f.flatten.forall(v => v >= 0.0 && v < 1.0))
    val f2 = Multimodal.decodeStub(media, featureDim = 4)
      .select(col("features")).as[Seq[Double]].collect()
    assert(f.map(_.toSeq).toSeq == f2.map(_.toSeq).toSeq)
  }
}
