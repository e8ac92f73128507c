package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.fromText(
    Seq((1L, "short"), (2L, "x" * 200)).toDF("id", "t"), "id", "t", "image")

  test("fromText wraps rows into the canonical media schema") {
    val out = media.select(col("media_id"), col("kind"),
      length(col("content")).as("len"), col("meta.mime"))
      .as[(Long, String, Int, String)].collect().toSeq.sortBy(_._1)
    assert(out == Seq((1L, "image", 5, "text/plain"),
      (2L, "image", 200, "text/plain")))
  }

  test("sampleFrames strides payload bytes and keeps every-nth window") {
    // 200 bytes / 64 -> 4 frames, every 2nd -> idx 0 and 2
    val out = Multimodal.sampleFrames(media, frameBytes = 64, everyNth = 2)
      .filter($"media_id" === 2L)
      .select(col("frame_idx"), length(col("frame")).as("n"))
      .as[(Int, Int)].collect().toSeq.sortBy(_._1)
    assert(out == Seq((0, 64), (2, 64)))
  }
}
