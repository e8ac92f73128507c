package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching — entity resolution over dirty string keys.
  *
  * A naive fuzzy join is |L|×|R| edit-distance evaluations; the standard
  * fix is *blocking*: join only within a cheap equality block (shared
  * prefix/suffix/phonetic key), then score the block-local candidates.
  * Recall is bounded by the block choice (an edit inside the block key
  * escapes the block — run a second pass with a different block for higher
  * recall); cost is bounded by the largest block, which is the knob to
  * watch at corpus scale.
  */
object Fuzzy {

  /** Phonetic block key — catches typos a prefix block misses ("Jon" /
    * "John" share a soundex but not a 4-prefix). Use as a second pass and
    * union the match sets for higher recall.
    */
  val soundexBlock: Column => Column = c => soundex(c)

  /** Join rows whose string keys are within `maxDist` Levenshtein edits,
    * blocking on `blockKey` of each side's key column. Adds `edit_dist`.
    */
  def joinByEditDistance(left: DataFrame, right: DataFrame,
                         leftCol: String, rightCol: String, maxDist: Int,
                         blockKey: Column => Column): DataFrame = {
    require(maxDist >= 0)
    val l = left.withColumn("__blk", blockKey(col(leftCol)))
    val r = right.withColumn("__blk", blockKey(col(rightCol)))
    l.join(r, "__blk")
      .withColumn("edit_dist", levenshtein(col(leftCol), col(rightCol)).cast("bigint"))
      .filter(col("edit_dist") <= maxDist)
      .drop("__blk")
  }
}
