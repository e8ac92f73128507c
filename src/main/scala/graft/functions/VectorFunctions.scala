package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns as pure Catalyst
  * higher-order functions (`zip_with`/`aggregate`) — codegen'd, no UDF, no
  * driver involvement; the building block for similarity search and
  * embedding-based dedup at 100 TB (SURVEY.md §7.2 step 5).
  *
  * All math is done in double precision (inputs cast up front) and
  * accumulates left-to-right in element order, which keeps results
  * bit-stable across engines for oracle comparison.
  */
object VectorFunctions {

  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def normSq(a: Column): Column =
    aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity, computed as dot / sqrt(|a|^2 * |b|^2) — the same
    * association DuckDB's list_cosine_similarity uses, so oracle comparisons
    * agree to the last ulp before rounding.
    */
  def cosine(a: Column, b: Column): Column = {
    val ad = toDouble(a); val bd = toDouble(b)
    val den = normSq(ad) * normSq(bd)
    // zero-norm guard: NaN sorts above every double in Spark, so without this
    // zero embeddings would rank first in every top-k and pass thresholds
    when(den === 0.0, lit(0.0)).otherwise(dot(ad, bd) / sqrt(den))
  }

  def l2Distance(a: Column, b: Column): Column = {
    val ad = toDouble(a); val bd = toDouble(b)
    sqrt(aggregate(zip_with(ad, bd, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v))
  }

  /** Sign-bit LSH bucket for a vector: `nBits` deterministic pseudo-random
    * hyperplanes, plane components derived from xxhash64 (no RNG state, so
    * the bucketing is reproducible across runs and engines). Plane b,
    * component i = centered hash in [-0.5, 0.5).
    */
  def signLshBucket(v: Column, nBits: Int, dim: Int, seed: Int = 42): Column = {
    val vd = toDouble(v)
    val bits = (0 until nBits).map { b =>
      val proj = aggregate(
        zip_with(vd, sequence(lit(0), lit(dim - 1)), (x, i) =>
          x * ((pmod(xxhash64(concat_ws("_", lit(seed), lit(b), i)), lit(1000000L))
            .cast("double") / 1000000.0) - 0.5)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce((x, y) => x.bitwiseOR(y))
  }
}
