package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float|double>` columns — the building
  * block for similarity search and embedding-based dedup at 100 TB
  * (SURVEY.md §7.2 step 5). The hot scalars (cosine, sign-LSH bucket)
  * delegate to native codegen'd expressions ([[CosineSimilarity]],
  * [[SignLshBucketExpr]]); the rest are declarative higher-order functions
  * (NOTE: those evaluate interpreted — fine off the hot path, see
  * SCALING.md "Expression-level costs").
  *
  * All math is done in double precision and accumulates left-to-right in
  * element order, which keeps results bit-stable across engines for oracle
  * comparison.
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
  /** Cosine similarity — delegates to the native codegen'd
    * [[CosineSimilarity]] expression (the declarative higher-order form is
    * CodegenFallback and drags whole projections out of codegen; see
    * CosineExpression). Bit-identical accumulation order, zero-norm → 0.0.
    */
  def cosine(a: Column, b: Column): Column = CosineExpression.cosineNative(a, b)

  /** Declarative reference implementation (kept for equivalence testing). */
  def cosineDeclarative(a: Column, b: Column): Column =
    ExprOps.let(toDouble(a)) { ad =>
      ExprOps.let(toDouble(b)) { bd =>
        ExprOps.let(normSq(ad) * normSq(bd)) { den =>
          // zero-norm guard: NaN sorts above every double in Spark, so without
          // this zero embeddings would rank first in every top-k
          when(den === 0.0, lit(0.0)).otherwise(dot(ad, bd) / sqrt(den))
        }
      }
    }

  /** L2-normalize a vector to unit length (zero vectors pass through
    * unchanged rather than dividing by zero). Normalizing embeddings up
    * front turns cosine ranking into a plain dot product and makes
    * sign-LSH/IVF cell geometry scale-free — the standard prep step before
    * indexing a 100 TB embedding corpus. Accumulation is left-to-right in
    * element order (same as [[normSq]]) so results are bit-stable across
    * engines.
    */
  def l2Normalize(a: Column): Column =
    ExprOps.let(toDouble(a)) { ad =>
      ExprOps.let(sqrt(normSq(ad))) { n =>
        when(n === 0.0, ad).otherwise(transform(ad, x => x / n))
      }
    }

  def l2Distance(a: Column, b: Column): Column = {
    val ad = toDouble(a); val bd = toDouble(b)
    sqrt(aggregate(zip_with(ad, bd, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v))
  }

  /** Symmetric int8 scalar quantization: scale = max|v| / 127, q[i] =
    * round(v[i] / scale) ∈ [-127, 127]. Returns struct(scale: double,
    * q: array<int>). The 4× (vs float32) / 8× (vs float64) memory cut that
    * makes a 100 TB embedding corpus fit a fraction of the executors —
    * brute-force and IVF scans read int8 and rescore survivors at full
    * precision. Zero vectors quantize to all-zero with scale 0 (no 0/0).
    * max is order-independent and round/divide are exact IEEE ops, so the
    * result is bit-stable across engines and partitionings.
    */
  def quantizeInt8(v: Column): Column =
    ExprOps.let(toDouble(v)) { vd =>
      ExprOps.let(aggregate(vd, lit(0.0), (a, x) => greatest(a, abs(x))) / 127.0) { s =>
        struct(s.as("scale"),
          when(s === 0.0, transform(vd, x => (x * 0).cast("int")))
            .otherwise(transform(vd, x => round(x / s).cast("int"))).as("q"))
      }
    }

  /** Inverse of [[quantizeInt8]]: q[i] × scale back to array<double>.
    * Reconstruction error is ≤ scale/2 per element by construction.
    */
  def dequantizeInt8(qs: Column): Column =
    ExprOps.let(qs.getField("scale")) { s =>
      transform(qs.getField("q"), x => x.cast("double") * s)
    }

  /** Deterministic Rademacher (±1) random projection `dim` → `outDim`:
    * out[j] = Σᵢ sign(j,i)·v[i], with sign(j,i) the parity of the first hex
    * nibble of md5("salt:j:i"). Johnson–Lindenstrauss with the
    * database-friendly ±1 matrix (Achlioptas, PODS'01): scaling the output
    * by 1/√outDim preserves pairwise distances within 1±ε for
    * outDim = O(log n / ε²) — the cheap dimension cut before LSH/IVF
    * indexing of a 100 TB embedding corpus (64→16 dims = 4× less shuffle
    * and scan per downstream similarity op).
    *
    * No RNG anywhere: the matrix is a pure function of (salt, j, i), so an
    * oracle engine regenerates it exactly, and re-running a pipeline on a
    * grown corpus projects old rows identically. The matrix is materialized
    * once driver-side as a literal (outDim×dim doubles ride into the plan —
    * trivial next to 100 TB of rows); accumulation is sequential in element
    * order, so integer-valued inputs (e.g. [[quantizeInt8]] codes) project
    * bit-exactly on any engine. `v` must have exactly `dim` elements.
    */
  def randomProjection(v: Column, dim: Int, outDim: Int,
                       salt: String = "graft"): Column = {
    require(dim > 0 && outDim > 0)
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(j: Int, i: Int): Double = {
      val h = md.digest(s"$salt:$j:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if (((h(0) >> 4) & 1) == 0) 1.0 else -1.0
    }
    val signs: Seq[Seq[Double]] =
      (0 until outDim).map(j => (0 until dim).map(i => sign(j, i)))
    val m = typedLit(signs)
    ExprOps.let(toDouble(v)) { vd =>
      transform(sequence(lit(0), lit(outDim - 1)), j =>
        aggregate(zip_with(vd, element_at(m, (j + 1).cast("int")), (x, s) => x * s),
          lit(0.0), (acc, x) => acc + x))
    }
  }

  /** Pack a vector's SIGN BITS into `ceil(dim/64)` BIGINT words: bit
    * `i mod 64` of word `i / 64` is set iff `v[i] >= 0`. This is 1-bit
    * scalar quantization — the most aggressive memory cut in the ANN
    * tier: 64 dims collapse to ONE 8-byte long (32× smaller than float32,
    * 8× smaller than the int8 codes), and Hamming distance between two
    * packed vectors is `popcount(xor)` per word — the cheapest possible
    * candidate metric at 100 TB (see [[graft.ext.Similarity.hammingTopK]]).
    * Zero is packed as positive (`>= 0`), matching SQL comparison
    * semantics in every engine (−0.0 == 0.0), so the packing is bit-stable
    * cross-engine and the Hamming rankings carry full integer oracles.
    * `v` must have exactly `dim` elements. Packing is declarative
    * (interpreted) — it runs once per row at signature-write time, off the
    * scan hot path, exactly like [[quantizeInt8]].
    */
  def packSignBits(v: Column, dim: Int): Column = {
    require(dim > 0, "dim must be positive")
    val nWords = (dim + 63) / 64
    ExprOps.let(toDouble(v)) { vd =>
      transform(sequence(lit(0), lit(nWords - 1)), w =>
        aggregate(
          sequence(w * 64, least(w * 64 + lit(63), lit(dim - 1))),
          lit(0L),
          (acc, i) =>
            when(element_at(vd, (i + 1).cast("int")) >= 0.0,
              acc.bitwiseOR(call_function("shiftleft", lit(1L), (i % 64).cast("int"))))
              .otherwise(acc)))
    }
  }

  /** Hamming distance between two [[packSignBits]] signatures:
    * `Σ popcount(a[w] xor b[w])` — integer, order-independent, bit-exact
    * across engines. Both arrays must have the same word count.
    */
  def hammingPacked(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => call_function("bit_count", x.bitwiseXOR(y)).cast("bigint")),
      lit(0L), (acc, v) => acc + v)

  /** Sign-bit LSH bucket for a vector: `nBits` deterministic pseudo-random
    * hyperplanes (splitmix64-derived row-constants). Delegates to the
    * native codegen'd [[SignLshBucketExpr]] — the planes ride along as one
    * shared `double[][]` reference object and all bit projections fuse
    * into a single loop per row (the declarative zip_with-per-bit form was
    * interpreted). Reproducible across runs.
    */
  def signLshBucket(v: Column, nBits: Int, dim: Int, seed: Int = 42): Column =
    SignLshBucketExpr.signLshNative(v, nBits, dim, seed)
}
