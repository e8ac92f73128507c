package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{IntegerType, LongType}

/** SQL-surface registration of graft's native Catalyst expressions, so SQL
  * users (`spark.sql(...)`, JDBC/Thrift clients, SQL files) get the same
  * codegen'd hot scalars the DataFrame API uses:
  *
  *  - `graft_simhash64(text)`                       → 64-bit SimHash
  *  - `graft_cosine(vec, vec)`                      → cosine similarity
  *  - `graft_winnow(text[, k, w])`                  → winnowing fingerprints
  *  - `graft_sign_lsh_bucket(vec, bits, dim[, s])`  → sign-LSH bucket
  *  - `graft_snowflake_id()`                        → distributed unique id
  *
  * Two registration paths, same builders:
  *  1. config-time: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *     (works for sessions the library never sees, e.g. Thrift server);
  *  2. runtime: `GraftFunctions.register(spark)` on a live session.
  *
  * Parameters that shape codegen (bits/dim/k/w/seed) must be integer
  * literals — they become constants baked into the generated loop, which is
  * exactly why these expressions are fast (no per-row parameter decode).
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType)   => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  private def arity(fn: String, args: Seq[Expression], ok: Range): Unit =
    require(ok.contains(args.length),
      s"$fn expects ${ok.min}..${ok.max} arguments, got ${args.length}")

  /** (name, builder) for every SQL-exposed native expression. */
  val descriptors: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_simhash64" -> { args =>
      arity("graft_simhash64", args, 1 to 1)
      SimHash64Text(args.head)
    },
    "graft_cosine" -> { args =>
      arity("graft_cosine", args, 2 to 2)
      CosineSimilarity(args(0), args(1))
    },
    "graft_winnow" -> { args =>
      arity("graft_winnow", args, 1 to 3)
      val k = if (args.length > 1) intLit(args(1), "k") else 25
      val w = if (args.length > 2) intLit(args(2), "w") else 16
      WinnowFingerprints(args.head, k, w)
    },
    "graft_sign_lsh_bucket" -> { args =>
      arity("graft_sign_lsh_bucket", args, 3 to 4)
      val bits = intLit(args(1), "nBits")
      val dim  = intLit(args(2), "dim")
      val seed = if (args.length > 3) intLit(args(3), "seed") else 42
      SignLshBucketExpr(args.head, SignLshBucketExpr.planesFor(bits, dim, seed))
    },
    "graft_snowflake_id" -> { args =>
      arity("graft_snowflake_id", args, 0 to 0)
      SnowflakeId()
    },
    // Column-composition functions (TextFunctions) exposed to SQL the same
    // way: build the composed Column over the argument expression and
    // convert back — the resulting tree is ordinary codegen'd Catalyst.
    "graft_token_count" -> colFn1("graft_token_count", TextFunctions.tokenCount),
    "graft_quality_pm" -> colFn1("graft_quality_pm", TextFunctions.qualityPerMille),
    "graft_langid" -> colFn1("graft_langid", TextFunctions.langId),
    "graft_fingerprint" -> colFn1("graft_fingerprint", TextFunctions.fingerprint),
    "graft_clean_text" -> colFn1("graft_clean_text", TextFunctions.cleanText),
    "graft_redact_pii" -> colFn1("graft_redact_pii", TextFunctions.redactPii))

  /** Lift a unary Column function into an Expression builder — the
    * composed Column converts EAGERLY to a resolvable Catalyst tree (a
    * lazy `Bridge.expression` wrapper would be Unevaluable here).
    */
  private def colFn1(fn: String,
                     f: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : Seq[Expression] => Expression = { args =>
    arity(fn, args, 1 to 1)
    Bridge.resolvableExpression(f(Bridge.column(args.head)))
  }

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(GraftFunctions.getClass.getCanonicalName, name)

  /** Runtime registration on a live session (idempotent — re-registering
    * replaces the previous builder).
    */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (name, builder) =>
      Bridge.registerFunction(spark, FunctionIdentifier(name), info(name), builder)
    }
}

/** `spark.sql.extensions` entry point — injects every [[GraftFunctions]]
  * descriptor at session build time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.descriptors.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(GraftFunctions.getClass.getCanonicalName, name), builder))
    }
}
