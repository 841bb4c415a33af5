package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for the graft custom expressions.
  *
  * The reference exposes its analytics through a SQL engine (Presto on the
  * Hive metastore, SURVEY.md §3.3); graft's equivalent surface is
  * `spark.sql` over temp views — which means the custom Catalyst
  * expressions must be callable FROM SQL, not only through the Scala DSL.
  * Two registration paths, same function list:
  *
  *  - config: `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (or `.withExtensions(new GraftExtensions)`) — the standard
  *    extensions mechanism, applies to every session built with it;
  *  - runtime: `GraftSqlFunctions.register(spark)` — injects into a LIVE
  *    session's function registry (the extensions path can't retrofit an
  *    already-built session).
  *
  * All functions are deterministic scalar expressions; fixed parameters
  * (bands/rows/seed/bits) are taken from foldable literals at resolution
  * time, so plans stay codegen/pushdown-friendly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftSqlFunctions.all.foreach(ext.injectFunction)
}

object GraftSqlFunctions {

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private def litLong(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def fn(name: String, usage: String)(builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo("graft", null, name, usage, ""), builder)

  /** (identifier, info, builder) triples — the single source for both
    * registration paths. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("graft_cosine", "graft_cosine(a, b) - cosine similarity of two numeric arrays") {
      es => CosineSimilarity(es(0), es(1))
    },
    fn("graft_dot", "graft_dot(a, b) - dot product of two numeric arrays") {
      es => DotProduct(es(0), es(1))
    },
    fn("graft_l2norm", "graft_l2norm(a) - L2 norm of a numeric array") {
      es => L2Norm(es(0))
    },
    fn("graft_sorted_intersect_size",
      "graft_sorted_intersect_size(a, b) - |a ∩ b| for SORTED distinct arrays") {
      es => SortedIntersectSize(es(0), es(1))
    },
    fn("graft_simhash64",
      "graft_simhash64(hashes) - 64-bit SimHash over an array of token hashes") {
      es => SimHash64(es(0))
    },
    fn("graft_token_hashes",
      "graft_token_hashes(tokens, bits) - md5-derived portable token hashes (bits = 31 | 60)") {
      es => Md5TokenHashes(es(0), litInt(es(1), "bits"))
    },
    fn("graft_rolling_fp",
      "graft_rolling_fp(tokens) - order-sensitive rolling fingerprint over md5-derived hashes") {
      es => RollingFingerprint(es(0))
    },
    fn("graft_minhash",
      "graft_minhash(tokens, bands, rowsPerBand, seed) - MinHash signature (array<bigint>)") {
      es => MinHashSignature(
        es(0), litInt(es(1), "bands"), litInt(es(2), "rowsPerBand"), litLong(es(3), "seed"))
    },
    fn("graft_minhash_bands",
      "graft_minhash_bands(tokens, bands, rowsPerBand, seed) - LSH band bucket keys") {
      es => MinHashBandKeys(
        es(0), litInt(es(1), "bands"), litInt(es(2), "rowsPerBand"), litLong(es(3), "seed"))
    },
    // Composite operators register as catalyst trees built directly (a
    // composed Column carries unresolved ColumnNodes that the function
    // registry path cannot resolve); the analyzer's type coercion fills
    // in the int→double casts exactly as the DSL version gets them.
    fn("graft_jaccard", "graft_jaccard(a, b) - token-set Jaccard of two DISTINCT arrays") { es =>
      import org.apache.spark.sql.catalyst.expressions.{Add, Cast, Divide, Subtract}
      import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Size}
      import org.apache.spark.sql.types.DoubleType
      val ni = Size(ArrayIntersect(es(0), es(1)))
      Divide(Cast(ni, DoubleType), Subtract(Add(Size(es(0)), Size(es(1))), ni))
    },
    fn("graft_hamming", "graft_hamming(a, b) - Hamming distance between two 64-bit fingerprints") { es =>
      import org.apache.spark.sql.catalyst.expressions.{BitwiseCount, BitwiseXor, Cast}
      import org.apache.spark.sql.types.IntegerType
      Cast(BitwiseCount(BitwiseXor(es(0), es(1))), IntegerType)
    },
    fn("graft_word_ngrams",
      "graft_word_ngrams(tokens, n) - sliding word n-grams joined by spaces (single pass)") {
      es => WordNgrams(es(0), litInt(es(1), "n"))
    })

  /** Inject into a live session (new sessions: use the extensions class). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
