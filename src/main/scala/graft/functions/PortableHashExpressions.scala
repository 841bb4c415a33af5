package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Engine-portable 64-bit-ish hashes derived from md5.
  *
  * xxhash64 is Spark-specific: any query that SURFACES a token hash (minhash
  * signatures, simhash fingerprints, rolling fingerprints) can't be
  * oracle-checked against DuckDB with it. md5 is identical everywhere, so the
  * portable hashes take a prefix of the md5 digest as an integer:
  *
  *   h31(t) = int(md5(t)[hex 1..8])  & 0x7FFFFFFF   (31 bits — mod-prime safe)
  *   h60(t) = int(md5(t)[hex 1..15])                (60 bits — fits BIGINT)
  *
  * Both are reproducible in ANSI SQL (substr(md5(x)) + hex fold), which is
  * what turns the fingerprint family from rows-only checks into exact
  * cross-engine oracles. xxhash64 stays in use where the hash is never
  * externally visible (LSH band bucket keys).
  */
object Md5Hash {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private def digest(bytes: Array[Byte]): Array[Byte] = {
    val m = md.get(); m.reset(); m.digest(bytes)
  }
  /** First 8 hex chars (4 bytes, big-endian) masked to 31 bits. */
  def h31(bytes: Array[Byte]): Long = {
    val d = digest(bytes)
    (((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) | ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)) & 0x7FFFFFFFL
  }
  /** First 15 hex chars (7.5 bytes, big-endian): 60 bits, always >= 0. */
  def h60(bytes: Array[Byte]): Long = {
    val d = digest(bytes)
    var acc = 0L
    var i = 0
    while (i < 7) { acc = (acc << 8) | (d(i) & 0xFFL); i += 1 }
    (acc << 4) | ((d(7) & 0xF0L) >>> 4)
  }

  /** DuckDB SQL computing the same value (for oracle construction): fold the
    * first `hexChars` md5 hex digits into a BIGINT. */
  def duckSql(tokenExpr: String, hexChars: Int, mask31: Boolean): String = {
    val fold = s"list_reduce(list_transform(range(1,${hexChars + 1}), i -> " +
      s"CAST(strpos('0123456789abcdef', substr(md5($tokenExpr), CAST(i AS INTEGER), 1)) - 1 AS BIGINT)), " +
      "(acc, d) -> acc*16+d)"
    if (mask31) s"($fold & 2147483647)" else s"($fold)"
  }
  def duckH31(tokenExpr: String): String = duckSql(tokenExpr, 8, mask31 = true)
  def duckH60(tokenExpr: String): String = duckSql(tokenExpr, 15, mask31 = false)
}

/** array<string> -> array<long> of portable md5-derived token hashes; one
  * digest per token in a primitive loop (the HOF transform() route is
  * interpreted per element). `bits` selects h31 or h60. */
case class Md5TokenHashes(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {
  require(bits == 31 || bits == 60, s"bits must be 31 or 60, got $bits")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val b = if (a.isNullAt(i)) Array.emptyByteArray else a.getUTF8String(i).getBytes
      out(i) = if (bits == 31) Md5Hash.h31(b) else Md5Hash.h60(b)
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Order-sensitive rolling polynomial fingerprint over a token array:
  * acc = (acc*31 + h31(token)) mod (2^31-1), acc0 = 7. Single pass; the
  * aggregate() HOF equivalent is interpreted and allocates per step.
  * Arithmetic stays < 2^36 — ANSI-overflow-safe. */
case class RollingFingerprint(child: Expression)
    extends UnaryExpression with CodegenFallback {
  private val Prime = 2147483647L
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var acc = 7L
    var i = 0
    while (i < n) {
      val b = if (a.isNullAt(i)) Array.emptyByteArray else a.getUTF8String(i).getBytes
      acc = (acc * 31L + Md5Hash.h31(b)) % Prime
      i += 1
    }
    acc
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object PortableHashFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}
  def md5_token_hashes(tokens: Column, bits: Int): Column =
    column(Md5TokenHashes(expression(tokens), bits))
  def rolling_fingerprint(tokens: Column): Column =
    column(RollingFingerprint(expression(tokens)))
}
