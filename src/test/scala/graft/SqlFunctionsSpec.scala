package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftExtensions, GraftSqlFunctions}

/** The SQL registration surface: every custom expression is callable from
  * spark.sql, and the SQL results match the DSL builders exactly. */
class SqlFunctionsSpec extends AnyFunSuite {
  lazy val spark = {
    val s = TestSpark.spark
    GraftSqlFunctions.register(s)
    s
  }

  test("extensions class injects the full function list without error") {
    // A fresh SparkSessionExtensions accepts all injections (builder-time
    // path); the session-level behavior is covered by register() below,
    // which shares the same (identifier, info, builder) triples.
    new GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("vector functions from SQL match the DSL expressions") {
    import spark.implicits._
    val row = spark.sql(
      """SELECT
        |  graft_cosine(array(1.0D, 2.0D), array(2.0D, 4.0D)) AS cos,
        |  graft_dot(array(1.0D, 2.0D), array(3.0D, 5.0D)) AS dot,
        |  graft_l2norm(array(3.0D, 4.0D)) AS nrm,
        |  graft_sorted_intersect_size(array('a','b','c'), array('b','c','d')) AS isect
        |""".stripMargin)
      .as[(Double, Double, Double, Int)].head()
    assert(math.abs(row._1 - 1.0) < 1e-15)
    assert(row._2 == 13.0)
    assert(row._3 == 5.0)
    assert(row._4 == 2)
  }

  test("hash/fingerprint functions from SQL match the DSL builders") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val viaSql = spark.sql(
      """SELECT
        |  graft_token_hashes(array('hello','the'), 31) AS h31s,
        |  graft_rolling_fp(array('hello','the')) AS fp,
        |  graft_simhash64(graft_token_hashes(array('hello','the'), 60)) AS sh,
        |  graft_minhash(array('hello','the'), 16, 12, 42L) AS mh
        |""".stripMargin)
    val viaDsl = Seq(("x", Seq("hello", "the"))).toDF("k", "toks")
      .select(
        graft.functions.PortableHashFunctions.md5_token_hashes(col("toks"), 31).as("h31s"),
        graft.functions.PortableHashFunctions.rolling_fingerprint(col("toks")).as("fp"),
        graft.functions.VectorFunctions.simhash64(
          graft.functions.PortableHashFunctions.md5_token_hashes(col("toks"), 60)).as("sh"),
        graft.functions.MinHashFunctions.minhash_signature(col("toks"), 16, 12, 42L).as("mh"))
    val a = viaSql.as[(Seq[Long], Long, Long, Seq[Long])].head()
    val b = viaDsl.as[(Seq[Long], Long, Long, Seq[Long])].head()
    assert(a == b)
  }

  test("graft_word_ngrams from SQL matches the DSL expression") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val viaSql = spark.sql(
      "SELECT graft_word_ngrams(array('a','b','c','d'), 2) AS g").as[Seq[String]].head()
    val viaDsl = Seq(("x", Seq("a", "b", "c", "d"))).toDF("k", "toks")
      .select(graft.functions.NgramFunctions.word_ngrams(col("toks"), 2).as("g"))
      .as[Seq[String]].head()
    assert(viaSql == viaDsl && viaSql == Seq("a b", "b c", "c d"))
  }

  test("composed-column functions (jaccard, hamming) work from SQL") {
    import spark.implicits._
    val r = spark.sql(
      """SELECT
        |  graft_jaccard(array('a','b','c'), array('b','c','d')) AS j,
        |  graft_hamming(CAST(7 AS BIGINT), CAST(1 AS BIGINT)) AS h
        |""".stripMargin).as[(Double, Int)].head()
    assert(r._1 == 0.5) // |{b,c}| / |{a,b,c,d}|
    assert(r._2 == 2)   // 7 xor 1 = 110b
  }

  test("non-literal fixed params are rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash(array('a'), cast(rand()*4 AS INT) + 1, 12, 42L)").collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      Option(e.getCause).exists(_.getMessage.contains("integer literal")))
  }
}
