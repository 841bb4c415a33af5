package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{cosine_sim, simhash64}
import graft.text.TextAnalysis

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design: every pipeline is
  *   per-row signature (map-only, codegen'd) →
  *   candidate generation (ONE shuffle on a compact key) →
  *   exact verification (joins only candidate pairs, never all pairs).
  * Nothing materializes the O(n²) pair space; the only quadratic work is
  * within LSH buckets, which banding keeps small.
  */
object Dedup {

  // ---------------------------------------------------------------------------
  // Exact dedup
  // ---------------------------------------------------------------------------

  /** Exact dedup by content hash: one hash-aggregate, keeps the smallest id
    * per group. */
  def exactDedup(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(md5(col(contentCol).cast("binary")).as("content_key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  // ---------------------------------------------------------------------------
  // MinHash + LSH
  // ---------------------------------------------------------------------------

  /** MinHash parameters. k = bands*rowsPerBand universal hashes
    * h_i(x) = (a_i·x + b_i) mod p over 31-bit token hashes. With the
    * default 12 bands × 8 rows, a pair at Jaccard 0.95 is missed with
    * probability (1-0.95^8)^12 ≈ 2·10⁻⁶ — effectively exact at the 0.95
    * threshold while pruning ~82% of random pairs. */
  final case class MinHashParams(bands: Int = 12, rowsPerBand: Int = 8, seed: Long = 42L) {
    val k: Int = bands * rowsPerBand
    val prime: Long = 2147483647L // 2^31-1; a·x+b ≤ 2^62, ANSI-overflow-safe
    private val rnd = new scala.util.Random(seed)
    val as: Array[Long] = Array.fill(k)(1L + rnd.nextInt(Int.MaxValue - 1).toLong)
    val bs: Array[Long] = Array.fill(k)(rnd.nextInt(Int.MaxValue).toLong)
  }

  /** 31-bit hashes of the distinct tokens (the shingle set). */
  def tokenHashes(text: Column): Column =
    transform(
      array_distinct(TextAnalysis.tokens(text)),
      t => xxhash64(t).bitwiseAND(lit(0x7FFFFFFFL)))

  /** k-wide MinHash signature as array<bigint>. Map-only, codegen'd. */
  def minhashSignature(text: Column, p: MinHashParams = MinHashParams()): Column = {
    val hashes = tokenHashes(text)
    val mins = (0 until p.k).map { i =>
      array_min(transform(hashes, h => pmod(h * lit(p.as(i)) + lit(p.bs(i)), lit(p.prime))))
    }
    array(mins: _*)
  }

  /** Banded LSH keys: one 64-bit hash per band of the signature. */
  def bandKeys(sig: Column, p: MinHashParams = MinHashParams()): Column =
    array((0 until p.bands).map(i => xxhash64(slice(sig, i * p.rowsPerBand + 1, p.rowsPerBand))): _*)

  /** Candidate pairs via band-bucket equi-join: explode (band_idx, band_key),
    * self-join on the bucket, distinct the pair. The join key is compact
    * (int, long) — this is the single large shuffle of the pipeline. */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
      p: MinHashParams = MinHashParams()): DataFrame = {
    val banded = docs
      .select(col(idCol).as("id"), bandKeys(minhashSignature(col(textCol), p), p).as("bands"))
      .select(col("id"), posexplode(col("bands")).as(Seq("band_idx", "band_key")))
    val l = banded.select(col("band_idx"), col("band_key"), col("id").as("id_a"))
    val r = banded.select(col("band_idx"), col("band_key"), col("id").as("id_b"))
    l.join(r, Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Exact token-set Jaccard between two token-array columns. int/int
    * division → bit-deterministic double. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Near-duplicate pairs: LSH candidates verified with exact Jaccard ≥
    * threshold. Output (id_a, id_b, jaccard). */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.95, p: MinHashParams = MinHashParams()): DataFrame = {
    val toks = docs.select(
      col(idCol).as("tid"),
      array_distinct(TextAnalysis.tokens(col(textCol))).as("toks"))
    candidatePairs(docs, idCol, textCol, p)
      .join(toks.select(col("tid").as("id_a"), col("toks").as("toks_a")), Seq("id_a"))
      .join(toks.select(col("tid").as("id_b"), col("toks").as("toks_b")), Seq("id_b"))
      .withColumn("jaccard", jaccard(col("toks_a"), col("toks_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Character n-gram (shingle) Jaccard variant: same LSH machinery over
    * word 3-gram shingles instead of single tokens — discriminative for
    * running text where unigram sets saturate. */
  def wordNgrams(text: Column, n: Int = 3): Column = {
    val toks = TextAnalysis.tokens(text)
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array(text))
  }

  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val grams = docs.select(
      col(idCol).as("tid"),
      array_distinct(wordNgrams(col(textCol), n)).as("grams"))
    // Reuse minhash LSH over the shingle strings by hashing grams directly.
    val p = MinHashParams()
    val hashes = transform(col("grams"), g => xxhash64(g).bitwiseAND(lit(0x7FFFFFFFL)))
    val mins = (0 until p.k).map { i =>
      array_min(transform(hashes, h => pmod(h * lit(p.as(i)) + lit(p.bs(i)), lit(p.prime))))
    }
    val banded = grams
      .select(col("tid"), bandKeys(array(mins: _*), p).as("bands"), col("grams"))
      .select(col("tid"), posexplode(col("bands")).as(Seq("band_idx", "band_key")))
    val l = banded.select(col("band_idx"), col("band_key"), col("tid").as("id_a"))
    val r = banded.select(col("band_idx"), col("band_key"), col("tid").as("id_b"))
    l.join(r, Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
      .join(grams.select(col("tid").as("id_a"), col("grams").as("grams_a")), Seq("id_a"))
      .join(grams.select(col("tid").as("id_b"), col("grams").as("grams_b")), Seq("id_b"))
      .withColumn("jaccard", jaccard(col("grams_a"), col("grams_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // ---------------------------------------------------------------------------
  // SimHash
  // ---------------------------------------------------------------------------

  /** 64-bit SimHash per document (custom Catalyst expression — one pass). */
  def simhash(text: Column): Column =
    simhash64(transform(TextAnalysis.tokens(text), t => xxhash64(t)))

  /** Hamming distance between two simhashes: bit_count(xor). */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("int")

  /** Close pairs by SimHash: pigeonhole 4×16-bit bands — any pair with
    * hamming ≤ 3 must agree on at least one band, so candidate recall is
    * exact for that radius; ranked output shows the nearest pairs found. */
  def simhashClosePairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, topK: Int = 100): DataFrame = {
    val sigs = docs.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
    val banded = sigs.select(
      col("id"), col("sig"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("sig"), i * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band_idx", "band_key")))
    val l = banded.select(col("band_idx"), col("band_key"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band_idx"), col("band_key"), col("id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming(col("sig_a"), col("sig_b")).as("hamming"))
      .distinct()
      .orderBy(col("hamming"), col("id_a"), col("id_b"))
      .limit(topK)
  }

  // ---------------------------------------------------------------------------
  // Embedding near-dup
  // ---------------------------------------------------------------------------

  /** Embedding-cosine near-duplicates above `threshold`, via hyperplane-LSH
    * candidate buckets + exact cosine verify (custom expression). For small
    * thresholds LSH recall drops; the Ann module's multi-table variant is
    * the tunable version — this one targets true near-dups (θ small). */
  def embeddingNearDups(embs: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.4): DataFrame = {
    val candidates = graft.similarity.Ann
      .bucketed(embs, idCol, vecCol, tables = 8, bits = 6, seed = 7L)
    val l = candidates.select(col("table_idx"), col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"))
    val r = candidates.select(col("table_idx"), col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"))
    l.join(r, Seq("table_idx", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("vec_a"), col("vec_b"))
      .distinct()
      .withColumn("cosine", cosine_sim(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
