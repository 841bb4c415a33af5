package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental dedup against an EXISTING corpus snapshot — the ingest-time
  * shape of deduplication at 100 TB: when new data arrives, you do not
  * re-join it against the full corpus; the corpus compresses once into a
  * Bloom filter (bits ∝ n·ln(1/fpp) — ~1.2 GB per 10⁹ docs at 1% fpp,
  * mergeable by bit-OR so the build is an ordinary two-phase aggregate with
  * map-side partials), and each incoming batch filters MAP-ONLY against
  * the broadcast bits.
  *
  * The fourth mergeable sketch in the engine next to HLL (q42), GK
  * quantiles (q69), and CMS (q79) — and like them it is surfaced as a
  * BOUNDED driver-checked claim: per-row Bloom flags are engine-specific
  * (xxhash64 bit patterns), but the Bloom guarantee has a one-sided error —
  * NO FALSE NEGATIVES. `flagged OR NOT is_dup_exact` is therefore TRUE for
  * every row by construction, next to the exact-join audit twin the oracle
  * recomputes.
  *
  * Spark-native machinery: the build uses Catalyst's own
  * [[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate]]
  * and the probe its partner
  * [[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]] —
  * the exact pair AQE's runtime-filter injection plans (ScaleSpec's
  * `might_contain` pin), here driven explicitly for the snapshot-dedup use
  * case. Both sides key on xxhash64 of the content fingerprint (8-byte
  * internal-only keys, the q64 rationale — never oracle-surfaced). The
  * only collect is the sketch itself (one binary row, KBs–MBs — the q79
  * CMS pattern), embedded as a constant so the probe is pure map work.
  */
object IncrementalDedup {

  /** Optimal Bloom bit count for `n` items at false-positive rate `fpp`:
    * m = -n·ln(p) / ln(2)².
    *
    * Cluster note: BloomFilterAggregate validates against
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` (default 4M)
    * and `.maxNumBits` (default 67108864 ≈ 8 MB) — sized for AQE's
    * runtime filters. A 10⁹-key snapshot wants ~1.2 GB of bits at 1% fpp,
    * so a production deployment raises both confs (or shards the filter
    * by key range); the math here is the same either way. */
  def optimalNumBits(n: Long, fpp: Double): Long = {
    require(n > 0 && fpp > 0 && fpp < 1, s"need n > 0 and 0 < fpp < 1, got n=$n fpp=$fpp")
    math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
  }

  /** Build the snapshot's Bloom filter over `keyCol` (any expression; it is
    * xxhash64'd into the filter) — a distributed aggregate whose partials
    * merge map-side; returns the serialized bits. One sketch-sized collect. */
  def snapshotBloom(snapshot: DataFrame, keyCol: Column, expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val agg = new BloomFilterAggregate(
      expression(xxhash64(keyCol)),
      Literal(expectedItems),
      Literal(optimalNumBits(expectedItems, fpp)))
    val row = snapshot.agg(column(agg.toAggregateExpression()).as("bloom")).head()
    require(!row.isNullAt(0), "empty snapshot: no Bloom filter to build")
    row.getAs[Array[Byte]](0)
  }

  /** Map-only membership probe: might_contain(bloom, xxhash64(keyCol)).
    * True for every key that was in the snapshot (no false negatives);
    * true for ~fpp of the keys that were not. */
  def mightContain(bloom: Array[Byte], keyCol: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.types.BinaryType
    column(BloomFilterMightContain(Literal(bloom, BinaryType), expression(xxhash64(keyCol))))
  }

  /** Flag an incoming batch against a snapshot: returns one row per
    * incoming id — `(idCol, is_dup_exact, no_false_negative)` where
    * is_dup_exact comes from the exact fingerprint semi-join (the audit
    * twin, oracle-recomputable) and no_false_negative is the Bloom
    * guarantee `flagged ∨ ¬dup` (structurally TRUE; a false row means the
    * sketch machinery itself broke). `fpCol` must be deterministic in the
    * content (e.g. [[graft.text.TextAnalysis.tokenSetKey]]). */
  def flagIncoming(snapshot: DataFrame, incoming: DataFrame, idCol: String,
      fpCol: Column, fpp: Double = 0.01): DataFrame = {
    // One row per distinct snapshot fingerprint. The cache lives ONLY for
    // the two in-function driver actions (count, Bloom build) and is
    // unpersisted before returning — repeated flagIncoming calls leak no
    // session-lifetime cache entries. The returned plan's exact-join audit
    // recomputes the distinct once at caller materialization: one extra
    // shuffle of compact keys, versus pinning a corpus-keyed cache for the
    // session (the wrong shape at 100 TB anyway).
    val snapKeys = snapshot.select(fpCol.as("fp")).distinct()
    snapKeys.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bloom =
      try {
        val n = snapKeys.count()
        snapshotBloom(snapKeys, col("fp"), expectedItems = math.max(n, 1L), fpp)
      } finally snapKeys.unpersist(blocking = false)
    incoming
      .select(col(idCol), fpCol.as("fp"))
      .withColumn("bloom_flagged", mightContain(bloom, col("fp")))
      .join(snapKeys.withColumn("is_dup_exact", lit(true)), Seq("fp"), "left")
      .select(
        col(idCol),
        coalesce(col("is_dup_exact"), lit(false)).as("is_dup_exact"),
        (col("bloom_flagged") || !coalesce(col("is_dup_exact"), lit(false)))
          .as("no_false_negative"))
  }
}
