package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.text.TextAnalysis

/** Dedup pipelines vs in-engine brute force on real testdata. */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def docs = Tables.documents(spark, TestSpark.SfDir)

  test("minhash LSH near-dups == brute-force pairs at jaccard >= 0.95") {
    val lsh = Dedup
      .minhashNearDups(docs, "doc_id", "text", threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val toks = docs.select($"doc_id".as("tid"), array_distinct(split($"text", " ")).as("toks"))
    val brute = toks.as("a")
      .join(toks.as("b"), col("a.tid") < col("b.tid"))
      .withColumn("j", Dedup.jaccard(col("a.toks"), col("b.toks")))
      .filter($"j" >= 0.95)
      .select(col("a.tid"), col("b.tid")).as[(Long, Long)].collect().toSet
    assert(lsh == brute)
    assert(brute.nonEmpty) // the corpus genuinely contains near-dups
  }

  test("decontamination (crossNearDups) == brute force at jaccard >= 0.8") {
    // The recall-heavy 48×4 banding must find EVERY pair — a missed pair
    // here is benchmark contamination shipping (the 32×6 tuning dropped 3
    // of ~50k pairs at sf0.1 against the DuckDB brute-force oracle).
    val bench = docs.filter($"doc_id" % 97 === 0)
    val lsh = Dedup
      .crossNearDups(docs, bench, "doc_id", "text", 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val toks = docs.select($"doc_id".as("tid"), array_distinct(split($"text", " ")).as("toks"))
    val btoks = toks.filter($"tid" % 97 === 0)
      .select($"tid".as("bid"), $"toks".as("btoks"))
    val brute = toks
      .join(btoks, col("tid") =!= col("bid"))
      .withColumn("j", Dedup.jaccard(col("toks"), col("btoks")))
      .filter($"j" >= 0.8)
      .select($"tid", $"bid").as[(Long, Long)].collect().toSet
    assert(lsh == brute)
    assert(brute.nonEmpty)
  }

  test("blocked jaccard sub-splits oversized blocks deterministically") {
    import graft.analytics.PipelineQueries
    // Uncapped = exact within every (lang, source) block.
    val exact = PipelineQueries.blockedJaccardPairs(docs, maxBlock = Int.MaxValue)
      .as[(Long, Long, Double)].collect().toSet
    // A tiny cap forces every block to shard: output must be the SUBSET of
    // exact pairs whose ids hash to the same shard - never new pairs, never
    // a changed score.
    val capped = PipelineQueries.blockedJaccardPairs(docs, maxBlock = 5)
      .as[(Long, Long, Double)].collect().toSet
    assert(capped.subsetOf(exact))
    assert(capped.size < exact.size) // sharding genuinely dropped cross-shard pairs
    // Within-cap blocks are untouched: every same-shard pair survives.
    val blockOf = docs.select($"doc_id", $"lang", $"source")
      .as[(Long, String, String)].collect()
      .map { case (id, l, s) => id -> ((l, s)) }.toMap
    val sizes = blockOf.values.groupBy(identity).view.mapValues(_.size).toMap
    val shards = blockOf.map { case (id, b) =>
      id -> (id % math.ceil(sizes(b) / 5.0).toLong)
    }
    exact.foreach { case (a, b, j) =>
      if (blockOf(a) == blockOf(b) && shards(a) == shards(b))
        assert(capped.contains((a, b, j)), s"same-shard pair ($a,$b) missing")
    }
  }

  test("clustering degrades gracefully when no set pairs survive the threshold") {
    // Threshold above 1.0: tier B is empty, so clusters are exactly the
    // identical-token-set groups (tier A) with >= 2 members — and the CC
    // loop must handle an empty edge list without a crash.
    val clusters = Dedup.nearDupClusters(docs, "doc_id", "text", threshold = 1.01)
      .as[(Long, Long)].collect().toSet
    val groups = docs
      .select(TextAnalysis.tokenSetKey($"text").as("k"), $"doc_id")
      .as[(String, Long)].collect()
      .groupBy(_._1).values.filter(_.length >= 2)
      .flatMap { g => val m = g.map(_._2).min; g.map(r => (r._2, m)) }
      .toSet
    assert(clusters == groups)
    assert(clusters.nonEmpty) // corpus genuinely has identical sets
  }

  test("exact dedup groups byte-identical content only") {
    val withDups = docs.select($"doc_id", $"text")
      .union(docs.filter($"doc_id" < 5).select($"doc_id" + 10000, $"text"))
    val res = Dedup.exactDedup(withDups, "doc_id", "text")
    assert(res.count() == docs.count()) // 5 injected copies collapse
    assert(res.filter($"n_copies" === 2).count() == 5)
    assert(res.filter($"n_copies" === 2).agg(max("keep_id")).as[Long].head() < 5)
  }

  test("token-set key is order/multiplicity-invariant") {
    val keys = Seq("a b c", "c b a", "a a b c c", "a b d")
      .toDF("text")
      .select(TextAnalysis.tokenSetKey($"text"))
      .as[String].collect()
    assert(keys(0) == keys(1) && keys(1) == keys(2))
    assert(keys(0) != keys(3))
  }

  /** Driver-side mirror of Dedup.simhashBandKeys (same constants). */
  private def bandKeysLocal(s: Long): Seq[Long] =
    Dedup.SimhashBandSubsets.map(_.foldLeft(0L) { (acc, b) =>
      (acc << Dedup.SimhashBlockBits) |
        ((s >>> (b * Dedup.SimhashBlockBits)) & ((1L << Dedup.SimhashBlockBits) - 1))
    })

  test("simhash close pairs: hamming correct, candidate set == brute-force banding") {
    val pairs = Dedup.simhashClosePairs(docs, "doc_id", "text", topK = 20)
    val sigs = docs
      .select($"doc_id", Dedup.simhash($"text").as("sig"))
      .as[(Long, Long)].collect().toMap
    pairs.as[(Long, Long, Int)].collect().foreach { case (a, b, h) =>
      assert(java.lang.Long.bitCount(sigs(a) ^ sigs(b)) == h)
    }
    // Expected candidate count from an O(n^2) driver-side brute force of
    // the same Manku band predicate.
    val sigSeq = sigs.toSeq
    val nCand = (for {
      (ia, sa) <- sigSeq; (ib, sb) <- sigSeq
      if ia < ib && bandKeysLocal(sa).zip(bandKeysLocal(sb)).exists(t => t._1 == t._2)
    } yield 1).size
    assert(pairs.count() == math.min(nCand, 20L))
    assert(pairs.count() > 0)
  }

  test("simhash banding: candidate recall is exact at hamming radius <= 3") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(300) {
      val s = rnd.nextLong() & ((1L << 60) - 1)
      var v = s
      (0 until rnd.nextInt(4)).foreach(_ => v ^= 1L << rnd.nextInt(60))
      (s, v) // hamming(s, v) <= 3 by construction
    }
    val checked = rows.toDF("sig_a", "sig_b")
      .select(
        Dedup.simhashBandKeys($"sig_a").as("ka"),
        Dedup.simhashBandKeys($"sig_b").as("kb"))
      .as[(Seq[Long], Seq[Long])].collect()
    rows.zip(checked).foreach { case ((a, b), (ka, kb)) =>
      assert(ka.zip(kb).exists(t => t._1 == t._2),
        s"banding missed a pair at hamming ${java.lang.Long.bitCount(a ^ b)}")
    }
  }

  test("pairsOfTiered maxGroupPairs cap: deterministic prefix per group, full groups under cap") {
    // g1: 6 identical-set members → 15 pairs; g2: 2 members → 1 pair.
    val members = ((1L to 6L).map(("g1", _)) ++ Seq(("g2", 10L), ("g2", 11L)))
      .toDF("set_key", "id")
    val setPairs = Seq.empty[(String, String, Double)].toDF("key_a", "key_b", "jaccard")
    val uncapped = Dedup.pairsOfTiered(members, setPairs)
      .as[(Long, Long, Double)].collect().toSet
    assert(uncapped.size == 16)
    // cap 7: g1 reports its first 7 pairs in (id_a, id_b) order, g2 in full.
    val capped = Dedup.pairsOfTiered(members, setPairs, maxGroupPairs = 7)
      .as[(Long, Long, Double)].collect().toSet
    val g1Prefix = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L), (2L, 3L), (2L, 4L))
    assert(capped == (g1Prefix.map { case (a, b) => (a, b, 1.0) } :+ ((10L, 11L, 1.0))).toSet)
    assert(capped.subsetOf(uncapped))
    // cap at/above the largest group's pair count == uncapped exactly.
    val wide = Dedup.pairsOfTiered(members, setPairs, maxGroupPairs = 15)
      .as[(Long, Long, Double)].collect().toSet
    assert(wide == uncapped)
  }

  test("distributed CC: chain-of-blobs over the driver gate converges in O(log diameter) rounds") {
    // 32 star-blobs (center + 4 leaves) chained by their centers — diameter
    // ~33, the shape harness near-dup data (dense blobs, tiny diameter)
    // never produces. driverMaxEdges=100 < 159 undirected edges forces the
    // distributed loop, protecting the 100 TB path.
    val edges = (0 until 32).flatMap { k =>
      val c = k * 100L
      (1 to 4).map(i => (c, c + i)) ++ (if (k > 0) Seq(((k - 1) * 100L, c)) else Nil)
    }
    val labels = Dedup.connectedComponents(
      edges.toDF("id_a", "id_b"), maxIter = 20, driverMaxEdges = 100)
    assert(labels.select("comp").distinct().as[Long].collect().toSeq == Seq(0L))
    assert(labels.count() == 32L * 5)
    val (iters, converged) = Dedup.lastLoopStats
    assert(converged, s"loop did not converge in $iters rounds")
    assert(iters <= 10, s"propagate+jump should need ~log2(33)+1 rounds, took $iters")
  }

  test("distributed CC: non-convergence warns loudly and is observable") {
    val chain = (0 until 200).map(i => (i.toLong, i + 1L)).toDF("id_a", "id_b")
    val errBuf = new java.io.ByteArrayOutputStream()
    val old = System.err
    System.setErr(new java.io.PrintStream(errBuf, true))
    try Dedup.connectedComponents(chain, maxIter = 1, driverMaxEdges = 0).count()
    finally System.setErr(old)
    val (iters, converged) = Dedup.lastLoopStats
    assert(iters == 1 && !converged)
    assert(errBuf.toString.contains("did NOT converge"), errBuf.toString.take(500))
  }

  test("embedding near-dups only reports pairs above threshold (no false positives)") {
    val res = Dedup
      .embeddingNearDups(Tables.embeddings(spark, TestSpark.SfDir), "vec_id", "embedding", 0.4)
    assert(res.filter($"cosine" < 0.4).count() == 0)
    assert(res.count() > 0)
  }

  test("dedupAssignments emits one linear row per dropped duplicate") {
    val withDups = docs.select($"doc_id", $"text")
      .union(docs.filter($"doc_id" < 5).select($"doc_id" + 10000, $"text"))
    val asg = Dedup.dedupAssignments(withDups, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(asg.size == 5)
    asg.foreach { case (dup, keep) => assert(dup == keep + 10000) }
  }

  test("connectedComponents matches driver-side union-find") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (22L, 20L))
      .toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("small-graph fast path and distributed loop produce identical labels") {
    // Chain (worst diameter), blob, singleton link, and a back-edge cycle —
    // the same frame through both paths (driverMaxEdges gate on/off).
    val rnd = new scala.util.Random(11)
    val chain = (0 until 40).map(i => (i.toLong, i + 1L))
    val blob = for (i <- 100 until 115; j <- (i + 1) until 115) yield (i.toLong, j.toLong)
    val extra = Seq((200L, 201L), (202L, 201L), (203L, 200L))
    val all = rnd.shuffle(chain ++ blob ++ extra).toDF("id_a", "id_b")
    val viaDriver = Dedup.connectedComponents(all)
      .as[(Long, Long)].collect().toMap
    val viaLoop = Dedup.connectedComponents(all, driverMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(viaDriver == viaLoop)
    assert(viaDriver(40L) == 0L && viaDriver(114L) == 100L && viaDriver(203L) == 200L)
  }

  test("nearDupClusters on real docs: clusters consistent with pair graph") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val clusters = Dedup.nearDupClusters(docs, "doc_id", "text", 0.95)
      .as[(Long, Long)].collect().toMap
    // union-find ground truth
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = parent.keys.map(k => k -> find(k)).toMap
    assert(clusters.keySet == truth.keySet)
    // same partition: components must have identical member sets
    def groups(m: Map[Long, Long]) = m.groupBy(_._2).values.map(_.keySet).toSet
    assert(groups(clusters) == groups(truth))
  }

  test("ngram LSH pairs find planted shingle near-dups") {
    // Two docs sharing a long 3-gram run + unrelated noise docs.
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    val noise = (0 until 20).map(i => s"n$i x$i y$i z$i w$i v$i u$i t$i s$i r$i")
    val docs = (Seq(a, b) ++ noise).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val pairs = Dedup
      .ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("incremental Bloom dedup: no false negatives, exact audit matches, fp rate bounded") {
    import graft.dedup.IncrementalDedup
    // The Bloom guarantee at the filter level: EVERY inserted key probes
    // true, and fresh keys probe true at ~fpp.
    val keys = (0 until 2000).map(i => s"snapshot-key-$i").toDF("k")
    val bloom = IncrementalDedup.snapshotBloom(keys, $"k", expectedItems = 2000, fpp = 0.01)
    val inserted = keys.select(IncrementalDedup.mightContain(bloom, $"k").as("f"))
      .as[Boolean].collect()
    assert(inserted.length == 2000 && inserted.forall(identity),
      "a snapshot key probed false — Bloom no-false-negative guarantee broke")
    val fresh = (0 until 2000).map(i => s"novel-key-$i").toDF("k")
      .select(IncrementalDedup.mightContain(bloom, $"k").as("f"))
      .as[Boolean].collect()
    val fpRate = fresh.count(identity).toDouble / fresh.length
    assert(fpRate <= 0.05, s"false-positive rate $fpRate far above the 0.01 design point")

    // End-to-end flags on the harness corpus: exact column matches a
    // driver-side reference, the claim column is all-true, and the split
    // is non-vacuous (the corpus's reordered-copy duplicates cross it).
    val docs = Tables.documents(spark, TestSpark.SfDir)
    val fp = graft.text.TextAnalysis.tokenSetKey($"text")
    val got = IncrementalDedup
      .flagIncoming(docs.filter($"doc_id" % 3 =!= 0), docs.filter($"doc_id" % 3 === 0),
        "doc_id", fp)
      .as[(Long, Boolean, Boolean)]
      .collect()
    val snapFps = docs.filter($"doc_id" % 3 =!= 0).select(fp.as("fp")).as[String].collect().toSet
    val incFps = docs.filter($"doc_id" % 3 === 0).select($"doc_id", fp.as("fp"))
      .as[(Long, String)].collect().toMap
    assert(got.length == incFps.size)
    got.foreach { case (id, dup, claim) =>
      assert(dup == snapFps.contains(incFps(id)), s"doc $id exact-dup flag")
      assert(claim, s"doc $id: no_false_negative violated")
    }
    assert(got.exists(_._2), "no cross-split duplicates — test corpus made the check vacuous")
  }

  test("ngram shingles: n=2 produces size-1 shingle count") {
    val r = Seq("a b c d").toDF("text")
      .select(Dedup.wordNgrams($"text", 2).as("g"))
      .select(size($"g")).as[Int].head()
    assert(r == 3)
    val single = Seq("solo").toDF("text")
      .select(Dedup.wordNgrams($"text", 2).as("g"))
      .select($"g").as[Seq[String]].head()
    assert(single == Seq("solo"))
  }
}
