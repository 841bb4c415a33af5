package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Filters, Parse}
import graft.sources.EventSources

/** Property-based tests (SURVEY.md §5.2): parsing is total, schema-on-read
  * drops unknowns, and the filter partition law holds for arbitrary JSON —
  * including malformed, unicode, extra/missing keys. (ScalaCheck Gen
  * sampled with fixed seeds; the scalatest bridge artifact isn't in the
  * offline cache, so sampling is driven manually.) */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val keyGen: Gen[String] = Gen.oneOf(
    "event_type", "direction", "event_detail", "Host", "zzz_unknown", "漢字キー")
  val valGen: Gen[String] = Gen.oneOf(
    "sword_event", "guild_event", "default", "", "héllo wörld", "plain", "こんにちは")
  val jsonGen: Gen[String] = Gen.oneOf(
    Gen.mapOf(Gen.zip(keyGen, valGen)).map { m =>
      m.map { case (k, v) => s""""$k": "$v"""" }.mkString("{", ", ", "}")
    },
    Gen.alphaNumStr,
    Gen.const(""),
    Gen.const("[1,2,3]"),
    Gen.const("{\"event_type\": 42}")) // wrong type for a declared field

  private def samples(n: Int): Seq[List[String]] =
    (0 until n).flatMap { i =>
      Gen.listOfN(20, jsonGen)(Gen.Parameters.default, Seed(42L + i))
    }

  test("parse is total and schema-stable for arbitrary payloads") {
    samples(10).foreach { payloads =>
      val rows = payloads.zipWithIndex.map { case (j, i) =>
        (j, new java.sql.Timestamp(1700000000000L + i))
      }
      val parsed = Parse.extractEvents(EventSources.memoryBatch(spark, rows))
      val out = parsed.collect() // must not throw
      assert(out.length == payloads.length)
      assert(parsed.columns.toSeq == Seq("raw_event", "timestamp", "event_time",
        "Accept", "Host", "User-Agent", "event_type", "direction", "event_detail"))
      val valid = parsed.filter(Filters.isValidEvent).count()
      val invalid = parsed.filter(!Filters.isValidEvent || Filters.isValidEvent.isNull).count()
      assert(valid + invalid == out.length.toLong)
    }
  }

  test("classifier is total: every event lands in exactly one route") {
    samples(10).foreach { payloads =>
      val rows = payloads.zipWithIndex.map { case (j, i) =>
        (j, new java.sql.Timestamp(1700000000000L + i))
      }
      val parsed = Parse.parseAndFlatten(
        Parse.projectRaw(EventSources.memoryBatch(spark, rows)),
        model.EventModel.gen1Schema)
      val (s, g, d) = Filters.demux(parsed)
      assert(s.count() + g.count() + d.count() == payloads.length.toLong)
    }
  }

  test("TopKAggregator: merge-order invariance and exact selection vs sort") {
    val agg = new graft.similarity.Ann.TopKAggregator(5)
    val scoreGen = Gen.chooseNum(-1.0, 1.0)
    val itemGen = Gen.zip(Gen.chooseNum(0L, 30L), scoreGen)
    (0 until 30).foreach { i =>
      val items = Gen.listOfN(40, itemGen)(Gen.Parameters.default, Seed(7L + i))
        .getOrElse(Nil).distinctBy(_._1)
      val expected = items.sortBy { case (id, s) => (-s, id) }.take(5)
      // fold in scrambled orders and as split-merged partials
      val shuffled = new scala.util.Random(i).shuffle(items)
      val direct = shuffled.foldLeft(agg.zero)(agg.reduce)
      assert(direct == expected, s"direct fold, seed $i")
      val (l, r) = shuffled.splitAt(shuffled.length / 2)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(merged == expected, s"split merge, seed $i")
      val mergedRev = agg.merge(
        r.foldLeft(agg.zero)(agg.reduce), l.foldLeft(agg.zero)(agg.reduce))
      assert(mergedRev == expected, s"reversed merge, seed $i")
    }
  }

  test("WordNgrams equals the naive sliding window for arbitrary token lists") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val tokGen = Gen.listOfN(
      25, Gen.oneOf(Gen.alphaLowerStr.map(_.take(4)), Gen.const(""), Gen.const("a b")))
    val cases = (0 until 20).flatMap { i =>
      tokGen(Gen.Parameters.default, Seed(31L + i)).map(_.take(3 + i))
    }
    Seq(1, 2, 5, 10).foreach { n =>
      val got = cases.zipWithIndex.toDF("toks", "i")
        .select($"i", graft.functions.NgramFunctions.word_ngrams($"toks", n).as("g"))
        .as[(Int, Seq[String])].collect().toMap
      cases.zipWithIndex.foreach { case (toks, i) =>
        val want =
          if (toks.length < n) Seq.empty
          else toks.sliding(n).map(_.mkString(" ")).toSeq
        assert(got(i) == want, s"n=$n case $i toks=$toks")
      }
    }
  }

  test("NearestCells agrees with per-centroid CosineSimilarity ranking") {
    import org.apache.spark.sql.functions._
    import graft.functions.{IvfFunctions, VectorFunctions}
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(11L)
    val centroids = Array.fill(6)(Array.fill(8)(rnd.nextGaussian()))
    val vecs = (0 until 50).map(i => (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("id", "vec")
    val viaExpr = df
      .select($"id", explode(IvfFunctions.nearest_cells($"vec", centroids, 3)).as("cell"))
      .as[(Long, Int)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    // reference ranking: score each centroid with the CosineSimilarity
    // expression itself, sort (sim desc, cell asc)
    val scored = centroids.indices.map { c =>
      df.select($"id",
        VectorFunctions.cosine_sim($"vec", typedLit(centroids(c))).as("sim"))
        .as[(Long, Double)].collect().toMap.map { case (id, s) => (id, (c, s)) }
    }
    vecs.foreach { case (id, _) =>
      val want = scored.map(_(id)).sortBy { case (c, s) => (-s, c) }.take(3).map(_._1)
      assert(viaExpr(id) == want, s"id $id")
    }
  }

  private def randomCorpus(seed: Long, nDocs: Int, minTok: Int, maxTok: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until nDocs).map { i =>
      val n = minTok + rnd.nextInt(maxTok - minTok + 1)
      (i.toLong, s"s${i % 3}", (1 to n).map(_ => s"w${rnd.nextInt(40)}").mkString(" "))
    }
  }

  test("q277 partial-merge soundness: partition partials recompose the direct q270 card for arbitrary corpora") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    (0 until 3).foreach { s =>
      val corpus = randomCorpus(100L + s, 40, 2, 30)
      val docs = corpus.toDF("doc_id", "source", "text")
      // arbitrary disjoint 3-way partitioning by doc_id
      val partials = (0 until 3).map { p =>
        graft.analytics.PipelineQueries
          .docSegments(docs.filter(pmod(col("doc_id"), lit(3)) === p))
          .groupBy(col("source"), col("segh"))
          .agg(count(lit(1)).as("n_inst"), countDistinct(col("doc_id")).as("n_docs"))
      }.reduce(_ unionByName _)
      val viaStore = graft.analytics.PipelineQueries.boilerCardFromPartials(partials)
        .collect().map(_.toSeq).toSeq
      val direct = graft.analytics.PipelineQueries.segmentBoilerplateOf(docs)
        .collect().map(_.toSeq).toSeq
      assert(viaStore == direct, s"seed $s")
    }
  }

  test("q271 winnowing: a planted duplicate always surfaces at full overlap") {
    import spark.implicits._
    (0 until 3).foreach { s =>
      val base = randomCorpus(200L + s, 20, 12, 40)
      // duplicate doc 0 under a fresh id; winnowing must pair them at
      // overlap_bp = 10000 (identical fingerprint sets)
      val corpus = base :+ ((900L, "s0", base.head._3))
      val got = graft.analytics.PipelineQueries
        .winnowingPairsOf(corpus.toDF("doc_id", "source", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5))).toSeq
      val hit = got.find(p => p._1 == 0L && p._2 == 900L)
      assert(hit.exists(_._3 == 10000L),
        s"seed $s: duplicate pair missing or partial: $got")
    }
  }

  test("q278 reassembly: every splitter victim reconstructs with seam >= 5 and merged <= original") {
    import spark.implicits._
    (0 until 3).foreach { s =>
      val corpus = randomCorpus(300L + s, 30, 20, 45)
      val docs = corpus.toDF("doc_id", "source", "text")
      val victims = corpus.filter(d => d._1 % 11 == 0 && d._3.split(" ").length >= 20)
      val got = graft.analytics.PipelineQueries.chunkReassemblyOf(docs)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      victims.foreach { case (id, _, text) =>
        val n = text.split(" ").length.toLong
        val pair = got.find(p => p._1 == id * 2 + 2000000L && p._2 == id * 2 + 2000001L)
        assert(pair.isDefined, s"seed $s: victim $id not reassembled")
        assert(pair.get._3 >= 5L && pair.get._4 <= n,
          s"seed $s: victim $id seam/merge out of bounds: ${pair.get}")
      }
    }
  }

  test("q283/q285/q290/q291/q292: card invariants hold for arbitrary corpora") {
    import spark.implicits._
    val P = graft.analytics.PipelineQueries
    (0 until 2).foreach { s =>
      val n = 36
      val docs = randomCorpus(700L + s, n, 3, 40).toDF("doc_id", "source", "text")
      // q283: the quota is exact; within a source the selected members are
      // its lowest fused ranks, so their mean never exceeds the overall mean.
      val borda = P.bordaFusionOf(docs).collect()
      assert(borda.map(_.getLong(2)).sum == n / 4, s"seed $s: quota drift")
      borda.filter(_.getLong(2) > 0).foreach { r =>
        assert(r.getLong(5) <= r.getLong(4), s"seed $s: selection raised the mean rank")
      }
      // q284: epoch 0 never displaces from itself; shard counts agree.
      val ep = P.epochScheduleOf(docs).collect()
      assert(ep.head.getLong(3) == 0L, s"seed $s: epoch 0 displaced")
      assert(ep.map(_.getLong(1)).distinct.length == 1, s"seed $s: shard counts differ")
      // q285: normalization only collapses — gains and sheds are non-negative.
      P.normalizationAuditOf(docs).collect().foreach { r =>
        assert(r.getLong(4) >= 0L && r.getLong(5) >= 0L, s"seed $s: negative shed/gain")
      }
      // q290: the cluster rule never leaks, by construction.
      val split = P.clusterSafeSplitOf(docs,
        graft.dedup.Dedup.nearDupClusters(docs, "doc_id", "text")).collect()
      assert(split.map(_.getLong(1)).sum == n.toLong, s"seed $s: split loses docs")
      split.foreach(r => assert(r.getLong(5) == 0L, s"seed $s: cluster split leaked"))
      // q291: every doc is scheduled; deviations are shares (≤ 10000 bp).
      val il = P.interleaveScheduleOf(docs).collect()
      assert(il.map(_.getLong(1)).sum == n.toLong, s"seed $s: schedule loses docs")
      il.foreach(r => assert(r.getLong(3) <= 10000L, s"seed $s: deviation out of range"))
      // q292: changes cascade upward; the tree never probes more than the
      // flat scan plus the internal nodes.
      val mk = P.merkleDiffOf(docs).collect()
        .map(r => r.getString(0) -> r).toMap
      val (lc, gc, rc) = (mk("leaf").getLong(2), mk("group").getLong(2),
        mk("root").getLong(2))
      assert(lc >= gc && gc >= rc && rc == 1L, s"seed $s: change cascade broken")
      assert(mk("root").getLong(3) <= 1L + mk("group").getLong(1) + mk("root").getLong(4),
        s"seed $s: tree probes exceed flat + internals")
    }
  }

  test("q286/q287/q288: bound invariants on arbitrary inputs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    val P = graft.analytics.PipelineQueries
    val rnd = new scala.util.Random(42L)
    // q286: loadings are L∞-normalized; the variance share is a share.
    val emb = (0 until 30).map { i =>
      (i.toLong, Seq.fill(graft.similarity.Pq.Dim)(rnd.nextFloat() - 0.5f))
    }.toDF("vec_id", "embedding")
    val pca = P.pcaPowerOf(emb).collect()
    assert(pca.map(r => math.abs(r.getLong(1))).max == 10000L, "L-inf norm drift")
    pca.foreach(r => assert(r.getLong(2) >= 0L && r.getLong(2) <= 10000L))
    // q287: a decayed score can never exceed 256× the raw count, and the
    // card is ordered by it.
    val events = (0 until 300).map { _ =>
      (rnd.nextInt(20).toLong, (90L + rnd.nextInt(12)) * 3600L)
    }.toDF("user_id", "secs").withColumn("ts", timestamp_seconds(col("secs")))
    val hit = P.decayedHittersOf(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    hit.foreach { case (_, d, c) => assert(d <= 256L * c, "decay exceeds raw mass") }
    assert(hit.sortBy { case (u, d, _) => (-d, u) }.toSeq == hit.toSeq, "order drift")
    // q288: the makespan is never under the lower bound; loads cover the corpus.
    val docs = randomCorpus(900L, 24, 3, 40).toDF("doc_id", "source", "text")
    val lpt = P.lptMakespanOf(docs).collect()
    assert(lpt.forall(_.getLong(4) >= 10000L), "makespan under the lower bound")
    assert(lpt.map(_.getLong(1)).sum == 3L, "source count drift")
  }

  test("q299-q306/q308: card invariants hold for arbitrary corpora") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, when}
    val P = graft.analytics.PipelineQueries
    (0 until 2).foreach { s =>
      val n = 40
      val base = randomCorpus(800L + s, n, 3, 60).toDF("doc_id", "source", "text")
      val docs = base.withColumn("lang",
        when(col("doc_id") % 3 === 0, "en")
          .when(col("doc_id") % 3 === 1, "fr").otherwise("de"))
      // q299: tokens conserve (+1 EOS per doc); a crossing doc has ≥ 2
      // spans, so spans_sum ≥ n_docs + n_crossing; shares are shares.
      val cc = P.concatChunkingOf(docs).collect()
      assert(cc.map(_.getLong(1)).sum == n.toLong, s"seed $s: q299 doc loss")
      cc.foreach { r =>
        assert(r.getLong(5) >= r.getLong(1) + r.getLong(3), s"seed $s: q299 span math")
        assert(r.getLong(4) <= 10000L, s"seed $s: q299 share range")
      }
      // q300: down-weighting only shrinks mass; a doc in no cluster keeps
      // full mass, so eff ≤ raw·10⁴ with equality iff nothing clustered.
      P.softDedupWeightsOf(docs).collect().foreach { r =>
        assert(r.getLong(4) <= 10000L * r.getLong(3), s"seed $s: q300 mass grew")
        assert((r.getLong(2) == 0L) == (r.getLong(4) == 10000L * r.getLong(3)),
          s"seed $s: q300 equality iff unclustered")
        assert(r.getLong(5) <= 10000L, s"seed $s: q300 share range")
      }
      // q301: every kept pair clears the gap gate; pairing consumes at
      // most the stratum, two docs per pair.
      P.preferencePairsOfScored(
        P.classifierDocScores(docs).select(col("doc_id"), col("source"), col("margin")))
        .collect().foreach { r =>
          assert(2 * r.getLong(2) <= r.getLong(1), s"seed $s: q301 over-paired")
          if (r.getLong(2) > 0)
            assert(r.getLong(3) >= r.getLong(2) * P.PrefMinGap, s"seed $s: q301 gate leak")
          assert(r.getLong(5) <= 10000L, s"seed $s: q301 share range")
        }
      // q302: the mask never exceeds the text; masked docs ≤ docs.
      P.lossMaskCardOf(docs).collect().foreach { r =>
        assert(r.getLong(4) <= r.getLong(3), s"seed $s: q302 mask exceeds tokens")
        assert(r.getLong(2) <= r.getLong(1) && r.getLong(5) <= 10000L,
          s"seed $s: q302 ranges")
      }
      // q303: Gini is a share in [0, 10000).
      P.sourceGiniOf(docs).collect().foreach { r =>
        assert(r.getLong(3) >= 0L && r.getLong(3) < 10000L, s"seed $s: q303 range")
      }
      // q304: surprisal is non-negative (c1 + B > c2 + 1 always) and the
      // keep share is a share.
      P.perplexityFilterOf(docs).collect().foreach { r =>
        assert(r.getLong(2) >= 0L && r.getLong(4) <= 10000L, s"seed $s: q304 ranges")
      }
      // q305: ranks are contiguous from 1 per lang; the count gate held.
      val pmi = P.tokenPmiOf(docs).collect()
        .map(r => (r.getString(0), r.getLong(3), r.getLong(5)))
      pmi.groupBy(_._1).foreach { case (lang, rows) =>
        assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
          s"seed $s: q305 $lang ranks not contiguous")
      }
      pmi.foreach { case (_, c12, _) =>
        assert(c12 >= P.PmiMinCount, s"seed $s: q305 count gate leak") }
      // q306: entropy is non-negative and the floor arithmetic keeps it
      // under L(n_langs) + the mantissa slack; Simpson/dup are shares.
      P.sourceDatasheetOf(docs).collect().foreach { r =>
        val hMax = (math.log(r.getLong(4).toDouble) / math.log(2.0) * 256).toLong + 46
        assert(r.getLong(5) >= 0L && r.getLong(5) <= hMax, s"seed $s: q306 entropy range")
        assert(r.getLong(3) <= 10000L && r.getLong(6) <= 10000L, s"seed $s: q306 shares")
      }
      // q308: the hit share is a share; both surprisal means non-negative.
      P.backoffLmOf(docs).collect().foreach { r =>
        assert(r.getLong(2) <= 10000L && r.getLong(3) >= 0L && r.getLong(4) >= 0L,
          s"seed $s: q308 ranges")
      }
    }
  }

  test("q314 hyperball: ball estimates never shrink across rounds on arbitrary graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11L)
    val edges = (0 until 60)
      .map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter { case (u, v) => u != v }
      .map { case (u, v) => (math.min(u, v), math.max(u, v)) }
      .distinct.toDF("u", "v")
    val rows = graft.analytics.PipelineQueries.hyperBallOf(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // Registers only grow, so the harmonic estimate is monotone in t;
    // node counts are constant; max dominates avg.
    assert(rows.map(_._2).distinct.length == 1, s"node count drift: ${rows.toSeq}")
    rows.sliding(2).foreach {
      case Array((_, _, a1, m1), (_, _, a2, m2)) =>
        assert(a2 >= a1 && m2 >= m1, s"estimate shrank: ${rows.toSeq}")
      case _ =>
    }
    rows.foreach { case (t, _, avg, mx) => assert(mx >= avg, s"t=$t: max < avg") }
  }

  test("q309 markov: floor iteration never grows mass; sinks drop from the core") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    val rnd = new scala.util.Random(7L)
    val ev = (0 until 400).map { i =>
      (i.toLong, rnd.nextInt(25).toLong, s"t${rnd.nextInt(6)}", 1000L + i)
    }.toDF("event_id", "user_id", "event_type", "secs")
      .withColumn("ts", timestamp_seconds(col("secs")))
    val rows = graft.analytics.PipelineQueries.markovStationaryOf(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._3).sum <= graft.analytics.PipelineQueries.MkScale,
      "floor iteration grew probability mass")
    rows.foreach { case (t, out, pi) =>
      assert(out > 0L, s"$t: sink-only type survived the core restriction")
      assert(pi >= 0L, s"$t: negative mass")
    }
  }

  test("q279 span corruption: card invariants hold for arbitrary corpora") {
    import spark.implicits._
    (0 until 3).foreach { s =>
      val docs = randomCorpus(400L + s, 40, 5, 120).toDF("doc_id", "source", "text")
      val rows = graft.analytics.PipelineQueries.spanCorruptionOf(docs)
        .collect()
        .map(r => (r.getLong(2), r.getLong(4), r.getLong(6), r.getLong(7), r.getLong(8)))
      rows.foreach { case (nTok, nMasked, nSpans, avgLen, sentinel) =>
        assert(nMasked <= nTok, s"seed $s: masked mass exceeds tokens")
        assert(nSpans >= 1L && nSpans <= nMasked, s"seed $s: span count out of range")
        assert(avgLen >= 100L && avgLen <= 300L,
          s"seed $s: mean span length outside the 1..3-token schedule: $avgLen")
        assert(sentinel <= nSpans, s"seed $s: sentinel budget exceeds span total")
      }
    }
  }
}
