package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup
import graft.multimodal.{Mp4, Multimodal}
import graft.similarity.Ann
import graft.text.TextAnalysis
import graft.functions.Md5Hash.{duckH31, duckH60}

/** DuckDB oracle SQL, head map + shared oracle builders (signature
  * family VALUES, IVFPQ/admission/fuzzy-ingest CTE prefixes) — a PURE MOVE out of the former 17k-line PipelineQueries.scala
  * (round-10 verdict #4): same members, same order, no logic change.
  * Self-typed to the object so every cross-slab reference resolves
  * unqualified and initialization order is exactly the old file order. */
trait PipelineOraclesHead { this: PipelineQueries.type =>

  private[analytics] val oracleHead: Map[String, String] = Map(
    "q25_dedup_exact" ->
      """SELECT md5(text) AS content_key, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY content_key""".stripMargin,
    "q26_dedup_tokenset" ->
      """SELECT md5(array_to_string(list_sort(list_distinct(str_split(text, ' '))), ' ')) AS set_key,
        |  MIN(doc_id) AS keep_id, COUNT(*) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY set_key""".stripMargin,
    "q27_minhash_neardup" ->
      """WITH t AS (SELECT doc_id, list_distinct(str_split(text, ' ')) AS toks FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / len(list_distinct(list_concat(a.toks, b.toks))) AS jaccard
        |FROM t a JOIN t b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.95
        |ORDER BY id_a, id_b""".stripMargin,
    "q28_ngram_blocked_jaccard" ->
      """WITH s AS (SELECT doc_id, lang, source, str_split(text, ' ') AS t FROM documents),
        |g AS (SELECT doc_id, lang, source,
        |  CASE WHEN len(t) >= 2
        |       THEN list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))
        |       ELSE [array_to_string(t, ' ')] END AS grams
        |  FROM s)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) / len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard
        |FROM g a JOIN g b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        |ORDER BY jaccard DESC, id_a, id_b LIMIT 100""".stripMargin,
    "q35_text_tokens" ->
      s"""SELECT doc_id, len(str_split(text, ' ')) AS n_ws_tokens,
         |  len(regexp_extract_all(text, '${TextAnalysis.BpeTokenPattern}')) AS n_bpe_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q36_text_quality" ->
      """SELECT doc_id, len(str_split(text, ' ')) AS n_tokens,
        |  CAST(length(text) - (len(str_split(text, ' ')) - 1) AS DOUBLE) / len(str_split(text, ' ')) AS avg_token_len,
        |  CAST(len(list_filter(str_split(text, ' '), x -> x IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'))) AS DOUBLE)
        |    / len(str_split(text, ' ')) AS stopword_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q29_minhash_signatures" ->
      s"""WITH t AS (SELECT doc_id, list_distinct(str_split(text, ' ')) AS toks FROM documents),
         |h AS (SELECT doc_id, list_transform(toks, tok -> ${duckH31("tok")}) AS hs FROM t)
         |SELECT h.doc_id, p.sig_idx,
         |  list_min(list_transform(h.hs, x -> (p.pa * x + p.pb) % 2147483647)) AS minhash
         |FROM h CROSS JOIN (VALUES $minhashParamValues) AS p(sig_idx, pa, pb)
         |ORDER BY doc_id, sig_idx""".stripMargin,
    "q30_simhash" ->
      s"""WITH $duckSimhash
         |SELECT doc_id, sig AS simhash FROM s ORDER BY doc_id""".stripMargin,
    "q31_simhash_pairs" ->
      s"""WITH $duckSimhash
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
         |FROM s a JOIN s b ON a.doc_id < b.doc_id
         |WHERE $duckSimhashBandCond
         |ORDER BY hamming, id_a, id_b LIMIT 100""".stripMargin,
    "q37_quality_score" ->
      """WITH m AS (SELECT doc_id, len(str_split(text, ' ')) AS n_tokens,
        |  CAST(length(text) - (len(str_split(text, ' ')) - 1) AS DOUBLE) / len(str_split(text, ' ')) AS avg_token_len,
        |  CAST(len(list_filter(str_split(text, ' '), x -> x IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'))) AS DOUBLE)
        |    / len(str_split(text, ' ')) AS stopword_ratio
        |FROM documents)
        |SELECT doc_id, LEAST(1.0, (CAST(n_tokens AS DOUBLE)/100.0)*0.4 + stopword_ratio*3.0*0.3
        |  + CASE WHEN avg_token_len BETWEEN 3.0 AND 8.0 THEN 0.3 ELSE 0.0 END) AS quality_score
        |FROM m ORDER BY doc_id""".stripMargin,
    "q38_langid" ->
      s"""WITH t AS (SELECT lang, list_distinct(str_split(lower(text), ' ')) AS toks FROM documents),
         |s AS (SELECT lang, $duckLangIdBest AS best FROM t)
         |SELECT lang, $duckLangIdDecode AS predicted, COUNT(*) AS n
         |FROM s GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin,
    "q39_fingerprint_md5" ->
      "SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id",
    "q40_fingerprint_rolling" ->
      s"""SELECT doc_id,
         |  list_reduce(list_prepend(CAST(7 AS BIGINT), list_transform(str_split(text, ' '), tok -> ${duckH31("tok")})),
         |    (acc, h) -> (acc*31 + h) % 2147483647) AS rolling_fp
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q56_neardup_clusters" ->
      """WITH RECURSIVE t AS (SELECT doc_id, list_distinct(str_split(text, ' ')) AS toks FROM documents),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |      FROM t a JOIN t b ON a.doc_id < b.doc_id
        |      WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.95),
        |e AS (SELECT id_a AS src, id_b AS dst FROM p UNION SELECT id_b, id_a FROM p),
        |reach(id, r) AS (
        |  SELECT src, dst FROM e
        |  UNION
        |  SELECT reach.id, e.dst FROM reach JOIN e ON reach.r = e.src)
        |SELECT id, LEAST(id, MIN(r)) AS comp FROM reach GROUP BY id ORDER BY id""".stripMargin,
    "q57_curation_report" ->
      s"""WITH keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         |d AS (SELECT doc_id, lang, text FROM documents WHERE doc_id IN (SELECT doc_id FROM keep)),
         |m AS (SELECT doc_id, lang,
         |  len(str_split(text, ' ')) AS n_tokens,
         |  CAST(length(text) - (len(str_split(text, ' ')) - 1) AS DOUBLE) / len(str_split(text, ' ')) AS avg_token_len,
         |  CAST(len(list_filter(str_split(text, ' '), x -> x IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'))) AS DOUBLE)
         |    / len(str_split(text, ' ')) AS stopword_ratio,
         |  list_distinct(str_split(lower(text), ' ')) AS toks
         |FROM d),
         |s AS (SELECT doc_id, lang, n_tokens,
         |  LEAST(1.0, (CAST(n_tokens AS DOUBLE)/100.0)*0.4 + stopword_ratio*3.0*0.3
         |    + CASE WHEN avg_token_len BETWEEN 3.0 AND 8.0 THEN 0.3 ELSE 0.0 END) AS quality_score,
         |  $duckLangIdBest AS best FROM m)
         |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |  CAST(SUM(CASE WHEN ($duckLangIdDecode) = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_agree
         |FROM s WHERE quality_score >= 0.5
         |GROUP BY lang ORDER BY lang""".stripMargin,
    "q59_token_budget_sample" ->
      """WITH t AS (SELECT lang, doc_id, len(str_split(text, ' ')) AS n_tokens, md5(text) AS rand_key FROM documents),
        |c AS (SELECT lang, n_tokens,
        |  SUM(n_tokens) OVER (PARTITION BY lang ORDER BY rand_key, doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |FROM t)
        |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sampled_tokens
        |FROM c WHERE cum - n_tokens < 5000
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q60_dataset_split" ->
      s"""SELECT lang,
         |  CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split,
         |  COUNT(*) AS n_docs
         |FROM (SELECT lang, ${duckH31("text")} % 100 AS b FROM documents)
         |GROUP BY lang, split ORDER BY lang, split""".stripMargin,
    "q62_decontamination" ->
      """WITH d AS (SELECT doc_id, list_distinct(str_split(text, ' ')) AS toks FROM documents),
        |b AS (SELECT * FROM d WHERE doc_id % 97 = 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |    / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) AS jaccard
        |FROM d a JOIN b ON a.doc_id != b.doc_id
        |WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |    / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,
    "q61_repetition" ->
      """WITH t AS (SELECT doc_id, str_split(text, ' ') AS s FROM documents),
        |b AS (SELECT doc_id, s,
        |  CASE WHEN len(s) >= 2 THEN list_transform(range(1, len(s)), i -> s[i] || ' ' || s[i+1])
        |       ELSE [text] END AS bg
        |FROM (SELECT doc_id, s, text FROM t JOIN documents USING (doc_id))),
        |u AS (SELECT doc_id, unnest(s) AS tok FROM t),
        |m AS (SELECT doc_id, MAX(c) AS max_cnt FROM
        |  (SELECT doc_id, tok, COUNT(*) AS c FROM u GROUP BY doc_id, tok) GROUP BY doc_id)
        |SELECT b.doc_id, len(s) AS n_tokens,
        |  CAST(len(s) - len(list_distinct(s)) AS DOUBLE) / len(s) AS dup_token_frac,
        |  CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE) / len(bg) AS dup_bigram_frac,
        |  CAST(m.max_cnt AS DOUBLE) / len(s) AS top_token_frac
        |FROM b JOIN m ON b.doc_id = m.doc_id
        |ORDER BY b.doc_id""".stripMargin,
    "q51_percentiles" ->
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.5) AS p50, quantile_cont(l_quantity, 0.75) AS p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q69_approx_quantiles" ->
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.5) AS p50, quantile_cont(l_quantity, 0.75) AS p75,
        |  TRUE AS within_bound
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q55_dedup_assignments" ->
      """WITH k AS (
        |  SELECT doc_id, md5(array_to_string(list_sort(list_distinct(str_split(text, ' '))), ' ')) AS set_key
        |  FROM documents),
        |m AS (SELECT set_key, MIN(doc_id) AS keep_id FROM k GROUP BY set_key)
        |SELECT k.doc_id AS dup_id, m.keep_id
        |FROM k JOIN m USING (set_key) WHERE k.doc_id <> m.keep_id
        |ORDER BY dup_id""".stripMargin,
    "q42_approx_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_exact, TRUE AS within_bound
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // q79's TRUE is the bounded-claim pattern: a hash mismatch on this row
    // means the CMS bound FIRED (the Spark side logs the offending token to
    // stderr), not that the engines computed different counts.
    "q79_heavy_hitters" ->
      """SELECT token, n_exact, TRUE AS within_bound FROM (
        |  SELECT token, COUNT(*) AS n_exact
        |  FROM (SELECT unnest(str_split(text, ' ')) AS token FROM documents)
        |  GROUP BY token ORDER BY n_exact DESC, token LIMIT 20)
        |ORDER BY n_exact DESC, token""".stripMargin,
    "q67_stratified_sample" -> {
      val rateCase = "CASE " + StratifiedRatesBp
        .map { case (l, bp) => s"WHEN lang = '$l' THEN $bp" }
        .mkString(" ") + " ELSE 10000 END"
      s"""WITH t AS (SELECT lang, len(str_split(text, ' ')) AS n_tok,
         |  ${duckH31("text")} % 10000 AS b FROM documents)
         |SELECT lang, COUNT(*) AS n_total,
         |  CAST(SUM(CASE WHEN b < $rateCase THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(SUM(CASE WHEN b < $rateCase THEN n_tok ELSE 0 END) AS BIGINT) AS kept_tokens
         |FROM t GROUP BY lang ORDER BY lang""".stripMargin
    },
    "q64_repeated_ngrams" ->
      """WITH t AS (SELECT doc_id, str_split(text, ' ') AS s, text FROM documents),
        |g AS (SELECT doc_id,
        |  CASE WHEN len(s) >= 10 THEN list_transform(range(1, len(s) - 8), i -> array_to_string(s[i:i+9], ' '))
        |       ELSE [text] END AS grams
        |  FROM t),
        |u AS (SELECT doc_id, unnest(grams) AS gram FROM g)
        |SELECT gram, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occurrences
        |FROM u GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
        |ORDER BY n_docs DESC, gram LIMIT 100""".stripMargin,
    "q65_pii_redaction" ->
      s"""SELECT doc_id,
         |  len(regexp_extract_all(text, '${TextAnalysis.EmailPattern}')) AS n_emails,
         |  len(regexp_extract_all(regexp_replace(text, '${TextAnalysis.EmailPattern}', '<EMAIL>', 'g'), '${TextAnalysis.PhonePattern}')) AS n_phones,
         |  md5(regexp_replace(regexp_replace(text, '${TextAnalysis.EmailPattern}', '<EMAIL>', 'g'), '${TextAnalysis.PhonePattern}', '<PHONE>', 'g')) AS redacted_fp
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q72_token_packing" ->
      """WITH t AS (SELECT lang, doc_id, len(str_split(text, ' ')) AS n, md5(text) AS rk FROM documents),
        |c AS (SELECT lang, n,
        |  SUM(n) OVER (PARTITION BY lang ORDER BY rk, doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |FROM t)
        |SELECT lang, CAST((cum - n) // 2048 AS BIGINT) AS window_id,
        |  COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS window_tokens
        |FROM c GROUP BY lang, window_id ORDER BY lang, window_id""".stripMargin,
    "q73_ngram_contamination" ->
      """WITH t AS (SELECT doc_id, str_split(text, ' ') AS s, text FROM documents),
        |g AS (SELECT doc_id,
        |  CASE WHEN len(s) >= 4 THEN list_transform(range(1, len(s) - 2), i -> array_to_string(s[i:i+3], ' '))
        |       ELSE [text] END AS grams
        |  FROM t),
        |u AS (SELECT doc_id, unnest(grams) AS gram FROM g),
        |b AS (SELECT DISTINCT doc_id AS bench_id, gram FROM u WHERE doc_id % 97 = 0)
        |SELECT u.doc_id, COUNT(DISTINCT u.gram) AS n_shared_grams
        |FROM u JOIN b ON u.gram = b.gram AND u.doc_id <> b.bench_id
        |GROUP BY u.doc_id ORDER BY u.doc_id""".stripMargin,
    "q74_token_chunks" -> {
      val (cs, st) = (ChunkSize, ChunkSize - ChunkOverlap)
      val sliceExpr = s"s[CAST(ci*$st + 1 AS INTEGER):CAST(LEAST(ci*$st + $cs, n) AS INTEGER)]"
      s"""WITH t AS (SELECT doc_id, str_split(text, ' ') AS s FROM documents),
         |c AS (SELECT doc_id, s, len(s) AS n,
         |  CASE WHEN len(s) <= $cs THEN 1 ELSE (len(s) - $cs + ${st - 1}) // $st + 1 END AS nc FROM t),
         |f AS (SELECT doc_id, s, n, unnest(range(0, nc)) AS ci FROM c)
         |SELECT doc_id, CAST(ci AS INTEGER) AS chunk_idx,
         |  CAST(len($sliceExpr) AS BIGINT) AS n_chunk_tokens,
         |  md5(array_to_string($sliceExpr, ' ')) AS chunk_fp
         |FROM f ORDER BY doc_id, chunk_idx""".stripMargin
    },
    "q75_bucketed_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q76_pq_codes" -> {
      // Same constants as the Spark side (graft.similarity.Pq), same seeded
      // codebooks (first-Ksub-id subvectors rebuilt in SQL), same left-fold
      // (x−y)·(x−y) distance — dists and argmins agree bit-for-bit.
      import graft.similarity.Pq.{Ksub, M, SubDim}
      val x = s"CAST(e.embedding[sub.subspace * $SubDim + j] AS DOUBLE)"
      val c = s"CAST(sub.sv[sub.subspace * $SubDim + j] AS DOUBLE)"
      val fold =
        s"list_reduce(list_transform(range(1, ${SubDim + 1}), j -> (($x) - ($c)) * (($x) - ($c))), (acc, v) -> acc + v)"
      s"""WITH seeds AS (
         |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS code, embedding AS sv
         |  FROM (SELECT vec_id, embedding FROM embeddings
         |        WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT $Ksub)),
         |sub AS (SELECT CAST(g.s AS INTEGER) AS subspace, seeds.code, seeds.sv
         |  FROM seeds CROSS JOIN (SELECT UNNEST(range(0, $M)) AS s) g),
         |d AS (SELECT e.vec_id, sub.subspace, sub.code, $fold AS dist
         |  FROM embeddings e CROSS JOIN sub WHERE e.embedding IS NOT NULL),
         |a AS (SELECT vec_id, subspace, code, dist,
         |  ROW_NUMBER() OVER (PARTITION BY vec_id, subspace ORDER BY dist, code) AS rn FROM d)
         |SELECT vec_id, subspace, code, dist
         |FROM a WHERE rn = 1 ORDER BY vec_id, subspace""".stripMargin
    },
    "q80_ann_ivfpq" -> {
      // q49's seeded-cell CTEs + q76's seeded-code CTEs; ADC = per-subspace
      // (x−y)² fold (j order), partials summed in SUBSPACE order via
      // list_reduce(list(p ORDER BY subspace)) — both folds match the
      // PqAdcDist expression's loops exactly, so distances and ranks are
      // bit-identical.
      import graft.similarity.Pq.{Ksub, M, SubDim}
      val x = s"CAST(e.embedding[psub.subspace * $SubDim + j] AS DOUBLE)"
      val c = s"CAST(psub.sv[psub.subspace * $SubDim + j] AS DOUBLE)"
      val codeFold =
        s"list_reduce(list_transform(range(1, ${SubDim + 1}), j -> (($x) - ($c)) * (($x) - ($c))), (acc, v) -> acc + v)"
      val qx = s"CAST(qe.embedding[pc.subspace * $SubDim + j] AS DOUBLE)"
      val qc = s"CAST(ps.sv[pc.subspace * $SubDim + j] AS DOUBLE)"
      val adcFold =
        s"list_reduce(list_transform(range(1, ${SubDim + 1}), j -> (($qx) - ($qc)) * (($qx) - ($qc))), (acc, v) -> acc + v)"
      s"""WITH cen AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell, embedding AS cvec
         |  FROM (SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT 16)),
         |sims AS (SELECT e.vec_id, cen.cell,
         |  ${VectorOracles.cosine("e.embedding", "cen.cvec")} AS sim
         |  FROM embeddings e CROSS JOIN cen WHERE e.embedding IS NOT NULL),
         |assigned AS (SELECT vec_id, cell FROM (
         |  SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC NULLS LAST, cell) AS rn
         |  FROM sims) WHERE rn = 1),
         |routed AS (SELECT vec_id AS query_id, cell FROM (
         |  SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC NULLS LAST, cell) AS rn
         |  FROM sims WHERE vec_id % 50 = 0) WHERE rn <= 4),
         |ps AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS code, embedding AS sv
         |  FROM (SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT $Ksub)),
         |psub AS (SELECT CAST(g.s AS INTEGER) AS subspace, ps.code, ps.sv
         |  FROM ps CROSS JOIN (SELECT UNNEST(range(0, $M)) AS s) g),
         |pdist AS (SELECT e.vec_id, psub.subspace, psub.code, $codeFold AS dist
         |  FROM embeddings e CROSS JOIN psub WHERE e.embedding IS NOT NULL),
         |pc AS (SELECT vec_id, subspace, code FROM (
         |  SELECT vec_id, subspace, code, ROW_NUMBER() OVER (PARTITION BY vec_id, subspace ORDER BY dist, code) AS rn
         |  FROM pdist) WHERE rn = 1),
         |partials AS (SELECT r.query_id, a.vec_id AS neighbor_id, pc.subspace, $adcFold AS p
         |  FROM routed r
         |  JOIN assigned a ON a.cell = r.cell AND a.vec_id <> r.query_id
         |  JOIN pc ON pc.vec_id = a.vec_id
         |  JOIN ps ON ps.code = pc.code
         |  JOIN embeddings qe ON qe.vec_id = r.query_id),
         |dist AS (SELECT query_id, neighbor_id,
         |  list_reduce(list(p ORDER BY subspace), (x, y) -> x + y) AS adc_dist
         |  FROM partials GROUP BY query_id, neighbor_id),
         |rk AS (SELECT query_id, neighbor_id, adc_dist,
         |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rn
         |  FROM dist)
         |SELECT query_id, neighbor_id, CAST(rn AS INTEGER) AS "rank", adc_dist
         |FROM rk WHERE rn <= 10 ORDER BY query_id, rn""".stripMargin
    },
    "q88_ann_recall" -> {
      // q80's generated CTE chain (identical folds/constants) + q33's
      // brute-force CTEs; both ranked sets are bit-deterministic, so the
      // semi-join counts — and the integer basis-point recall — hash-match.
      import graft.similarity.Pq.{Ksub, M, SubDim}
      val x = s"CAST(e.embedding[psub.subspace * $SubDim + j] AS DOUBLE)"
      val c = s"CAST(psub.sv[psub.subspace * $SubDim + j] AS DOUBLE)"
      val codeFold =
        s"list_reduce(list_transform(range(1, ${SubDim + 1}), j -> (($x) - ($c)) * (($x) - ($c))), (acc, v) -> acc + v)"
      val qx = s"CAST(qe.embedding[pc.subspace * $SubDim + j] AS DOUBLE)"
      val qc = s"CAST(ps.sv[pc.subspace * $SubDim + j] AS DOUBLE)"
      val adcFold =
        s"list_reduce(list_transform(range(1, ${SubDim + 1}), j -> (($qx) - ($qc)) * (($qx) - ($qc))), (acc, v) -> acc + v)"
      s"""WITH cen AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell, embedding AS cvec
         |  FROM (SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT 16)),
         |sims AS (SELECT e.vec_id, cen.cell,
         |  ${VectorOracles.cosine("e.embedding", "cen.cvec")} AS sim
         |  FROM embeddings e CROSS JOIN cen WHERE e.embedding IS NOT NULL),
         |assigned AS (SELECT vec_id, cell FROM (
         |  SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC NULLS LAST, cell) AS rn
         |  FROM sims) WHERE rn = 1),
         |routed AS (SELECT vec_id AS query_id, cell FROM (
         |  SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC NULLS LAST, cell) AS rn
         |  FROM sims WHERE vec_id % 50 = 0) WHERE rn <= 4),
         |ps AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS code, embedding AS sv
         |  FROM (SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT $Ksub)),
         |psub AS (SELECT CAST(g.s AS INTEGER) AS subspace, ps.code, ps.sv
         |  FROM ps CROSS JOIN (SELECT UNNEST(range(0, $M)) AS s) g),
         |pdist AS (SELECT e.vec_id, psub.subspace, psub.code, $codeFold AS dist
         |  FROM embeddings e CROSS JOIN psub WHERE e.embedding IS NOT NULL),
         |pc AS (SELECT vec_id, subspace, code FROM (
         |  SELECT vec_id, subspace, code, ROW_NUMBER() OVER (PARTITION BY vec_id, subspace ORDER BY dist, code) AS rn
         |  FROM pdist) WHERE rn = 1),
         |partials AS (SELECT r.query_id, a.vec_id AS neighbor_id, pc.subspace, $adcFold AS p
         |  FROM routed r
         |  JOIN assigned a ON a.cell = r.cell AND a.vec_id <> r.query_id
         |  JOIN pc ON pc.vec_id = a.vec_id
         |  JOIN ps ON ps.code = pc.code
         |  JOIN embeddings qe ON qe.vec_id = r.query_id),
         |adist AS (SELECT query_id, neighbor_id,
         |  list_reduce(list(p ORDER BY subspace), (x, y) -> x + y) AS adc_dist
         |  FROM partials GROUP BY query_id, neighbor_id),
         |ivf10 AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rn
         |  FROM adist) WHERE rn <= 10),
         |q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
         |  WHERE vec_id % 50 = 0 AND embedding IS NOT NULL),
         |s AS (SELECT q.query_id, e.vec_id AS neighbor_id,
         |  ${VectorOracles.cosine("q.qv", "e.embedding")} AS cosine
         |  FROM q JOIN embeddings e ON e.vec_id <> q.query_id
         |  WHERE e.embedding IS NOT NULL),
         |bt AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
         |  FROM s WHERE cosine IS NOT NULL) WHERE rn <= 10),
         |nq AS (SELECT COUNT(DISTINCT query_id) AS n_queries FROM bt),
         |h AS (SELECT COUNT(*) AS n_hits FROM ivf10 JOIN bt USING (query_id, neighbor_id))
         |SELECT nq.n_queries, h.n_hits,
         |  CAST(h.n_hits * 10000 // (nq.n_queries * 10) AS BIGINT) AS recall_bp
         |FROM nq CROSS JOIN h""".stripMargin
    },
    "q87_quality_gate" ->
      """WITH m AS (SELECT lang, len(str_split(text, ' ')) AS n_tokens,
        |  CAST(length(text) - (len(str_split(text, ' ')) - 1) AS DOUBLE) / len(str_split(text, ' ')) AS avg_token_len,
        |  CAST(len(list_filter(str_split(text, ' '), x -> x IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'))) AS DOUBLE)
        |    / len(str_split(text, ' ')) AS stopword_ratio
        |FROM documents),
        |q AS (SELECT lang, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(FLOOR(LEAST(1.0, (CAST(n_tokens AS DOUBLE)/100.0)*0.4 + stopword_ratio*3.0*0.3
        |    + CASE WHEN avg_token_len BETWEEN 3.0 AND 8.0 THEN 0.3 ELSE 0.0 END) * 1000000.0) AS BIGINT) AS quality_fp
        |FROM m),
        |t AS (SELECT lang, quantile_cont(quality_fp, 0.25) AS p25_fp FROM q GROUP BY lang)
        |SELECT q.lang, t.p25_fp, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN q.quality_fp >= t.p25_fp THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(SUM(CASE WHEN q.quality_fp >= t.p25_fp THEN q.n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
        |FROM q JOIN t USING (lang)
        |GROUP BY q.lang, t.p25_fp ORDER BY q.lang""".stripMargin,
    "q86_kmeans_inertia" -> {
      // Iteration 0 is exactly replicable: seeded centroids (first-K-id
      // vectors), the q76 (x−y)² fold, MIN over cells, fixed-point BIGINT
      // sum. Iterations ≥ 1 ride the structural Lloyd claim (TRUE; a
      // violation logs both inertias to stderr on the Spark side). The
      // seed LIMIT and the per-iteration rows are GENERATED from
      // Kmeans.DefaultK/DefaultIters — the same constants inertiaTrace
      // defaults to — so changing either cannot desynchronize the oracle
      // (the q77/q83/q85 generated-constant pattern).
      import graft.similarity.Kmeans.{DefaultIters, DefaultK}
      import graft.similarity.Pq.Dim
      val x = "CAST(e.embedding[j] AS DOUBLE)"
      val c = "CAST(cen.cvec[j] AS DOUBLE)"
      val fold =
        s"list_reduce(list_transform(range(1, ${Dim + 1}), j -> (($x) - ($c)) * (($x) - ($c))), (acc, v) -> acc + v)"
      val laterIters = (1 until DefaultIters)
        .map(i => s"UNION ALL SELECT CAST($i AS INTEGER), CAST(NULL AS BIGINT), TRUE")
        .mkString("\n")
      s"""WITH cen AS (SELECT embedding AS cvec FROM (
         |  SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT $DefaultK)),
         |d AS (SELECT e.vec_id, MIN($fold) AS dist
         |  FROM embeddings e CROSS JOIN cen WHERE e.embedding IS NOT NULL GROUP BY e.vec_id)
         |SELECT CAST(0 AS INTEGER) AS iter,
         |  CAST(SUM(CAST(FLOOR(dist * 1000000.0) AS BIGINT)) AS BIGINT) AS inertia_fp,
         |  TRUE AS non_increasing
         |FROM d
         |$laterIters
         |ORDER BY iter""".stripMargin
    },
    "q85_source_reputation" -> {
      val blocked = SourceBlocklist.map(s => s"'$s'").mkString(", ")
      s"""WITH k AS (SELECT source, doc_id,
         |  md5(array_to_string(list_sort(list_distinct(str_split(text, ' '))), ' ')) AS set_key,
         |  len(str_split(text, ' ')) AS n_tokens,
         |  CAST(length(text) - (len(str_split(text, ' ')) - 1) AS DOUBLE) / len(str_split(text, ' ')) AS avg_token_len,
         |  CAST(len(list_filter(str_split(text, ' '), x -> x IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'))) AS DOUBLE)
         |    / len(str_split(text, ' ')) AS stopword_ratio
         |  FROM documents),
         |q AS (SELECT source, set_key, n_tokens,
         |  LEAST(1.0, (CAST(n_tokens AS DOUBLE)/100.0)*0.4 + stopword_ratio*3.0*0.3
         |    + CASE WHEN avg_token_len BETWEEN 3.0 AND 8.0 THEN 0.3 ELSE 0.0 END) AS qs
         |  FROM k),
         |d AS (SELECT set_key FROM k GROUP BY set_key HAVING COUNT(*) > 1),
         |a AS (SELECT q.source, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(SUM(CAST(FLOOR(qs * 1000000.0) AS BIGINT)) AS BIGINT) AS quality_fp,
         |  CAST(SUM(CASE WHEN d.set_key IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs
         |  FROM q LEFT JOIN d ON q.set_key = d.set_key GROUP BY q.source)
         |SELECT source, n_docs, n_tokens, quality_fp, n_dup_docs,
         |  (source IN ($blocked)) AS blocked,
         |  (source NOT IN ($blocked) AND quality_fp >= 400000 * n_docs) AS kept
         |FROM a ORDER BY source""".stripMargin
    },
    // q84's no_false_negative TRUE is the bounded-claim pattern (q42/q69/
    // q79): a hash mismatch means the Bloom guarantee broke (impossible
    // short of sketch-machinery corruption), not engine count drift.
    "q84_incremental_dedup" ->
      """WITH snap AS (SELECT DISTINCT md5(array_to_string(list_sort(list_distinct(str_split(text, ' '))), ' ')) AS fp
        |  FROM documents WHERE doc_id % 3 <> 0),
        |inc AS (SELECT doc_id, md5(array_to_string(list_sort(list_distinct(str_split(text, ' '))), ' ')) AS fp
        |  FROM documents WHERE doc_id % 3 = 0)
        |SELECT inc.doc_id, (snap.fp IS NOT NULL) AS is_dup_exact, TRUE AS no_false_negative
        |FROM inc LEFT JOIN snap ON inc.fp = snap.fp
        |ORDER BY doc_id""".stripMargin,
    "q83_curation_v2" -> {
      // The composed pipeline, stage by stage, each CTE the proven oracle
      // form of its operator: q25 exact dedup → q27 brute-force pair
      // dominance → q73 exact-gram + q62 brute-force fuzzy decontamination
      // → q77 rates (weights VALUES generated from DomainMixWeights) →
      // q74 chunking (constants generated from ChunkSize/ChunkOverlap) →
      // q72's windowed packing twin (PrefixSum equality is spec-proven).
      val wvals = DomainMixWeights
        .map { case (l, w) => s"('$l', CAST($w AS DOUBLE))" }
        .mkString(", ")
      val (cs, st) = (ChunkSize, ChunkSize - ChunkOverlap)
      val sliceLen = s"len(s[CAST(ci*$st + 1 AS INTEGER):CAST(LEAST(ci*$st + $cs, n) AS INTEGER)])"
      s"""WITH keep1 AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         |d1 AS (SELECT d.doc_id, d.lang, d.text FROM documents d JOIN keep1 USING (doc_id)),
         |t1 AS (SELECT doc_id, list_distinct(str_split(text, ' ')) AS toks FROM d1),
         |dom AS (SELECT DISTINCT b.doc_id
         |  FROM t1 a JOIN t1 b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
         |      / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.95),
         |d2 AS (SELECT * FROM d1 WHERE doc_id NOT IN (SELECT doc_id FROM dom)),
         |gsrc AS (SELECT doc_id, str_split(text, ' ') AS s, text FROM documents),
         |g AS (SELECT doc_id,
         |  CASE WHEN len(s) >= 4 THEN list_transform(range(1, len(s) - 2), i -> array_to_string(s[i:i+3], ' '))
         |       ELSE [text] END AS grams FROM gsrc),
         |u AS (SELECT doc_id, unnest(grams) AS gram FROM g),
         |bg AS (SELECT DISTINCT doc_id AS bench_id, gram FROM u WHERE doc_id % 97 = 0),
         |cont1 AS (SELECT DISTINCT u.doc_id
         |  FROM u JOIN d2 USING (doc_id) JOIN bg ON u.gram = bg.gram AND u.doc_id <> bg.bench_id),
         |tb AS (SELECT doc_id, list_distinct(str_split(text, ' ')) AS toks
         |  FROM documents WHERE doc_id % 97 = 0),
         |t2 AS (SELECT doc_id, list_distinct(str_split(text, ' ')) AS toks FROM d2),
         |cont2 AS (SELECT DISTINCT a.doc_id FROM t2 a JOIN tb b ON a.doc_id <> b.doc_id
         |  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
         |      / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.8),
         |d3 AS (SELECT * FROM d2 WHERE doc_id NOT IN (SELECT doc_id FROM cont1)
         |                          AND doc_id NOT IN (SELECT doc_id FROM cont2)),
         |w(lang, w) AS (VALUES $wvals),
         |c AS (SELECT lang, COUNT(*) AS n_docs FROM d3 GROUP BY lang),
         |cw AS (SELECT c.lang, c.n_docs, w.w FROM c JOIN w USING (lang)),
         |tt AS (SELECT MIN(CAST(n_docs AS DOUBLE) / w) AS t FROM cw),
         |r AS (SELECT cw.lang, LEAST(1.0, (cw.w * tt.t) / CAST(cw.n_docs AS DOUBLE)) AS rate
         |  FROM cw CROSS JOIN tt),
         |d4 AS (SELECT d3.lang, d3.doc_id, d3.text FROM d3 JOIN r ON d3.lang = r.lang
         |  WHERE CAST(${duckH31("d3.text")} % 1000000 AS DOUBLE) < r.rate * 1000000.0),
         |ct AS (SELECT lang, doc_id, md5(text) AS rk, str_split(text, ' ') AS s FROM d4),
         |cc AS (SELECT lang, doc_id, rk, s, len(s) AS n,
         |  CASE WHEN len(s) <= $cs THEN 1 ELSE (len(s) - $cs + ${st - 1}) // $st + 1 END AS nc FROM ct),
         |cf AS (SELECT lang, doc_id, rk, ci AS chunk_idx, CAST($sliceLen AS BIGINT) AS n_chunk_tokens
         |  FROM (SELECT lang, doc_id, rk, s, n, unnest(range(0, nc)) AS ci FROM cc)),
         |pk AS (SELECT lang, doc_id, n_chunk_tokens,
         |  SUM(n_chunk_tokens) OVER (PARTITION BY lang ORDER BY rk, doc_id, chunk_idx
         |    ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM cf)
         |SELECT lang, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_chunks,
         |  CAST(SUM(n_chunk_tokens) AS BIGINT) AS kept_tokens,
         |  COUNT(DISTINCT (cum - n_chunk_tokens) // 2048) AS n_windows
         |FROM pk GROUP BY lang ORDER BY lang""".stripMargin
    },
    "q82_pq_trained_claim" -> {
      // q76's seeded-codebook CTEs; the total error is summed as
      // fixed-point BIGINTs (floor(dist·10⁶) — one IEEE multiply + exact
      // floor on a bit-identical double), so the SUM is order-free and
      // hash-exact. trained_improved = TRUE is the bounded-claim pattern:
      // a mismatch means Lloyd monotonicity fired on the Spark side (which
      // logs it to stderr), not engine drift.
      import graft.similarity.Pq.{Ksub, M, SubDim}
      val x = s"CAST(e.embedding[sub.subspace * $SubDim + j] AS DOUBLE)"
      val c = s"CAST(sub.sv[sub.subspace * $SubDim + j] AS DOUBLE)"
      val fold =
        s"list_reduce(list_transform(range(1, ${SubDim + 1}), j -> (($x) - ($c)) * (($x) - ($c))), (acc, v) -> acc + v)"
      s"""WITH seeds AS (
         |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS code, embedding AS sv
         |  FROM (SELECT vec_id, embedding FROM embeddings
         |        WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT $Ksub)),
         |sub AS (SELECT CAST(g.s AS INTEGER) AS subspace, seeds.code, seeds.sv
         |  FROM seeds CROSS JOIN (SELECT UNNEST(range(0, $M)) AS s) g),
         |d AS (SELECT e.vec_id, sub.subspace, sub.code, $fold AS dist
         |  FROM embeddings e CROSS JOIN sub WHERE e.embedding IS NOT NULL),
         |a AS (SELECT vec_id, subspace, code, dist,
         |  ROW_NUMBER() OVER (PARTITION BY vec_id, subspace ORDER BY dist, code) AS rn FROM d)
         |SELECT CAST($M AS INTEGER) AS m, CAST($Ksub AS INTEGER) AS ksub,
         |  COUNT(*) AS n_code_rows,
         |  CAST(SUM(CAST(FLOOR(dist * 1000000.0) AS BIGINT)) AS BIGINT) AS seeded_err_fp,
         |  TRUE AS trained_improved
         |FROM a WHERE rn = 1""".stripMargin
    },
    // q98 runs the SAME residual-IVFPQ search as q81, from the COMMITTED
    // index layout instead of a per-run rebuild — results are contractually
    // bit-identical, so both rows share one oracle. A q98/q81 divergence
    // reads as "the committed layout drifted from the build arithmetic".
    "q98_ann_indexed" -> ivfPqResidualOracleSql,
    "q81_ann_ivfpq_residual" -> ivfPqResidualOracleSql)

  /** The q81/q98 oracle, parameterized by the predicate that selects the
    * corpus the QUANTIZER is trained on (`seedWhere` restricts only the
    * cell-seed and codebook-seed CTEs; assignment, encode, and search
    * always span the full corpus). `TRUE` = the classic build; q101 passes
    * the base-corpus predicate to replicate a frozen-quantizer append.
    * `candWhere` (over `a.vec_id`) additionally restricts which encoded
    * vectors may surface as CANDIDATES — the tombstone-delete semantics:
    * quantizer, assignment, and encode still span the full corpus (a
    * logical delete re-trains nothing), but deleted ids never reach the
    * ADC ranking. q116 passes the deleted-id complement. */
  private[analytics] def ivfPqResidualOracleSqlSeeded(
      seedWhere: String, candWhere: String = "TRUE"): String = {
      // q80's oracle with the FAISS residual step spliced in: residuals are
      // elementwise CAST-to-DOUBLE subtracts (one IEEE op per element, so
      // corpus residuals, the residual-seeded codebooks, and both folds
      // stay bit-identical to the PqEncode/PqAdcDist loops).
      import graft.similarity.Pq.{Dim, Ksub, M, SubDim}
      val rx = s"res.rvec[psub.subspace * $SubDim + j]"
      val rc = s"psub.sv[psub.subspace * $SubDim + j]"
      val codeFold =
        s"list_reduce(list_transform(range(1, ${SubDim + 1}), j -> (($rx) - ($rc)) * (($rx) - ($rc))), (acc, v) -> acc + v)"
      val qx = s"qr.qrvec[pc.subspace * $SubDim + j]"
      val qc = s"rs.sv[pc.subspace * $SubDim + j]"
      val adcFold =
        s"list_reduce(list_transform(range(1, ${SubDim + 1}), j -> (($qx) - ($qc)) * (($qx) - ($qc))), (acc, v) -> acc + v)"
      val resOf = (vec: String, cvec: String) =>
        s"list_transform(range(1, ${Dim + 1}), j -> CAST($vec[j] AS DOUBLE) - CAST($cvec[j] AS DOUBLE))"
      s"""WITH cen AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell, vec_id AS cid, embedding AS cvec
         |  FROM (SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL AND ($seedWhere) ORDER BY vec_id LIMIT 16)),
         |sims AS (SELECT e.vec_id, cen.cell,
         |  ${VectorOracles.cosine("e.embedding", "cen.cvec")} AS sim
         |  FROM embeddings e CROSS JOIN cen WHERE e.embedding IS NOT NULL),
         |assigned AS (SELECT vec_id, cell FROM (
         |  SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC NULLS LAST, cell) AS rn
         |  FROM sims) WHERE rn = 1),
         |routed AS (SELECT vec_id AS query_id, cell FROM (
         |  SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC NULLS LAST, cell) AS rn
         |  FROM sims WHERE vec_id % 50 = 0) WHERE rn <= 4),
         |res AS (SELECT a.vec_id, a.cell, ${resOf("e.embedding", "c.cvec")} AS rvec
         |  FROM assigned a JOIN embeddings e ON e.vec_id = a.vec_id JOIN cen c ON c.cell = a.cell),
         |rs AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS code, rvec AS sv
         |  FROM (SELECT vec_id, rvec FROM res WHERE vec_id NOT IN (SELECT cid FROM cen) AND ($seedWhere)
         |        ORDER BY vec_id LIMIT $Ksub)),
         |psub AS (SELECT CAST(g.s AS INTEGER) AS subspace, rs.code, rs.sv
         |  FROM rs CROSS JOIN (SELECT UNNEST(range(0, $M)) AS s) g),
         |pdist AS (SELECT res.vec_id, psub.subspace, psub.code, $codeFold AS dist
         |  FROM res CROSS JOIN psub),
         |pc AS (SELECT vec_id, subspace, code FROM (
         |  SELECT vec_id, subspace, code, ROW_NUMBER() OVER (PARTITION BY vec_id, subspace ORDER BY dist, code) AS rn
         |  FROM pdist) WHERE rn = 1),
         |qres AS (SELECT r.query_id, r.cell, ${resOf("qe.embedding", "c.cvec")} AS qrvec
         |  FROM routed r JOIN embeddings qe ON qe.vec_id = r.query_id JOIN cen c ON c.cell = r.cell),
         |partials AS (SELECT qr.query_id, a.vec_id AS neighbor_id, pc.subspace, $adcFold AS p
         |  FROM qres qr
         |  JOIN assigned a ON a.cell = qr.cell AND a.vec_id <> qr.query_id AND ($candWhere)
         |  JOIN pc ON pc.vec_id = a.vec_id
         |  JOIN rs ON rs.code = pc.code),
         |dist AS (SELECT query_id, neighbor_id,
         |  list_reduce(list(p ORDER BY subspace), (x, y) -> x + y) AS adc_dist
         |  FROM partials GROUP BY query_id, neighbor_id),
         |rk AS (SELECT query_id, neighbor_id, adc_dist,
         |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rn
         |  FROM dist)
         |SELECT query_id, neighbor_id, CAST(rn AS INTEGER) AS "rank", adc_dist
         |FROM rk WHERE rn <= 10 ORDER BY query_id, rn""".stripMargin
  }

  private[analytics] lazy val ivfPqResidualOracleSql: String = ivfPqResidualOracleSqlSeeded("TRUE")

  /** The q125 oracle: the q81/q98 residual-IVFPQ SQL widened to keep the
    * ROUTE RANK (rn ≤ nlist instead of ≤ nprobe), fanned across the
    * operating points (a candidate participates where route_rank ≤ np),
    * ranked per (np, query), and scored for recall against the exact
    * brute-force top-10 (the q33 formulation). */
  private[analytics] lazy val annNprobeSweepOracleSql: String = {
    import graft.similarity.Pq.{Dim, Ksub, M, SubDim}
    val rx = s"res.rvec[psub.subspace * $SubDim + j]"
    val rc = s"psub.sv[psub.subspace * $SubDim + j]"
    val codeFold =
      s"list_reduce(list_transform(range(1, ${SubDim + 1}), j -> (($rx) - ($rc)) * (($rx) - ($rc))), (acc, v) -> acc + v)"
    val qx = s"qr.qrvec[pc.subspace * $SubDim + j]"
    val qc = s"rs.sv[pc.subspace * $SubDim + j]"
    val adcFold =
      s"list_reduce(list_transform(range(1, ${SubDim + 1}), j -> (($qx) - ($qc)) * (($qx) - ($qc))), (acc, v) -> acc + v)"
    val resOf = (vec: String, cvec: String) =>
      s"list_transform(range(1, ${Dim + 1}), j -> CAST($vec[j] AS DOUBLE) - CAST($cvec[j] AS DOUBLE))"
    val npList = SweepNprobes.mkString("[", ", ", "]")
    s"""WITH cen AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell, vec_id AS cid, embedding AS cvec
       |  FROM (SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT 16)),
       |sims AS (SELECT e.vec_id, cen.cell,
       |  ${VectorOracles.cosine("e.embedding", "cen.cvec")} AS sim
       |  FROM embeddings e CROSS JOIN cen WHERE e.embedding IS NOT NULL),
       |assigned AS (SELECT vec_id, cell FROM (
       |  SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC NULLS LAST, cell) AS rn
       |  FROM sims) WHERE rn = 1),
       |routed AS (SELECT vec_id AS query_id, cell, CAST(rn AS INTEGER) AS route_rank FROM (
       |  SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC NULLS LAST, cell) AS rn
       |  FROM sims WHERE vec_id % 50 = 0) WHERE rn <= 16),
       |res AS (SELECT a.vec_id, a.cell, ${resOf("e.embedding", "c.cvec")} AS rvec
       |  FROM assigned a JOIN embeddings e ON e.vec_id = a.vec_id JOIN cen c ON c.cell = a.cell),
       |rs AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS code, rvec AS sv
       |  FROM (SELECT vec_id, rvec FROM res WHERE vec_id NOT IN (SELECT cid FROM cen)
       |        ORDER BY vec_id LIMIT $Ksub)),
       |psub AS (SELECT CAST(g.s AS INTEGER) AS subspace, rs.code, rs.sv
       |  FROM rs CROSS JOIN (SELECT UNNEST(range(0, $M)) AS s) g),
       |pdist AS (SELECT res.vec_id, psub.subspace, psub.code, $codeFold AS dist
       |  FROM res CROSS JOIN psub),
       |pc AS (SELECT vec_id, subspace, code FROM (
       |  SELECT vec_id, subspace, code, ROW_NUMBER() OVER (PARTITION BY vec_id, subspace ORDER BY dist, code) AS rn
       |  FROM pdist) WHERE rn = 1),
       |qres AS (SELECT r.query_id, r.cell, r.route_rank, ${resOf("qe.embedding", "c.cvec")} AS qrvec
       |  FROM routed r JOIN embeddings qe ON qe.vec_id = r.query_id JOIN cen c ON c.cell = r.cell),
       |partials AS (SELECT qr.query_id, qr.route_rank, a.vec_id AS neighbor_id, pc.subspace, $adcFold AS p
       |  FROM qres qr
       |  JOIN assigned a ON a.cell = qr.cell AND a.vec_id <> qr.query_id
       |  JOIN pc ON pc.vec_id = a.vec_id
       |  JOIN rs ON rs.code = pc.code),
       |dist AS (SELECT query_id, route_rank, neighbor_id,
       |  list_reduce(list(p ORDER BY subspace), (x, y) -> x + y) AS adc_dist
       |  FROM partials GROUP BY query_id, route_rank, neighbor_id),
       |npx AS (SELECT d.query_id, d.route_rank, d.neighbor_id, d.adc_dist, CAST(n.np AS INTEGER) AS np
       |  FROM dist d CROSS JOIN (SELECT UNNEST($npList) AS np) n WHERE d.route_rank <= n.np),
       |rk AS (SELECT np, query_id, neighbor_id,
       |  ROW_NUMBER() OVER (PARTITION BY np, query_id ORDER BY adc_dist, neighbor_id) AS rn
       |  FROM npx),
       |topk AS (SELECT np, query_id, neighbor_id FROM rk WHERE rn <= 10),
       |bq AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
       |  WHERE vec_id % 50 = 0 AND embedding IS NOT NULL),
       |bs AS (SELECT bq.query_id, e.vec_id AS neighbor_id,
       |  ${VectorOracles.cosine("bq.qv", "e.embedding")} AS cosine
       |  FROM bq JOIN embeddings e ON e.vec_id <> bq.query_id WHERE e.embedding IS NOT NULL),
       |br AS (SELECT query_id, neighbor_id FROM (
       |  SELECT query_id, neighbor_id, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
       |  FROM bs WHERE cosine IS NOT NULL) WHERE rn <= 10),
       |nq AS (SELECT COUNT(DISTINCT query_id) AS n_queries FROM br),
       |cands AS (SELECT np, COUNT(*) AS n_candidates FROM npx GROUP BY np),
       |hits AS (SELECT t.np, COUNT(*) AS n_hits FROM topk t
       |  JOIN br ON br.query_id = t.query_id AND br.neighbor_id = t.neighbor_id GROUP BY t.np)
       |SELECT c.np, CAST(nq.n_queries AS BIGINT) AS n_queries,
       |  CAST(c.n_candidates AS BIGINT) AS n_candidates,
       |  CAST(h.n_hits AS BIGINT) AS n_hits,
       |  CAST(h.n_hits * 10000 // (nq.n_queries * 10) AS BIGINT) AS recall_bp
       |FROM cands c JOIN hits h ON h.np = c.np CROSS JOIN nq ORDER BY c.np""".stripMargin
  }

  /** Shared lexical-retrieval CTE block — q110's derived query + pruned
    * postings, extended with the per-doc length BM25 needs. Used by the
    * q126/q127 oracles so the two rankers and the fusion can never drift
    * from one another's postings. */
  private[analytics] val LexicalCtes =
    """td AS (SELECT token, doc_id, dl, COUNT(*) AS tf
      |  FROM (SELECT doc_id, len(str_split(text, ' ')) AS dl, unnest(str_split(text, ' ')) AS token FROM documents)
      |  GROUP BY token, doc_id, dl),
      |q AS (SELECT DISTINCT unnest(str_split(text, ' ')) AS token
      |  FROM documents WHERE doc_id = (SELECT min(doc_id) FROM documents)),
      |n AS (SELECT COUNT(*) AS n_docs, CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS total_tokens FROM documents),
      |qtd AS (SELECT td.token, td.doc_id, td.dl, td.tf FROM td JOIN q USING (token)),
      |d AS (SELECT token, COUNT(*) AS df FROM qtd GROUP BY token)""".stripMargin

  /** The per-term BM25 score (k1 = 1.2, b = 0.75) as the exact parse
    * tree [[bm25Topk]] evaluates — every IEEE op in the same order. */
  private[analytics] val BmTermSql =
    """CAST(FLOOR(CAST(n_docs * 1000000 // df AS DOUBLE)
      |    * (CAST(tf AS DOUBLE) * 2.2)
      |    / (CAST(tf AS DOUBLE) + (0.3 + 0.9 * (CAST(dl * n_docs AS DOUBLE) / CAST(total_tokens AS DOUBLE))))) AS BIGINT)""".stripMargin

  /** q131 oracle — the banding sweep replayed in SQL: distinct token
    * sets, the same 192-slot signature family (minhashParamValues), band
    * keys as slice TUPLES (the engine buckets by xxhash64 of the slice —
    * identical partition of sets into buckets absent 64-bit collisions,
    * the q64/q73 precedent), candidates unioned across the generated
    * config list, truth verified once at the shared threshold. */
  private[analytics] def lshSweepOracleSql: String = {
    val perConfig = SweepConfigs.map { case (b, r) =>
      s"""SELECT $b AS bands, $r AS rows_per_band, a.sid AS id_a, b2.sid AS id_b
         |  FROM (SELECT sid, i, array_to_string(sig[CAST(i*$r+1 AS INTEGER) : CAST(i*$r+$r AS INTEGER)], ',') AS key
         |        FROM sg, (SELECT unnest(range(0, $b)) AS i)) a
         |  JOIN (SELECT sid, i, array_to_string(sig[CAST(i*$r+1 AS INTEGER) : CAST(i*$r+$r AS INTEGER)], ',') AS key
         |        FROM sg, (SELECT unnest(range(0, $b)) AS i)) b2
         |    ON a.i = b2.i AND a.key = b2.key AND a.sid < b2.sid
         |  GROUP BY ALL""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH t AS (SELECT MIN(doc_id) AS sid, ANY_VALUE(list_sort(list_distinct(str_split(text, ' ')))) AS toks
       |  FROM documents GROUP BY md5(array_to_string(list_sort(list_distinct(str_split(text, ' '))), ' '))),
       |h AS (SELECT sid, list_transform(toks, tok -> ${graft.functions.Md5Hash.duckH31("tok")}) AS hs FROM t),
       |sg AS (SELECT sid, list(mh ORDER BY sig_idx) AS sig FROM (
       |    SELECT h.sid, p.sig_idx, list_min(list_transform(h.hs, x -> (p.pa * x + p.pb) % 2147483647)) AS mh
       |    FROM h CROSS JOIN (VALUES $minhashParamValues) AS p(sig_idx, pa, pb)) GROUP BY sid),
       |cand AS (
       |  $perConfig),
       |uniq AS (SELECT DISTINCT id_a, id_b FROM cand),
       |ver AS (SELECT u.id_a, u.id_b FROM uniq u JOIN t a ON a.sid = u.id_a JOIN t b ON b.sid = u.id_b
       |  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
       |    / len(list_distinct(list_concat(a.toks, b.toks))) >= $SweepJaccard),
       |tot AS (SELECT COUNT(*) AS n_truth FROM ver)
       |SELECT c.bands, c.rows_per_band, COUNT(*) AS n_candidates, tot.n_truth,
       |  CAST(SUM(CASE WHEN v.id_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       |  CAST(SUM(CASE WHEN v.id_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 10000 // tot.n_truth AS recall_bp
       |FROM cand c LEFT JOIN ver v ON c.id_a = v.id_a AND c.id_b = v.id_b CROSS JOIN tot
       |GROUP BY c.bands, c.rows_per_band, tot.n_truth
       |ORDER BY c.bands""".stripMargin
  }

  /** q134 oracle — per truncation dimension, the q33 left-fold cosine
    * over SLICED lists ranks top-10; hits against the full-dim point's
    * list; generated from the shared MrlDims (the last dim IS the
    * truth). */
  private[analytics] def mrlSweepOracleSql: String = {
    val perDim = MrlDims.map { d =>
      s"""SELECT $d AS dim, query_id, neighbor_id FROM (
         |  SELECT s.query_id, s.neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY s.query_id ORDER BY s.cosine DESC, s.neighbor_id) AS rn
         |  FROM (SELECT q.query_id, e.vec_id AS neighbor_id,
         |      ${VectorOracles.cosine(s"q.qv[1:$d]", s"e.embedding[1:$d]")} AS cosine
         |    FROM q JOIN e ON e.vec_id <> q.query_id) s
         |  WHERE s.cosine IS NOT NULL) WHERE rn <= 10""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
       |  WHERE vec_id % 50 = 0 AND embedding IS NOT NULL),
       |e AS (SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL),
       |allr AS (
       |  $perDim),
       |truth AS (SELECT query_id, neighbor_id FROM allr WHERE dim = ${MrlDims.last})
       |SELECT a.dim, COUNT(*) // 10 AS n_queries,
       |  CAST(SUM(CASE WHEN t.query_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       |  CAST(SUM(CASE WHEN t.query_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 10000
       |    // COUNT(*) AS recall_bp
       |FROM allr a LEFT JOIN truth t
       |  ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
       |GROUP BY a.dim ORDER BY a.dim""".stripMargin
  }

  /** Shared CTE prefix of the q240/q254 online-admission oracles: seeded
    * centroids → cell assignment → the unrolled per-wave drop/admit CTEs
    * (`dp$b` / `adm$b`). q240 aggregates per-wave stats over it; q254
    * selects the admitted SET itself (the frame its committed store must
    * hash-match). */
  private[analytics] def onlineAdmissionCtePrefix: String =
    "WITH " + onlineAdmissionCtes("embeddings")

  /** The q240/q254 admission CTE body over an arbitrary (vec_id,
    * embedding) source CTE/table `src` (no leading WITH) — q317 reruns
    * the same unrolled sequential semantics over the curation DAG's
    * survivor subset. */
  private[analytics] def onlineAdmissionCtes(src: String): String = {
    import graft.similarity.SemDedup.{Nlist, OnlineBatches, Tau}
    val cosXY = VectorOracles.cosine("a.embedding", "b.embedding")
    val waveCtes = (0 until OnlineBatches).map { b =>
      val dp =
        if (b == 0) s"dp$b AS (SELECT vec_id FROM assigned WHERE 1 = 0)"
        else {
          val prior = (0 until b).map(i => s"SELECT vec_id, cell FROM adm$i")
            .mkString(" UNION ALL ")
          s"""dp$b AS (SELECT DISTINCT x.vec_id
             |  FROM assigned x JOIN ($prior) p ON p.cell = x.cell
             |  JOIN $src a ON a.vec_id = x.vec_id
             |  JOIN $src b ON b.vec_id = p.vec_id
             |  WHERE x.batch = $b AND $cosXY >= $Tau)""".stripMargin
        }
      val adm =
        s"""adm$b AS (SELECT x.vec_id, x.cell FROM assigned x
           |  WHERE x.batch = $b
           |    AND x.vec_id NOT IN (SELECT vec_id FROM dp$b)
           |    AND NOT EXISTS (SELECT 1 FROM assigned y
           |      JOIN $src a ON a.vec_id = x.vec_id
           |      JOIN $src b ON b.vec_id = y.vec_id
           |      WHERE y.batch = $b AND y.cell = x.cell
           |        AND y.vec_id < x.vec_id AND $cosXY >= $Tau))""".stripMargin
      s"$dp,\n$adm"
    }.mkString(",\n")
    s"""cen AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell, embedding AS cvec
       |  FROM (SELECT vec_id, embedding FROM $src WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT $Nlist)),
       |sims AS (SELECT e.vec_id, cen.cell,
       |  ${VectorOracles.cosine("e.embedding", "cen.cvec")} AS sim
       |  FROM $src e CROSS JOIN cen WHERE e.embedding IS NOT NULL),
       |assigned AS (SELECT vec_id, cell, vec_id % $OnlineBatches AS batch FROM (
       |  SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC NULLS LAST, cell) AS rn
       |  FROM sims) WHERE rn = 1),
       |$waveCtes""".stripMargin
  }

  /** Shared CTE prefix of the q200/q256 oracles (no leading WITH): the
    * sequential four-batch fuzzy-ingest replay — brute-force Jaccard with
    * the q62 recall-exactness argument standing in for the banding. */
  private[analytics] def fuzzyIngestCtePrefix: String = {
    def jac(a: String, x: String) =
      s"CAST(len(list_intersect($a.toks, $x.toks)) AS DOUBLE) / " +
        s"($a.nt + $x.nt - len(list_intersect($a.toks, $x.toks))) >= 0.8"
    def lenPre(a: String, x: String) =
      s"5 * LEAST($a.nt, $x.nt) >= 4 * GREATEST($a.nt, $x.nt)"
    def batch(b: Int): String = {
      val corpusUnion = ("SELECT doc_id, toks, nt FROM st" +:
        (0 until b).map(i => s"SELECT doc_id, toks, nt FROM s$i")).mkString(" UNION ALL ")
      s"""a$b AS MATERIALIZED (SELECT * FROM arr WHERE (doc_id // 7) % 4 = $b),
         |wd$b AS (SELECT DISTINCT a.doc_id FROM a$b a JOIN a$b x
         |  ON x.doc_id < a.doc_id AND ${lenPre("a", "x")} AND ${jac("a", "x")}),
         |k$b AS MATERIALIZED (SELECT * FROM a$b WHERE doc_id NOT IN (SELECT doc_id FROM wd$b)),
         |c$b AS MATERIALIZED ($corpusUnion),
         |cd$b AS (SELECT DISTINCT k.doc_id FROM k$b k JOIN c$b c
         |  ON ${lenPre("k", "c")} AND ${jac("k", "c")}),
         |s$b AS MATERIALIZED (SELECT * FROM k$b WHERE doc_id NOT IN (SELECT doc_id FROM cd$b))"""
    }
    s"""d AS MATERIALIZED (SELECT doc_id, list_distinct(str_split(text, ' ')) AS toks,
       |    len(list_distinct(str_split(text, ' '))) AS nt FROM documents),
       |st AS MATERIALIZED (SELECT doc_id, toks, nt FROM d WHERE doc_id % 7 <> 0),
       |arr AS MATERIALIZED (SELECT doc_id, toks, nt FROM d WHERE doc_id % 7 = 0),
       |${(0 to 3).map(batch).mkString(",\n")}""".stripMargin
  }

}
