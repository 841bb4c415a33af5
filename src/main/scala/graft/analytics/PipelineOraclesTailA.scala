package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup
import graft.multimodal.{Mp4, Multimodal}
import graft.similarity.Ann
import graft.text.TextAnalysis
import graft.functions.Md5Hash.{duckH31, duckH60}

/** DuckDB oracle SQL, tail map A (q145–q139 entries of the former
  * single `oracleTail` literal) — a PURE MOVE out of the 17k-line
  * PipelineQueries.scala (round-10 verdict #4): entries unchanged, the
  * one literal split into A ++ B at an entry boundary. */
trait PipelineOraclesTailA { this: PipelineQueries.type =>

  private[analytics] val oracleTailA: Map[String, String] = Map(
    // q145: identical h31 bucketing, conversion threshold and the exact
    // integer chi-square cross-multiply (HUGEINT here, DECIMAL(38,0) in
    // the engine — both exact, so the boolean agrees bit-for-bit).
    "q145_ab_experiment" ->
      s"""WITH u AS (SELECT user_id,
         |    CASE WHEN COUNT(*) FILTER (event_type = 'purchase') >= $AbConvPurchases
         |         THEN 1 ELSE 0 END AS conv
         |  FROM events GROUP BY user_id),
         |v AS (SELECT CASE WHEN ${duckH31("CAST(user_id AS VARCHAR)")} % 2 = 0
         |    THEN 'control' ELSE 'treatment' END AS variant, conv FROM u),
         |p AS (SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_users,
         |    CAST(SUM(conv) AS BIGINT) AS n_converted,
         |    CAST(SUM(conv) AS BIGINT) * 10000 // CAST(COUNT(*) AS BIGINT) AS cvr_bp
         |  FROM v GROUP BY variant),
         |t AS (SELECT
         |    CAST(SUM(CASE WHEN variant = 'control' THEN n_converted ELSE 0 END) AS BIGINT) AS a,
         |    CAST(SUM(CASE WHEN variant = 'control' THEN n_users - n_converted ELSE 0 END) AS BIGINT) AS b,
         |    CAST(SUM(CASE WHEN variant = 'treatment' THEN n_converted ELSE 0 END) AS BIGINT) AS c,
         |    CAST(SUM(CASE WHEN variant = 'treatment' THEN n_users - n_converted ELSE 0 END) AS BIGINT) AS d,
         |    CAST(SUM(CASE WHEN variant = 'treatment' THEN cvr_bp ELSE -cvr_bp END) AS BIGINT) AS lift_bp
         |  FROM p)
         |SELECT p.variant, p.n_users, p.n_converted, p.cvr_bp, t.lift_bp,
         |  CAST(1000 AS HUGEINT) * CAST(a + b + c + d AS HUGEINT)
         |      * (CAST(a * d - b * c AS HUGEINT) * CAST(a * d - b * c AS HUGEINT))
         |    >= CAST(3841 AS HUGEINT) * CAST(a + b AS HUGEINT) * CAST(c + d AS HUGEINT)
         |      * CAST(a + c AS HUGEINT) * CAST(b + d AS HUGEINT) AS significant_95
         |FROM p, t ORDER BY p.variant""".stripMargin,
    // q146: same distinct-token h60 keys, same ⌊1e6·N/df⌋ per-token
    // surprisal and floor-mean reductions — BIGINT end to end.
    "q146_idf_quality" ->
      s"""WITH d AS (SELECT doc_id, lang, list_distinct(str_split(text, ' ')) AS toks FROM documents),
         |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM documents),
         |t AS (SELECT doc_id, lang, ${duckH60("u.tok")} AS tk FROM d, unnest(d.toks) AS u(tok)),
         |f AS (SELECT tk, CAST(COUNT(*) AS BIGINT) AS df FROM t GROUP BY tk),
         |p AS (SELECT t.doc_id, t.lang,
         |    CAST(SUM(($IdfScale * n.n_total) // f.df) AS BIGINT) AS s,
         |    CAST(COUNT(*) AS BIGINT) AS c
         |  FROM t JOIN f ON t.tk = f.tk CROSS JOIN n GROUP BY 1, 2),
         |q AS (SELECT lang, s // c AS surprisal_u FROM p)
         |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(surprisal_u) // COUNT(*) AS BIGINT) AS mean_surprisal_u,
         |  CAST(MIN(surprisal_u) AS BIGINT) AS min_surprisal_u,
         |  CAST(MAX(surprisal_u) AS BIGINT) AS max_surprisal_u
         |FROM q GROUP BY lang ORDER BY lang""".stripMargin,
    // q148: identical (epoch_us, event_id) gap ordering and the same
    // integer burst-rule constants interpolated from the engine.
    "q148_bot_detection" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
         |g AS (SELECT user_id, us,
         |    us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap_us
         |  FROM e),
         |a AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         |    CAST(MAX(us) - MIN(us) AS BIGINT) AS span_us,
         |    CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
         |    CAST(COUNT(*) FILTER (gap_us <= $BotFastGapUs) AS BIGINT) AS n_fast,
         |    CAST(SUM(gap_us) AS BIGINT) AS sum_gap
         |  FROM g GROUP BY user_id)
         |SELECT user_id, n_events, span_us, sum_gap // n_gaps AS mean_gap_us,
         |  n_fast * 10000 // n_gaps AS fast_bp,
         |  (n_events >= $BotMinEvents AND n_fast * 10000 // n_gaps >= $BotFastBp) AS is_bot
         |FROM a WHERE n_gaps > 0 ORDER BY user_id""".stripMargin,
    // q147: identical 3-gram shingles (position-unnest form — same
    // strings, same h60 keys), identical df cut and containment rule.
    "q147_doc_containment" ->
      s"""WITH tk AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents
         |  WHERE len(str_split(text, ' ')) >= $ContainGramLen),
         |pos AS (SELECT doc_id, t, unnest(range(1, len(t) - ${ContainGramLen - 2})) AS pi FROM tk),
         |gs AS (SELECT doc_id,
         |    array_to_string(list_slice(t, pi, pi + ${ContainGramLen - 1}), ' ') AS gstr
         |  FROM pos),
         |gr AS (SELECT DISTINCT doc_id, ${duckH60("gstr")} AS g FROM gs),
         |f AS (SELECT g FROM (SELECT g, COUNT(*) AS c FROM gr GROUP BY g) WHERE c <= $ContainMaxDf),
         |rg AS (SELECT gr.doc_id, gr.g FROM gr JOIN f USING (g)),
         |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams FROM rg GROUP BY doc_id),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS shared
         |  FROM rg a JOIN rg b ON a.g = b.g AND a.doc_id <> b.doc_id GROUP BY 1, 2)
         |SELECT id_a, id_b, sa.n_grams AS n_grams_a, sb.n_grams AS n_grams_b, shared,
         |  shared * 10000 // sa.n_grams AS containment_bp
         |FROM p JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
         |WHERE shared * 10000 // sa.n_grams >= $ContainBp
         |  AND (sa.n_grams < sb.n_grams OR (sa.n_grams = sb.n_grams AND id_a < id_b))
         |ORDER BY id_a, id_b""".stripMargin,
    // q149: the exact min-label iteration unrolled from the same
    // LpIters constant, over the same bipartite edge encoding as q139.
    "q149_label_communities" -> {
      import graft.graph.Graph
      def step(prev: String, next: String): String =
        s"""$next AS (SELECT node, MIN(lbl) AS lbl FROM (
           |  SELECT e.src AS node, p.lbl FROM se e JOIN $prev p ON p.node = e.dst
           |  UNION ALL SELECT node, lbl FROM $prev) GROUP BY node)""".stripMargin
      val steps = (1 to Graph.LpIters).map(i => step(s"l${i - 1}", s"l$i")).mkString(",\n")
      s"""WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS u, l_partkey * 2 + 1 AS v
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |se AS (SELECT u AS src, v AS dst FROM e0 UNION ALL SELECT v, u FROM e0),
         |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM se),
         |$steps
         |SELECT CASE WHEN lbl % 2 = 0 THEN 'customer' ELSE 'part' END AS community_type,
         |  lbl // 2 AS community_key, CAST(COUNT(*) AS BIGINT) AS n_members
         |FROM l${Graph.LpIters} GROUP BY 1, 2
         |ORDER BY n_members DESC, community_type, community_key LIMIT 20""".stripMargin
    },
    // q150: same (count desc, token) total order for the top-10 cut;
    // all reductions BIGINT.
    "q150_token_concentration" ->
      """WITH c AS (SELECT lang, u.tok AS tok, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents, unnest(str_split(text, ' ')) AS u(tok) GROUP BY 1, 2),
        |r AS (SELECT lang, tok, c,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY c DESC, tok) AS rnk FROM c)
        |SELECT lang, CAST(SUM(c) AS BIGINT) AS total_tokens,
        |  CAST(COUNT(*) AS BIGINT) AS distinct_tokens,
        |  CAST(SUM(CASE WHEN rnk <= 10 THEN c ELSE 0 END) AS BIGINT) * 10000
        |    // CAST(SUM(c) AS BIGINT) AS top10_bp,
        |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS singletons,
        |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) * 10000
        |    // CAST(COUNT(*) AS BIGINT) AS singleton_bp
        |FROM r GROUP BY lang ORDER BY lang""".stripMargin,
    // q153: same bigram total order for the top-1 phrase; the oracle
    // intersects by string equality — a divergence reads as "the
    // positional index drifted from the text".
    "q153_phrase_search" ->
      """WITH t AS (SELECT doc_id, str_split(text, ' ') AS tk FROM documents
        |  WHERE len(str_split(text, ' ')) >= 2),
        |pos AS (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i FROM t),
        |bg AS (SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2 FROM pos),
        |cnt AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY 1, 2),
        |top1 AS (SELECT w1, w2 FROM cnt ORDER BY c DESC, w1, w2 LIMIT 1)
        |SELECT bg.doc_id, bg.w1 || ' ' || bg.w2 AS phrase,
        |  CAST(COUNT(*) AS BIGINT) AS n_matches
        |FROM bg JOIN top1 ON bg.w1 = top1.w1 AND bg.w2 = top1.w2
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    // q154: same distinct incidence, same (n_co desc, part ids) total
    // order for the cut, same integer lift.
    "q154_copurchase" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |p AS (SELECT a.pk AS part_a, b.pk AS part_b, CAST(COUNT(*) AS BIGINT) AS n_co
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2),
        |t AS (SELECT part_a, part_b, n_co FROM p ORDER BY n_co DESC, part_a, part_b LIMIT 20),
        |pc AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS n FROM li GROUP BY pk),
        |nn AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS total FROM li)
        |SELECT t.part_a, t.part_b, t.n_co, pa.n AS n_a, pb.n AS n_b,
        |  t.n_co * nn.total * 10000 // (pa.n * pb.n) AS lift_bp
        |FROM t JOIN pc pa ON pa.pk = t.part_a JOIN pc pb ON pb.pk = t.part_b CROSS JOIN nn
        |ORDER BY t.n_co DESC, t.part_a, t.part_b""".stripMargin,
    // q155: per-user first-signup/first-subsequent-purchase offsets with
    // end-of-window censoring; risk sets from the same exit histogram.
    "q155_survival_hazard" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
         |te AS (SELECT MAX(us) AS t_end FROM e),
         |fs AS (SELECT user_id, MIN(us) AS fs FROM e WHERE event_type = 'signup' GROUP BY user_id),
         |fp AS (SELECT e.user_id, MIN(e.us) AS fp FROM e JOIN fs ON e.user_id = fs.user_id
         |  WHERE e.event_type = 'purchase' AND e.us >= fs.fs GROUP BY e.user_id),
         |u AS (SELECT (fp.fp - fs.fs) // 86400000000 AS conv_off,
         |    (te.t_end - fs.fs) // 86400000000 AS cens_off
         |  FROM fs LEFT JOIN fp ON fs.user_id = fp.user_id CROSS JOIN te),
         |ue AS (SELECT conv_off,
         |    CASE WHEN conv_off IS NOT NULL THEN LEAST(conv_off, cens_off)
         |         ELSE cens_off END AS exit_off FROM u),
         |h AS (SELECT exit_off, CAST(COUNT(*) AS BIGINT) AS n_exit,
         |    CAST(COUNT(*) FILTER (conv_off = exit_off) AS BIGINT) AS n_events
         |  FROM ue GROUP BY exit_off),
         |r AS (SELECT exit_off, n_exit, n_events,
         |    COALESCE(SUM(n_exit) OVER (ORDER BY exit_off
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS exited_before,
         |    SUM(n_exit) OVER () AS n_total FROM h)
         |SELECT exit_off AS day, CAST(n_total - exited_before AS BIGINT) AS at_risk,
         |  n_events,
         |  CAST(n_events * 10000 // (n_total - exited_before) AS BIGINT) AS hazard_bp
         |FROM r WHERE exit_off < $SurvivalDays AND exit_off >= 0 ORDER BY day""".stripMargin,
    // q156: strict-order anchors (MIN after the previous anchor); the
    // 3-row readout from one per-user frame.
    "q156_funnel3" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
        |fs AS (SELECT user_id, MIN(us) AS fs FROM e WHERE event_type = 'signup' GROUP BY user_id),
        |fv AS (SELECT e.user_id, MIN(e.us) AS fv FROM e JOIN fs ON e.user_id = fs.user_id
        |  WHERE e.event_type = 'view' AND e.us > fs.fs GROUP BY e.user_id),
        |fp AS (SELECT e.user_id, MIN(e.us) AS fp FROM e JOIN fv ON e.user_id = fv.user_id
        |  WHERE e.event_type = 'purchase' AND e.us > fv.fv GROUP BY e.user_id),
        |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0, CAST(COUNT(fv.fv) AS BIGINT) AS n1,
        |    CAST(COUNT(fp.fp) AS BIGINT) AS n2
        |  FROM fs LEFT JOIN fv ON fs.user_id = fv.user_id
        |    LEFT JOIN fp ON fs.user_id = fp.user_id)
        |SELECT r.* FROM s, LATERAL (
        |  SELECT 1 AS step_no, 'signup' AS step, n0 AS n_users, CAST(10000 AS BIGINT) AS conv_bp
        |  UNION ALL SELECT 2, 'view_after_signup', n1, n1 * 10000 // n0
        |  UNION ALL SELECT 3, 'purchase_after_view', n2, n2 * 10000 // n1) r
        |ORDER BY step_no""".stripMargin,
    // q157: same bit-portable cosine, same (cosine desc, id) rank-1,
    // mutuality by symmetric self-join.
    "q157_mutual_nn" ->
      s"""WITH s AS (SELECT vec_id, embedding FROM embeddings
         |  WHERE embedding IS NOT NULL AND vec_id % 10 = 0),
         |sc AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |    ${VectorOracles.cosine("a.embedding", "b.embedding")} AS cosine
         |  FROM s a JOIN s b ON a.vec_id <> b.vec_id),
         |rk AS (SELECT query_id, neighbor_id, cosine,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
         |  FROM sc WHERE cosine IS NOT NULL),
         |t1 AS (SELECT query_id, neighbor_id, cosine FROM rk WHERE rn = 1)
         |SELECT x.query_id AS id_a, x.neighbor_id AS id_b, x.cosine AS cosine
         |FROM t1 x JOIN t1 y
         |  ON x.query_id = y.neighbor_id AND x.neighbor_id = y.query_id
         |  AND x.query_id < x.neighbor_id
         |ORDER BY id_a""".stripMargin,
    // q158: open/close via row-number endpoints over the identical
    // (µs, event_id) order; all cents BIGINT.
    "q158_ohlc_bars" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS us, event_id,
        |    CAST(FLOOR(value * 100) AS BIGINT) AS cents FROM events
        |  WHERE value IS NOT NULL),
        |d AS (SELECT event_type, us // 86400000000 AS day, us, event_id, cents FROM e),
        |w AS (SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY event_type, day ORDER BY us, event_id) AS rn_a,
        |    ROW_NUMBER() OVER (PARTITION BY event_type, day ORDER BY us DESC, event_id DESC) AS rn_z
        |  FROM d)
        |SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(MAX(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_cents,
        |  MAX(cents) AS high_cents, MIN(cents) AS low_cents,
        |  CAST(MAX(CASE WHEN rn_z = 1 THEN cents END) AS BIGINT) AS close_cents
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q159: identical two-level reduction; all squares BIGINT.
    "q159_source_diversity" ->
      """WITH c AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1, 2),
        |a AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS n_docs,
        |    CAST(COUNT(*) AS BIGINT) AS n_sources,
        |    CAST(SUM(n * n) AS BIGINT) AS ss FROM c GROUP BY lang)
        |SELECT lang, n_docs, n_sources,
        |  ss * 10000 // (n_docs * n_docs) AS simpson_bp,
        |  n_docs * n_docs * 100 // ss AS eff_sources_x100
        |FROM a ORDER BY lang""".stripMargin,
    // q162: identical holdout split, truncation, scoring, and cutoff
    // grid — every constant interpolated from the engine.
    "q162_recs_backtest" -> {
      val hitCols = RecsKs.map(k =>
        s"CAST(SUM(CASE WHEN best_rank <= $k THEN 1 ELSE 0 END) AS BIGINT) AS h$k").mkString(",\n    ")
      val kRows = RecsKs.map(k =>
        s"SELECT CAST($k AS BIGINT) AS k, n_customers, h$k AS n_hits, h$k * 10000 // n_customers AS hitrate_bp")
        .mkString("\n  UNION ALL ")
      s"""WITH r AS (SELECT o_orderkey AS ok, o_custkey AS cust,
         |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn,
         |    COUNT(*) OVER (PARTITION BY o_custkey) AS n_orders FROM orders),
         |ord AS (SELECT ok, cust, rn = 1 AS holdout FROM r WHERE n_orders >= 2),
         |b AS (SELECT DISTINCT cust, ok, l_partkey AS pk, holdout
         |  FROM ord JOIN lineitem ON l_orderkey = ok),
         |tr AS (SELECT * FROM b WHERE NOT holdout),
         |te AS (SELECT DISTINCT cust, pk FROM b WHERE holdout),
         |p AS (SELECT a.pk AS item, bb.pk AS partner, CAST(COUNT(*) AS BIGINT) AS co
         |  FROM tr a JOIN tr bb ON a.ok = bb.ok AND a.pk <> bb.pk GROUP BY 1, 2),
         |tp AS (SELECT item, partner, co FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY item ORDER BY co DESC, partner) AS prn FROM p)
         |  WHERE prn <= $RecsPartnerTopN),
         |h AS (SELECT DISTINCT cust, pk FROM tr),
         |ca AS (SELECT h.cust, tp.partner, CAST(SUM(tp.co) AS BIGINT) AS score
         |  FROM h JOIN tp ON h.pk = tp.item GROUP BY 1, 2),
         |cf AS (SELECT ca.* FROM ca WHERE NOT EXISTS (
         |    SELECT 1 FROM h WHERE h.cust = ca.cust AND h.pk = ca.partner)),
         |rk AS (SELECT cust, partner,
         |    ROW_NUMBER() OVER (PARTITION BY cust ORDER BY score DESC, partner) AS crn FROM cf),
         |hi AS (SELECT rk.cust, MIN(crn) AS best_rank
         |  FROM rk JOIN te ON te.cust = rk.cust AND te.pk = rk.partner
         |  WHERE crn <= ${RecsKs.max} GROUP BY 1),
         |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
         |    $hitCols
         |  FROM (SELECT c.cust, hi.best_rank
         |    FROM (SELECT DISTINCT cust FROM te) c LEFT JOIN hi ON c.cust = hi.cust))
         |SELECT kr.* FROM s, LATERAL (
         |  $kRows) kr
         |ORDER BY k""".stripMargin
    },
    // q163: identical integer moment sums and cross-multiplied verdicts.
    "q163_daily_correlation" ->
      """WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day, event_type,
        |    CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(a.c) AS BIGINT) AS sx, CAST(SUM(b.c) AS BIGINT) AS sy,
        |    CAST(SUM(a.c * a.c) AS BIGINT) AS sxx, CAST(SUM(b.c * b.c) AS BIGINT) AS syy,
        |    CAST(SUM(a.c * b.c) AS BIGINT) AS sxy
        |  FROM d a JOIN d b ON a.day = b.day AND a.event_type < b.event_type
        |  GROUP BY 1, 2),
        |m AS (SELECT type_a, type_b, n_days,
        |    n_days * sxy - sx * sy AS cov_n,
        |    n_days * sxx - sx * sx AS varx_n,
        |    n_days * syy - sy * sy AS vary_n FROM p)
        |SELECT type_a, type_b, n_days, cov_n, cov_n > 0 AS positive,
        |  (4 * cov_n * cov_n >= varx_n * vary_n AND varx_n > 0 AND vary_n > 0) AS strong
        |FROM m ORDER BY type_a, type_b""".stripMargin,
    // q164: same bins, same split anchor, same common-denominator TVD.
    "q164_value_drift" ->
      s"""WITH p AS (SELECT CAST(FLOOR(value * 100) AS BIGINT) // $DriftBinCents AS bin,
         |    epoch_us(ts) // 86400000000 AS day FROM events
         |  WHERE event_type = 'purchase' AND value IS NOT NULL),
         |d0 AS (SELECT MIN(day) AS d0 FROM p),
         |b AS (SELECT bin, (day - d0.d0 < $DriftSplitDay) AS week1 FROM p CROSS JOIN d0),
         |h AS (SELECT bin,
         |    CAST(SUM(CASE WHEN week1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
         |    CAST(SUM(CASE WHEN week1 THEN 0 ELSE 1 END) AS BIGINT) AS b FROM b GROUP BY bin),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
         |    CAST(SUM(a) AS BIGINT) AS n1, CAST(SUM(b) AS BIGINT) AS n2,
         |    CAST(SUM(abs(a * (SELECT SUM(b) FROM h) - b * (SELECT SUM(a) FROM h))) AS BIGINT) AS num
         |  FROM h)
         |SELECT n_bins, n1 AS n_week1, n2 AS n_rest,
         |  num * 10000 // (2 * n1 * n2) AS tvd_bp,
         |  num * 10000 // (2 * n1 * n2) >= $DriftTvdBp AS drifted
         |FROM t""".stripMargin,
    // q165: identical epoch-arithmetic dow ((day+3) mod 7, Monday=0).
    "q165_seasonality" ->
      """WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day_id,
        |    (epoch_us(ts) // 3600000000) % 24 AS hour FROM events),
        |h AS (SELECT (day_id + 3) % 7 AS dow, hour,
        |    CAST(COUNT(*) AS BIGINT) AS n_events FROM e GROUP BY 1, 2),
        |t AS (SELECT SUM(n_events) AS total FROM h)
        |SELECT dow, hour, n_events,
        |  CAST(n_events * 10000 // t.total AS BIGINT) AS share_bp,
        |  n_events * 168 >= 2 * t.total AS peak
        |FROM h CROSS JOIN t ORDER BY dow, hour""".stripMargin,
    // q166: identical gap rule, order, and token serialization
    // (string_agg with the same ORDER BY).
    "q166_session_export" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type FROM events),
        |m AS (SELECT *, CASE WHEN LAG(us) OVER w IS NULL
        |      OR us - LAG(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM m),
        |s2 AS (SELECT *, MIN(us) OVER (PARTITION BY user_id, sid) AS sstart FROM s),
        |g AS (SELECT user_id, sid, CAST(MIN(us) AS BIGINT) AS start_us,
        |    CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST((MAX(us) - MIN(us)) // 1000000 AS BIGINT) AS duration_s,
        |    string_agg(event_type || '@' || CAST((us - sstart) // 1000000 AS VARCHAR),
        |      ' ' ORDER BY us, event_id) AS trajectory
        |  FROM s2 GROUP BY user_id, sid)
        |SELECT user_id, start_us, n_events, duration_s, trajectory
        |FROM g WHERE n_events >= 2 ORDER BY user_id, start_us""".stripMargin,
    // q167: the audit recomputed from the SOURCE table with the same
    // q148 bot rule — equality proves the rewrite was exact.
    "q167_gdpr_purge" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
         |g AS (SELECT user_id,
         |    us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap_us
         |  FROM e),
         |a AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         |    CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
         |    CAST(COUNT(*) FILTER (gap_us <= $BotFastGapUs) AS BIGINT) AS n_fast
         |  FROM g GROUP BY user_id),
         |bots AS (SELECT user_id FROM a WHERE n_gaps > 0
         |  AND n_events >= $BotMinEvents AND n_fast * 10000 // n_gaps >= $BotFastBp),
         |kept AS (SELECT * FROM events WHERE user_id NOT IN (SELECT user_id FROM bots))
         |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM bots) AS n_users_flagged,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM events) AS n_before,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM events)
         |    - (SELECT CAST(COUNT(*) AS BIGINT) FROM kept) AS n_removed,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM kept) AS n_after,
         |  (SELECT CAST(COUNT(*) FILTER (value IS NOT NULL) AS BIGINT) FROM kept) AS n_valued_after,
         |  (SELECT CAST(SUM(${graft.functions.Md5Hash.duckH31("CAST(event_id AS VARCHAR)")}) AS BIGINT)
         |    FROM kept) AS sum_id_hash_after""".stripMargin,
    // q168: identical rank orders and the (rank−1)·5 div n quintile rule.
    "q168_rfm_scores" ->
      """WITH per AS (SELECT user_id, MAX(epoch_us(ts)) AS last_us,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS frequency,
        |    CAST(SUM(CASE WHEN event_type = 'purchase'
        |      THEN CAST(FLOOR(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS monetary_cents
        |  FROM events GROUP BY user_id),
        |t AS (SELECT MAX(last_us) AS t_end FROM per),
        |base AS (SELECT user_id, (t.t_end - last_us) // 86400000000 AS recency_days,
        |    frequency, monetary_cents FROM per CROSS JOIN t),
        |r AS (SELECT *,
        |    ROW_NUMBER() OVER (ORDER BY recency_days ASC, user_id) AS rk_r,
        |    ROW_NUMBER() OVER (ORDER BY frequency DESC, user_id) AS rk_f,
        |    ROW_NUMBER() OVER (ORDER BY monetary_cents DESC, user_id) AS rk_m,
        |    COUNT(*) OVER () AS n FROM base)
        |SELECT user_id, CAST(recency_days AS BIGINT) AS recency_days, frequency, monetary_cents,
        |  CAST((rk_r - 1) * 5 // n + 1 AS BIGINT) AS r_score,
        |  CAST((rk_f - 1) * 5 // n + 1 AS BIGINT) AS f_score,
        |  CAST((rk_m - 1) * 5 // n + 1 AS BIGINT) AS m_score,
        |  CAST(((rk_r - 1) * 5 // n + 1) * 100 + ((rk_f - 1) * 5 // n + 1) * 10
        |    + ((rk_m - 1) * 5 // n + 1) AS BIGINT) AS segment
        |FROM r ORDER BY user_id""".stripMargin,
    // q169: the same island key (day − row-number) and tie rules.
    "q169_activity_streaks" ->
      """WITH inc AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |i AS (SELECT user_id, day,
        |    day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS island FROM inc),
        |runs AS (SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS len,
        |    CAST(MIN(day) AS BIGINT) AS sd FROM i GROUP BY 1, 2),
        |best AS (SELECT user_id, sd,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY len DESC, sd ASC) AS rn FROM runs),
        |a AS (SELECT user_id, CAST(SUM(len) AS BIGINT) AS active_days,
        |    CAST(MAX(len) AS BIGINT) AS longest_streak FROM runs GROUP BY user_id)
        |SELECT a.user_id, a.active_days, a.longest_streak, b.sd AS best_streak_start
        |FROM a JOIN best b ON a.user_id = b.user_id AND b.rn = 1
        |ORDER BY a.user_id""".stripMargin,
    // q170: same split, same bit-portable cosine rank-1, label joins.
    "q170_knn_label_eval" ->
      s"""WITH em AS (SELECT vec_id, embedding, label FROM embeddings
         |  WHERE embedding IS NOT NULL AND label IS NOT NULL),
         |pr AS (SELECT * FROM em WHERE vec_id % 20 = 0),
         |tr AS (SELECT * FROM em WHERE vec_id % 20 <> 0),
         |sc AS (SELECT pr.vec_id AS query_id, tr.vec_id AS neighbor_id,
         |    tr.label AS pred_label, pr.label AS true_label,
         |    ${VectorOracles.cosine("pr.embedding", "tr.embedding")} AS cosine
         |  FROM pr JOIN tr ON pr.vec_id <> tr.vec_id),
         |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, neighbor_id) AS rn
         |  FROM sc WHERE cosine IS NOT NULL)
         |SELECT true_label AS label, CAST(COUNT(*) AS BIGINT) AS n_probes,
         |  CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
         |  CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END) AS BIGINT) * 10000
         |    // CAST(COUNT(*) AS BIGINT) AS acc_bp
         |FROM rk WHERE rn = 1 GROUP BY true_label ORDER BY label""".stripMargin,
    // q171: exact WAU restricted to observed days (the q137 oracle
    // shape) + the bounded claim emitted as TRUE.
    "q171_sliding_hll_wau" ->
      """WITH inc AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id FROM events),
        |f AS (SELECT DISTINCT user_id, day + CAST(g.i AS BIGINT) AS day2
        |  FROM inc, (SELECT unnest(range(0, 7)) AS i) g),
        |obs AS (SELECT DISTINCT day FROM inc),
        |e AS (SELECT f.day2 AS day, CAST(COUNT(DISTINCT f.user_id) AS BIGINT) AS wau_exact
        |  FROM f JOIN obs ON f.day2 = obs.day GROUP BY 1)
        |SELECT day, wau_exact, TRUE AS within_bound FROM e ORDER BY day""".stripMargin,
    // q172: q89's funnel window + q145's arms and chi-square, composed.
    "q172_ab_funnel" ->
      s"""WITH fs AS (SELECT user_id, MIN(epoch_us(ts)) AS fs FROM events
         |  WHERE event_type = 'signup' GROUP BY user_id),
         |cv AS (SELECT DISTINCT e.user_id FROM events e JOIN fs ON e.user_id = fs.user_id
         |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > fs.fs
         |    AND epoch_us(e.ts) <= fs.fs + 3600000000),
         |u AS (SELECT fs.user_id,
         |    CASE WHEN cv.user_id IS NULL THEN 0 ELSE 1 END AS conv
         |  FROM fs LEFT JOIN cv ON fs.user_id = cv.user_id),
         |v AS (SELECT CASE WHEN ${duckH31("CAST(user_id AS VARCHAR)")} % 2 = 0
         |    THEN 'control' ELSE 'treatment' END AS variant, conv FROM u),
         |t AS (SELECT
         |    CAST(SUM(CASE WHEN variant = 'control' THEN conv ELSE 0 END) AS BIGINT) AS a,
         |    CAST(SUM(CASE WHEN variant = 'control' THEN 1 - conv ELSE 0 END) AS BIGINT) AS b,
         |    CAST(SUM(CASE WHEN variant = 'treatment' THEN conv ELSE 0 END) AS BIGINT) AS c,
         |    CAST(SUM(CASE WHEN variant = 'treatment' THEN 1 - conv ELSE 0 END) AS BIGINT) AS d
         |  FROM v)
         |SELECT r.variant, r.n_signup_users, r.n_converted,
         |  r.n_converted * 10000 // r.n_signup_users AS conv_bp,
         |  c * 10000 // (c + d) - a * 10000 // (a + b) AS lift_bp,
         |  CAST(1000 AS HUGEINT) * CAST(a + b + c + d AS HUGEINT)
         |      * (CAST(a * d - b * c AS HUGEINT) * CAST(a * d - b * c AS HUGEINT))
         |    >= CAST(3841 AS HUGEINT) * CAST(a + b AS HUGEINT) * CAST(c + d AS HUGEINT)
         |      * CAST(a + c AS HUGEINT) * CAST(b + d AS HUGEINT) AS significant_95
         |FROM t, LATERAL (
         |  SELECT 'control' AS variant, a + b AS n_signup_users, a AS n_converted
         |  UNION ALL SELECT 'treatment', c + d, c) r
         |ORDER BY r.variant""".stripMargin,
    // q173: identical day truncation (both engines truncate toward
    // zero) and the lower-median rule over the lag histogram.
    "q173_ship_lag" ->
      """WITH lg AS (SELECT o_orderpriority AS priority,
        |    (epoch_us(l_shipdate) - epoch_us(o_orderdate)) // 86400000000 AS lag_days
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |h AS (SELECT priority, lag_days, CAST(COUNT(*) AS BIGINT) AS c FROM lg GROUP BY 1, 2),
        |t AS (SELECT priority, SUM(c) AS n, SUM(lag_days * c) AS s,
        |    MIN(lag_days) AS mn, MAX(lag_days) AS mx FROM h GROUP BY priority),
        |cm AS (SELECT h.priority, h.lag_days, h.c,
        |    SUM(h.c) OVER (PARTITION BY h.priority ORDER BY h.lag_days
        |      ROWS UNBOUNDED PRECEDING) AS cum FROM h)
        |SELECT cm.priority, CAST(MIN(t.n) AS BIGINT) AS n_lineitems,
        |  MIN(cm.lag_days) AS median_lag_days,
        |  CAST(MIN(t.s // t.n) AS BIGINT) AS mean_lag_days,
        |  CAST(MIN(t.mn) AS BIGINT) AS min_lag_days, CAST(MIN(t.mx) AS BIGINT) AS max_lag_days
        |FROM cm JOIN t ON cm.priority = t.priority
        |WHERE cm.cum >= (t.n + 1) // 2
        |GROUP BY cm.priority ORDER BY cm.priority""".stripMargin,
    // q174: each expectation recomputed directly; booleans must agree.
    "q174_expectations" ->
      """WITH ev AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(COUNT(*) FILTER (user_id IS NULL) AS BIGINT) AS v_nn_user,
        |    CAST(COUNT(*) FILTER (ts IS NULL) AS BIGINT) AS v_nn_ts,
        |    CAST(COUNT(*) FILTER (event_type IS NULL
        |      OR event_type NOT IN ('click','error','purchase','signup','view')) AS BIGINT) AS v_set,
        |    CAST(COUNT(*) FILTER (user_id IS NOT NULL
        |      AND NOT (user_id >= 0 AND user_id <= 1000000000)) AS BIGINT) AS v_range,
        |    CAST(COUNT(*) FILTER (props IS NOT NULL
        |      AND NOT regexp_matches(props, '^\{.*\}$')) AS BIGINT) AS v_re
        |  FROM events),
        |evu AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS v
        |  FROM (SELECT event_id, COUNT(*) AS c FROM events GROUP BY event_id)),
        |o AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(COUNT(*) FILTER (o_orderstatus IS NULL
        |      OR o_orderstatus NOT IN ('F','O','P')) AS BIGINT) AS v_set,
        |    CAST(COUNT(*) FILTER (o_custkey IS NULL) AS BIGINT) AS v_nn
        |  FROM orders),
        |ou AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS v
        |  FROM (SELECT o_orderkey, COUNT(*) AS c FROM orders GROUP BY o_orderkey)),
        |rows0 AS (
        |  SELECT 'events' AS table_name, 'in_range(user_id)' AS expectation, ev.n, ev.v_range AS v FROM ev
        |  UNION ALL SELECT 'events', 'in_set(event_type)', ev.n, ev.v_set FROM ev
        |  UNION ALL SELECT 'events', 'matches(props)', ev.n, ev.v_re FROM ev
        |  UNION ALL SELECT 'events', 'not_null(ts)', ev.n, ev.v_nn_ts FROM ev
        |  UNION ALL SELECT 'events', 'not_null(user_id)', ev.n, ev.v_nn_user FROM ev
        |  UNION ALL SELECT 'events', 'unique(event_id)', evu.n, evu.v FROM evu
        |  UNION ALL SELECT 'orders', 'in_set(o_orderstatus)', o.n, o.v_set FROM o
        |  UNION ALL SELECT 'orders', 'not_null(o_custkey)', o.n, o.v_nn FROM o
        |  UNION ALL SELECT 'orders', 'unique(o_orderkey)', ou.n, ou.v FROM ou)
        |SELECT table_name, expectation, n AS n_rows, v AS n_violations,
        |  v * 10000 // n AS violation_bp, v = 0 AS passed
        |FROM rows0 ORDER BY table_name, expectation""".stripMargin,
    // q175/q176: the same exact cent·pct revenue units (no decimal
    // division anywhere) and identical rank/lag orders.
    "q175_market_share" ->
      """WITH an AS (SELECT n_nationkey, n_name FROM nation
        |  JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA'),
        |f AS (SELECT n_nationkey AS focus_key, n_name AS focus_nation
        |  FROM an ORDER BY n_name LIMIT 1),
        |r AS (SELECT year(o_orderdate) AS o_year, s_nationkey,
        |    CAST(l_extendedprice * 100 AS BIGINT) * CAST((1 - l_discount) * 100 AS BIGINT) AS rev_u
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN an ON s_nationkey = an.n_nationkey)
        |SELECT r.o_year, f.focus_nation,
        |  CAST(SUM(rev_u) AS BIGINT) AS asia_rev_u,
        |  CAST(SUM(CASE WHEN r.s_nationkey = f.focus_key THEN rev_u ELSE 0 END) AS BIGINT) AS focus_rev_u,
        |  CAST(SUM(CASE WHEN r.s_nationkey = f.focus_key THEN rev_u ELSE 0 END) AS BIGINT)
        |    * 10000 // CAST(SUM(rev_u) AS BIGINT) AS share_bp
        |FROM r CROSS JOIN f GROUP BY r.o_year, f.focus_nation ORDER BY r.o_year""".stripMargin,
    "q176_rank_movement" ->
      """WITH rev AS (SELECT year(o_orderdate) AS o_year, n_name,
        |    CAST(SUM(CAST(l_extendedprice * 100 AS BIGINT)
        |      * CAST((1 - l_discount) * 100 AS BIGINT)) AS BIGINT) AS rev_u
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |rk AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY o_year
        |    ORDER BY rev_u DESC, n_name) AS BIGINT) AS rnk FROM rev),
        |lg AS (SELECT *, LAG(rnk) OVER (PARTITION BY n_name ORDER BY o_year) AS prev_rnk FROM rk)
        |SELECT o_year, n_name, rev_u, rnk, prev_rnk - rnk AS rank_delta
        |FROM lg ORDER BY o_year, rnk""".stripMargin,
    // q177: triangle counts are orientation-independent, so the oracle
    // replays the cheap id-ordered enumeration (a<b<c) — it must land on
    // the same integers as the engine's degree-ordered join.
    "q177_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e AS (SELECT DISTINCT a.pk AS u, b.pk AS v FROM li a
        |  JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
        |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM
        |  (SELECT u AS node FROM e UNION ALL SELECT v FROM e) GROUP BY node),
        |tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        |  FROM e e1 JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
        |  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
        |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |  CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges FROM deg),
        |ec AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e)
        |SELECT st.n_nodes, ec.n_edges, st.n_wedges, tri.n_triangles,
        |  3 * tri.n_triangles * 10000 // st.n_wedges AS gcc_bp
        |FROM st CROSS JOIN ec CROSS JOIN tri""".stripMargin,
    // q178: gap-filled daily counts, integer fixed-point mean, identical
    // running/global windows over the day frame.
    "q178_cusum" ->
      """WITH p AS (SELECT epoch_us(ts) // 86400000000 AS day FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS cnt FROM p GROUP BY day),
        |b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM p),
        |f AS (SELECT d.day, COALESCE(c.cnt, 0) AS cnt FROM
        |  (SELECT UNNEST(range(b.d0, b.d1 + 1)) AS day FROM b) d
        |  LEFT JOIN c ON c.day = d.day),
        |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS nd FROM f),
        |r AS (SELECT f.day, f.cnt,
        |    SUM(f.cnt * 1000000 - (t.total * 1000000 // t.nd)) OVER
        |      (ORDER BY f.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum_fp
        |  FROM f CROSS JOIN t),
        |m AS (SELECT MAX(ABS(cusum_fp)) AS peak FROM r)
        |SELECT r.day, r.cnt, CAST(r.cusum_fp AS BIGINT) AS cusum_fp,
        |  ABS(r.cusum_fp) = m.peak AS is_peak
        |FROM r CROSS JOIN m ORDER BY r.day""".stripMargin,
    // q179: same HAVING cut, same cent arithmetic, same
    // (price desc, orderkey) total order for the top-100.
    "q179_large_orders" ->
      s"""WITH q AS (SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
         |  FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS BIGINT)) > $LargeOrderQty)
         |SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
         |  CAST(o_totalprice * 100 AS BIGINT) AS price_cents, q.sum_qty
         |FROM orders JOIN q ON o_orderkey = q.l_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY price_cents DESC, o_orderkey LIMIT 100""".stripMargin,
    // q180: same conditional aggregate per snapshot half, same long
    // format, same integer drift.
    "q180_stats_drift" ->
      """WITH w AS (SELECT doc_id % 2 AS snap, CAST(COUNT(*) AS BIGINT) AS rows_,
        |    CAST(COUNT(DISTINCT text) AS BIGINT) AS ndv_text,
        |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS ndv_lang,
        |    CAST(COUNT(DISTINCT source) AS BIGINT) AS ndv_source,
        |    CAST(COUNT(*) FILTER (text IS NULL) AS BIGINT) AS nulls_text,
        |    CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars
        |  FROM documents GROUP BY 1),
        |l AS (
        |  SELECT snap, 'rows' AS metric, rows_ AS val FROM w UNION ALL
        |  SELECT snap, 'ndv_text', ndv_text FROM w UNION ALL
        |  SELECT snap, 'ndv_lang', ndv_lang FROM w UNION ALL
        |  SELECT snap, 'ndv_source', ndv_source FROM w UNION ALL
        |  SELECT snap, 'nulls_text', nulls_text FROM w UNION ALL
        |  SELECT snap, 'sum_n_chars', sum_n_chars FROM w)
        |SELECT metric, MAX(CASE WHEN snap = 0 THEN val END) AS snap_a,
        |  MAX(CASE WHEN snap = 1 THEN val END) AS snap_b,
        |  CASE WHEN MAX(CASE WHEN snap = 0 THEN val END) <> 0 THEN
        |    (MAX(CASE WHEN snap = 1 THEN val END) - MAX(CASE WHEN snap = 0 THEN val END))
        |      * 10000 // MAX(CASE WHEN snap = 0 THEN val END) END AS drift_bp
        |FROM l GROUP BY metric ORDER BY metric""".stripMargin,
    // q181: the q86 iter-0 discipline row-wise — identical (x−y)² fold,
    // per-row argmin cell with (dist, cell) tie order, floor(d²·10⁶).
    "q181_centroid_outliers" -> {
      import graft.similarity.Kmeans.DefaultK
      import graft.similarity.Pq.Dim
      val x = "CAST(e.embedding[j] AS DOUBLE)"
      val c = "CAST(cen.cvec[j] AS DOUBLE)"
      val fold =
        s"list_reduce(list_transform(range(1, ${Dim + 1}), j -> (($x) - ($c)) * (($x) - ($c))), (acc, v) -> acc + v)"
      s"""WITH cen AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell, embedding AS cvec
         |  FROM (SELECT vec_id, embedding FROM embeddings
         |    WHERE embedding IS NOT NULL AND len(embedding) >= $Dim ORDER BY vec_id LIMIT $DefaultK)),
         |d AS (SELECT e.vec_id, cen.cell, $fold AS dist
         |  FROM embeddings e CROSS JOIN cen
         |  WHERE e.embedding IS NOT NULL AND len(e.embedding) >= $Dim),
         |a AS (SELECT vec_id, cell, CAST(FLOOR(dist * 1000000.0) AS BIGINT) AS dist_fp FROM (
         |  SELECT vec_id, cell, dist, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
         |  FROM d) WHERE rn = 1),
         |s AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dist_fp) AS BIGINT) AS sum_dist_fp
         |  FROM a GROUP BY cell)
         |SELECT s.cell, s.n, s.sum_dist_fp, s.sum_dist_fp // s.n AS avg_dist_fp,
         |  CAST(COUNT(*) FILTER (a.dist_fp > 2 * (s.sum_dist_fp // s.n)) AS BIGINT) AS n_outliers,
         |  CAST(COUNT(*) FILTER (a.dist_fp > 2 * (s.sum_dist_fp // s.n)) AS BIGINT) * 10000 // s.n AS outlier_bp
         |FROM a JOIN s USING (cell) GROUP BY s.cell, s.n, s.sum_dist_fp ORDER BY s.cell""".stripMargin
    },
    // q182: same vocab, same symbolization, same left-to-right
    // non-overlapping replace, same (count desc, p1, p2) total orders.
    "q182_bpe_merge_round" ->
      """WITH tc AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM (SELECT unnest(str_split(text, ' ')) AS token FROM documents) GROUP BY token),
        |v AS (SELECT array_to_string(list_transform(range(1, length(token) + 1),
        |    i -> substring(token, CAST(i AS INTEGER), 1)), ' ') AS sym, cnt
        |  FROM tc WHERE length(token) >= 2),
        |pr1 AS (SELECT s.tk[CAST(t.i AS INTEGER)] AS p1, s.tk[CAST(t.i AS INTEGER) + 1] AS p2,
        |    CAST(SUM(s.cnt) AS BIGINT) AS pair_count
        |  FROM (SELECT str_split(sym, ' ') AS tk, cnt FROM v) s,
        |    UNNEST(range(1, len(s.tk))) AS t(i)
        |  GROUP BY 1, 2),
        |t1 AS (SELECT p1 AS m1, p2 AS m2 FROM pr1 ORDER BY pair_count DESC, p1, p2 LIMIT 1),
        |m AS (SELECT trim(replace(replace(replace(' ' || v.sym || ' ', ' ', '  '),
        |    ' ' || t1.m1 || '  ' || t1.m2 || ' ', ' ' || t1.m1 || t1.m2 || ' '), '  ', ' ')) AS sym, v.cnt
        |  FROM v CROSS JOIN t1),
        |pr2 AS (SELECT s.tk[CAST(t.i AS INTEGER)] AS p1, s.tk[CAST(t.i AS INTEGER) + 1] AS p2,
        |    CAST(SUM(s.cnt) AS BIGINT) AS pair_count
        |  FROM (SELECT str_split(sym, ' ') AS tk, cnt FROM m WHERE len(str_split(sym, ' ')) >= 2) s,
        |    UNNEST(range(1, len(s.tk))) AS t(i)
        |  GROUP BY 1, 2),
        |ms AS (SELECT m1 || m2 AS merged_symbol FROM t1)
        |SELECT pr2.p1, pr2.p2, pr2.pair_count, ms.merged_symbol
        |FROM pr2 CROSS JOIN ms ORDER BY pair_count DESC, p1, p2 LIMIT 10""".stripMargin,
    // q183: both engines carry exact micro-dollar integers through the
    // discount and tax legs; the histogram is pure integer classify.
    "q183_order_reconciliation" ->
      """WITH l AS (SELECT l_orderkey,
        |    CAST(SUM(CAST(l_extendedprice * 100 AS BIGINT)
        |      * CAST((1 - l_discount) * 100 AS BIGINT)
        |      * CAST((1 + l_tax) * 100 AS BIGINT)) AS BIGINT) AS lines_u
        |  FROM lineitem GROUP BY 1),
        |o AS (SELECT o_orderkey, CAST(o_totalprice * 100 AS BIGINT) * 10000 AS hdr_u FROM orders),
        |d AS (SELECT ABS(o.hdr_u - COALESCE(l.lines_u, 0)) AS diff_u, l.lines_u IS NULL AS lineless
        |  FROM o LEFT JOIN l ON o.o_orderkey = l.l_orderkey),
        |b AS (SELECT CASE WHEN lineless THEN 'no_lines' WHEN diff_u = 0 THEN 'exact'
        |    WHEN diff_u < 1000000 THEN 'lt_1_dollar' WHEN diff_u < 10000000 THEN 'lt_10_dollars'
        |    ELSE 'gte_10_dollars' END AS bucket, diff_u FROM d)
        |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_orders, CAST(SUM(diff_u) AS BIGINT) AS sum_diff_u
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    // q184: same two simulated layouts, same integer band, same zone-map
    // skip rule.
    "q184_zonemap_audit" ->
      s"""WITH mx AS (SELECT MAX(user_id) AS maxu FROM events),
         |f AS (SELECT layout, file, MIN(user_id) AS mn, MAX(user_id) AS mx_u,
         |    CAST(COUNT(*) AS BIGINT) AS rows_
         |  FROM (SELECT user_id, 'time' AS layout, epoch_us(ts) // 3600000000 AS file FROM events
         |    UNION ALL
         |    SELECT e.user_id, 'user_clustered', e.user_id * $ZoneMapBuckets // (mx.maxu + 1)
         |    FROM events e CROSS JOIN mx)
         |  GROUP BY 1, 2),
         |s AS (SELECT f.layout, f.rows_,
         |    CAST((f.mx_u < mx.maxu * 4 // 10 OR f.mn > mx.maxu * 5 // 10) AS BIGINT) AS skip
         |  FROM f CROSS JOIN mx)
         |SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_files, CAST(SUM(skip) AS BIGINT) AS n_skippable,
         |  CAST(SUM(skip) AS BIGINT) * 10000 // COUNT(*) AS skip_bp,
         |  CAST(SUM(rows_) AS BIGINT) AS rows_total,
         |  CAST(SUM(CASE WHEN skip = 0 THEN rows_ ELSE 0 END) AS BIGINT) AS rows_scanned
         |FROM s GROUP BY layout ORDER BY layout""".stripMargin,
    // q185: identical ascending (v, user_id) rank, identical integer
    // Gini divisions, identical decile arithmetic.
    "q185_revenue_concentration" ->
      """WITH u AS (SELECT user_id, CAST(SUM(CAST(value * 100 AS BIGINT)) AS BIGINT) AS v
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |r1 AS (SELECT user_id, v, CAST(ROW_NUMBER() OVER (ORDER BY v, user_id) AS BIGINT) AS i FROM u),
        |r2 AS (SELECT v, i, CAST(COUNT(*) OVER () AS BIGINT) AS n,
        |    CAST(SUM(v) OVER () AS BIGINT) AS tot, CAST(SUM(i * v) OVER () AS BIGINT) AS iv FROM r1),
        |d0 AS (SELECT (i - 1) * 10 // n AS decile, v, tot,
        |    CAST((2 * CAST(iv AS HUGEINT) * 10000 // (CAST(n AS HUGEINT) * tot))
        |      - ((n + 1) * 10000 // n) AS BIGINT) AS gini_bp FROM r2),
        |d AS (SELECT decile, tot, gini_bp, CAST(COUNT(*) AS BIGINT) AS n_users,
        |    CAST(SUM(v) AS BIGINT) AS revenue_cents FROM d0 GROUP BY 1, 2, 3),
        |c AS (SELECT decile, n_users, revenue_cents, tot, gini_bp,
        |    CAST(SUM(revenue_cents) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum FROM d)
        |SELECT decile, n_users, revenue_cents, revenue_cents * 10000 // tot AS share_bp,
        |  cum * 10000 // tot AS cum_share_bp, gini_bp
        |FROM c ORDER BY decile""".stripMargin,
    // q186: same 60-bit portable bigram hashes, same per-occurrence ppm
    // division, same integer means and floor rule.
    "q186_bigram_fluency" -> {
      import graft.functions.Md5Hash.duckH60
      val h1 = duckH60("tk.t[CAST(u.i AS INTEGER)]")
      val h2 = duckH60("tk.t[CAST(u.i AS INTEGER) + 1]")
      s"""WITH tk AS (SELECT doc_id, lang, str_split(text, ' ') AS t FROM documents
         |  WHERE len(str_split(text, ' ')) >= 2),
         |bg AS (SELECT tk.doc_id, tk.lang, $h1 AS h1, $h2 AS h2
         |  FROM tk, UNNEST(range(1, len(tk.t))) AS u(i)),
         |c12 AS (SELECT h1, h2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2),
         |c1 AS (SELECT h1, CAST(COUNT(*) AS BIGINT) AS c1 FROM bg GROUP BY 1),
         |sc AS (SELECT bg.doc_id, bg.lang,
         |    CAST(SUM(c12.c12 * 1000000 // c1.c1) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM bg JOIN c12 ON bg.h1 = c12.h1 AND bg.h2 = c12.h2
         |  JOIN c1 ON bg.h1 = c1.h1 GROUP BY 1, 2),
         |d AS (SELECT lang, s // c AS score_ppm FROM sc),
         |gm AS (SELECT CAST(SUM(score_ppm) AS BIGINT) // COUNT(*) AS gm FROM d)
         |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(score_ppm) // COUNT(*) AS BIGINT) AS avg_score_ppm,
         |  CAST(COUNT(*) FILTER (score_ppm < gm.gm // $FluencyFloorDiv) AS BIGINT) AS n_low_fluency
         |FROM d CROSS JOIN gm GROUP BY lang ORDER BY lang""".stripMargin
    },
    // q188: the WHOLE iteration is order-free integers (per-element
    // floors before every sum), so the oracle unrolls all rounds — the
    // q139 unrolled-CTE pattern applied to linear algebra.
    "q188_power_iteration" -> {
      import graft.similarity.Pq.Dim
      val S = PowerScale
      def iter(k: Int): String = {
        val vp = s"v${k - 1}"
        s"""u$k AS (SELECT e.vec_id,
           |    CAST(SUM(CAST(FLOOR(CAST(e.embedding[d.j + 1] AS DOUBLE) * d.v) AS BIGINT)) AS BIGINT) AS u
           |  FROM e CROSS JOIN $vp d GROUP BY e.vec_id),
           |w$k AS (SELECT d.j,
           |    CAST(SUM(CAST(FLOOR(CAST(e.embedding[d.j + 1] AS DOUBLE) * u$k.u) AS BIGINT)) AS BIGINT) AS w
           |  FROM e JOIN u$k ON e.vec_id = u$k.vec_id CROSS JOIN dims d GROUP BY d.j),
           |m$k AS (SELECT CAST(MAX(ABS(w)) AS BIGINT) AS m FROM w$k),
           |v$k AS (SELECT w$k.j, CAST(w$k.w * $S // m$k.m AS BIGINT) AS v FROM w$k CROSS JOIN m$k),
           |r$k AS (SELECT CAST($k AS INTEGER) AS iter,
           |  (SELECT CAST(w$k.j AS INTEGER) FROM w$k CROSS JOIN m$k
           |     WHERE ABS(w$k.w) = m$k.m ORDER BY w$k.j LIMIT 1) AS dominant_dim,
           |  (SELECT m FROM m$k) AS growth,
           |  (SELECT CAST(SUM(a.v * b.v) // $S AS BIGINT) FROM $vp a JOIN v$k b ON a.j = b.j) AS align_fp)"""
      }
      val body = (1 to PowerIters).map(iter).mkString(",\n")
      val union = (1 to PowerIters).map(k => s"SELECT * FROM r$k").mkString(" UNION ALL ")
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings
         |  WHERE embedding IS NOT NULL AND len(embedding) >= $Dim),
         |dims AS (SELECT CAST(t.j AS INTEGER) AS j FROM range(0, $Dim) t(j)),
         |v0 AS (SELECT CAST(t.j AS INTEGER) AS j,
         |    CAST(CASE WHEN t.j = 0 THEN $S ELSE 0 END AS BIGINT) AS v FROM range(0, $Dim) t(j)),
         |$body
         |$union ORDER BY iter""".stripMargin
    },
    // q189: same micro-batch width, same batch-boundary watermark
    // advance, same integer classification.
    "q189_watermark_audit" ->
      s"""WITH e AS (SELECT event_id, epoch_us(ts) AS us, event_id // $WmBatchIds AS batch FROM events),
         |st AS (SELECT batch, MAX(us) AS mx FROM e GROUP BY batch),
         |st2 AS (SELECT batch,
         |    MAX(mx) OVER (ORDER BY batch ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_mx
         |  FROM st),
         |c AS (SELECT e.batch,
         |    CASE WHEN st2.prev_mx IS NOT NULL AND e.us < st2.prev_mx - $WmDelayUs THEN 'dropped'
         |         WHEN st2.prev_mx IS NOT NULL AND e.us < st2.prev_mx THEN 'late_kept'
         |         ELSE 'on_time' END AS status
         |  FROM e JOIN st2 ON e.batch = st2.batch)
         |SELECT batch, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(COUNT(*) FILTER (status = 'on_time') AS BIGINT) AS n_on_time,
         |  CAST(COUNT(*) FILTER (status = 'late_kept') AS BIGINT) AS n_late_kept,
         |  CAST(COUNT(*) FILTER (status = 'dropped') AS BIGINT) AS n_dropped
         |FROM c GROUP BY batch ORDER BY batch""".stripMargin,
    // q190: same edge set, same integer log2 via binary-string length.
    "q190_degree_profile" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e AS (SELECT DISTINCT a.pk AS u, b.pk AS v FROM li a
        |  JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
        |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM
        |  (SELECT u AS node FROM e UNION ALL SELECT v FROM e) GROUP BY 1),
        |h AS (SELECT deg, CAST(length(bin(deg)) - 1 AS BIGINT) AS bucket FROM deg)
        |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_nodes, CAST(MIN(deg) AS BIGINT) AS min_deg,
        |  CAST(MAX(deg) AS BIGINT) AS max_deg, CAST(SUM(deg) AS BIGINT) AS sum_deg
        |FROM h GROUP BY bucket ORDER BY bucket""".stripMargin,
    // q191: the sketch is portable-hash built, so the ESTIMATE replays
    // exactly — both engines fold the same md5 cells.
    "q191_join_size_estimate" -> {
      import graft.functions.Md5Hash.duckH31
      val h = duckH31("CAST(t.d AS VARCHAR) || ':' || CAST(l.l_partkey AS VARCHAR)")
      s"""WITH cells AS (SELECT t.d, ($h) % $CmsWidth AS w, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM lineitem l CROSS JOIN range(0, $CmsDepth) t(d) GROUP BY 1, 2),
         |est AS (SELECT CAST(MIN(ip) AS BIGINT) AS est_selfjoin FROM (
         |  SELECT d, SUM(c * c) AS ip FROM cells GROUP BY d)),
         |ex AS (SELECT CAST(SUM(c * c) AS BIGINT) AS exact_selfjoin,
         |    CAST(COUNT(*) AS BIGINT) AS n_keys, CAST(SUM(c) AS BIGINT) AS n_rows FROM (
         |  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c FROM lineitem GROUP BY 1))
         |SELECT ex.n_rows, ex.n_keys, ex.exact_selfjoin, est.est_selfjoin,
         |  (est.est_selfjoin - ex.exact_selfjoin) * 10000 // ex.exact_selfjoin AS over_bp,
         |  est.est_selfjoin >= ex.exact_selfjoin AS never_under
         |FROM ex CROSS JOIN est""".stripMargin
    },
    // q192: HUGEINT mirrors DECIMAL(38,0); // and div both truncate
    // toward zero, so the signed m3 replays exactly.
    "q192_moment_stats" ->
      """WITH e AS (SELECT event_type, CAST(value * 100 AS BIGINT) AS v FROM events),
        |a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS s,
        |    SUM(CAST(v AS HUGEINT) * v) AS s2, SUM(CAST(v AS HUGEINT) * v * v) AS s3
        |  FROM e GROUP BY 1)
        |SELECT event_type, n, s AS sum_cents, s // n AS mean_cents,
        |  CAST((n * s2 - CAST(s AS HUGEINT) * s) // (CAST(n AS HUGEINT) * (n - 1)) AS BIGINT) AS var_cents2,
        |  CAST((CAST(n AS HUGEINT) * n * s3 - 3 * CAST(n AS HUGEINT) * s * s2
        |    + 2 * CAST(s AS HUGEINT) * s * s) // (CAST(n AS HUGEINT) * n * n) AS BIGINT) AS m3_scaled,
        |  (CAST(n AS HUGEINT) * n * s3 - 3 * CAST(n AS HUGEINT) * s * s2
        |    + 2 * CAST(s AS HUGEINT) * s * s) > 0 AS right_skewed
        |FROM a ORDER BY event_type""".stripMargin,
    // q193: the bounded-claim pattern — the estimates are engine-internal,
    // the GK guarantee rows are the portable contract.
    "q193_quantile_accuracy" ->
      s"""WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem)
         |SELECT CAST(t.q * 1000 AS BIGINT) AS quantile_bp, n.n,
         |  CAST($QuantileEpsBp AS BIGINT) AS eps_bp, TRUE AS within_bound
         |FROM range(1, 10) t(q) CROSS JOIN n ORDER BY quantile_bp""".stripMargin,
    // q194: same sessionization, same tie order (+1 before −1 at the
    // same instant), same two-level prefix decomposition.
    "q194_peak_concurrency" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
         |g AS (SELECT user_id, us,
         |    CASE WHEN LAG(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
         |      OR us - LAG(us) OVER (PARTITION BY user_id ORDER BY us) > $ConcurrencySessionGapUs
         |      THEN 1 ELSE 0 END AS new_s
         |  FROM e),
         |s AS (SELECT user_id, us, SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM g),
         |iv AS (SELECT user_id, sid, MIN(us) AS s_start, MAX(us) AS s_end FROM s GROUP BY 1, 2),
         |dl AS (SELECT s_start AS us, 1 AS d FROM iv UNION ALL SELECT s_end, -1 FROM iv),
         |dd AS (SELECT us, d, us // 86400000000 AS day FROM dl),
         |rn AS (SELECT day, us, d, SUM(d) OVER (PARTITION BY day ORDER BY us, d DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run FROM dd),
         |pd AS (SELECT day, CAST(COUNT(*) FILTER (d = 1) AS BIGINT) AS n_starts,
         |    CAST(COUNT(*) FILTER (d = -1) AS BIGINT) AS n_ends,
         |    MAX(run) AS peak_in_day, SUM(d) AS net FROM rn GROUP BY day),
         |cr AS (SELECT day, n_starts, n_ends, peak_in_day,
         |    COALESCE(SUM(net) OVER (ORDER BY day
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS carry FROM pd)
         |SELECT day, n_starts, n_ends,
         |  CAST(GREATEST(carry, carry + peak_in_day) AS BIGINT) AS peak_concurrency
         |FROM cr ORDER BY day""".stripMargin,
    // q195: unrolled peel rounds (q139/q188 discipline) over the same
    // id-ordered edge set.
    "q195_kcore_peeling" -> {
      def round(r: Int): String = {
        val prev = s"e${r - 1}"
        s"""d$r AS MATERIALIZED (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM
           |  (SELECT u AS node FROM $prev UNION ALL SELECT v FROM $prev) GROUP BY 1),
           |k$r AS MATERIALIZED (SELECT node FROM d$r WHERE deg >= $KCoreK),
           |e$r AS MATERIALIZED (SELECT $prev.u, $prev.v FROM $prev
           |  JOIN k$r a ON $prev.u = a.node JOIN k$r b ON $prev.v = b.node),
           |r$r AS (SELECT CAST($r AS INTEGER) AS round,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT DISTINCT n FROM
           |    (SELECT u AS n FROM e$r UNION ALL SELECT v FROM e$r))) AS n_nodes,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM e$r) AS n_edges)"""
      }
      val body = (1 to KCoreRounds).map(round).mkString(",\n")
      val union = (1 to KCoreRounds).map(r => s"SELECT * FROM r$r").mkString(" UNION ALL ")
      s"""WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |e0 AS MATERIALIZED (SELECT DISTINCT a.pk AS u, b.pk AS v FROM li a
         |  JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
         |$body
         |$union ORDER BY round""".stripMargin
    },
    // q196: same (date, orderkey) sequence, same tier cuts, exact cents.
    "q196_pit_loyalty" ->
      """WITH o AS (SELECT o_custkey, o_orderkey, epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS us,
        |    CAST(o_totalprice * 100 AS BIGINT) AS cents FROM orders),
        |s AS (SELECT cents,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY us, o_orderkey) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS cnt FROM o),
        |t AS (SELECT cents,
        |    CASE WHEN rn <= 2 THEN 'bronze' WHEN rn <= 4 THEN 'silver' ELSE 'gold' END AS tier_as_was,
        |    CASE WHEN cnt <= 2 THEN 'bronze' WHEN cnt <= 4 THEN 'silver' ELSE 'gold' END AS tier_as_is
        |  FROM s)
        |SELECT tier_as_was, tier_as_is, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(cents) AS BIGINT) AS rev_cents
        |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q197: the oracle's serial row_number is bit-identical to the
    // engine's sharded PrefixSum rank (the q144 contract).
    "q197_batch_padding" ->
      s"""WITH l AS (SELECT doc_id, CAST(len(str_split(text, ' ')) AS BIGINT) AS len FROM documents),
         |a AS (SELECT 'arrival' AS policy, len,
         |    CAST(ROW_NUMBER() OVER (ORDER BY doc_id) AS BIGINT) AS rn FROM l
         |  UNION ALL SELECT 'sorted', len,
         |    CAST(ROW_NUMBER() OVER (ORDER BY len, doc_id) AS BIGINT) FROM l),
         |b AS (SELECT policy, (rn - 1) // $InferBatchSize AS batch,
         |    CAST(COUNT(*) AS BIGINT) AS n, CAST(MAX(len) AS BIGINT) AS mx,
         |    CAST(SUM(len) AS BIGINT) AS s
         |  FROM a GROUP BY 1, 2),
         |r AS (SELECT policy, CAST(COUNT(*) AS BIGINT) AS n_batches,
         |    CAST(SUM(s) AS BIGINT) AS total_tokens, CAST(SUM(n * mx) AS BIGINT) AS capacity
         |  FROM b GROUP BY 1)
         |SELECT policy, n_batches, total_tokens, capacity - total_tokens AS padded_tokens,
         |  (capacity - total_tokens) * 10000 // capacity AS waste_bp
         |FROM r ORDER BY policy""".stripMargin,
    // q198: identical portable hash, identical Poisson cut points,
    // identical order statistics.
    "q198_bootstrap_ci" -> {
      import graft.functions.Md5Hash.duckH31
      val h = duckH31("CAST(t.b AS VARCHAR) || ':' || CAST(u.user_id AS VARCHAR)")
      val Seq(t0, t1, t2, t3) = BootPoissonCuts
      s"""WITH u AS (SELECT user_id,
         |    CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS conv
         |  FROM events GROUP BY 1),
         |w AS (SELECT t.b, u.conv,
         |    CASE WHEN $h < $t0 THEN 0 WHEN $h < $t1 THEN 1 WHEN $h < $t2 THEN 2
         |         WHEN $h < $t3 THEN 3 ELSE 4 END AS w
         |  FROM u CROSS JOIN range(0, $BootB) t(b)),
         |r AS (SELECT b, CAST(SUM(w * conv) AS BIGINT) * 10000
         |    // CAST(SUM(w) AS BIGINT) AS rate_bp FROM w GROUP BY b),
         |o AS (SELECT rate_bp, CAST(ROW_NUMBER() OVER (ORDER BY rate_bp) AS BIGINT) AS rk FROM r),
         |ci AS (SELECT MAX(CASE WHEN rk = $BootCiLoRank THEN rate_bp END) AS ci_lo_bp,
         |    MAX(CASE WHEN rk = $BootCiHiRank THEN rate_bp END) AS ci_hi_bp FROM o),
         |base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         |    CAST(SUM(conv) AS BIGINT) * 10000 // CAST(COUNT(*) AS BIGINT) AS base_rate_bp FROM u)
         |SELECT base.n_users, base.base_rate_bp, CAST($BootB AS BIGINT) AS n_resamples,
         |  ci.ci_lo_bp, ci.ci_hi_bp
         |FROM base CROSS JOIN ci""".stripMargin
    },
    // q199: same (count desc, token) vocabulary order, same cut points.
    "q199_vocab_curve" ->
      s"""WITH c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM (SELECT unnest(str_split(text, ' ')) AS token FROM documents) GROUP BY 1),
         |r AS (SELECT c, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, token) AS BIGINT) AS rk,
         |    CAST(SUM(c) OVER () AS BIGINT) AS total, CAST(COUNT(*) OVER () AS BIGINT) AS nv
         |  FROM c),
         |v AS (SELECT UNNEST(ARRAY[${VocabCurveSizes.mkString(", ")}]) AS v)
         |SELECT CAST(v.v AS BIGINT) AS v, CAST(LEAST(v.v, r.nv) AS BIGINT) AS n_vocab_used,
         |  CAST(SUM(r.c) AS BIGINT) * 10000 // r.total AS coverage_bp
         |FROM r JOIN v ON r.rk <= v.v
         |GROUP BY v.v, r.total, r.nv ORDER BY v""".stripMargin,
    // q200: sequential-batch replay with brute-force Jaccard — the q62
    // recall-exactness argument batch by batch; the length prefilter
    // (5·min ≥ 4·max ⟸ j ≥ 0.8) is a pure optimization.
    "q200_stream_fuzzy_dedup" ->
      s"""WITH $fuzzyIngestCtePrefix,
         |r AS (${(0 to 3).map(b => s"SELECT CAST($b AS BIGINT) AS batch_id, doc_id FROM s$b")
            .mkString(" UNION ALL ")})
         |SELECT batch_id, doc_id FROM r ORDER BY batch_id, doc_id""".stripMargin,
    // q256: the compacted base must carry EXACTLY 48 band rows for every
    // doc of the replayed final corpus (seed + sequential survivors) —
    // the oracle recomputes membership from the q200 replay CTEs and the
    // store's expected multiplicity from the banding constant.
    "q256_sig_compaction" -> {
      val bands = graft.dedup.IncrementalDedup.FuzzyParams.bands
      s"""WITH $fuzzyIngestCtePrefix,
         |corpus AS (SELECT doc_id FROM st UNION ALL ${(0 to 3)
            .map(b => s"SELECT doc_id FROM s$b").mkString(" UNION ALL ")}),
         |parts AS (SELECT DISTINCT pid FROM (
         |  SELECT -1 AS pid FROM st UNION ALL ${(0 to 3)
            .map(b => s"SELECT $b AS pid FROM s$b").mkString(" UNION ALL ")}))
         |SELECT CAST((SELECT COUNT(*) FROM parts) AS BIGINT) AS n_folded_partitions,
         |  CAST($bands AS BIGINT) AS n_bands,
         |  CAST((SELECT COUNT(*) FROM corpus) * $bands AS BIGINT) AS n_rows,
         |  CAST((SELECT COUNT(DISTINCT doc_id) FROM corpus) AS BIGINT) AS n_distinct_sids,
         |  CAST((SELECT SUM(DISTINCT doc_id) FROM corpus) AS BIGINT) AS sid_sum""".stripMargin
    },
    // q201: same hour aggregate, same trailing RANGE windows, same
    // integer thresholds.
    "q201_slo_burn_rate" ->
      s"""WITH h AS (SELECT epoch_us(ts) // 3600000000 AS hour_id,
         |    CAST(COUNT(*) AS BIGINT) AS n_total,
         |    CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS n_err
         |  FROM events GROUP BY 1),
         |w AS (SELECT hour_id, n_total, n_err,
         |    SUM(n_err) OVER w6 AS e6, SUM(n_total) OVER w6 AS t6,
         |    SUM(n_err) OVER w24 AS e24, SUM(n_total) OVER w24 AS t24
         |  FROM h WINDOW
         |    w6 AS (ORDER BY hour_id RANGE BETWEEN 5 PRECEDING AND CURRENT ROW),
         |    w24 AS (ORDER BY hour_id RANGE BETWEEN 23 PRECEDING AND CURRENT ROW))
         |SELECT hour_id, n_total, n_err * 10000 // n_total AS err_1h_bp,
         |  CAST(e6 * 10000 // t6 AS BIGINT) AS err_6h_bp,
         |  CAST(e24 * 10000 // t24 AS BIGINT) AS err_24h_bp,
         |  (n_err * 10000 // n_total >= $SloPage1hBp AND e6 * 10000 // t6 >= $SloPage6hBp) AS page,
         |  (e24 * 10000 // t24 >= $SloTicket24hBp) AS ticket
         |FROM w ORDER BY hour_id""".stripMargin,
    // q202: the serial running sum is bit-identical to the sharded
    // PrefixSum (q144 contract); same start-offset batch rule.
    "q202_pixel_packing" ->
      s"""WITH m AS (SELECT doc_id,
         |    (32 + (doc_id % 8) * 16) * (32 + (doc_id % 5) * 32) AS px
         |  FROM documents WHERE doc_id % 3 = 0),
         |c AS (SELECT doc_id, px, SUM(px) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM m),
         |b AS (SELECT (cum - px) // $PixelBudget AS batch, px FROM c)
         |SELECT CAST(batch AS BIGINT) AS batch, CAST(COUNT(*) AS BIGINT) AS n_items,
         |  CAST(SUM(px) AS BIGINT) AS px_total,
         |  CAST(SUM(px) AS BIGINT) * 10000 // $PixelBudget AS fill_bp
         |FROM b GROUP BY batch ORDER BY batch""".stripMargin,
    // q203: the q127 fusion chain verbatim, then 10-row assembly —
    // diversity drop vs better-ranked passages, greedy budget pack.
    "q203_context_assembly" ->
      s"""WITH td AS (SELECT token, doc_id, dl, COUNT(*) AS tf
         |  FROM (SELECT doc_id, len(str_split(text, ' ')) AS dl, unnest(str_split(text, ' ')) AS token FROM documents)
         |  GROUP BY token, doc_id, dl),
         |q AS (SELECT DISTINCT unnest(str_split(text, ' ')) AS token
         |  FROM documents WHERE doc_id = (SELECT min(doc_id) FROM documents)),
         |n AS (SELECT COUNT(*) AS n_docs, CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS total_tokens FROM documents),
         |qtd AS (SELECT td.token, td.doc_id, td.dl, td.tf FROM td JOIN q USING (token)),
         |d AS (SELECT token, COUNT(*) AS df FROM qtd GROUP BY token),
         |tfidf AS (SELECT qtd.doc_id, CAST(SUM(tf * (n_docs * 1000000 // df)) AS BIGINT) AS score
         |  FROM qtd JOIN d USING (token) CROSS JOIN n
         |  GROUP BY qtd.doc_id ORDER BY score DESC, doc_id LIMIT 10),
         |bm AS (SELECT qtd.doc_id, CAST(SUM(CAST(FLOOR(CAST(n_docs * 1000000 // df AS DOUBLE)
         |    * (CAST(tf AS DOUBLE) * 2.2)
         |    / (CAST(tf AS DOUBLE) + (0.3 + 0.9 * (CAST(dl * n_docs AS DOUBLE) / CAST(total_tokens AS DOUBLE))))) AS BIGINT)) AS BIGINT) AS score
         |  FROM qtd JOIN d USING (token) CROSS JOIN n
         |  GROUP BY qtd.doc_id ORDER BY score DESC, doc_id LIMIT 10),
         |tr AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS tfidf_rank FROM tfidf),
         |br AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS bm25_rank FROM bm),
         |fused AS (SELECT COALESCE(tr.doc_id, br.doc_id) AS doc_id,
         |  CAST(COALESCE(1000000 // ($RrfK + tfidf_rank), 0)
         |    + COALESCE(1000000 // ($RrfK + bm25_rank), 0) AS BIGINT) AS rrf_score
         |  FROM tr FULL OUTER JOIN br ON tr.doc_id = br.doc_id),
         |f AS (SELECT doc_id, rrf_score FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 10),
         |fr AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id) AS rn0 FROM f),
         |wt AS (SELECT fr.doc_id, fr.rn0, list_distinct(str_split(dd.text, ' ')) AS toks,
         |    CAST(len(str_split(dd.text, ' ')) AS BIGINT) AS n_tokens
         |  FROM fr JOIN documents dd USING (doc_id)),
         |dr AS (SELECT DISTINCT a.doc_id FROM wt a JOIN wt b ON b.rn0 < a.rn0
         |  AND CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
         |    / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= $CtxDedupJaccard),
         |k AS (SELECT * FROM wt WHERE doc_id NOT IN (SELECT doc_id FROM dr)),
         |r AS (SELECT doc_id, n_tokens, CAST(ROW_NUMBER() OVER (ORDER BY rn0) AS BIGINT) AS ctx_rank,
         |    CAST(SUM(n_tokens) OVER (ORDER BY rn0
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum FROM k)
         |SELECT ctx_rank, doc_id, n_tokens, cum AS cum_tokens, cum <= $CtxTokenBudget AS included
         |FROM r ORDER BY ctx_rank""".stripMargin,
    // q204: the q33 bit-exact cosine folds restricted by the label
    // equi-predicate — pre-filtered, so top-k ranks eligible rows only.
    "q204_ann_filtered" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS ql FROM embeddings
         |  WHERE vec_id % 50 = 0 AND embedding IS NOT NULL),
         |s AS (SELECT q.query_id, e.vec_id AS neighbor_id,
         |  ${VectorOracles.cosine("q.qv", "e.embedding")} AS cosine
         |  FROM embeddings e JOIN q ON e.label = q.ql AND e.vec_id <> q.query_id
         |  WHERE e.embedding IS NOT NULL),
         |${VectorOracles.topKTail(5)}""".stripMargin,
    // q205: unrolled BFS rounds over the id-ordered edge set.
    "q205_khop_reach" -> {
      def hop(h: Int): String =
        s"""f$h AS MATERIALIZED (SELECT DISTINCT t AS node FROM sym
           |  JOIN f${h - 1} ON sym.s = f${h - 1}.node
           |  WHERE t NOT IN (SELECT node FROM v${h - 1})),
           |v$h AS MATERIALIZED (SELECT node FROM v${h - 1} UNION SELECT node FROM f$h),
           |r$h AS (SELECT CAST($h AS INTEGER) AS hop,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM f$h) AS frontier_size,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM v$h) AS visited_size)"""
      val body = (1 to BfsHops).map(hop).mkString(",\n")
      val union = (1 to BfsHops).map(h => s"SELECT * FROM r$h").mkString(" UNION ALL ")
      s"""WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |e0 AS MATERIALIZED (SELECT DISTINCT a.pk AS u, b.pk AS v FROM li a
         |  JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
         |sym AS MATERIALIZED (SELECT u AS s, v AS t FROM e0 UNION ALL SELECT v AS s, u AS t FROM e0),
         |sd AS (SELECT MIN(u) AS seed FROM e0),
         |f0 AS MATERIALIZED (SELECT seed AS node FROM sd),
         |v0 AS MATERIALIZED (SELECT node FROM f0),
         |$body
         |$union ORDER BY hop""".stripMargin
    },
    // q206: same delta split, same four-term delta-join algebra, exact
    // integer revenue; hash equality proves ΔV = γ(ΔA⋈B)⊎γ(A⋈ΔB)⊎γ(ΔA⋈ΔB).
    "q206_incremental_view" ->
      """WITH o AS (SELECT o_orderkey AS ok, o_custkey AS ck, o_orderkey % 5 = 0 AS od FROM orders),
        |l AS (SELECT l_orderkey AS ok,
        |    CAST(l_extendedprice * 100 AS BIGINT) * CAST((1 - l_discount) * 100 AS BIGINT) AS rev_u,
        |    (l_orderkey * 10 + l_linenumber) % 7 = 0 AS ld FROM lineitem),
        |v00 AS (SELECT ck, CAST(SUM(rev_u) AS BIGINT) AS rev FROM o JOIN l USING (ok)
        |  WHERE NOT od AND NOT ld GROUP BY ck),
        |vd0 AS (SELECT ck, CAST(SUM(rev_u) AS BIGINT) AS rev FROM o JOIN l USING (ok)
        |  WHERE od AND NOT ld GROUP BY ck),
        |v0d AS (SELECT ck, CAST(SUM(rev_u) AS BIGINT) AS rev FROM o JOIN l USING (ok)
        |  WHERE NOT od AND ld GROUP BY ck),
        |vdd AS (SELECT ck, CAST(SUM(rev_u) AS BIGINT) AS rev FROM o JOIN l USING (ok)
        |  WHERE od AND ld GROUP BY ck),
        |inc AS (SELECT ck, CAST(SUM(rev) AS BIGINT) AS rev_ivm FROM
        |  (SELECT * FROM v00 UNION ALL SELECT * FROM vd0
        |   UNION ALL SELECT * FROM v0d UNION ALL SELECT * FROM vdd) GROUP BY ck),
        |fv AS (SELECT ck, CAST(SUM(rev_u) AS BIGINT) AS rf FROM o JOIN l USING (ok) GROUP BY ck)
        |SELECT COALESCE(fv.ck, inc.ck) AS custkey, COALESCE(rf, 0) AS rev_full,
        |  COALESCE(rev_ivm, 0) AS rev_ivm, COALESCE(rf, 0) = COALESCE(rev_ivm, 0) AS ivm_exact
        |FROM fv FULL OUTER JOIN inc ON fv.ck = inc.ck
        |ORDER BY rev_full DESC, custkey LIMIT 20""".stripMargin,
    // q207: same dominance rewrite — strictly-cheaper RANGE max + same-
    // price partition max.
    "q207_skyline" ->
      """WITH p AS (SELECT p_partkey, CAST(p_retailprice * 100 AS BIGINT) AS price_cents,
        |    CAST(p_size AS BIGINT) AS p_size FROM part),
        |w AS (SELECT p_partkey, price_cents, p_size,
        |    MAX(p_size) OVER (ORDER BY price_cents
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_cheaper,
        |    MAX(p_size) OVER (PARTITION BY price_cents) AS best_same
        |  FROM p)
        |SELECT p_partkey, price_cents, p_size FROM w
        |WHERE (best_cheaper IS NULL OR best_cheaper < p_size) AND best_same = p_size
        |ORDER BY price_cents, p_partkey""".stripMargin,
    // q208: the q37/q87 scoring + threshold CTEs, then (dist, doc_id)
    // rank — identical to the TopKAggregator's better() order.
    "q208_uncertainty_sample" ->
      s"""WITH m AS (SELECT lang, doc_id, len(str_split(text, ' ')) AS n_tokens,
         |  CAST(length(text) - (len(str_split(text, ' ')) - 1) AS DOUBLE) / len(str_split(text, ' ')) AS avg_token_len,
         |  CAST(len(list_filter(str_split(text, ' '), x -> x IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'))) AS DOUBLE)
         |    / len(str_split(text, ' ')) AS stopword_ratio
         |FROM documents),
         |q AS (SELECT lang, doc_id,
         |  CAST(FLOOR(LEAST(1.0, (CAST(n_tokens AS DOUBLE)/100.0)*0.4 + stopword_ratio*3.0*0.3
         |    + CASE WHEN avg_token_len BETWEEN 3.0 AND 8.0 THEN 0.3 ELSE 0.0 END) * 1000000.0) AS BIGINT) AS quality_fp
         |FROM m),
         |t AS (SELECT lang, quantile_cont(quality_fp, 0.25) AS p25_fp FROM q GROUP BY lang),
         |d AS (SELECT q.lang, q.doc_id, q.quality_fp,
         |    ABS(CAST(q.quality_fp AS DOUBLE) - t.p25_fp) AS dist
         |  FROM q JOIN t USING (lang)),
         |r AS (SELECT lang, doc_id, quality_fp, dist,
         |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY dist, doc_id) AS rk FROM d)
         |SELECT lang, CAST(rk AS BIGINT) AS "rank", doc_id, quality_fp,
         |  CAST(FLOOR(dist) AS BIGINT) AS dist_fp
         |FROM r WHERE rk <= $UncertaintyK ORDER BY lang, rk, doc_id""".stripMargin,
    // q209: per-element floors before the sums; HUGEINT mirrors
    // DECIMAL(38,0) and // mirrors div.
    "q209_whitening_stats" -> {
      import graft.similarity.Pq.Dim
      s"""WITH f AS (SELECT CAST(t.j AS INTEGER) - 1 AS dim,
         |    CAST(FLOOR(CAST(e.embedding[CAST(t.j AS INTEGER)] AS DOUBLE) * 1000000) AS BIGINT) AS f
         |  FROM embeddings e, UNNEST(range(1, $Dim + 1)) AS t(j)
         |  WHERE e.embedding IS NOT NULL AND len(e.embedding) >= $Dim),
         |a AS (SELECT dim, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(f) AS BIGINT) AS s,
         |    SUM(CAST(f AS HUGEINT) * f) AS s2 FROM f GROUP BY dim)
         |SELECT dim, n, s // n AS mean_fp,
         |  CAST((n * s2 - CAST(s AS HUGEINT) * s) // (CAST(n AS HUGEINT) * n) AS BIGINT) AS var_fp2
         |FROM a ORDER BY dim""".stripMargin
    },
    // q210: exact pair counts replay; the HLL estimate rows are the
    // bounded claim (q42/q79 pattern).
    "q210_hll_intersection" -> {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val flagCols = types.map(t =>
        s"MAX(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS f_$t").mkString(", ")
      val pairRows = (for {
        i <- types.indices; j <- types.indices if i < j
        (a, b) = (types(i), types(j))
      } yield
        s"""SELECT '$a' AS type_a, '$b' AS type_b,
           |  CAST(SUM(CASE WHEN f_$a = 1 AND f_$b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS exact_inter,
           |  CAST(SUM(CASE WHEN f_$a = 1 OR f_$b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS exact_union,
           |  TRUE AS within_bound FROM fl""").mkString("\nUNION ALL ")
      s"""WITH fl AS (SELECT user_id, $flagCols FROM events GROUP BY user_id)
         |$pairRows
         |ORDER BY type_a, type_b""".stripMargin
    },
    // q211: same (us, event_id) step order, same integer ppm model.
    "q211_path_likelihood" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type AS f FROM events),
         |s AS (SELECT user_id, f,
         |    LEAD(f) OVER (PARTITION BY user_id ORDER BY us, event_id) AS t FROM e),
         |st AS (SELECT user_id, f, t FROM s WHERE t IS NOT NULL),
         |m AS (SELECT f, t, CAST(COUNT(*) AS BIGINT) AS c FROM st GROUP BY 1, 2),
         |m2 AS (SELECT f, t, CAST(c * 1000000 // SUM(c) OVER (PARTITION BY f) AS BIGINT) AS p_ppm FROM m),
         |sc AS (SELECT st.user_id, CAST(COUNT(*) AS BIGINT) AS n_steps,
         |    CAST(SUM(m2.p_ppm) // COUNT(*) AS BIGINT) AS score_ppm
         |  FROM st JOIN m2 USING (f, t) GROUP BY 1)
         |SELECT user_id, n_steps, score_ppm FROM sc
         |ORDER BY score_ppm, user_id LIMIT $PathOutlierK""".stripMargin,
    // q212: same layouts, same (event_id) within-file order, same break
    // rule.
    "q212_clustering_factor" ->
      s"""WITH mx AS (SELECT MAX(user_id) AS maxu FROM events),
         |r AS (SELECT e.event_id, e.user_id, 'time' AS layout,
         |    epoch_us(ts) // 3600000000 AS file FROM events e
         |  UNION ALL SELECT e.event_id, e.user_id, 'user_clustered',
         |    e.user_id * $ZoneMapBuckets // (mx.maxu + 1) FROM events e CROSS JOIN mx),
         |b AS (SELECT layout,
         |    CASE WHEN LAG(user_id) OVER w IS NULL OR user_id < LAG(user_id) OVER w
         |      THEN 1 ELSE 0 END AS brk
         |  FROM r WINDOW w AS (PARTITION BY layout, file ORDER BY event_id))
         |SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_rows, CAST(SUM(brk) AS BIGINT) AS n_runs,
         |  CAST(COUNT(*) AS BIGINT) * 100 // CAST(SUM(brk) AS BIGINT) AS avg_run_len_x100
         |FROM b GROUP BY layout ORDER BY layout""".stripMargin,
    // q213: same boundaries, same integer pro-rata interpolation, same
    // zero-width guard — the estimates replay exactly.
    "q213_histogram_accuracy" -> {
      val B = HistBins
      val depthSel = (1L until B).map(k =>
        s"MIN(CASE WHEN cum >= $k * s.n // $B THEN v END) AS b$k").mkString(", ")
      val depthBins = (0L until B).map { b =>
        val lo = if (b == 0) "s.mn" else s"bd.b$b"
        val hi = if (b == B - 1) "s.mx + 1" else s"bd.b${b + 1}"
        s"SELECT 'depth' AS htype, CAST($b AS BIGINT) AS bin, $lo AS lo, $hi AS hi FROM bd CROSS JOIN s"
      }.mkString("\nUNION ALL ")
      s"""WITH vals AS (SELECT CAST(l_extendedprice * 100 AS BIGINT) AS v FROM lineitem),
         |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(MIN(v) AS BIGINT) AS mn,
         |    CAST(MAX(v) AS BIGINT) AS mx FROM vals),
         |h AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM vals GROUP BY v),
         |hc AS (SELECT v, c, SUM(c) OVER (ORDER BY v
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM h),
         |bd AS (SELECT $depthSel FROM hc CROSS JOIN s),
         |bins AS (
         |  SELECT 'width' AS htype, CAST(t.b AS BIGINT) AS bin,
         |    s.mn + t.b * (s.mx - s.mn + 1) // $B AS lo,
         |    s.mn + (t.b + 1) * (s.mx - s.mn + 1) // $B AS hi
         |  FROM range(0, $B) t(b) CROSS JOIN s
         |  UNION ALL $depthBins),
         |bc AS (SELECT bins.htype, bins.bin, bins.lo, bins.hi, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM bins JOIN vals ON vals.v >= bins.lo AND vals.v < bins.hi
         |  GROUP BY 1, 2, 3, 4),
         |p AS (SELECT CAST(t.i AS BIGINT) AS pred, s.mn + t.i * (s.mx - s.mn) // 20 AS p_lo,
         |    s.mn + (t.i + 5) * (s.mx - s.mn) // 20 AS p_hi
         |  FROM range(0, $HistPreds) t(i) CROSS JOIN s),
         |e AS (SELECT p.pred, bc.htype,
         |    CAST(SUM(CASE WHEN bc.hi > bc.lo THEN
         |      bc.c * GREATEST(0, LEAST(bc.hi, p.p_hi + 1) - GREATEST(bc.lo, p.p_lo)) // (bc.hi - bc.lo)
         |      ELSE 0 END) AS BIGINT) AS est
         |  FROM bc CROSS JOIN p GROUP BY 1, 2),
         |ew AS (SELECT pred, MAX(CASE WHEN htype = 'width' THEN est END) AS est_width,
         |    MAX(CASE WHEN htype = 'depth' THEN est END) AS est_depth FROM e GROUP BY pred),
         |ex AS (SELECT p.pred, CAST(COUNT(*) AS BIGINT) AS exact0
         |  FROM vals JOIN p ON vals.v >= p.p_lo AND vals.v <= p.p_hi GROUP BY 1)
         |SELECT p.pred, p.p_lo, p.p_hi, COALESCE(ex.exact0, 0) AS exact,
         |  ew.est_width, ew.est_depth,
         |  ABS(ew.est_width - COALESCE(ex.exact0, 0)) * 10000 // s.n AS err_width_bp,
         |  ABS(ew.est_depth - COALESCE(ex.exact0, 0)) * 10000 // s.n AS err_depth_bp
         |FROM p LEFT JOIN ex ON p.pred = ex.pred JOIN ew ON p.pred = ew.pred CROSS JOIN s
         |ORDER BY p.pred""".stripMargin
    },
    // q214: the q27 pair CTE + identical list algebra; the sample is
    // sorted-then-sliced so the strings match byte for byte.
    "q214_neardup_diff" ->
      """WITH t AS (SELECT doc_id, list_distinct(str_split(text, ' ')) AS toks FROM documents),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.toks AS ta, b.toks AS tb
        |  FROM t a JOIN t b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.95)
        |SELECT id_a, id_b,
        |  CAST(len(list_intersect(ta, tb)) AS BIGINT) AS shared,
        |  CAST(len(list_filter(ta, x -> NOT list_contains(tb, x))) AS BIGINT) AS only_a,
        |  CAST(len(list_filter(tb, x -> NOT list_contains(ta, x))) AS BIGINT) AS only_b,
        |  COALESCE(array_to_string(list_sort(list_filter(tb, x -> NOT list_contains(ta, x)))[1:3], ','), '') AS added_sample
        |FROM p ORDER BY id_a, id_b""".stripMargin,
    // q215: HUGEINT mirrors DECIMAL(38,0); same margins, same integer
    // chi-square cells.
    "q215_independence_test" ->
      """WITH c AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
        |  FROM documents GROUP BY 1, 2),
        |m AS (SELECT lang, source, o,
        |    CAST(SUM(o) OVER (PARTITION BY lang) AS BIGINT) AS r,
        |    CAST(SUM(o) OVER (PARTITION BY source) AS BIGINT) AS c,
        |    CAST(SUM(o) OVER () AS BIGINT) AS n FROM c),
        |k AS (SELECT lang, source, o, r * c * 100 // n AS expected_x100,
        |    CAST((CAST(o * n - r * c AS HUGEINT) * (o * n - r * c) * 10000)
        |      // (CAST(n AS HUGEINT) * r * c) AS BIGINT) AS cell_bp FROM m)
        |SELECT lang, source, o, expected_x100, cell_bp,
        |  CAST(SUM(cell_bp) OVER () AS BIGINT) AS total_bp
        |FROM k ORDER BY lang, source""".stripMargin,
    // q216: the EXISTS stays a semi-join in both engines — DuckDB's
    // EXISTS, Spark's LeftSemi.
    "q216_priority_returns" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // q217: same smoothed integer rate ratios, same (ratio desc, token)
    // cuts per direction.
    "q217_token_keyness" ->
      s"""WITH t AS (SELECT doc_id % 2 AS snap, unnest(str_split(text, ' ')) AS token FROM documents),
         |c0 AS (SELECT token,
         |    CAST(SUM(CASE WHEN snap = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         |    CAST(SUM(CASE WHEN snap = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
         |  FROM t GROUP BY token),
         |c1 AS (SELECT token, ca, cb,
         |    CAST(SUM(ca) OVER () AS BIGINT) AS ta, CAST(SUM(cb) OVER () AS BIGINT) AS tb,
         |    CAST(COUNT(*) OVER () AS BIGINT) AS v FROM c0),
         |c AS (SELECT token, ca, cb,
         |    CAST(CAST(ca + 1 AS HUGEINT) * (tb + v) * 10000 // (CAST(cb + 1 AS HUGEINT) * (ta + v)) AS BIGINT) AS ab_bp,
         |    CAST(CAST(cb + 1 AS HUGEINT) * (ta + v) * 10000 // (CAST(ca + 1 AS HUGEINT) * (tb + v)) AS BIGINT) AS ba_bp
         |  FROM c1 WHERE ca + cb >= $KeynessMinCount),
         |ta2 AS (SELECT 'a_over_b' AS direction, token, ca, cb, ab_bp AS ratio_bp
         |  FROM c ORDER BY ab_bp DESC, token LIMIT $KeynessK),
         |tb2 AS (SELECT 'b_over_a' AS direction, token, ca, cb, ba_bp AS ratio_bp
         |  FROM c ORDER BY ba_bp DESC, token LIMIT $KeynessK)
         |SELECT * FROM (SELECT * FROM ta2 UNION ALL SELECT * FROM tb2)
         |ORDER BY direction, ratio_bp DESC, token""".stripMargin,
    // q218: the engine builds + box-walks a real ISO-BMFF container per
    // document; every generated field is a pure function of doc_id, so the
    // oracle replays the expectations arithmetically. Container byte count
    // derives from the fixed box layout: ftyp 24 + moov header 8 + mvhd 108
    // + 173 per trak (tkhd 92 + mdia 73 + trak header 8) + mdat 8 + payload
    // (ASCII corpus: char length == byte length, the q50 precedent).
    "q218_mp4_metadata" ->
      """SELECT doc_id AS media_id, 'isom' AS brand,
        |  CAST(doc_id % 900 + 100 AS BIGINT) AS duration_ms,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END AS BIGINT) AS n_tracks,
        |  CAST(320 + (doc_id % 4) * 16 AS BIGINT) AS width,
        |  CAST(240 + (doc_id % 3) * 16 AS BIGINT) AS height,
        |  TRUE AS has_video, doc_id % 2 = 0 AS has_audio,
        |  CAST(148 + 173 * (CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END)
        |    + coalesce(length(text), 0) AS BIGINT) AS n_bytes
        |FROM documents ORDER BY media_id""".stripMargin,
    // q219: same round-trip discipline as q218 for PNG/GIF/JPEG headers —
    // every generated field is a pure function of doc_id; container sizes
    // derive from the fixed layouts (PNG 57 + body, GIF 14 + body,
    // JPEG 23 + body; ASCII corpus, the q50 precedent).
    "q219_image_headers" ->
      """SELECT doc_id AS media_id,
        |  (['png','gif','jpeg'])[CAST(doc_id % 3 AS INTEGER) + 1] AS format,
        |  CAST(16 + doc_id % 1009 AS BIGINT) AS width,
        |  CAST(16 + doc_id % 797 AS BIGINT) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 1 THEN doc_id % 8 + 1 ELSE 8 END AS BIGINT) AS bit_depth,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 57 WHEN 1 THEN 14 ELSE 23 END
        |    + coalesce(length(text), 0) AS BIGINT) AS n_bytes
        |FROM documents ORDER BY media_id""".stripMargin,
    // q220: the q33 brute-force oracle with the hard-negative band filter
    // applied before ranking — cosine is the identical left fold, so band
    // membership and ranks replay bit-for-bit.
    "q220_hard_negatives" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
         |  WHERE vec_id % 50 = 0 AND embedding IS NOT NULL),
         |s0 AS (SELECT q.query_id, e.vec_id AS neighbor_id,
         |  ${VectorOracles.cosine("q.qv", "e.embedding")} AS cosine
         |  FROM q JOIN embeddings e ON e.vec_id <> q.query_id
         |  WHERE e.embedding IS NOT NULL),
         |s AS (SELECT * FROM s0 WHERE cosine >= $HardNegLo AND cosine < $HardNegHi),
         |${VectorOracles.topKTail(5)}""".stripMargin,
    // q221: identical block / rank / boundary-stitch rule, identical
    // verifier — integer window math plus levenshtein, both portable.
    "q221_sorted_neighborhood" ->
      s"""WITH c0 AS (SELECT c_custkey, c_name, c_nationkey,
         |    CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS cents FROM customer),
         |r AS (SELECT *, (cents + 1000000) // $SnmBlockCents AS blk FROM c0),
         |r2 AS (SELECT *,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY blk ORDER BY cents, c_custkey) AS BIGINT) AS rn,
         |    CAST(COUNT(*) OVER (PARTITION BY blk) AS BIGINT) AS cnt FROM r),
         |p AS (
         |  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b, a.c_name AS na, b.c_name AS nb,
         |    a.c_nationkey AS nka, b.c_nationkey AS nkb, a.cents AS cents_a, b.cents AS cents_b
         |  FROM r2 a JOIN r2 b ON a.blk = b.blk AND b.rn - a.rn BETWEEN 1 AND $SnmWindow
         |  UNION ALL
         |  SELECT a.c_custkey, b.c_custkey, a.c_name, b.c_name,
         |    a.c_nationkey, b.c_nationkey, a.cents, b.cents
         |  FROM r2 a JOIN r2 b ON a.blk + 1 = b.blk AND a.cnt - a.rn + b.rn <= $SnmWindow)
         |SELECT id_a, id_b, cents_a, cents_b, cents_b - cents_a AS cents_gap
         |FROM p WHERE nka = nkb AND levenshtein(na, nb) <= 1
         |ORDER BY id_a, id_b""".stripMargin,
    // q222: the q36/q37/q38/q65 primitive replications composed into the
    // same five predicates; the sums and the unpivot are plain integers.
    "q222_filter_ablation" -> {
      val en = TextAnalysis.StopwordProfiles("en").map(w => s"'$w'").mkString(", ")
      val names = Seq("len", "stop", "tlen", "lang", "pii")
      val fails = names
        .map(n => s"CAST(SUM(CASE WHEN NOT p_$n THEN 1 ELSE 0 END) AS BIGINT) AS f_$n")
        .mkString(",\n    ")
      val uniques = names.map { n =>
        val others = names.filter(_ != n).map(o => s"p_$o").mkString(" AND ")
        s"CAST(SUM(CASE WHEN NOT p_$n AND $others THEN 1 ELSE 0 END) AS BIGINT) AS u_$n"
      }.mkString(",\n    ")
      val allPass = names.map(n => s"p_$n").mkString(" AND ")
      val stack = names
        .map(n => s"SELECT '$n' AS filter, n_docs, f_$n AS n_fail, u_$n AS n_unique_fail, pass_all FROM a")
        .mkString("\n  UNION ALL ")
      s"""WITH m AS (SELECT doc_id, lang, text,
         |    CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    CAST(len(list_filter(str_split(text, ' '), x -> x IN ($en))) AS BIGINT) AS hits,
         |    CAST(length(text) AS BIGINT) AS n_chars,
         |    list_distinct(str_split(lower(text), ' ')) AS toks
         |  FROM documents WHERE text IS NOT NULL),
         |s AS (SELECT *, $duckLangIdBest AS best FROM m),
         |f AS (SELECT
         |    n_tokens >= $AblationMinTokens AS p_len,
         |    hits * 20 >= n_tokens AS p_stop,
         |    n_chars - n_tokens + 1 >= n_tokens * 3 AND n_chars - n_tokens + 1 <= n_tokens * 8 AS p_tlen,
         |    ($duckLangIdDecode) = lang AS p_lang,
         |    len(regexp_extract_all(text, '${TextAnalysis.EmailPattern}'))
         |      + len(regexp_extract_all(regexp_replace(text, '${TextAnalysis.EmailPattern}', '<EMAIL>', 'g'),
         |          '${TextAnalysis.PhonePattern}')) = 0 AS p_pii
         |  FROM s),
         |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    $fails,
         |    $uniques,
         |    CAST(SUM(CASE WHEN $allPass THEN 1 ELSE 0 END) AS BIGINT) AS pass_all
         |  FROM f),
         |l AS ($stack)
         |SELECT filter, n_docs, n_fail, n_fail * 10000 // n_docs AS fail_bp,
         |  n_unique_fail, pass_all AS n_pass_all
         |FROM l ORDER BY filter""".stripMargin
    },
    // q223: the q25/q26 keep-min rules chained, near-dup components from
    // the q56 recursive-reachability CTE, keep-min restricted to the
    // tokenset-stage survivors — the exact cascade the engine runs.
    "q223_dedup_funnel" ->
      """WITH RECURSIVE t AS (SELECT doc_id, list_distinct(str_split(text, ' ')) AS toks FROM documents),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |      FROM t a JOIN t b ON a.doc_id < b.doc_id
        |      WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.95),
        |e AS (SELECT id_a AS src, id_b AS dst FROM p UNION SELECT id_b, id_a FROM p),
        |reach(id, r) AS (
        |  SELECT src, dst FROM e
        |  UNION
        |  SELECT reach.id, e.dst FROM reach JOIN e ON reach.r = e.src),
        |comp AS (SELECT id, LEAST(id, MIN(r)) AS comp FROM reach GROUP BY id),
        |s1 AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        |s2 AS (SELECT MIN(doc_id) AS doc_id FROM documents
        |  WHERE doc_id IN (SELECT doc_id FROM s1)
        |  GROUP BY md5(array_to_string(list_sort(list_distinct(str_split(text, ' '))), ' '))),
        |d2 AS (SELECT s2.doc_id, comp.comp FROM s2 LEFT JOIN comp ON s2.doc_id = comp.id),
        |keep AS (SELECT comp, MIN(doc_id) AS keep_id FROM d2 WHERE comp IS NOT NULL GROUP BY comp),
        |s3 AS (SELECT d2.doc_id FROM d2 LEFT JOIN keep USING (comp)
        |  WHERE d2.comp IS NULL OR d2.doc_id = keep.keep_id),
        |n AS (SELECT 0 AS idx, 'raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n FROM documents
        |  UNION ALL SELECT 1, 'exact', CAST(COUNT(*) AS BIGINT) FROM s1
        |  UNION ALL SELECT 2, 'tokenset', CAST(COUNT(*) AS BIGINT) FROM s2
        |  UNION ALL SELECT 3, 'neardup', CAST(COUNT(*) AS BIGINT) FROM s3),
        |w AS (SELECT idx, stage, n, LAG(n) OVER (ORDER BY idx) AS n_in FROM n)
        |SELECT stage, n_in, n AS n_out, n_in - n AS n_removed,
        |  (n_in - n) * 10000 // n_in AS removed_bp
        |FROM w WHERE idx > 0 ORDER BY stage""".stripMargin,
    // q224: sign bits replayed per dimension (DuckDB arrays are 1-based),
    // Hamming via xor+bit_count on the two BIGINT halves, identical
    // candidate and rerank tie-breaks.
    "q224_ann_binary_quant" -> {
      def bits(lo: Int, hi: Int) = (lo until hi).map(i =>
        s"CAST(CASE WHEN e.embedding[${i + 1}] > 0.0 THEN ${1L << (i % 32)} ELSE 0 END AS BIGINT)")
        .mkString("\n    + ")
      s"""WITH c AS (SELECT vec_id, embedding,
         |    ${bits(0, 32)} AS b_lo,
         |    ${bits(32, 64)} AS b_hi
         |  FROM embeddings e WHERE embedding IS NOT NULL AND len(embedding) >= 64),
         |q AS (SELECT vec_id AS query_id, embedding AS qv, b_lo AS q_lo, b_hi AS q_hi
         |  FROM c WHERE vec_id % 50 = 0),
         |h AS (SELECT q.query_id, c.vec_id AS neighbor_id,
         |    CAST(bit_count(xor(c.b_lo, q.q_lo)) + bit_count(xor(c.b_hi, q.q_hi)) AS BIGINT) AS hamming
         |  FROM q JOIN c ON c.vec_id <> q.query_id),
         |cand AS (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY hamming, neighbor_id) AS crn
         |    FROM h) WHERE crn <= $BinaryAnnCandidates),
         |s AS (SELECT cand.query_id, cand.neighbor_id,
         |    ${VectorOracles.cosine("q.qv", "n.embedding")} AS cosine
         |  FROM cand JOIN q ON cand.query_id = q.query_id
         |  JOIN c n ON cand.neighbor_id = n.vec_id),
         |${VectorOracles.topKTail(BinaryAnnK)}""".stripMargin
    },
    // q225: dialect-equivalent recursion (div → //); same heap-parent
    // relation, same per-level rollup.
    "q225_recursive_hierarchy" ->
      """WITH RECURSIVE walk(id, anc, depth) AS (
        |  SELECT c_custkey, c_custkey, 0 FROM customer
        |  UNION ALL
        |  SELECT id, (anc - 1) // 2, depth + 1 FROM walk WHERE anc > 0),
        |d AS (SELECT id, MAX(depth) AS depth FROM walk GROUP BY id)
        |SELECT d.depth, CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |  MIN(d.id) AS min_id, MAX(d.id) AS max_id,
        |  CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM d JOIN customer ON d.id = c_custkey
        |GROUP BY d.depth ORDER BY d.depth""".stripMargin,
    // q226: identical histogram → CDF windows → HUGEINT cross products →
    // bp division; argmax location ties resolved by MIN(cents).
    "q226_ks_drift" ->
      """WITH ev AS (SELECT event_type, CAST(value * 100 AS BIGINT) AS cents
        |  FROM events WHERE event_type IN ('purchase', 'view')),
        |h AS (SELECT cents,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |  FROM ev GROUP BY cents),
        |c AS (SELECT cents,
        |    CAST(SUM(c1) OVER () AS BIGINT) AS n1, CAST(SUM(c2) OVER () AS BIGINT) AS n2,
        |    SUM(c1) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cum1,
        |    SUM(c2) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cum2
        |  FROM h),
        |d AS (SELECT cents, n1, n2,
        |    abs(CAST(cum1 AS HUGEINT) * n2 - CAST(cum2 AS HUGEINT) * n1) AS dnum FROM c),
        |m AS (SELECT cents, n1, n2, dnum, MAX(dnum) OVER () AS mx FROM d)
        |SELECT n1, n2,
        |  CAST(mx * 10000 // (CAST(n1 AS HUGEINT) * n2) AS BIGINT) AS ks_bp,
        |  MIN(cents) AS ks_at_cents
        |FROM m WHERE dnum = mx GROUP BY n1, n2, mx""".stripMargin,
    // q227: the greedy trajectory unrolled as chained CTEs — the q181
    // (x−y)² fold per pair, LEAST over raw doubles, floor once, argmax on
    // (floored dist DESC, vec_id) — exactly the engine's selection rule.
    "q227_kcenter_seeds" -> {
      import graft.similarity.Pq.Dim
      def fold(a: String, b: String) =
        s"list_reduce(list_transform(range(1, ${Dim + 1}), " +
          s"j -> (CAST($a[j] AS DOUBLE) - CAST($b[j] AS DOUBLE)) * (CAST($a[j] AS DOUBLE) - CAST($b[j] AS DOUBLE))), " +
          "(acc, v) -> acc + v)"
      val chain = (2 to KCenterSeeds).map { k =>
        val pf = s"f${k - 1}"
        s"""s$k AS (SELECT vec_id, embedding, dfp FROM $pf ORDER BY dfp DESC, vec_id LIMIT 1),
           |d$k AS (SELECT $pf.vec_id, $pf.embedding,
           |    LEAST($pf.dd, ${fold(s"$pf.embedding", s"s$k.embedding")}) AS dd
           |  FROM $pf CROSS JOIN s$k),
           |f$k AS (SELECT vec_id, embedding, dd, CAST(FLOOR(dd * 1000000.0) AS BIGINT) AS dfp FROM d$k)""".stripMargin
      }.mkString(",\n")
      val seedRows = (2 to KCenterSeeds)
        .map(k => s"UNION ALL SELECT 'seed', $k, vec_id, dfp FROM s$k").mkString("\n")
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings
         |  WHERE embedding IS NOT NULL AND len(embedding) >= $Dim),
         |s1 AS (SELECT vec_id, embedding FROM e ORDER BY vec_id LIMIT 1),
         |d1 AS (SELECT e.vec_id, e.embedding, ${fold("e.embedding", "s1.embedding")} AS dd
         |  FROM e CROSS JOIN s1),
         |f1 AS (SELECT vec_id, embedding, dd, CAST(FLOOR(dd * 1000000.0) AS BIGINT) AS dfp FROM d1),
         |$chain,
         |rad AS (SELECT vec_id, dfp FROM f$KCenterSeeds ORDER BY dfp DESC, vec_id LIMIT 1)
         |SELECT 'seed' AS role, CAST(1 AS BIGINT) AS seed_idx, s1.vec_id, CAST(0 AS BIGINT) AS dist_fp FROM s1
         |$seedRows
         |UNION ALL SELECT 'radius', ${KCenterSeeds + 1}, vec_id, dfp FROM rad
         |ORDER BY seed_idx""".stripMargin
    },
    // q229: identical word packing (32-bit payloads in BIGINT carriers),
    // bit_or aggregate, popcount intersections, integer Jaccard.
    "q229_bitmap_membership" ->
      s"""WITH b AS (SELECT event_type, user_id // 32 AS w,
        |    CAST(bit_or(CAST(1 AS BIGINT) << CAST(user_id % 32 AS INTEGER)) AS BIGINT) AS word
        |  FROM events WHERE value >= $BitmapValueFloor GROUP BY 1, 2),
        |card AS (SELECT event_type, CAST(SUM(bit_count(word)) AS BIGINT) AS n FROM b GROUP BY 1),
        |p AS (SELECT a.event_type AS type_a, b2.event_type AS type_b,
        |    CAST(SUM(bit_count(a.word & b2.word)) AS BIGINT) AS n_both
        |  FROM b a JOIN b b2 ON a.w = b2.w AND a.event_type < b2.event_type
        |  GROUP BY 1, 2)
        |SELECT p.type_a, p.type_b, ca.n AS n_a, cb.n AS n_b, p.n_both,
        |  CAST(p.n_both * 10000 // (ca.n + cb.n - p.n_both) AS BIGINT) AS jaccard_bp
        |FROM p JOIN card ca ON p.type_a = ca.event_type
        |JOIN card cb ON p.type_b = cb.event_type
        |ORDER BY type_a, type_b""".stripMargin,
    // q230: the union-set signature recomputed from the same md5-h31
    // permutation family (q29's parameters); TRUE is the mergeability
    // claim — the engine's aggregated per-doc mins must equal it.
    "q230_minhash_union" ->
      s"""WITH t AS (SELECT lang, unnest(list_distinct(str_split(text, ' '))) AS token
         |  FROM documents WHERE text IS NOT NULL),
         |u AS (SELECT DISTINCT lang, token FROM t),
         |h AS (SELECT lang, ${duckH31("token")} AS th FROM u),
         |s AS (SELECT lang, p.sig_idx,
         |    MIN((p.pa * th + p.pb) % 2147483647) AS minhash
         |  FROM h CROSS JOIN (VALUES $minhashParamValues) AS p(sig_idx, pa, pb)
         |  GROUP BY lang, p.sig_idx)
         |SELECT lang, CAST(sig_idx AS INTEGER) AS sig_idx,
         |  CAST(minhash AS BIGINT) AS minhash, TRUE AS merge_exact
         |FROM s ORDER BY lang, sig_idx""".stripMargin,
    // q231: per-slot max + slot-ordered left fold — float addition order
    // pinned on both sides, so the MaxSim scores (and therefore ranks)
    // replay bit-for-bit; DuckDB arrays are 1-based only inside the
    // cosine fold, which VectorOracles already handles.
    "q231_maxsim_retrieval" ->
      s"""WITH e AS (SELECT vec_id, vec_id // $MaxSimSlots AS doc,
         |    vec_id % $MaxSimSlots AS slot, embedding
         |  FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) >= 64),
         |q AS (SELECT doc AS query_id, slot AS qslot, embedding AS qv
         |  FROM e WHERE doc % $MaxSimQueryMod = 0),
         |sc AS (SELECT q.query_id, e.doc AS neighbor_id, q.qslot,
         |    ${VectorOracles.cosine("q.qv", "e.embedding")} AS c
         |  FROM q JOIN e ON e.doc <> q.query_id),
         |sm AS (SELECT query_id, neighbor_id, qslot, MAX(c) AS m
         |  FROM sc WHERE c IS NOT NULL GROUP BY 1, 2, 3),
         |s AS (SELECT query_id, neighbor_id,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(m ORDER BY qslot)),
         |      (a, x) -> a + x) AS cosine
         |  FROM sm GROUP BY 1, 2),
         |rk AS (SELECT query_id, neighbor_id, cosine,
         |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
         |  FROM s WHERE cosine IS NOT NULL)
         |SELECT query_id, neighbor_id, CAST(rn AS INTEGER) AS "rank", cosine AS maxsim
         |FROM rk WHERE rn <= $MaxSimK ORDER BY query_id, rn""".stripMargin,
    // q232: brute-force pairs replay the banded candidates exactly (the
    // banding guarantee is complete at hamming ≤ 3); truth is the q27
    // brute-force Jaccard ≥ 0.95 pair set.
    "q232_simhash_pr_sweep" ->
      s"""WITH $duckSimhash,
         |cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
         |  FROM s a JOIN s b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sig, b.sig)) <= $SimhashSweepMax),
         |t AS (SELECT doc_id, list_distinct(str_split(text, ' ')) AS toks FROM documents),
         |tp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM t a JOIN t b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
         |    / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.95),
         |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM tp),
         |j AS (SELECT c.hamming,
         |    CASE WHEN tp.id_a IS NOT NULL THEN 1 ELSE 0 END AS hit
         |  FROM cand c LEFT JOIN tp ON c.id_a = tp.id_a AND c.id_b = tp.id_b),
         |sw AS (SELECT u.t, CAST(COUNT(*) AS BIGINT) AS n_pred, CAST(SUM(hit) AS BIGINT) AS n_hit
         |  FROM j, UNNEST(range(j.hamming, ${SimhashSweepMax + 1})) AS u(t) GROUP BY u.t)
         |SELECT CAST(t AS INTEGER) AS max_hamming, n_pred, nt.n_truth, n_hit,
         |  n_hit * 10000 // n_pred AS precision_bp,
         |  CASE WHEN nt.n_truth = 0 THEN NULL
         |       ELSE n_hit * 10000 // nt.n_truth END AS recall_bp
         |FROM sw CROSS JOIN nt ORDER BY max_hamming""".stripMargin,
    // q233: the corruption rule is structural (first byte mangled → the
    // line can never parse as JSON), so the oracle encodes the expected
    // accounting directly from the slice rule — the engine must arrive at
    // the same numbers THROUGH the real serialize → garble → parse path,
    // which is exactly the audit: a parser dropping good lines, keeping
    // bad ones, or mangling values breaks a count or the checksum.
    // q234: the whole eval harness replays — the q126 per-term scorer
    // (BmTermSql, IEEE ops in engine order), per-query ROW_NUMBER cutoffs
    // with the same (score DESC, doc_id) tie-break, the exact Jaccard
    // truth, and the integer-bp metrics.
    "q234_retrieval_eval" ->
      s"""WITH toks AS (SELECT doc_id, len(str_split(text, ' ')) AS dl, unnest(str_split(text, ' ')) AS token FROM documents),
         |td AS (SELECT token, doc_id, dl, COUNT(*) AS tf FROM toks GROUP BY token, doc_id, dl),
         |qt AS (SELECT DISTINCT doc_id AS qid, token FROM toks WHERE doc_id % $IrQMod = 1),
         |n AS (SELECT COUNT(*) AS n_docs, CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS total_tokens FROM documents),
         |tdq AS (SELECT * FROM td WHERE token IN (SELECT token FROM qt)),
         |d AS (SELECT token, COUNT(*) AS df FROM tdq GROUP BY token),
         |sc AS (SELECT qt.qid, tdq.doc_id, CAST(SUM($BmTermSql) AS BIGINT) AS score
         |  FROM qt JOIN tdq ON qt.token = tdq.token AND tdq.doc_id <> qt.qid
         |  JOIN d ON d.token = qt.token CROSS JOIN n
         |  GROUP BY qt.qid, tdq.doc_id),
         |topk AS (SELECT * FROM (SELECT qid, doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank FROM sc)
         |  WHERE rank <= $IrK),
         |dt AS (SELECT DISTINCT doc_id, token FROM toks),
         |sz AS (SELECT doc_id, COUNT(*) AS sz FROM dt GROUP BY doc_id),
         |qdt AS (SELECT doc_id AS qid, token FROM dt WHERE doc_id % $IrQMod = 1),
         |rel AS (SELECT i.qid, i.doc_id FROM (
         |    SELECT q.qid, dt.doc_id, COUNT(*) AS i FROM qdt q
         |    JOIN dt ON q.token = dt.token AND dt.doc_id <> q.qid
         |    GROUP BY q.qid, dt.doc_id) i
         |  JOIN sz sq ON sq.doc_id = i.qid JOIN sz sd ON sd.doc_id = i.doc_id
         |  WHERE i.i * 10000 >= $IrRelBp * (sq.sz + sd.sz - i.i)),
         |nrel AS (SELECT qid, COUNT(*) AS n_rel FROM rel GROUP BY qid),
         |hit AS (SELECT t.qid, COUNT(*) AS hits, MIN(t.rank) AS first_rank
         |  FROM topk t JOIN rel r ON t.qid = r.qid AND t.doc_id = r.doc_id GROUP BY t.qid)
         |SELECT q.qid, CAST(COALESCE(n_rel, 0) AS BIGINT) AS n_rel,
         |  CAST(COALESCE(hits, 0) AS BIGINT) AS hits_at_k,
         |  CAST(COALESCE(hits, 0) * 10000 // $IrK AS BIGINT) AS p_at_k_bp,
         |  CAST(CASE WHEN COALESCE(n_rel, 0) = 0 THEN 0
         |    ELSE COALESCE(hits, 0) * 10000 // n_rel END AS BIGINT) AS recall_at_k_bp,
         |  CAST(CASE WHEN first_rank IS NULL THEN 0 ELSE 10000 // first_rank END AS BIGINT) AS mrr_bp
         |FROM (SELECT doc_id AS qid FROM documents WHERE doc_id % $IrQMod = 1) q
         |LEFT JOIN nrel ON nrel.qid = q.qid LEFT JOIN hit ON hit.qid = q.qid
         |ORDER BY q.qid""".stripMargin,
    // q236: identical block-local run counting (lag within col×blk), the
    // same byte cost model, the same length(bin())-as-⌈log₂⌉ idiom.
    "q236_encoding_audit" ->
      s"""WITH u AS (
         |  SELECT 'user_id' AS col_name, event_id AS ord, event_id // $EncBlockRows AS blk,
         |    CAST(user_id AS VARCHAR) AS v, CAST(8 AS BIGINT) AS vbytes FROM events
         |  UNION ALL SELECT 'event_type', event_id, event_id // $EncBlockRows,
         |    event_type, CAST(length(event_type) + 4 AS BIGINT) FROM events
         |  UNION ALL SELECT 'cents', event_id, event_id // $EncBlockRows,
         |    CAST(CAST(value * 100 AS BIGINT) AS VARCHAR), CAST(8 AS BIGINT) FROM events),
         |r AS (SELECT *, CASE WHEN lag(v) OVER (PARTITION BY col_name, blk ORDER BY ord) IS NULL
         |    OR lag(v) OVER (PARTITION BY col_name, blk ORDER BY ord) <> v THEN 1 ELSE 0 END AS is_start FROM u),
         |p AS (SELECT col_name, COUNT(*) AS n_rows, COUNT(DISTINCT v) AS ndv,
         |    CAST(SUM(is_start) AS BIGINT) AS n_runs, CAST(SUM(vbytes) AS BIGINT) AS plain_bytes,
         |    CAST(SUM(CASE WHEN is_start = 1 THEN vbytes + 4 ELSE 0 END) AS BIGINT) AS rle_bytes
         |  FROM r GROUP BY col_name),
         |de AS (SELECT col_name, CAST(SUM(vbytes) AS BIGINT) AS dict_entry_bytes
         |  FROM (SELECT DISTINCT col_name, v, vbytes FROM u) GROUP BY col_name),
         |b AS (SELECT p.*, de.dict_entry_bytes,
         |    CASE WHEN ndv <= 1 THEN 1 ELSE length(bin(ndv - 1)) END AS bits
         |  FROM p JOIN de USING (col_name))
         |SELECT col_name, CAST(n_rows AS BIGINT) AS n_rows, CAST(ndv AS BIGINT) AS ndv, n_runs,
         |  plain_bytes,
         |  CAST(dict_entry_bytes + (bits * n_rows + 7) // 8 AS BIGINT) AS dict_bytes,
         |  rle_bytes,
         |  CASE WHEN plain_bytes <= dict_entry_bytes + (bits * n_rows + 7) // 8
         |         AND plain_bytes <= rle_bytes THEN 'plain'
         |       WHEN dict_entry_bytes + (bits * n_rows + 7) // 8 <= rle_bytes THEN 'dict'
         |       ELSE 'rle' END AS encoding
         |FROM b ORDER BY col_name""".stripMargin,
    // q237: both routings replay on the portable h60 — mod residues
    // directly, HRW via the identical (h div 2)·16 + s packed argmax.
    "q237_shard_rebalance" -> {
      val hKey = duckH60("CAST(user_id AS VARCHAR)")
      val hCand = duckH60("CAST(user_id AS VARCHAR) || '#' || CAST(s AS VARCHAR)")
      s"""WITH k AS (SELECT DISTINCT user_id FROM events),
         |h AS (SELECT user_id, $hKey AS h FROM k),
         |md AS (SELECT 'mod' AS strategy, user_id, h % $ShardsOld AS s_old, h % $ShardsNew AS s_new FROM h),
         |c AS (SELECT user_id, s, ($hCand // 16) * 16 + s AS packed
         |  FROM k, (SELECT unnest(range(0, $ShardsNew)) AS s)),
         |hrw AS (SELECT 'hrw' AS strategy, user_id,
         |    MAX(CASE WHEN s < $ShardsOld THEN packed END) % 16 AS s_old,
         |    MAX(packed) % 16 AS s_new
         |  FROM c GROUP BY user_id),
         |b AS (SELECT * FROM md UNION ALL SELECT * FROM hrw),
         |m AS (SELECT strategy, COUNT(*) AS n_keys,
         |    CAST(SUM(CASE WHEN s_old <> s_new THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
         |  FROM b GROUP BY strategy),
         |lo AS (SELECT strategy, MAX(c) AS max_old FROM
         |  (SELECT strategy, s_old, COUNT(*) AS c FROM b GROUP BY 1, 2) GROUP BY strategy),
         |ln AS (SELECT strategy, MAX(c) AS max_new FROM
         |  (SELECT strategy, s_new, COUNT(*) AS c FROM b GROUP BY 1, 2) GROUP BY strategy)
         |SELECT m.strategy, CAST(n_keys AS BIGINT) AS n_keys, n_moved,
         |  CAST(n_moved * 10000 // n_keys AS BIGINT) AS moved_bp,
         |  CAST(max_old * 10000 * $ShardsOld // n_keys AS BIGINT) AS max_load_old_bp,
         |  CAST(max_new * 10000 * $ShardsNew // n_keys AS BIGINT) AS max_load_new_bp
         |FROM m JOIN lo USING (strategy) JOIN ln USING (strategy)
         |ORDER BY strategy""".stripMargin
    },
    // q238: the filter's k positions, its set bits, and every membership
    // probe replay on the portable h60 — the FP accounting is exact.
    "q238_bloom_join_prune" -> {
      // NB: the hash index column must NOT be named `i` — duckH60 expands
      // to a list_transform lambda whose variable `i` would shadow it.
      val hB = duckH60("CAST(o_orderkey AS VARCHAR) || '/' || CAST(hi AS VARCHAR)")
      val hP = duckH60("CAST(l_orderkey AS VARCHAR) || '/' || CAST(hi AS VARCHAR)")
      s"""WITH build AS (SELECT DISTINCT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'),
         |bpos AS (SELECT DISTINCT ($hB) % $BloomM AS pos
         |  FROM build, (SELECT unnest(range(0, $BloomK)) AS hi)),
         |probe AS (SELECT l_orderkey, COUNT(*) AS n_rows FROM lineitem GROUP BY l_orderkey),
         |ppos AS (SELECT l_orderkey, n_rows, ($hP) % $BloomM AS pos
         |  FROM probe, (SELECT unnest(range(0, $BloomK)) AS hi)),
         |pass AS (SELECT l_orderkey, n_rows FROM (
         |    SELECT p.l_orderkey, p.n_rows, COUNT(*) AS hits
         |    FROM ppos p JOIN bpos USING (pos) GROUP BY 1, 2)
         |  WHERE hits = $BloomK),
         |tr AS (SELECT p.l_orderkey, p.n_rows FROM probe p JOIN build b ON p.l_orderkey = b.o_orderkey)
         |SELECT (SELECT COUNT(*) FROM build) AS n_build,
         |  (SELECT COUNT(*) FROM bpos) AS bits_set,
         |  CAST($BloomM AS BIGINT) AS m_bits,
         |  (SELECT COUNT(*) FROM probe) AS n_probe_keys,
         |  (SELECT CAST(SUM(n_rows) AS BIGINT) FROM probe) AS n_probe,
         |  (SELECT CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) FROM pass) AS n_pass,
         |  (SELECT CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) FROM tr) AS n_true,
         |  (SELECT CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) FROM pass)
         |    - (SELECT CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) FROM tr) AS n_false_pos,
         |  CASE WHEN (SELECT SUM(n_rows) FROM probe) = (SELECT COALESCE(SUM(n_rows), 0) FROM tr) THEN CAST(0 AS BIGINT)
         |    ELSE CAST(((SELECT COALESCE(SUM(n_rows), 0) FROM pass) - (SELECT COALESCE(SUM(n_rows), 0) FROM tr)) * 10000
         |      // ((SELECT SUM(n_rows) FROM probe) - (SELECT COALESCE(SUM(n_rows), 0) FROM tr)) AS BIGINT) END AS fp_bp""".stripMargin
    },
    // q235: same global (frequency, token) order, same per-doc prefix cut,
    // same length filter, intersections recomputed for candidates only —
    // the theorem (no false negatives) holds identically on both sides.
    "q235_prefix_filter_join" ->
      s"""WITH dt AS (SELECT DISTINCT doc_id, unnest(str_split(text, ' ')) AS token FROM documents),
         |cnt AS (SELECT token, COUNT(*) AS cnt FROM dt GROUP BY token),
         |sz AS (SELECT doc_id, COUNT(*) AS sz FROM dt GROUP BY doc_id),
         |pfx AS (SELECT * FROM (
         |    SELECT dt.doc_id, dt.token, sz.sz,
         |      ROW_NUMBER() OVER (PARTITION BY dt.doc_id ORDER BY cnt.cnt, dt.token) AS rn
         |    FROM dt JOIN cnt ON dt.token = cnt.token JOIN sz ON dt.doc_id = sz.doc_id)
         |  WHERE rn <= sz - (($PfxJacBp * sz + 9999) // 10000) + 1),
         |cands AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sz_a, b.sz AS sz_b
         |  FROM pfx a JOIN pfx b ON a.token = b.token AND a.doc_id < b.doc_id
         |  WHERE LEAST(a.sz, b.sz) * 10000 >= $PfxJacBp * GREATEST(a.sz, b.sz)),
         |i AS (SELECT c.id_a, c.id_b, c.sz_a, c.sz_b, COUNT(*) AS inter
         |  FROM cands c JOIN dt x ON x.doc_id = c.id_a
         |  JOIN dt y ON y.doc_id = c.id_b AND x.token = y.token
         |  GROUP BY c.id_a, c.id_b, c.sz_a, c.sz_b),
         |pairs AS (SELECT id_a, id_b,
         |    CAST(inter * 10000 // (sz_a + sz_b - inter) AS BIGINT) AS jac_bp
         |  FROM i WHERE inter * 10000 >= $PfxJacBp * (sz_a + sz_b - inter)),
         |sym AS (SELECT id_a AS doc_id, id_b AS partner, jac_bp FROM pairs
         |  UNION ALL SELECT id_b, id_a, jac_bp FROM pairs),
         |rk AS (SELECT doc_id, partner, jac_bp,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY jac_bp DESC, partner) AS rk FROM sym)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
         |  MIN(jac_bp) AS min_jac_bp, MAX(jac_bp) AS max_jac_bp,
         |  MIN(CASE WHEN rk = 1 THEN partner END) AS best_partner
         |FROM rk GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q233_jsonl_corrupt_audit" ->
      s"""WITH e AS (SELECT event_type, event_id, CAST(value * 100 AS BIGINT) AS cents FROM events)
         |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_lines,
         |  CAST(SUM(CASE WHEN event_id % $JsonlCorruptMod <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_parsed,
         |  CAST(SUM(CASE WHEN event_id % $JsonlCorruptMod = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
         |  CAST(SUM(CASE WHEN event_id % $JsonlCorruptMod = 0 THEN 1 ELSE 0 END) * 10000
         |    // COUNT(*) AS BIGINT) AS corrupt_bp,
         |  CAST(SUM(CASE WHEN event_id % $JsonlCorruptMod <> 0 THEN cents ELSE 0 END) AS BIGINT) AS parsed_cents
         |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
    // q228: DuckDB's native JSON extraction replays the VARIANT path's
    // typed field get; the stats are plain integers.
    "q228_variant_extract" ->
      """WITH x AS (SELECT event_type,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(COUNT(k) AS BIGINT) AS n_with_k,
        |  CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k,
        |  CAST(COUNT(DISTINCT k) AS BIGINT) AS ndv_k
        |FROM x GROUP BY event_type ORDER BY event_type""".stripMargin,
    // q187: same month truncation, same cent·pct units, same share.
    "q187_promo_share" ->
      """WITH r AS (SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
        |    CAST(l_extendedprice * 100 AS BIGINT) * CAST((1 - l_discount) * 100 AS BIGINT) AS rev_u,
        |    p_type
        |  FROM lineitem JOIN part ON l_partkey = p_partkey)
        |SELECT month,
        |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_u ELSE 0 END) AS BIGINT) AS promo_u,
        |  CAST(SUM(rev_u) AS BIGINT) AS total_u,
        |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_u ELSE 0 END) AS BIGINT) * 10000
        |    // CAST(SUM(rev_u) AS BIGINT) AS promo_bp
        |FROM r GROUP BY month ORDER BY month""".stripMargin,
    // q101: the q81 SQL with the quantizer-training CTEs (cells +
    // codebook seeds) restricted to the BASE corpus — assignment, encode,
    // and search still span base ∪ delta, exactly the frozen-quantizer
    // append the engine commits as layout segments.
    "q101_ann_index_append" -> ivfPqResidualOracleSqlSeeded("vec_id % 4 <> 3"),
    // q116: the q81/q98 SQL with tombstoned ids excluded from the
    // CANDIDATE join only — quantizer, assignment, and encode still span
    // the full corpus, exactly what a logical delete leaves in place.
    "q116_ann_index_delete" ->
      ivfPqResidualOracleSqlSeeded("TRUE", "a.vec_id % 7 <> 3"),
    // q105: the Morton interleave is pure integer bit arithmetic generated
    // from the same round constants on both sides; epoch(ts) matches
    // Spark's tz-free cast-to-long because both treat the stored value as
    // an instant.
    "q105_zorder_layout" -> {
      val su = duckMortonSpread("user_id")
      val sh = duckMortonSpread("(h - m.hmin)")
      s"""WITH e AS (SELECT user_id, epoch_us(ts) // 3600000000 AS h FROM events),
         |m AS (SELECT MIN(h) AS hmin FROM e),
         |z AS (SELECT e.user_id, e.h - m.hmin AS hour_idx,
         |    ($su | ($sh << 1)) >> $ZBucketShift AS zbucket
         |  FROM e CROSS JOIN m)
         |SELECT zbucket, COUNT(*) AS n_rows,
         |  MIN(user_id) AS min_user, MAX(user_id) AS max_user,
         |  MIN(hour_idx) AS min_hour, MAX(hour_idx) AS max_hour
         |FROM z GROUP BY zbucket ORDER BY zbucket""".stripMargin
    },
    // q106: the two snapshot derivations replay in SQL; closed and
    // current versions come from the SAME full-outer join, emitted as two
    // UNION ALL branches (the engine's explode produces identical rows).
    "q106_scd2_merge" ->
      """WITH dim AS (SELECT c_custkey, c_mktsegment AS dim_seg
        |    FROM customer WHERE c_custkey % 5 <> 1),
        |inc AS (SELECT c_custkey,
        |    CASE WHEN c_custkey % 5 = 2 THEN c_mktsegment || '*' ELSE c_mktsegment END AS inc_seg
        |  FROM customer WHERE c_custkey % 5 <> 3),
        |j AS (SELECT COALESCE(d.c_custkey, i.c_custkey) AS c_custkey, dim_seg, inc_seg
        |  FROM dim d FULL OUTER JOIN inc i ON d.c_custkey = i.c_custkey)
        |SELECT c_custkey, dim_seg AS segment, 1 AS valid_from,
        |    2 AS valid_to, FALSE AS is_current
        |  FROM j WHERE dim_seg IS NOT NULL AND (inc_seg IS NULL OR inc_seg <> dim_seg)
        |UNION ALL
        |SELECT c_custkey, inc_seg AS segment,
        |    CASE WHEN dim_seg IS NOT DISTINCT FROM inc_seg THEN 1 ELSE 2 END AS valid_from,
        |    NULL AS valid_to, TRUE AS is_current
        |  FROM j WHERE inc_seg IS NOT NULL
        |ORDER BY c_custkey, valid_from""".stripMargin,
    // q107: floor-mean and ceil-salt are pure integer arithmetic; the
    // top-20 tie-breaks on user_id in both engines.
    "q107_skew_audit" ->
      """WITH c AS (SELECT user_id, COUNT(*) AS n_rows FROM events GROUP BY user_id),
        |t AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total, COUNT(*) AS n_keys FROM c)
        |SELECT user_id, n_rows,
        |  n_rows * 100 // (total // n_keys) AS mult_x100,
        |  (n_rows * 32 + total - 1) // total AS salt_factor,
        |  n_rows * 100 >= total * 400 // n_keys AS needs_salt
        |FROM c CROSS JOIN t
        |ORDER BY n_rows DESC, user_id LIMIT 20""".stripMargin,
    // q108: sqrt is correctly rounded in both engines (τ = 1/2 chosen for
    // exactly this), the ×10⁶ fixed-point floor happens before any sum,
    // and every later step is integer — no float crosses the compare.
    "q108_mix_temperature" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n_docs,
        |    CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1000000.0) AS BIGINT) AS w_fp
        |  FROM documents GROUP BY lang),
        |t AS (SELECT CAST(SUM(w_fp) AS BIGINT) AS w_total,
        |    CAST(SUM(n_docs) AS BIGINT) AS docs_total FROM c)
        |SELECT lang, n_docs, w_fp,
        |  w_fp * 10000 // w_total AS p_bp,
        |  docs_total * w_fp // w_total AS expected_docs,
        |  (docs_total * w_fp // w_total) * 10000 // n_docs AS epoch_bp
        |FROM c CROSS JOIN t ORDER BY lang""".stripMargin,
    // q109: tokenization is the q102 str_split; the sample is the 5
    // SMALLEST doc_ids (rank-capped before collection in both engines),
    // joined into one string so no array type crosses the compare.
    "q109_posting_lists" ->
      """WITH td AS (SELECT token, doc_id, COUNT(*) AS tf
        |  FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS token FROM documents)
        |  GROUP BY token, doc_id),
        |a AS (SELECT token, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS tf_total
        |  FROM td GROUP BY token),
        |t5 AS (SELECT token,
        |    array_to_string(list_sort(list(doc_id)), ',') AS sample_docs
        |  FROM (SELECT token, doc_id,
        |      row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn FROM td)
        |  WHERE rn <= 5 GROUP BY token)
        |SELECT a.token, df, tf_total, sample_docs
        |FROM a JOIN t5 USING (token) ORDER BY token""".stripMargin,
    // q115: the q56 recursive-CTE components + a row_number argmax per
    // component on (n_chars DESC, id) — keep the longest member.
    "q115_cluster_keeper" ->
      """WITH RECURSIVE t AS (SELECT doc_id, list_distinct(str_split(text, ' ')) AS toks FROM documents),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |      FROM t a JOIN t b ON a.doc_id < b.doc_id
        |      WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.95),
        |e AS (SELECT id_a AS src, id_b AS dst FROM p UNION SELECT id_b, id_a FROM p),
        |reach(id, r) AS (
        |  SELECT src, dst FROM e
        |  UNION
        |  SELECT reach.id, e.dst FROM reach JOIN e ON reach.r = e.src),
        |c AS (SELECT id, LEAST(id, MIN(r)) AS comp FROM reach GROUP BY id)
        |SELECT c.id, c.comp, d.n_chars,
        |  row_number() OVER (PARTITION BY c.comp ORDER BY d.n_chars DESC, c.id) = 1 AS is_keep
        |FROM c JOIN documents d ON c.id = d.doc_id
        |ORDER BY c.id""".stripMargin,
    // q117: per-gram min-owner + per-doc share, grouped by the gram
    // STRING (the engine groups by xxhash64 of the gram — equal results
    // absent 64-bit collisions, the q64/q73 precedent). All integer
    // arithmetic; DuckDB SUM(BIGINT)→HUGEINT cast back to BIGINT.
    "q117_exact_gram_dedup" -> {
      val n = ExactGramN
      val sharedBig =
        "CAST(SUM(CASE WHEN o.owner < u.doc_id THEN 1 ELSE 0 END) AS BIGINT)"
      s"""WITH t AS (SELECT doc_id, str_split(text, ' ') AS s, text FROM documents),
         |g AS (SELECT doc_id,
         |  CASE WHEN len(s) >= $n THEN list_distinct(list_transform(range(1, len(s) - ${n - 2}), i -> array_to_string(s[i:i+${n - 1}], ' ')))
         |       ELSE [text] END AS grams
         |  FROM t),
         |u AS (SELECT doc_id, unnest(grams) AS gram FROM g),
         |o AS (SELECT gram, MIN(doc_id) AS owner FROM u GROUP BY gram)
         |SELECT u.doc_id, COUNT(*) AS n_grams,
         |  $sharedBig AS shared_grams,
         |  $sharedBig * 10000 // COUNT(*) AS dup_bp,
         |  ($sharedBig * 10000 // COUNT(*)) >= 8000 AS is_dup
         |FROM u JOIN o ON u.gram = o.gram
         |GROUP BY u.doc_id ORDER BY u.doc_id""".stripMargin
    },
    // q118: the uniform is exact BIGINT arithmetic in both engines; the
    // single IEEE division (v+1)/w is bit-identical; the bounded
    // aggregator equals the row_number formulation by construction
    // (selection is a pure function of the input set).
    "q118_weighted_sample" ->
      s"""WITH d AS (SELECT lang, doc_id, n_chars AS weight,
         |    ((doc_id % $SampleP) * $SampleC1 + $SampleC2) % $SampleP AS v
         |  FROM documents),
         |p AS (SELECT lang, doc_id, weight,
         |    CAST(v + 1 AS DOUBLE) / weight AS priority FROM d),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY priority, doc_id) AS rn
         |  FROM p)
         |SELECT lang, doc_id, weight, priority, CAST(rn AS INTEGER) AS "rank"
         |FROM r WHERE rn <= $SampleK ORDER BY lang, rn""".stripMargin,
    // q125: see annNprobeSweepOracleSql.
    "q125_ann_nprobe_sweep" -> annNprobeSweepOracleSql,
    // q126: idf is the q110 integer family; the saturation factor is the
    // SAME parse tree of IEEE double ops in both engines (exact BIGINT
    // dl·n_docs, one divide, one multiply, two adds, one divide), so the
    // floored per-term scores are bit-identical and sum order-free.
    "q126_bm25_topk" ->
      s"""WITH $LexicalCtes
         |SELECT qtd.doc_id, CAST(SUM($BmTermSql) AS BIGINT) AS score
         |FROM qtd JOIN d USING (token) CROSS JOIN n
         |GROUP BY qtd.doc_id ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,
    // q127: both rankers replay as CTEs sharing the q110/q126 postings;
    // ranks are windows over 10-row lists and the fusion is pure integer
    // (⌊10⁶/(60+rank)⌋ summed), so the fused ordering is hash-exact.
    "q127_rrf_fusion" ->
      s"""WITH $LexicalCtes,
         |tfidf AS (SELECT qtd.doc_id, CAST(SUM(tf * (n_docs * 1000000 // df)) AS BIGINT) AS score
         |  FROM qtd JOIN d USING (token) CROSS JOIN n
         |  GROUP BY qtd.doc_id ORDER BY score DESC, doc_id LIMIT 10),
         |bm AS (SELECT qtd.doc_id, CAST(SUM($BmTermSql) AS BIGINT) AS score
         |  FROM qtd JOIN d USING (token) CROSS JOIN n
         |  GROUP BY qtd.doc_id ORDER BY score DESC, doc_id LIMIT 10),
         |tr AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS tfidf_rank FROM tfidf),
         |br AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS bm25_rank FROM bm)
         |SELECT COALESCE(tr.doc_id, br.doc_id) AS doc_id,
         |  CAST(COALESCE(tfidf_rank, 0) AS BIGINT) AS tfidf_rank,
         |  CAST(COALESCE(bm25_rank, 0) AS BIGINT) AS bm25_rank,
         |  CAST(COALESCE(1000000 // ($RrfK + tfidf_rank), 0)
         |    + COALESCE(1000000 // ($RrfK + bm25_rank), 0) AS BIGINT) AS rrf_score
         |FROM tr FULL OUTER JOIN br ON tr.doc_id = br.doc_id
         |ORDER BY rrf_score DESC, doc_id""".stripMargin,
    // q129: vocabulary = top-V tokens by (cnt DESC, token) — a total
    // order, so the cut is identical in both engines; coverage pure
    // integer.
    "q129_vocab_coverage" ->
      s"""WITH lt AS (SELECT lang, token, COUNT(*) AS n
         |  FROM (SELECT lang, unnest(str_split(text, ' ')) AS token FROM documents)
         |  GROUP BY lang, token),
         |v AS (SELECT token FROM (SELECT token, SUM(n) AS cnt FROM lt GROUP BY token)
         |  ORDER BY cnt DESC, token LIMIT $VocabV)
         |SELECT lang,
         |  CAST(SUM(n) AS BIGINT) AS n_instances,
         |  CAST(SUM(CASE WHEN v.token IS NOT NULL THEN n ELSE 0 END) AS BIGINT) AS covered_instances,
         |  CAST(SUM(CASE WHEN v.token IS NOT NULL THEN n ELSE 0 END) AS BIGINT) * 10000
         |    // CAST(SUM(n) AS BIGINT) AS coverage_bp,
         |  COUNT(*) AS n_types,
         |  CAST(SUM(CASE WHEN v.token IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS covered_types,
         |  (COUNT(*) - CAST(SUM(CASE WHEN v.token IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)) * 10000
         |    // COUNT(*) AS oov_type_bp
         |FROM lt LEFT JOIN v ON lt.token = v.token
         |GROUP BY lang ORDER BY lang""".stripMargin,
    // q130: every stat is a count, an exact NDV, a canonical string
    // cast of min/max (text hashed via the q104 md5 precedent), or an
    // integer ×100 width — all hash-exact.
    "q130_table_stats" ->
      """WITH s AS (SELECT COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS doc_id_nulls,
        |  COUNT(DISTINCT doc_id) AS doc_id_ndv,
        |  CAST(MIN(doc_id) AS VARCHAR) AS doc_id_min, CAST(MAX(doc_id) AS VARCHAR) AS doc_id_max,
        |  CAST(SUM(length(CAST(doc_id AS VARCHAR)) * 100) AS BIGINT) // COUNT(doc_id) AS doc_id_w,
        |  CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS lang_nulls,
        |  COUNT(DISTINCT lang) AS lang_ndv,
        |  MIN(lang) AS lang_min, MAX(lang) AS lang_max,
        |  CAST(SUM(length(lang) * 100) AS BIGINT) // COUNT(lang) AS lang_w,
        |  CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS source_nulls,
        |  COUNT(DISTINCT source) AS source_ndv,
        |  MIN(source) AS source_min, MAX(source) AS source_max,
        |  CAST(SUM(length(source) * 100) AS BIGINT) // COUNT(source) AS source_w,
        |  CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_chars_nulls,
        |  COUNT(DISTINCT n_chars) AS n_chars_ndv,
        |  CAST(MIN(n_chars) AS VARCHAR) AS n_chars_min, CAST(MAX(n_chars) AS VARCHAR) AS n_chars_max,
        |  CAST(SUM(length(CAST(n_chars AS VARCHAR)) * 100) AS BIGINT) // COUNT(n_chars) AS n_chars_w,
        |  CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS text_nulls,
        |  COUNT(DISTINCT text) AS text_ndv,
        |  md5(MIN(text)) AS text_min, md5(MAX(text)) AS text_max,
        |  CAST(SUM(length(text) * 100) AS BIGINT) // COUNT(text) AS text_w
        |  FROM documents)
        |SELECT 'doc_id' AS col_name, n AS n_rows, doc_id_nulls AS n_nulls, doc_id_ndv AS ndv,
        |  doc_id_min AS min_val, doc_id_max AS max_val, doc_id_w AS avg_width_x100 FROM s
        |UNION ALL SELECT 'lang', n, lang_nulls, lang_ndv, lang_min, lang_max, lang_w FROM s
        |UNION ALL SELECT 'n_chars', n, n_chars_nulls, n_chars_ndv, n_chars_min, n_chars_max, n_chars_w FROM s
        |UNION ALL SELECT 'source', n, source_nulls, source_ndv, source_min, source_max, source_w FROM s
        |UNION ALL SELECT 'text', n, text_nulls, text_ndv, text_min, text_max, text_w FROM s
        |ORDER BY col_name""".stripMargin,
    // q131: see lshSweepOracleSql.
    "q131_lsh_banding_sweep" -> lshSweepOracleSql,
    // q133: basket = distinct (user, day); support and lift pure integer.
    "q133_cooccurrence_lift" ->
      """WITH bt AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type FROM events),
        |n AS (SELECT COUNT(*) AS n_baskets FROM (SELECT DISTINCT user_id, day FROM bt)),
        |tc AS (SELECT event_type, COUNT(*) AS n_t FROM bt GROUP BY 1),
        |pc AS (SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_ab
        |  FROM bt a JOIN bt b ON a.user_id = b.user_id AND a.day = b.day
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, ta.n_t AS n_a, tb.n_t AS n_b, n_ab,
        |  n_ab * 10000 // n_baskets AS support_bp,
        |  n_ab * n_baskets * 10000 // (ta.n_t * tb.n_t) AS lift_bp
        |FROM pc JOIN tc ta ON ta.event_type = type_a
        |JOIN tc tb ON tb.event_type = type_b CROSS JOIN n
        |ORDER BY type_a, type_b""".stripMargin,
    // q134: see mrlSweepOracleSql.
    "q134_mrl_recall_sweep" -> mrlSweepOracleSql,
    // q135: the oracle computes the profile DIRECTLY over the full
    // table; the engine goes through per-batch segments + merge —
    // equality IS the mergeability proof.
    "q135_incremental_stats" ->
      """WITH s AS (SELECT COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS lang_nulls,
        |  MIN(lang) AS lang_min, MAX(lang) AS lang_max,
        |  CAST(SUM(length(lang)) AS BIGINT) AS lang_wsum,
        |  CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_chars_nulls,
        |  CAST(MIN(n_chars) AS VARCHAR) AS n_chars_min, CAST(MAX(n_chars) AS VARCHAR) AS n_chars_max,
        |  CAST(SUM(length(CAST(n_chars AS VARCHAR))) AS BIGINT) AS n_chars_wsum,
        |  CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS text_nulls,
        |  MIN(md5(text)) AS text_min, MAX(md5(text)) AS text_max,
        |  CAST(SUM(length(text)) AS BIGINT) AS text_wsum
        |  FROM documents)
        |SELECT 'lang' AS col_name, n_rows, lang_nulls AS n_nulls, lang_min AS min_val,
        |  lang_max AS max_val, lang_wsum * 100 // (n_rows - lang_nulls) AS avg_width_x100 FROM s
        |UNION ALL SELECT 'n_chars', n_rows, n_chars_nulls, n_chars_min, n_chars_max,
        |  n_chars_wsum * 100 // (n_rows - n_chars_nulls) FROM s
        |UNION ALL SELECT 'text', n_rows, text_nulls, text_min, text_max,
        |  text_wsum * 100 // (n_rows - text_nulls) FROM s
        |ORDER BY col_name""".stripMargin,
    // q136: per-signup first purchase within the shared window; deltas
    // exact in micros, the median ranked over the SECONDS histogram.
    "q136_conversion_funnel" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
         |su AS (SELECT user_id, event_id AS signup_id, us AS s_us FROM e WHERE event_type = 'signup'),
         |pu AS (SELECT user_id, us AS p_us FROM e WHERE event_type = 'purchase'),
         |conv AS (SELECT signup_id, MIN(p_us - s_us) AS delta_us
         |  FROM su JOIN pu USING (user_id)
         |  WHERE p_us > s_us AND p_us <= s_us + $ConvWindowUs
         |  GROUP BY signup_id),
         |hist AS (SELECT delta_us // 1000000 AS delta_s, COUNT(*) AS c FROM conv GROUP BY 1),
         |cum AS (SELECT delta_s, SUM(c) OVER (ORDER BY delta_s) AS cum FROM hist),
         |nc AS (SELECT COUNT(*) AS n_conv FROM conv),
         |med AS (SELECT MIN(delta_s) AS median_delta_s FROM cum CROSS JOIN nc
         |  WHERE cum >= (n_conv + 1) // 2),
         |ns AS (SELECT COUNT(*) AS n_signups FROM su)
         |SELECT ns.n_signups, nc.n_conv AS n_conversions,
         |  nc.n_conv * 10000 // ns.n_signups AS conversion_bp,
         |  (SELECT MIN(delta_us) FROM conv) AS min_delta_us,
         |  (SELECT MAX(delta_us) FROM conv) AS max_delta_us,
         |  med.median_delta_s
         |FROM ns CROSS JOIN nc CROSS JOIN med""".stripMargin,
    // q139: the exact fixed-point iteration unrolled — every contribution
    // is BIGINT `rank // outdeg`, so engine and oracle agree bit-for-bit.
    // Constants (scale, damping, teleport, iteration count) are generated
    // from graft.graph.Graph so the two sides can never drift.
    "q139_pagerank" -> {
      import graft.graph.Graph
      def step(prev: String, next: String): String =
        s"""$next AS (SELECT s.dst AS node,
           |  CAST(${Graph.TeleportFp} + (${Graph.DampNum} * SUM(r.rank_fp // s.outdeg)) // 100 AS BIGINT) AS rank_fp
           |  FROM sym s JOIN $prev r ON s.src = r.node GROUP BY s.dst)""".stripMargin
      val steps = (1 to Graph.Iters).map(i => step(s"r${i - 1}", s"r$i")).mkString(",\n")
      s"""WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS u, l_partkey * 2 + 1 AS v
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |se AS (SELECT u AS src, v AS dst FROM e0 UNION ALL SELECT v, u FROM e0),
         |dg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM se GROUP BY src),
         |sym AS (SELECT se.src, se.dst, dg.outdeg FROM se JOIN dg ON se.src = dg.src),
         |r0 AS (SELECT src AS node, CAST(${Graph.Scale} AS BIGINT) AS rank_fp FROM dg),
         |$steps
         |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'part' END AS node_type,
         |  node // 2 AS node_key, rank_fp
         |FROM r${Graph.Iters}
         |ORDER BY rank_fp DESC, node_type, node_key LIMIT 20""".stripMargin
    })
}
