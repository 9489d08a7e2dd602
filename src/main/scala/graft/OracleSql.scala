package graft

/** DuckDB oracle SQL for every SQL-expressible SparkEntry query, over the same
  * parquet tables (registered by the driver as `orders`, `lineitem`,
  * `documents`, `embeddings`, ...). Iterative algorithms are unrolled to a
  * fixed superstep count k — deterministic and exactly the engine's fixed-k
  * semantics. All float outputs are rounded identically on both sides; sums
  * and counts are cast so DuckDB's widened types (HUGEINT) match Spark's.
  */
object OracleSql {

  /** Shared prelude: folded weighted edges, vertex set, zero-filled degrees.
    * Mirrors TestdataGraph + LinkGraph.fromEdgeList (duplicate-summing fold).
    */
  val prelude: String =
    """e AS MATERIALIZED (
      |  SELECT o_custkey AS src, l_suppkey AS dst, CAST(count(*) AS DOUBLE) AS weight
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |  GROUP BY 1, 2
      |),
      |verts AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
      |nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
      |indeg AS MATERIALIZED (SELECT dst AS id, sum(weight) AS d FROM e GROUP BY 1),
      |outdeg AS MATERIALIZED (SELECT src AS id, sum(weight) AS d FROM e GROUP BY 1),
      |deg AS MATERIALIZED (
      |  SELECT v.id, coalesce(i.d, 0.0) AS ind, coalesce(o.d, 0.0) AS outd,
      |         coalesce(i.d, 0.0) + coalesce(o.d, 0.0) AS totd
      |  FROM verts v LEFT JOIN indeg i ON i.id = v.id LEFT JOIN outdeg o ON o.id = v.id
      |)""".stripMargin

  val edges: String =
    s"""WITH $prelude
       |SELECT src, dst, weight FROM e ORDER BY src, dst""".stripMargin

  val degrees: String =
    s"""WITH $prelude
       |SELECT id, ind AS in_deg, outd AS out_deg FROM deg ORDER BY id""".stripMargin

  val networkMetrics: String =
    s"""WITH $prelude
       |SELECT
       |  CAST((SELECT count(*) FROM verts) AS BIGINT) AS total_providers,
       |  CAST((SELECT count(*) FROM e) AS BIGINT) AS total_referrals,
       |  round((SELECT CAST(count(*) AS DOUBLE) FROM e)
       |        / ((SELECT n FROM nn) * ((SELECT n FROM nn) - 1)), 12) AS network_density,
       |  round(avg(outd), 6) AS average_referrals_out,
       |  round(quantile_cont(outd, 0.5), 6) AS median_referrals_out,
       |  round(stddev_pop(outd), 6) AS std_referrals_out,
       |  CAST(max(outd) AS BIGINT) AS max_referrals_out,
       |  round(sum(CASE WHEN outd > (SELECT quantile_cont(outd, 0.9) FROM deg) THEN 1.0 ELSE 0.0 END)
       |        / (SELECT n FROM nn), 6) AS referral_concentration_out,
       |  round(avg(ind), 6) AS average_referrals_in,
       |  round(quantile_cont(ind, 0.5), 6) AS median_referrals_in,
       |  round(stddev_pop(ind), 6) AS std_referrals_in,
       |  CAST(max(ind) AS BIGINT) AS max_referrals_in,
       |  round(sum(CASE WHEN ind > (SELECT quantile_cont(ind, 0.9) FROM deg) THEN 1.0 ELSE 0.0 END)
       |        / (SELECT n FROM nn), 6) AS referral_concentration_in,
       |  CAST(sum(CASE WHEN totd = 0 THEN 1 ELSE 0 END) AS BIGINT) AS isolated_providers,
       |  CAST(sum(CASE WHEN totd > (SELECT quantile_cont(totd, 0.95) FROM deg) THEN 1 ELSE 0 END) AS BIGINT) AS hub_providers,
       |  round(avg(CASE WHEN ind > 0 THEN outd / (ind + 1e-10) ELSE outd END), 6) AS referral_imbalance_ratio
       |FROM deg""".stripMargin

  val giniDegree: String =
    s"""WITH $prelude,
       |ranked AS MATERIALIZED (
       |  SELECT totd AS v, CAST(row_number() OVER (ORDER BY totd) AS DOUBLE) AS i FROM deg
       |)
       |SELECT round(2.0 * sum(i * v) / (count(*) * sum(v)) - (count(*) + 1.0) / count(*), 6) AS gini
       |FROM ranked""".stripMargin

  val topDegree: String =
    s"""WITH $prelude
       |SELECT id, totd AS total_deg FROM deg ORDER BY totd DESC, id LIMIT 10""".stripMargin

  val histDegree: String =
    s"""WITH $prelude,
       |mm AS MATERIALIZED (SELECT min(totd) AS lo, max(totd) AS hi FROM deg),
       |w AS MATERIALIZED (SELECT CASE WHEN hi > lo THEN (hi - lo) / 30 ELSE 1.0 END AS width, lo, hi FROM mm)
       |SELECT CAST(least(floor((totd - (SELECT lo FROM w)) / (SELECT width FROM w)), 29) AS BIGINT) AS bin,
       |       CAST(count(*) AS BIGINT) AS cnt
       |FROM deg GROUP BY 1 ORDER BY 1""".stripMargin

  val cdfDegree: String =
    s"""WITH $prelude
       |SELECT id, totd AS total_deg,
       |       round(cume_dist() OVER (ORDER BY totd) * 100.0, 6) AS pct_rank
       |FROM deg ORDER BY id""".stripMargin

  val rankCurveDegree: String =
    s"""WITH $prelude,
       |ranked AS MATERIALIZED (
       |  SELECT totd AS score, row_number() OVER (ORDER BY totd DESC, id) AS rank FROM deg
       |)
       |SELECT rank, score FROM ranked
       |WHERE rank <= 10 OR (rank % 10 = 0 AND rank <= 1000)
       |ORDER BY rank""".stripMargin

  /** Unrolled reference-mode PageRank CTE chain ending in x$k (id, v):
    * y = d·(GDx) + ((1-d)/n)·sum(x);  x' = y / sum(y)   (pagerank.py:194-197).
    */
  private def pagerankCtes(k: Int, damping: Double = 0.85): String = {
    val sb = new StringBuilder
    sb ++= "x0 AS MATERIALIZED (SELECT id, 1.0 / (SELECT n FROM nn) AS v FROM verts)"
    for (i <- 1 to k) {
      val p = i - 1
      sb ++= s""",
        |gx$i AS MATERIALIZED (
        |  SELECT e.src AS id, sum(e.weight / cd.d * xp.v) AS g
        |  FROM e JOIN indeg cd ON cd.id = e.dst JOIN x$p xp ON xp.id = e.dst
        |  GROUP BY 1
        |),
        |y$i AS MATERIALIZED (
        |  SELECT v.id,
        |         $damping * coalesce(g.g, 0.0)
        |           + ((1.0 - $damping) / (SELECT n FROM nn)) * (SELECT sum(v) FROM x$p) AS y
        |  FROM verts v LEFT JOIN gx$i g ON g.id = v.id
        |),
        |x$i AS MATERIALIZED (SELECT id, y / (SELECT sum(y) FROM y$i) AS v FROM y$i)""".stripMargin
    }
    sb.toString
  }

  def pagerankUnrolled(k: Int, damping: Double = 0.85, roundTo: Int = 8): String =
    s"""WITH $prelude,
       |${pagerankCtes(k, damping)}
       |SELECT id, round(v, $roundTo) AS rank FROM x$k ORDER BY id""".stripMargin

  /** Unrolled PageRank over the induced prefix subgraph: the `prefix` smallest
    * vertex ids and the edges among them (G[:k,:k] dense-slice semantics —
    * isolated prefix vertices keep their teleport-only rank).
    */
  def pagerankPrefixUnrolled(prefix: Int, k: Int, damping: Double = 0.85, roundTo: Int = 8): String = {
    val sb = new StringBuilder
    sb ++= s"WITH $prelude,\n"
    sb ++=
      s"""pverts AS MATERIALIZED (SELECT id FROM verts ORDER BY id LIMIT $prefix),
         |pn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM pverts),
         |pe AS MATERIALIZED (
         |  SELECT e.src, e.dst, e.weight
         |  FROM e JOIN pverts a ON a.id = e.src JOIN pverts b ON b.id = e.dst
         |),
         |pindeg AS MATERIALIZED (SELECT dst AS id, sum(weight) AS d FROM pe GROUP BY 1),
         |px0 AS MATERIALIZED (SELECT id, 1.0 / (SELECT n FROM pn) AS v FROM pverts)""".stripMargin
    for (i <- 1 to k) {
      val p = i - 1
      sb ++= s""",
        |pgx$i AS MATERIALIZED (
        |  SELECT pe.src AS id, sum(pe.weight / cd.d * xp.v) AS g
        |  FROM pe JOIN pindeg cd ON cd.id = pe.dst JOIN px$p xp ON xp.id = pe.dst
        |  GROUP BY 1
        |),
        |py$i AS MATERIALIZED (
        |  SELECT v.id,
        |         $damping * coalesce(g.g, 0.0)
        |           + ((1.0 - $damping) / (SELECT n FROM pn)) * (SELECT sum(v) FROM px$p) AS y
        |  FROM pverts v LEFT JOIN pgx$i g ON g.id = v.id
        |),
        |px$i AS MATERIALIZED (SELECT id, y / (SELECT sum(y) FROM py$i) AS v FROM py$i)""".stripMargin
    }
    sb ++= s"\nSELECT id, round(v, $roundTo) AS rank FROM px$k ORDER BY id"
    sb.toString
  }

  /** Key providers (pagerank.py:444-455): vertices above the p90 of
    * out-degree / in-degree / fixed-k PageRank score respectively.
    */
  def keyProviders(k: Int): String =
    s"""WITH $prelude,
       |${pagerankCtes(k)},
       |kp AS MATERIALIZED (
       |  SELECT d.id, coalesce(x.v, 0.0) AS score, d.outd, d.ind
       |  FROM deg d LEFT JOIN x$k x ON x.id = d.id
       |),
       |kthr AS MATERIALIZED (
       |  SELECT quantile_cont(outd, 0.9) AS hub,
       |         quantile_cont(ind, 0.9) AS auth,
       |         quantile_cont(score, 0.9) AS cent
       |  FROM kp
       |)
       |SELECT id, round(score, 9) AS centrality_score,
       |       outd AS referrals_out, ind AS referrals_in,
       |       outd > (SELECT hub FROM kthr) AS is_hub,
       |       ind > (SELECT auth FROM kthr) AS is_authority,
       |       score > (SELECT cent FROM kthr) AS is_central
       |FROM kp
       |WHERE outd > (SELECT hub FROM kthr)
       |   OR ind > (SELECT auth FROM kthr)
       |   OR score > (SELECT cent FROM kthr)
       |ORDER BY id""".stripMargin

  /** High-risk provider records (pagerank.py:364-386): above the p90 of
    * propagated risk, with amplification and empirical-CDF percentile.
    */
  def highRisk(k: Int): String =
    s"""WITH $prelude,
       |${riskCtes(k)},
       |xr AS MATERIALIZED (
       |  SELECT x.id, x.v AS x, r.v AS r0v FROM rk$k x JOIN r0 r ON r.id = x.id
       |),
       |hthr AS MATERIALIZED (SELECT quantile_cont(x, 0.9) AS t FROM xr),
       |hcdf AS MATERIALIZED (
       |  SELECT id, x, r0v, cume_dist() OVER (ORDER BY x) * 100.0 AS pct FROM xr
       |)
       |SELECT id, round(x, 9) AS risk_score, round(r0v, 9) AS original_risk,
       |       round(CASE WHEN r0v > 0 THEN x / r0v ELSE 1.0 END, 6) AS amplification_factor,
       |       round(pct, 6) AS risk_percentile
       |FROM hcdf WHERE x > (SELECT t FROM hthr) ORDER BY id""".stripMargin

  /** Pearson correlation of propagated risk (k risk supersteps) with PageRank
    * (kPr supersteps) — visualizations.py:442-448.
    */
  def riskCorr(kRisk: Int, kPr: Int): String =
    s"""WITH $prelude,
       |${pagerankCtes(kPr)},
       |${riskCtes(kRisk)}
       |SELECT round(corr(r.v, p.v), 6) AS risk_pagerank_corr
       |FROM rk$kRisk r JOIN x$kPr p ON p.id = r.id""".stripMargin

  /** Outlier-trimmed histogram: band-filter totals to [q1, q99], then bin
    * (visualizations.py:232-236 trim-then-hist).
    */
  def histTrimmed(bins: Int): String =
    s"""WITH $prelude,
       |band AS MATERIALIZED (
       |  SELECT totd FROM deg
       |  WHERE totd BETWEEN (SELECT quantile_cont(totd, 0.01) FROM deg)
       |                 AND (SELECT quantile_cont(totd, 0.99) FROM deg)
       |),
       |bmm AS MATERIALIZED (SELECT min(totd) AS lo, max(totd) AS hi FROM band),
       |bw AS MATERIALIZED (
       |  SELECT CASE WHEN hi > lo THEN (hi - lo) / $bins ELSE 1.0 END AS width, lo FROM bmm
       |)
       |SELECT CAST(least(floor((totd - (SELECT lo FROM bw)) / (SELECT width FROM bw)), ${bins - 1}) AS BIGINT) AS bin,
       |       CAST(count(*) AS BIGINT) AS cnt
       |FROM band GROUP BY 1 ORDER BY 1""".stripMargin

  /** Top-10 by degree with display formatting: provider label (F6) and
    * log10 scale value (F3) — the reference's print/plot formatting
    * (pagerank.py:377-383, log-scale axes in visualizations.py).
    */
  val topFormatted: String =
    s"""WITH $prelude
       |SELECT printf('P%08d', id) AS provider_label, id, totd AS total_deg,
       |       round(log10(totd), 6) AS log10_deg
       |FROM deg ORDER BY totd DESC, id LIMIT 10""".stripMargin

  /** Composite-risk prior (pagerank.py:690-713) as CTEs ending in r0 (id, v). */
  private val compositeRiskCtes: String =
    """comp AS MATERIALIZED (
      |  SELECT id,
      |         0.001
      |           + (1.0/3) * (CASE WHEN (SELECT max(totd) FROM deg) > 0
      |                        THEN totd / (SELECT max(totd) FROM deg) ELSE 0.0 END)
      |           + (1.0/3) * (CASE WHEN (SELECT max(CASE WHEN ind > 0 THEN outd / (ind + 1e-10) ELSE outd END) FROM deg) > 0
      |                        THEN (CASE WHEN ind > 0 THEN outd / (ind + 1e-10) ELSE outd END)
      |                             / (SELECT max(CASE WHEN ind > 0 THEN outd / (ind + 1e-10) ELSE outd END) FROM deg)
      |                        ELSE 0.0 END)
      |           + (1.0/3) * (CASE WHEN (SELECT max(1.0 / (1.0 + totd)) FROM deg) > 0
      |                        THEN (1.0 / (1.0 + totd)) / (SELECT max(1.0 / (1.0 + totd)) FROM deg)
      |                        ELSE 0.0 END) AS raw
      |  FROM deg
      |),
      |r0 AS MATERIALIZED (SELECT id, raw / (SELECT sum(raw) FROM comp) AS v FROM comp)""".stripMargin

  val compositeRisk: String =
    s"""WITH $prelude,
       |$compositeRiskCtes
       |SELECT id, round(v, 9) AS risk FROM r0 ORDER BY id""".stripMargin

  /** Risk-propagation CTEs ending in rk$k (id, v): x' = d·(GDx) + (1-d)·r0,
    * no renormalization (pagerank.py:297-305), d = 0.95.
    */
  private def riskCtes(k: Int, damping: Double = 0.95): String = {
    val sb = new StringBuilder
    sb ++= compositeRiskCtes
    sb ++= ",\nrk0 AS MATERIALIZED (SELECT id, v FROM r0)"
    for (i <- 1 to k) {
      val p = i - 1
      sb ++= s""",
        |rgx$i AS MATERIALIZED (
        |  SELECT e.src AS id, sum(e.weight / cd.d * xp.v) AS g
        |  FROM e JOIN indeg cd ON cd.id = e.dst JOIN rk$p xp ON xp.id = e.dst
        |  GROUP BY 1
        |),
        |rk$i AS MATERIALIZED (
        |  SELECT v.id, $damping * coalesce(g.g, 0.0) + (1.0 - $damping) * r.v AS v
        |  FROM verts v LEFT JOIN rgx$i g ON g.id = v.id JOIN r0 r ON r.id = v.id
        |)""".stripMargin
    }
    sb.toString
  }

  def riskUnrolled(k: Int): String =
    s"""WITH $prelude,
       |${riskCtes(k)}
       |SELECT id, round(v, 9) AS risk FROM rk$k ORDER BY id""".stripMargin

  def riskStats(k: Int): String =
    s"""WITH $prelude,
       |${riskCtes(k)},
       |xr AS MATERIALIZED (
       |  SELECT x.id, x.v AS x, r.v AS r0v,
       |         CASE WHEN r.v > 0 THEN x.v / r.v ELSE 1.0 END AS amp
       |  FROM rk$k x JOIN r0 r ON r.id = x.id
       |)
       |SELECT
       |  round(avg(x), 9) AS mean_risk,
       |  round(quantile_cont(x, 0.5), 9) AS median_risk,
       |  round(stddev_pop(x), 9) AS std_risk,
       |  round(max(x), 9) AS max_risk,
       |  round(min(x), 9) AS min_risk,
       |  round(sum(CASE WHEN x > (SELECT quantile_cont(x, 0.9) FROM xr) THEN x ELSE 0.0 END) / sum(x), 6) AS risk_concentration_90,
       |  round(sum(CASE WHEN x > (SELECT quantile_cont(x, 0.95) FROM xr) THEN x ELSE 0.0 END) / sum(x), 6) AS risk_concentration_95,
       |  round(sum(CASE WHEN x > (SELECT quantile_cont(x, 0.99) FROM xr) THEN x ELSE 0.0 END) / sum(x), 6) AS risk_concentration_99,
       |  round(quantile_cont(x, 0.95), 9) AS var_95,
       |  round(quantile_cont(x, 0.99), 9) AS var_99,
       |  round(avg(CASE WHEN x >= (SELECT quantile_cont(x, 0.95) FROM xr) THEN x END), 9) AS expected_shortfall_95,
       |  round(avg(CASE WHEN x >= (SELECT quantile_cont(x, 0.99) FROM xr) THEN x END), 9) AS expected_shortfall_99,
       |  round(avg(amp), 6) AS mean_amplification,
       |  round(max(amp), 6) AS max_amplification,
       |  CAST(sum(CASE WHEN x > (SELECT quantile_cont(x, 0.9) FROM xr) THEN 1 ELSE 0 END) AS BIGINT) AS high_risk_count,
       |  CAST(sum(CASE WHEN x > (SELECT quantile_cont(x, 0.99) FROM xr) THEN 1 ELSE 0 END) AS BIGINT) AS extreme_risk_count,
       |  round((SELECT quantile_cont(x, 0.9) FROM xr), 9) AS risk_threshold_90,
       |  round((SELECT quantile_cont(x, 0.95) FROM xr), 9) AS risk_threshold_95,
       |  round((SELECT quantile_cont(x, 0.99) FROM xr), 9) AS risk_threshold_99
       |FROM xr""".stripMargin

  /** Connected components: min-label transitive closure over the undirected
    * graph (fixpoint of the engine's min-label propagation).
    */
  val connectedComponents: String =
    s"""WITH RECURSIVE $prelude,
       |und AS MATERIALIZED (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e),
       |reach(id, lbl) AS (
       |  SELECT id, id FROM verts
       |  UNION
       |  SELECT u.dst, r.lbl FROM reach r JOIN und u ON u.src = r.id
       |)
       |SELECT id, CAST(min(lbl) AS BIGINT) AS component FROM reach GROUP BY id ORDER BY id""".stripMargin

  /** Synchronous LPA, k unrolled rounds: weighted neighbor-label mode, ties →
    * smallest label, isolated vertices keep their label.
    */
  def lpaUnrolled(k: Int): String = {
    val sb = new StringBuilder
    sb ++= s"WITH $prelude,\n"
    sb ++=
      """eb AS MATERIALIZED (
        |  SELECT src, dst, CAST(sum(weight) AS DOUBLE) AS weight FROM (
        |    SELECT src, dst, weight FROM e
        |    UNION ALL
        |    SELECT dst AS src, src AS dst, weight FROM e
        |  ) GROUP BY 1, 2
        |),
        |lab0 AS MATERIALIZED (SELECT id, id AS lbl FROM verts)""".stripMargin
    for (i <- 1 to k) {
      val p = i - 1
      sb ++= s""",
        |votes$i AS MATERIALIZED (
        |  SELECT eb.dst AS id, l.lbl AS lbl, sum(eb.weight) AS w
        |  FROM eb JOIN lab$p l ON l.id = eb.src GROUP BY 1, 2
        |),
        |best$i AS MATERIALIZED (
        |  SELECT id, lbl FROM (
        |    SELECT id, lbl, row_number() OVER (PARTITION BY id ORDER BY w DESC, lbl ASC) AS rn
        |    FROM votes$i
        |  ) WHERE rn = 1
        |),
        |lab$i AS MATERIALIZED (
        |  SELECT v.id, coalesce(b.lbl, l.lbl) AS lbl
        |  FROM verts v LEFT JOIN best$i b ON b.id = v.id JOIN lab$p l ON l.id = v.id
        |)""".stripMargin
    }
    sb ++= s"\nSELECT id, CAST(lbl AS BIGINT) AS label FROM lab$k ORDER BY id"
    sb.toString
  }

  /** Degree-ordered triangle listing shared CTEs, ending in `tri` (a,b,c). */
  private val triangleCtes: String =
    """und AS MATERIALIZED (
      |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM e WHERE src <> dst
      |),
      |ud AS MATERIALIZED (
      |  SELECT id, CAST(count(*) AS BIGINT) AS d FROM (
      |    SELECT u AS id FROM und UNION ALL SELECT v AS id FROM und
      |  ) GROUP BY 1
      |),
      |ori AS MATERIALIZED (
      |  SELECT CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND und.u < und.v) THEN und.u ELSE und.v END AS x,
      |         CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND und.u < und.v) THEN und.v ELSE und.u END AS y
      |  FROM und JOIN ud du ON du.id = und.u JOIN ud dv ON dv.id = und.v
      |),
      |wedge AS MATERIALIZED (
      |  SELECT o1.x AS a, o1.y AS b, o2.y AS c
      |  FROM ori o1 JOIN ori o2 ON o1.x = o2.x AND o1.y < o2.y
      |),
      |tri AS MATERIALIZED (
      |  SELECT w.a, w.b, w.c FROM wedge w
      |  JOIN und cl ON cl.u = least(w.b, w.c) AND cl.v = greatest(w.b, w.c)
      |)""".stripMargin

  val trianglesPerVertex: String =
    s"""WITH $prelude,
       |$triangleCtes,
       |corners AS MATERIALIZED (
       |  SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
       |),
       |cnts AS (SELECT id, CAST(count(*) AS BIGINT) AS triangles FROM corners GROUP BY 1)
       |SELECT v.id, coalesce(c.triangles, 0) AS triangles
       |FROM verts v LEFT JOIN cnts c ON c.id = v.id ORDER BY v.id""".stripMargin

  val clusteringCoefficients: String =
    s"""WITH $prelude,
       |$triangleCtes,
       |corners AS MATERIALIZED (
       |  SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
       |),
       |cnts AS (SELECT id, CAST(count(*) AS BIGINT) AS triangles FROM corners GROUP BY 1)
       |SELECT v.id,
       |       coalesce(c.triangles, 0) AS triangles,
       |       coalesce(u.d, 0) AS deg,
       |       round(CASE WHEN coalesce(u.d, 0) >= 2
       |             THEN 2.0 * coalesce(c.triangles, 0) / (u.d * (u.d - 1))
       |             ELSE 0.0 END, 6) AS clustering_coeff
       |FROM verts v LEFT JOIN cnts c ON c.id = v.id LEFT JOIN ud u ON u.id = v.id
       |ORDER BY v.id""".stripMargin

  // ------------------------------------------------------------------ documents

  /** Word-bigram shingle CTEs over documents: dsh (doc_id, sh), dsizes. */
  private val shingleCtes: String =
    """docs AS MATERIALIZED (SELECT doc_id, regexp_split_to_array(text, '\s+') AS w FROM documents),
      |dsh AS MATERIALIZED (
      |  SELECT DISTINCT doc_id, array_to_string(w[i:i+1], ' ') AS sh
      |  FROM docs, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
      |),
      |dsizes AS MATERIALIZED (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM dsh GROUP BY 1)""".stripMargin

  val dedupExact: String =
    """SELECT doc_id,
      |       min(doc_id) OVER (PARTITION BY text) AS cluster_id,
      |       CAST(count(*) OVER (PARTITION BY text) AS BIGINT) AS cluster_size
      |FROM documents ORDER BY doc_id""".stripMargin

  def jaccardPairs(threshold: Double): String =
    s"""WITH $shingleCtes,
       |inter AS MATERIALIZED (
       |  SELECT a.doc_id AS a, b.doc_id AS b, CAST(count(*) AS BIGINT) AS inter
       |  FROM dsh a JOIN dsh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT a, b, round(inter * 1.0 / (sa.sz + sb.sz - inter), 6) AS jaccard
       |FROM inter JOIN dsizes sa ON sa.doc_id = a JOIN dsizes sb ON sb.doc_id = b
       |WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= $threshold
       |ORDER BY a, b""".stripMargin

  /** Engine-portable 60-bit hash (Dedup.portableHash60's DuckDB twin):
    * first 15 md5 hex nibbles parsed as an integer.
    */
  private def h60(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 15))::BIGINT"

  /** MinHash + LSH banding with the portable md5-based hash — the exact
    * algorithm Dedup.minhashLshPairs(portable = true) runs: per-seed minima
    * over distinct word-n-gram shingles, band buckets over signature slices,
    * candidates inside buckets, estimated Jaccard = agreeing-minima fraction.
    */
  def minhashLsh(bands: Int, rowsPerBand: Int, threshold: Double): String = {
    val numHashes = bands * rowsPerBand
    s"""WITH docs AS MATERIALIZED (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS w FROM documents),
       |dsh AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, array_to_string(w[i:i+1], ' ') AS sh
       |  FROM docs, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
       |  WHERE len(w) >= 2
       |),
       |mh AS MATERIALIZED (
       |  SELECT doc_id, seed, min(${h60("seed::VARCHAR || ':' || sh")}) AS mh
       |  FROM dsh, UNNEST(generate_series(1, $numHashes)) AS t(seed)
       |  GROUP BY 1, 2
       |),
       |sig AS MATERIALIZED (SELECT doc_id, list(mh ORDER BY seed) AS sig FROM mh GROUP BY 1),
       |banded AS MATERIALIZED (
       |  SELECT doc_id, b,
       |         ${h60(s"b::VARCHAR || '|' || array_to_string(sig[b*$rowsPerBand+1 : b*$rowsPerBand+$rowsPerBand], ',')")} AS bucket
       |  FROM sig, UNNEST(generate_series(0, ${bands - 1})) AS t(b)
       |),
       |cands AS MATERIALIZED (
       |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
       |  FROM banded l JOIN banded r ON l.b = r.b AND l.bucket = r.bucket AND l.doc_id < r.doc_id
       |),
       |agree AS MATERIALIZED (
       |  SELECT c.a, c.b, CAST(count(*) FILTER (la.mh = lb.mh) AS DOUBLE) / $numHashes AS est
       |  FROM cands c
       |  JOIN mh la ON la.doc_id = c.a
       |  JOIN mh lb ON lb.doc_id = c.b AND lb.seed = la.seed
       |  GROUP BY 1, 2
       |)
       |SELECT a, b, round(est, 6) AS est_jaccard FROM agree WHERE est >= $threshold
       |ORDER BY a, b""".stripMargin
  }

  /** 60-bit portable SimHash pairs — the DuckDB twin of
    * Dedup.simhashPairs(portable = true): per-token md5-60 hashes, sign-sum
    * bits, 4×15-bit band candidate buckets, exact Hamming verify.
    */
  def simhashPairs(maxHamming: Int): String =
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS tok FROM documents
       |),
       |th AS MATERIALIZED (
       |  SELECT doc_id, ${h60("tok")} AS h FROM toks WHERE tok <> ''
       |),
       |bits AS MATERIALIZED (
       |  SELECT doc_id, b,
       |         CASE WHEN sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) > 0
       |              THEN 1::BIGINT ELSE 0::BIGINT END AS bit
       |  FROM th, UNNEST(generate_series(0, 59)) AS t(b)
       |  GROUP BY 1, 2
       |),
       |sig AS MATERIALIZED (SELECT doc_id, sum(bit << b) AS sig FROM bits GROUP BY 1),
       |banded AS MATERIALIZED (
       |  SELECT doc_id, sig, q, (sig >> (q * 15)) & 32767 AS bucket
       |  FROM sig, UNNEST(generate_series(0, 3)) AS t(q)
       |),
       |pairs AS (
       |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
       |         bit_count(xor(l.sig, r.sig)) AS hamming
       |  FROM banded l JOIN banded r ON l.q = r.q AND l.bucket = r.bucket AND l.doc_id < r.doc_id
       |)
       |SELECT a, b, CAST(hamming AS BIGINT) AS hamming FROM pairs WHERE hamming <= $maxHamming
       |ORDER BY a, b""".stripMargin

  val langId: String = {
    val markers = Seq(
      "en" -> Seq(" the ", " and ", " of ", " to ", " is "),
      "de" -> Seq(" der ", " und ", " die ", " das ", " ist "),
      "fr" -> Seq(" le ", " la ", " et ", " les ", " est "),
      "es" -> Seq(" el ", " la ", " los ", " que ", " es "))
    val scoreExprs = markers.map { case (lg, ms) =>
      val terms = ms.map(m =>
        s"(length(p) - length(replace(p, '$m', ''))) / ${m.length}").mkString(" + ")
      s"CAST($terms AS BIGINT) AS score_$lg"
    }.mkString(",\n       ")
    s"""WITH padded AS MATERIALIZED (
       |  SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM documents
       |),
       |scored AS MATERIALIZED (
       |  SELECT doc_id,
       |       ${scoreExprs}
       |  FROM padded
       |)
       |SELECT doc_id, score_en, score_de, score_fr, score_es,
       |       CASE WHEN greatest(score_en, score_de, score_fr, score_es) = 0 THEN 'und'
       |            WHEN score_en >= score_de AND score_en >= score_fr AND score_en >= score_es THEN 'en'
       |            WHEN score_de > score_en AND score_de >= score_fr AND score_de >= score_es THEN 'de'
       |            WHEN score_fr > score_en AND score_fr > score_de AND score_fr >= score_es THEN 'fr'
       |            ELSE 'es' END AS lang_guess
       |FROM scored ORDER BY doc_id""".stripMargin
  }

  val quality: String =
    """WITH q AS MATERIALIZED (
      |  SELECT doc_id,
      |         CAST(length(text) AS DOUBLE) AS nc,
      |         CAST(len(string_split(text, ' ')) AS DOUBLE) AS nw,
      |         CAST(length(text) - length(regexp_replace(text, '[!?.,;:]', '', 'g')) AS DOUBLE) AS np,
      |         CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) AS nd,
      |         CAST((length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' the ', ''))) / 5
      |            + (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' and ', ''))) / 5
      |            + (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' of ', ''))) / 4
      |            + (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' to ', ''))) / 4
      |            + (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' a ', ''))) / 3
      |            + (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' in ', ''))) / 4 AS DOUBLE) AS stop
      |  FROM documents
      |)
      |SELECT doc_id,
      |       CAST(nc AS BIGINT) AS n_chars,
      |       CAST(nw AS BIGINT) AS n_words,
      |       round(CASE WHEN nw > 0 THEN nc / nw ELSE 0.0 END, 6) AS avg_word_len,
      |       round(CASE WHEN nc > 0 THEN np / nc ELSE 0.0 END, 6) AS punct_ratio,
      |       round(CASE WHEN nc > 0 THEN nd / nc ELSE 0.0 END, 6) AS digit_ratio,
      |       round(CASE WHEN nw > 0 THEN stop / nw ELSE 0.0 END, 6) AS stopword_ratio,
      |       round(least(1.0, greatest(0.0,
      |         0.3 * least(nw / 100.0, 1.0)
      |           + 0.4 * least((CASE WHEN nw > 0 THEN stop / nw ELSE 0.0 END) * 5.0, 1.0)
      |           + 0.3 * (1.0 - least((CASE WHEN nc > 0 THEN np / nc ELSE 0.0 END) * 5.0, 1.0)))), 6) AS quality_score
      |FROM q ORDER BY doc_id""".stripMargin

  val tokenCounts: String =
    """SELECT doc_id,
      |       CAST(CASE WHEN length(trim(text)) = 0 THEN 0
      |            ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS ws_tokens,
      |       CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS bpeish_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  val fingerprint: String =
    """WITH norm AS MATERIALIZED (
      |  SELECT doc_id, regexp_replace(lower(text), '\s+', ' ', 'g') AS t FROM documents
      |)
      |SELECT doc_id,
      |       list_reduce(
      |         list_prepend(CAST(0 AS BIGINT),
      |           list_transform(generate_series(1, length(t)),
      |                          i -> CAST(ord(substr(t, i, 1)) AS BIGINT))),
      |         (acc, c) -> (acc * 31 + c) % 1000000007) AS fingerprint
      |FROM norm ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------ embeddings

  /** Exploded double-precision embedding values: ev (vec_id, i, v). */
  private val embCtes: String =
    """ev AS MATERIALIZED (
      |  SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
      |  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
      |),
      |norms AS MATERIALIZED (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM ev GROUP BY 1)""".stripMargin

  def embeddingPairs(threshold: Double): String =
    s"""WITH $embCtes,
       |dots AS MATERIALIZED (
       |  SELECT a.vec_id AS a, b.vec_id AS b, sum(a.v * b.v) AS dot
       |  FROM ev a JOIN ev b ON a.i = b.i AND a.vec_id < b.vec_id
       |  GROUP BY 1, 2
       |)
       |SELECT a, b, round(dot / (na.nrm * nb.nrm), 6) AS cosine
       |FROM dots JOIN norms na ON na.vec_id = a JOIN norms nb ON nb.vec_id = b
       |WHERE round(dot / (na.nrm * nb.nrm), 6) >= $threshold
       |ORDER BY a, b""".stripMargin

  def knnBrute(k: Int, numQueries: Int): String =
    s"""WITH $embCtes,
       |dots AS MATERIALIZED (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, sum(q.v * c.v) AS dot
       |  FROM ev q JOIN ev c ON q.i = c.i AND q.vec_id <> c.vec_id
       |  WHERE q.vec_id < $numQueries
       |  GROUP BY 1, 2
       |),
       |scored AS MATERIALIZED (
       |  SELECT query_id, neighbor_id, round(dot / (nq.nrm * nc.nrm), 6) AS cosine
       |  FROM dots JOIN norms nq ON nq.vec_id = query_id JOIN norms nc ON nc.vec_id = neighbor_id
       |),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
       |  FROM scored
       |)
       |SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** Mirrors Multimodal.syntheticMedia payload sizing: UTF-8 text bytes plus
    * the planted real image-header prefix (PNG 24 B on image rows with
    * id ≡ 0 mod 7, GIF 10 B on id ≡ 1 mod 7).
    */
  val mediaMeta: String =
    """SELECT doc_id AS media_id,
      |       CAST(octet_length(encode(text)) AS BIGINT)
      |         + CASE WHEN doc_id % 3 = 0 AND doc_id % 7 = 0 THEN 24
      |                WHEN doc_id % 3 = 0 AND doc_id % 7 = 1 THEN 10
      |                ELSE 0 END AS byte_len
      |FROM documents ORDER BY media_id""".stripMargin

  /** Full value oracle for the multimodal decode pipeline: header-planted
    * image rows reproduce the planted dimensions (1 + id mod 640/480 —
    * Multimodal.syntheticMedia), every other row reproduces FakeDecoder's
    * portable rolling hash h = fold (acc·31 + byte) mod 1e9+7 over the
    * payload — equal to the character-ord fold because the synthetic text is
    * pure ASCII (hash-relevant rows carry no header bytes).
    */
  val mediaFeatures: String =
    """WITH m AS MATERIALIZED (
      |  SELECT doc_id AS media_id,
      |         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |         doc_id % 7 AS r, text,
      |         CAST(octet_length(encode(text)) AS BIGINT) AS text_len
      |  FROM documents
      |),
      |h AS MATERIALIZED (
      |  SELECT media_id, media_type, r, text_len,
      |         list_reduce(
      |           list_prepend(CAST(0 AS BIGINT),
      |             list_transform(generate_series(1, length(text)),
      |                            i -> CAST(ord(substr(text, i, 1)) AS BIGINT))),
      |           (acc, c) -> (acc * 31 + c) % 1000000007) AS hv
      |  FROM m
      |)
      |SELECT media_id, media_type,
      |       text_len + CASE WHEN media_type = 'image' AND r = 0 THEN 24
      |                       WHEN media_type = 'image' AND r = 1 THEN 10
      |                       ELSE 0 END AS byte_len,
      |       CASE WHEN media_type = 'image' AND r IN (0, 1) THEN 1 + media_id % 640
      |            ELSE 64 + hv % 512 END AS width,
      |       CASE WHEN media_type = 'image' AND r IN (0, 1) THEN 1 + media_id % 480
      |            ELSE 64 + (hv // 512) % 512 END AS height,
      |       CASE WHEN media_type = 'video' THEN 1 + (hv // 262144) % 120
      |            ELSE CAST(1 AS BIGINT) END AS n_frames
      |FROM h ORDER BY media_id""".stripMargin

  /** q_ann_lsh_check computes the LSH top-k output's invariant-violation
    * counts Spark-side (the candidate set is seed-dependent, the invariants
    * are not); all must be zero, so the oracle is the constant zero row.
    */
  val annLshCheck: String =
    """SELECT CAST(0 AS BIGINT) AS over_k, CAST(0 AS BIGINT) AS bad_cosine,
      |       CAST(0 AS BIGINT) AS bad_rank, CAST(0 AS BIGINT) AS dup_pairs,
      |       CAST(0 AS BIGINT) AS self_pairs""".stripMargin

  /** The prefix study's SQL-expressible slice: per-prefix subgraph shape
    * (nodes = min(k, n) slots; edges = folded pairs whose BOTH endpoints
    * rank ≤ prefix in sorted-extId order — the dictionary's vid assignment)
    * and the solver roster with the dense-direct n ≤ 2000 gate.
    */
  def prefixCheck(sizes: Seq[Long], directSolveMax: Long): String = {
    val vals = sizes.map(k => s"(CAST($k AS BIGINT))").mkString(", ")
    s"""WITH $prelude,
       |nverts AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM verts),
       |rv AS MATERIALIZED (SELECT id, row_number() OVER (ORDER BY id) AS rk FROM verts),
       |ks AS MATERIALIZED (
       |  SELECT DISTINCT least(k, (SELECT n FROM nverts)) AS prefix
       |  FROM (VALUES $vals) t(k)
       |),
       |shape AS MATERIALIZED (
       |  SELECT ks.prefix, ks.prefix AS nodes,
       |         (SELECT CAST(count(*) AS BIGINT) FROM e
       |          JOIN rv a ON a.id = e.src JOIN rv b ON b.id = e.dst
       |          WHERE a.rk <= ks.prefix AND b.rk <= ks.prefix) AS edges
       |  FROM ks
       |)
       |SELECT prefix, nodes, edges, s.solver
       |FROM shape, (VALUES ('pr2_dangling'), ('pr3_renorm')) s(solver)
       |UNION ALL
       |SELECT prefix, nodes, edges, 'pr1_direct' FROM shape WHERE nodes <= $directSolveMax
       |ORDER BY prefix, solver""".stripMargin
  }

  /** q_sweep_check computes the convergence sweep's invariant-violation
    * counts Spark-side (iteration counts per tolerance are not
    * SQL-expressible; their invariants are); all must be zero.
    */
  def sweepCheck(numTolerances: Int): String =
    s"""SELECT CAST($numTolerances AS BIGINT) AS n_rows,
       |       CAST(0 AS BIGINT) AS bad_monotone, CAST(0 AS BIGINT) AS bad_positive,
       |       CAST(0 AS BIGINT) AS bad_converged, CAST(0 AS BIGINT) AS bad_residual""".stripMargin

}
