package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.algo.{ConnectedComponents, LabelPropagation, PageRank, PrefixStudy, TriangleCount}
import graft.analytics.NetworkAnalytics
import graft.graph.LinkGraph
import graft.multimodal.Multimodal
import graft.sim.Ann
import graft.sources.TestdataGraph
import graft.text.{Dedup, TextAnalytics}

/** Driver contract: one query per implemented operator (SURVEY.md §2) plus a
  * DuckDB oracle for every SQL-expressible one. Column names, rounding, and
  * orderings match [[OracleSql]] exactly — the driver hash-compares values.
  */
object SparkEntry {

  /** Flagship: end-to-end pipeline on sf0.001 — fold edges, converge
    * reference-mode PageRank, emit the top-10 ranked vertices.
    */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val g = TestdataGraph.graph(spark, "/root/testdata/sf0.001")
    val out = PageRank.run(g, damping = 0.85, tolerance = 1e-8)
    TestdataGraph
      .withExtId(g, out.toVertexDf(g))
      .select($"extId".as("id"), round($"value", 8).as("rank"))
      .orderBy($"rank".desc, $"id")
      .limit(10)
  }

  private def g(s: SparkSession, dir: String): LinkGraph = TestdataGraph.graph(s, dir)

  // PrefixStudy and the convergence sweep each back TWO contract queries
  // (study + its oracle-gated check); memoized per dir like TestdataGraph's
  // graph cache so a correctness pass runs each computation ONCE — the check
  // queries stay "derived from the REAL run" without paying for a second
  // full solve (round-4 verdict task #4).
  private val prefixCache =
    scala.collection.mutable.Map.empty[String, Seq[graft.algo.PrefixStudyRow]]
  private def prefixStudy(s: SparkSession, dir: String): Seq[graft.algo.PrefixStudyRow] =
    synchronized {
      prefixCache.getOrElseUpdate(
        dir, PrefixStudy.run(g(s, dir), Seq(100L, 1000L, Long.MaxValue), tolerance = 1e-8))
    }

  private val sweepCache =
    scala.collection.mutable.Map.empty[String, Seq[graft.model.ConvergenceRow]]
  private def sweep(s: SparkSession, dir: String): Seq[graft.model.ConvergenceRow] =
    synchronized {
      sweepCache.getOrElseUpdate(dir, PageRank.convergenceSweep(g(s, dir), Seq(1e-4, 1e-6, 1e-8, 1e-10)))
    }

  /** Engine run at fixed k, output (id, rank) rounded like the oracle. */
  private def pagerankK(s: SparkSession, dir: String, k: Int): DataFrame = {
    import s.implicits._
    val graph = g(s, dir)
    val out = PageRank.run(graph, damping = 0.85, tolerance = 0.0, maxIterations = k)
    TestdataGraph
      .withExtId(graph, out.toVertexDf(graph))
      .select($"extId".as("id"), round($"value", 8).as("rank"))
      .orderBy($"id")
  }

  private def riskK(s: SparkSession, dir: String, k: Int): DataFrame = {
    import s.implicits._
    val graph = g(s, dir)
    val prior = NetworkAnalytics.compositeRisk(graph)
    val out = PageRank.propagateRisk(graph, prior, damping = 0.95, tolerance = 0.0, maxIterations = k)
    TestdataGraph
      .withExtId(graph, out.toVertexDf(graph))
      .select($"extId".as("id"), round($"value", 9).as("risk"))
      .orderBy($"id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_edges" -> { (s, dir) =>
      import s.implicits._
      g(s, dir).edges.toDF()
        .join(g(s, dir).vertexDict.toDF("srcId", "src_v"), $"src" === $"src_v")
        .join(g(s, dir).vertexDict.toDF("dstId", "dst_v"), $"dst" === $"dst_v")
        .select($"srcId".as("src"), $"dstId".as("dst"), $"weight")
        .orderBy($"src", $"dst")
    },
    "q_degrees" -> { (s, dir) =>
      import s.implicits._
      g(s, dir).degreeTable
        .select($"extId".as("id"), $"inDeg".as("in_deg"), $"outDeg".as("out_deg"))
        .orderBy($"id")
    },
    "q_network_metrics" -> { (s, dir) =>
      import s.implicits._
      NetworkAnalytics.networkMetrics(g(s, dir)).select(
        $"total_providers",
        $"total_referrals",
        round($"network_density", 12).as("network_density"),
        round($"average_referrals_out", 6).as("average_referrals_out"),
        round($"median_referrals_out", 6).as("median_referrals_out"),
        round($"std_referrals_out", 6).as("std_referrals_out"),
        $"max_referrals_out",
        round($"referral_concentration_out", 6).as("referral_concentration_out"),
        round($"average_referrals_in", 6).as("average_referrals_in"),
        round($"median_referrals_in", 6).as("median_referrals_in"),
        round($"std_referrals_in", 6).as("std_referrals_in"),
        $"max_referrals_in",
        round($"referral_concentration_in", 6).as("referral_concentration_in"),
        $"isolated_providers",
        $"hub_providers",
        round($"referral_imbalance_ratio", 6).as("referral_imbalance_ratio"))
    },
    "q_gini_degree" -> { (s, dir) =>
      import s.implicits._
      val deg = g(s, dir).degreeTable.withColumn("totalDeg", $"inDeg" + $"outDeg")
      NetworkAnalytics.gini(deg, "totalDeg").select(round($"gini", 6).as("gini"))
    },
    "q_top_degree" -> { (s, dir) =>
      import s.implicits._
      g(s, dir).degreeTable
        .select($"extId".as("id"), ($"inDeg" + $"outDeg").as("total_deg"))
        .orderBy($"total_deg".desc, $"id")
        .limit(10)
    },
    "q_hist_degree" -> { (s, dir) =>
      import s.implicits._
      val deg = g(s, dir).degreeTable.select(($"inDeg" + $"outDeg").as("totalDeg"))
      NetworkAnalytics.histogram(deg, "totalDeg", 30).select($"bin", $"cnt").orderBy($"bin")
    },
    "q_cdf_degree" -> { (s, dir) =>
      import s.implicits._
      val deg = g(s, dir).degreeTable
        .select($"extId".as("id"), ($"inDeg" + $"outDeg").as("total_deg"))
      NetworkAnalytics.percentileRank(deg, "total_deg")
        .select($"id", $"total_deg", round($"pct_rank", 6).as("pct_rank"))
        .orderBy($"id")
    },
    "q_rank_curve_degree" -> { (s, dir) =>
      import s.implicits._
      val deg = g(s, dir).degreeTable
        .select($"vid", ($"inDeg" + $"outDeg").as("score"))
      NetworkAnalytics.rankCurve(deg, "score", top = 10, step = 10, limit = 100)
        .orderBy($"rank")
    },
    "q_pagerank_k8" -> { (s, dir) => pagerankK(s, dir, 8) },
    "q_composite_risk" -> { (s, dir) =>
      import s.implicits._
      val graph = g(s, dir)
      TestdataGraph.withExtId(graph, NetworkAnalytics.compositeRisk(graph))
        .select($"extId".as("id"), round($"value", 9).as("risk"))
        .orderBy($"id")
    },
    "q_risk_k6" -> { (s, dir) => riskK(s, dir, 6) },
    "q_risk_stats_k6" -> { (s, dir) =>
      import s.implicits._
      val graph = g(s, dir)
      val prior = NetworkAnalytics.compositeRisk(graph)
      val out = PageRank.propagateRisk(graph, prior, damping = 0.95, tolerance = 0.0, maxIterations = 6)
      NetworkAnalytics.riskStatistics(out.toVertexDf(graph), prior).select(
        round($"mean_risk", 9).as("mean_risk"),
        round($"median_risk", 9).as("median_risk"),
        round($"std_risk", 9).as("std_risk"),
        round($"max_risk", 9).as("max_risk"),
        round($"min_risk", 9).as("min_risk"),
        round($"risk_concentration_90", 6).as("risk_concentration_90"),
        round($"risk_concentration_95", 6).as("risk_concentration_95"),
        round($"risk_concentration_99", 6).as("risk_concentration_99"),
        round($"var_95", 9).as("var_95"),
        round($"var_99", 9).as("var_99"),
        round($"expected_shortfall_95", 9).as("expected_shortfall_95"),
        round($"expected_shortfall_99", 9).as("expected_shortfall_99"),
        round($"mean_amplification", 6).as("mean_amplification"),
        round($"max_amplification", 6).as("max_amplification"),
        $"high_risk_count",
        $"extreme_risk_count",
        round($"risk_threshold_90", 9).as("risk_threshold_90"),
        round($"risk_threshold_95", 9).as("risk_threshold_95"),
        round($"risk_threshold_99", 9).as("risk_threshold_99"))
    },
    "q_cc" -> { (s, dir) =>
      import s.implicits._
      val graph = g(s, dir)
      val labels = ConnectedComponents.run(graph)
      // canonical label = min vid of the component; map both sides to extId
      labels
        .join(graph.vertexDict.toDF("id", "v1"), $"vid" === $"v1")
        .join(graph.vertexDict.toDF("component", "v2"), $"label" === $"v2")
        .select($"id", $"component")
        .orderBy($"id")
    },
    "q_lpa_k4" -> { (s, dir) =>
      import s.implicits._
      val graph = g(s, dir)
      val labels = LabelPropagation.run(graph, iterations = 4)
      labels
        .join(graph.vertexDict.toDF("id", "v1"), $"vid" === $"v1")
        .join(graph.vertexDict.toDF("label_ext", "v2"), $"label" === $"v2")
        .select($"id", $"label_ext".as("label"))
        .orderBy($"id")
    },
    "q_triangles" -> { (s, dir) =>
      import s.implicits._
      val graph = g(s, dir)
      TestdataGraph.withExtId(graph, TriangleCount.perVertexTriangles(graph))
        .select($"extId".as("id"), $"triangles")
        .orderBy($"id")
    },
    "q_clustering" -> { (s, dir) =>
      import s.implicits._
      val graph = g(s, dir)
      TestdataGraph.withExtId(graph, TriangleCount.clusteringCoefficients(graph))
        .select($"extId".as("id"), $"triangles", $"deg",
          round($"clustering_coeff", 6).as("clustering_coeff"))
        .orderBy($"id")
    },
    "q_key_providers" -> { (s, dir) =>
      import s.implicits._
      val graph = g(s, dir)
      val out = PageRank.run(graph, damping = 0.85, tolerance = 0.0, maxIterations = 8)
      TestdataGraph.withExtId(graph, NetworkAnalytics.keyProviders(graph, out.toVertexDf(graph)))
        .select($"extId".as("id"),
          round($"centrality_score", 9).as("centrality_score"),
          $"referrals_out", $"referrals_in",
          $"is_hub", $"is_authority", $"is_central")
        .orderBy($"id")
    },
    "q_high_risk" -> { (s, dir) =>
      import s.implicits._
      val graph = g(s, dir)
      val prior = NetworkAnalytics.compositeRisk(graph)
      val out = PageRank.propagateRisk(graph, prior, damping = 0.95, tolerance = 0.0, maxIterations = 6)
      TestdataGraph.withExtId(graph, NetworkAnalytics.highRiskProviders(out.toVertexDf(graph), prior))
        .select($"extId".as("id"),
          round($"risk_score", 9).as("risk_score"),
          round($"original_risk", 9).as("original_risk"),
          round($"amplification_factor", 6).as("amplification_factor"),
          round($"risk_percentile", 6).as("risk_percentile"))
        .orderBy($"id")
    },
    "q_risk_corr" -> { (s, dir) =>
      import s.implicits._
      val graph = g(s, dir)
      val prior = NetworkAnalytics.compositeRisk(graph)
      val risk = PageRank.propagateRisk(graph, prior, damping = 0.95, tolerance = 0.0, maxIterations = 6)
        .toVertexDf(graph)
      val pr = PageRank.run(graph, damping = 0.85, tolerance = 0.0, maxIterations = 8)
        .toVertexDf(graph)
      risk.select($"vid", $"value".as("r"))
        .join(pr.select($"vid", $"value".as("p")), Seq("vid"))
        .agg(round(corr($"r", $"p"), 6).as("risk_pagerank_corr"))
    },
    "q_prefix_pagerank" -> { (s, dir) =>
      import s.implicits._
      val graph = g(s, dir)
      val sub = graph.inducedPrefix(300L)
      val out = PageRank.run(sub, damping = 0.85, tolerance = 0.0, maxIterations = 8)
      out.toVertexDf(sub)
        .join(graph.vertexDict.toDF("id", "v"), $"vid" === $"v")
        .select($"id", round($"value", 8).as("rank"))
        .orderBy($"id")
    },
    // wall-times are non-deterministic: rows-only check
    "q_prefix_study" -> { (s, dir) =>
      import s.implicits._
      prefixStudy(s, dir)
        .map(r => (r.prefix, r.nodes, r.edges, r.solver, r.iterations, r.converged))
        .toDF("prefix", "nodes", "edges", "solver", "iterations", "converged")
    },
    // the study's SQL-expressible slice IS oracle-checkable: per-prefix
    // subgraph shape (nodes = prefix slots, edges = folded edges inside the
    // first-k-sorted-extIds block) and the solver roster incl. the
    // directSolveMax gate — derived from the REAL PrefixStudy run so a
    // divergence in its size logic fails the hash
    "q_prefix_check" -> { (s, dir) =>
      import s.implicits._
      prefixStudy(s, dir)
        .map(r => (r.prefix, r.nodes, r.edges, r.solver))
        .toDF("prefix", "nodes", "edges", "solver")
        .orderBy($"prefix", $"solver")
    },
    "q_hist_trimmed" -> { (s, dir) =>
      import s.implicits._
      val deg = g(s, dir).degreeTable.select(($"inDeg" + $"outDeg").as("totalDeg"))
      NetworkAnalytics.trimmedHistogram(deg, "totalDeg", 20, 0.01, 0.99)
        .select($"bin", $"cnt").orderBy($"bin")
    },
    "q_top_formatted" -> { (s, dir) =>
      import s.implicits._
      g(s, dir).degreeTable
        .select($"extId".as("id"), ($"inDeg" + $"outDeg").as("total_deg"))
        .orderBy($"total_deg".desc, $"id")
        .limit(10)
        .select(
          format_string("P%08d", $"id").as("provider_label"),
          $"id", $"total_deg",
          round(log10($"total_deg"), 6).as("log10_deg"))
    },
    // convergence sweep is tolerance-driven (not SQL-expressible): rows-only check
    "q_convergence_sweep" -> { (s, dir) =>
      import s.implicits._
      sweep(s, dir)
        .map(r => (r.tolerance, r.iterations, r.converged))
        .toDF("tolerance", "iterations", "converged")
    },
    // iteration counts at a tolerance are not SQL-expressible, but the
    // sweep's INVARIANTS are: one row per tolerance, iterations positive and
    // nondecreasing as the tolerance tightens (same power-iteration sequence,
    // later stop), every run converged, and the final L1 residual at or under
    // its tolerance. Violation counts must all be zero (constant oracle).
    "q_sweep_check" -> { (s, dir) =>
      import s.implicits._
      val rows = sweep(s, dir)
      val iters = rows.map(_.iterations)
      Seq((
        rows.length.toLong,
        iters.zip(iters.tail).count { case (a, b) => b < a }.toLong,
        iters.count(_ <= 0).toLong,
        rows.count(!_.converged).toLong,
        rows.count(r => r.converged && !(r.finalError <= r.tolerance)).toLong))
        .toDF("n_rows", "bad_monotone", "bad_positive", "bad_converged", "bad_residual")
    },
    // ---- documents: dedup + text analysis ----
    "q_dedup_exact" -> { (s, dir) =>
      import s.implicits._
      Dedup.exactClusters(docs(s, dir), "doc_id", "text").orderBy($"doc_id")
    },
    "q_jaccard_pairs" -> { (s, dir) =>
      import s.implicits._
      Dedup.jaccardPairs(docs(s, dir), "doc_id", "text", n = 2, threshold = 0.5)
        .select($"a", $"b", round($"jaccard", 6).as("jaccard"))
        .orderBy($"a", $"b")
    },
    // portable md5-based signatures: DuckDB mirrors the EXACT hash math, so
    // these probabilistic-banding operators get full value-level oracles
    // (round 2 ran them rows-only because xxhash64 has no DuckDB twin)
    "q_minhash_lsh" -> { (s, dir) =>
      import s.implicits._
      Dedup.minhashLshPairs(docs(s, dir), "doc_id", "text", n = 2, threshold = 0.5, portable = true)
        .select($"a", $"b", round($"est_jaccard", 6).as("est_jaccard"))
        .orderBy($"a", $"b")
    },
    "q_simhash_pairs" -> { (s, dir) =>
      import s.implicits._
      Dedup.simhashPairs(docs(s, dir), "doc_id", "text", maxHamming = 6, portable = true)
        .select($"a", $"b", $"hamming".cast("long").as("hamming"))
        .orderBy($"a", $"b")
    },
    "q_langid" -> { (s, dir) =>
      import s.implicits._
      TextAnalytics.languageId(docs(s, dir), "text")
        .select($"doc_id", $"score_en", $"score_de", $"score_fr", $"score_es", $"lang_guess")
        .orderBy($"doc_id")
    },
    "q_quality" -> { (s, dir) =>
      import s.implicits._
      TextAnalytics.qualitySignals(docs(s, dir), "text")
        .select($"doc_id", $"n_chars", $"n_words",
          round($"avg_word_len", 6).as("avg_word_len"),
          round($"punct_ratio", 6).as("punct_ratio"),
          round($"digit_ratio", 6).as("digit_ratio"),
          round($"stopword_ratio", 6).as("stopword_ratio"),
          round($"quality_score", 6).as("quality_score"))
        .orderBy($"doc_id")
    },
    "q_token_counts" -> { (s, dir) =>
      import s.implicits._
      TextAnalytics.tokenCounts(docs(s, dir), "text")
        .select($"doc_id", $"ws_tokens", $"bpeish_tokens")
        .orderBy($"doc_id")
    },
    "q_fingerprint" -> { (s, dir) =>
      import s.implicits._
      TextAnalytics.fingerprints(docs(s, dir), "doc_id", "text").orderBy($"doc_id")
    },
    // ---- embeddings: similarity search ----
    // EXACT brute-force pair set for the hash-gated oracle (the probabilistic
    // LSH path must never gate a deterministic contract — a boundary pair
    // missed with p≈3e-6 would fail the hash nondeterministically); the
    // bucketed scale path is exercised by q_ann_lsh + recall tests instead.
    // The pre-filter sits just below the rounded contract threshold so the
    // final round()-filter is identical to the oracle's.
    "q_embedding_pairs" -> { (s, dir) =>
      import s.implicits._
      Dedup.embeddingPairs(emb(s, dir), "vec_id", "embedding", threshold = 0.39)
        .select($"a", $"b", round($"cosine", 6).as("cosine"))
        .filter(round($"cosine", 6) >= 0.4)
        .orderBy($"a", $"b")
    },
    "q_knn_brute" -> { (s, dir) =>
      import s.implicits._
      val corpus = emb(s, dir).select($"vec_id".as("id"), $"embedding".as("vec"))
      val queries = emb(s, dir).filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      Ann.bruteForceTopK(corpus, queries, k = 5)
        .select($"query_id", $"neighbor_id", round($"cosine", 6).as("cosine"), $"rank".cast("long").as("rank"))
        .orderBy($"query_id", $"rank")
    },
    "q_ann_lsh" -> { (s, dir) => // seeded-hyperplane buckets: rows-only
      import s.implicits._
      val corpus = emb(s, dir).select($"vec_id".as("id"), $"embedding".as("vec"))
      val queries = emb(s, dir).filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      Ann.lshTopK(corpus, queries, k = 5, dim = 64).orderBy($"query_id", $"rank")
    },
    // the candidate SET is seed-dependent (not SQL-expressible), but the
    // output INVARIANTS are not: ≤ k rows per query, cosine equal to the
    // value independently recomputed from the embeddings table, rank dense
    // from 1 and consistent with cosine desc, no duplicate or self pairs.
    // All violation counts must be zero — the oracle is that constant row.
    "q_ann_lsh_check" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val corpus = emb(s, dir).select($"vec_id".as("id"), $"embedding".as("vec"))
      val queries = emb(s, dir).filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val out = Ann.lshTopK(corpus, queries, k = 5, dim = 64)
      val w = Window.partitionBy($"query_id").orderBy($"rank")
      out
        .join(corpus.select($"id".as("neighbor_id"), $"vec"), Seq("neighbor_id"))
        .join(queries.select($"qid".as("query_id"), $"qvec"), Seq("query_id"))
        .select($"query_id", $"neighbor_id", $"cosine", $"rank",
          Ann.cosine($"vec", $"qvec").as("recos"))
        .withColumn("prev_cos", lag($"cosine", 1).over(w))
        .withColumn("prev_rank", lag($"rank", 1).over(w))
        .agg(
          count(when($"rank" > 5, 1)).as("over_k"),
          count(when(abs($"cosine" - $"recos") > 1e-9, 1)).as("bad_cosine"),
          count(when(
            ($"prev_rank".isNull && $"rank" =!= 1) ||
              ($"prev_rank".isNotNull &&
                ($"rank" =!= $"prev_rank" + 1 || $"prev_cos" < $"cosine" - 1e-12)), 1))
            .as("bad_rank"),
          (count(lit(1)) - countDistinct($"query_id", $"neighbor_id")).as("dup_pairs"),
          count(when($"query_id" === $"neighbor_id", 1)).as("self_pairs"))
    },
    // ---- multimodal plumbing ----
    "q_media_meta" -> { (s, dir) =>
      import s.implicits._
      val media = Multimodal.syntheticMedia(docs(s, dir), "doc_id", "text")
      Multimodal.decodeFeatures(media).toDF()
        .select($"media_id", $"byte_len")
        .orderBy($"media_id")
    },
    // full value oracle: planted real PNG/GIF headers decode via HeaderDecoder,
    // everything else via the portable-rolling-hash stub — both DuckDB-mirrored
    "q_media_features" -> { (s, dir) =>
      import s.implicits._
      val media = Multimodal.syntheticMedia(docs(s, dir), "doc_id", "text")
      Multimodal.decodeFeatures(media).toDF()
        .select($"media_id", $"media_type", $"byte_len",
          $"width".cast("long").as("width"),
          $"height".cast("long").as("height"),
          $"n_frames".cast("long").as("n_frames"))
        .orderBy($"media_id")
    }
  )

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  def oracleSql: Map[String, String] = Map(
    "q_edges" -> OracleSql.edges,
    "q_degrees" -> OracleSql.degrees,
    "q_network_metrics" -> OracleSql.networkMetrics,
    "q_gini_degree" -> OracleSql.giniDegree,
    "q_top_degree" -> OracleSql.topDegree,
    "q_hist_degree" -> OracleSql.histDegree,
    "q_cdf_degree" -> OracleSql.cdfDegree,
    "q_rank_curve_degree" -> OracleSql.rankCurveDegree,
    "q_pagerank_k8" -> OracleSql.pagerankUnrolled(8),
    "q_composite_risk" -> OracleSql.compositeRisk,
    "q_risk_k6" -> OracleSql.riskUnrolled(6),
    "q_risk_stats_k6" -> OracleSql.riskStats(6),
    "q_key_providers" -> OracleSql.keyProviders(8),
    "q_high_risk" -> OracleSql.highRisk(6),
    "q_risk_corr" -> OracleSql.riskCorr(6, 8),
    "q_prefix_pagerank" -> OracleSql.pagerankPrefixUnrolled(300, 8),
    "q_hist_trimmed" -> OracleSql.histTrimmed(20),
    "q_top_formatted" -> OracleSql.topFormatted,
    "q_cc" -> OracleSql.connectedComponents,
    "q_lpa_k4" -> OracleSql.lpaUnrolled(4),
    "q_triangles" -> OracleSql.trianglesPerVertex,
    "q_clustering" -> OracleSql.clusteringCoefficients,
    "q_dedup_exact" -> OracleSql.dedupExact,
    "q_jaccard_pairs" -> OracleSql.jaccardPairs(0.5),
    "q_minhash_lsh" -> OracleSql.minhashLsh(16, 4, 0.5),
    "q_simhash_pairs" -> OracleSql.simhashPairs(6),
    "q_langid" -> OracleSql.langId,
    "q_quality" -> OracleSql.quality,
    "q_token_counts" -> OracleSql.tokenCounts,
    "q_fingerprint" -> OracleSql.fingerprint,
    "q_embedding_pairs" -> OracleSql.embeddingPairs(0.4),
    "q_knn_brute" -> OracleSql.knnBrute(5, 10),
    "q_media_meta" -> OracleSql.mediaMeta,
    "q_media_features" -> OracleSql.mediaFeatures,
    "q_ann_lsh_check" -> OracleSql.annLshCheck,
    "q_prefix_check" -> OracleSql.prefixCheck(Seq(100L, 1000L, Long.MaxValue), 2000L),
    "q_sweep_check" -> OracleSql.sweepCheck(4)
  )
}
