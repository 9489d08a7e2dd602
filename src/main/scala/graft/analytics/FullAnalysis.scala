package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.algo.PageRank
import graft.graph.LinkGraph
import graft.model.ConvergenceRow

/** Bundle mirroring the reference's top-level pipeline result
  * (run_healthcare_analysis, /root/reference/pagerank.py:649-727): PageRank,
  * network structure, composite-risk propagation, convergence sweep.
  */
final case class AnalysisReport(
    ranks: DataFrame, // (vid, value)
    iterations: Int,
    converged: Boolean,
    finalError: Double,
    networkMetrics: DataFrame, // single row
    keyProviders: DataFrame, // hubs/authorities/central flags
    compositeRisk: DataFrame, // (vid, value) prior
    propagatedRisk: DataFrame, // (vid, value)
    riskStatistics: DataFrame, // single row
    highRiskProviders: DataFrame, // sorted desc
    convergence: Seq[ConvergenceRow]
)

object FullAnalysis {

  /** The reference's exact fan-out (pagerank.py:649-727):
    * 1. core PageRank (d=0.85);      2. network structure + key providers;
    * 3. composite risk construction; 4. risk propagation (d=0.95);
    * 5. convergence sweep.
    * Note: unlike the reference, PageRank runs ONCE and is reused for both
    * the analysis and the provider categorization (the reference recomputes
    * it from scratch at pagerank.py:687 — an acknowledged inefficiency, not a
    * semantic difference).
    */
  def run(
      graph: LinkGraph,
      damping: Double = 0.85,
      tolerance: Double = 1e-8,
      riskDamping: Double = 0.95,
      sweepTolerances: Seq[Double] = Seq(1e-4, 1e-6, 1e-8, 1e-10) // README.md:85-88
  ): AnalysisReport = {
    val pr = PageRank.run(graph, damping, tolerance)
    val ranks = pr.toVertexDf(graph)
    val prior = NetworkAnalytics.compositeRisk(graph)
    val risk = PageRank.propagateRisk(graph, prior, riskDamping, tolerance)
    val propagated = risk.toVertexDf(graph)
    AnalysisReport(
      ranks = ranks,
      iterations = pr.run.iterations,
      converged = pr.run.converged,
      finalError = pr.run.finalError,
      networkMetrics = NetworkAnalytics.networkMetrics(graph),
      keyProviders = NetworkAnalytics.keyProviders(graph, ranks),
      compositeRisk = prior,
      propagatedRisk = propagated,
      riskStatistics = NetworkAnalytics.riskStatistics(propagated, prior),
      highRiskProviders = NetworkAnalytics.highRiskProviders(propagated, prior),
      convergence = PageRank.convergenceSweep(graph, sweepTolerances, damping))
  }

  /** Deterministic seeded uniform sample w/o replacement (the engine-pinned
    * version of the reference's unseeded np.random.choice viz sampling,
    * visualizations.py:106). Rows are ranked by a content hash salted with
    * the seed — NOT rand(seed), whose draw depends on the partition index,
    * so the same data at a different parallelism would sample differently.
    * orderBy+limit plans as TakeOrderedAndProject: a distributed top-k, not
    * a global sort.
    */
  def seededSample(df: DataFrame, k: Int, seed: Long = 42L): DataFrame = {
    val cols = df.columns.map(col).toSeq
    df.orderBy((xxhash64((lit(seed) +: cols): _*) +: cols): _*).limit(k)
  }
}
