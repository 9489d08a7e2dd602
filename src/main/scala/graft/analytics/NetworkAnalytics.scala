package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.graph.LinkGraph

/** The reference's relational analytics re-expressed as Catalyst plans.
  * Every percentile is Spark SQL `percentile` — exact, the same
  * linear-interpolation definition as np.percentile (never percentile_approx:
  * it breaks 1e-6 parity). NumPy std is population σ → `stddev_pop`, not
  * Spark's default sample stddev. Medians are exact percentile(.5).
  * Threshold-dependent aggregates run as two phases (percentile scalars
  * first, then the conditional agg with literal thresholds) because SQL
  * forbids nesting aggregates.
  */
object NetworkAnalytics {

  /** Gini coefficient of a column (pagerank.py:221-243):
    * sort asc, G = 2·Σ(i·v_i)/(n·Σv) − (n+1)/n with 1-based ranks. Ties share
    * equal v, so rank order within a tie group cannot change the sum.
    */
  def gini(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // Distributed global ranking (no single-partition window): range-partition
    // by value, sort within partitions, then offset per-partition local ranks
    // by the exclusive prefix of partition counts — Σ((off+j)·v) decomposes as
    // Σ(j·v) + off·Σv per partition, so one pass computes everything.
    val p = math.max(1, spark.sparkContext.defaultParallelism)
    val sorted = df
      .select(col(valueCol).cast("double").as("v"))
      .repartitionByRange(p, $"v")
      .sortWithinPartitions($"v")
      .select($"v", spark_partition_id().as("pid"))
      .as[(Double, Int)]
    val perPartition = sorted
      .mapPartitions { it =>
        var pid = -1
        var cnt = 0L
        var s = 0.0
        var iv = 0.0 // Σ (1-based local index · v)
        it.foreach { case (v, id) =>
          pid = id; cnt += 1; s += v; iv += cnt * v
        }
        if (cnt == 0) Iterator.empty else Iterator.single((pid, cnt, s, iv))
      }
      .collect()
      .sortBy(_._1)
    var off = 0L
    var n = 0L
    var sumV = 0.0
    var sumIv = 0.0
    perPartition.foreach { case (_, cnt, s, iv) =>
      sumIv += iv + off.toDouble * s
      sumV += s
      off += cnt
      n += cnt
    }
    val g = if (n == 0 || sumV == 0.0) 0.0
    else 2.0 * sumIv / (n * sumV) - (n + 1.0) / n
    Seq(g).toDF("gini")
  }

  /** Exact percentile via SQL `percentile` (linear interpolation, NumPy-equal). */
  def percentileOfExact(df: DataFrame, valueCol: String, p: Double): Double =
    df.agg(percentile(col(valueCol), lit(p))).first().getDouble(0)

  /** network_metrics block (pagerank.py:459-486) as a single-row DataFrame.
    * Degrees are weighted row/column sums over the folded matrix, zero-filled
    * across all n vertices (reference arrays have length n).
    */
  def networkMetrics(graph: LinkGraph): DataFrame = {
    val spark = graph.spark
    import spark.implicits._
    val deg = graph.degreeTable.withColumn("totalDeg", $"inDeg" + $"outDeg")
    val nnz = graph.numEdges // distinct (src,dst) pairs = G.nnz
    val n = graph.numVertices

    val thr = deg.agg(
      percentile($"outDeg", lit(0.9)).as("p90out"),
      percentile($"inDeg", lit(0.9)).as("p90in"),
      percentile($"totalDeg", lit(0.95)).as("p95tot")).first()
    val (p90out, p90in, p95tot) = (thr.getDouble(0), thr.getDouble(1), thr.getDouble(2))

    deg.agg(
      lit(n).as("total_providers"),
      lit(nnz).as("total_referrals"),
      lit(if (n > 1) nnz.toDouble / (n.toDouble * (n - 1)) else 0.0).as("network_density"),
      avg($"outDeg").as("average_referrals_out"),
      percentile($"outDeg", lit(0.5)).as("median_referrals_out"),
      stddev_pop($"outDeg").as("std_referrals_out"),
      max($"outDeg").cast("long").as("max_referrals_out"),
      (sum(when($"outDeg" > lit(p90out), 1L).otherwise(0L)).cast("double") / lit(n.toDouble))
        .as("referral_concentration_out"),
      avg($"inDeg").as("average_referrals_in"),
      percentile($"inDeg", lit(0.5)).as("median_referrals_in"),
      stddev_pop($"inDeg").as("std_referrals_in"),
      max($"inDeg").cast("long").as("max_referrals_in"),
      (sum(when($"inDeg" > lit(p90in), 1L).otherwise(0L)).cast("double") / lit(n.toDouble))
        .as("referral_concentration_in"),
      sum(when($"totalDeg" === 0.0, 1L).otherwise(0L)).as("isolated_providers"),
      sum(when($"totalDeg" > lit(p95tot), 1L).otherwise(0L)).as("hub_providers"),
      avg(when($"inDeg" > 0, $"outDeg" / ($"inDeg" + lit(1e-10))).otherwise($"outDeg"))
        .as("referral_imbalance_ratio"))
  }

  /** Composite risk scores (pagerank.py:690-713): equal-weight mix of
    * connectivity, referral imbalance, and (inverse-degree) isolation risk,
    * each min-max scaled, plus 0.001 baseline; normalized to sum 1.
    * Returns (vid, value).
    */
  def compositeRisk(graph: LinkGraph): DataFrame = {
    val spark = graph.spark
    import spark.implicits._
    val deg = graph.degreeTable.withColumn("totalDeg", $"inDeg" + $"outDeg")
    val withComponents = deg
      .withColumn("imb", when($"inDeg" > 0, $"outDeg" / ($"inDeg" + lit(1e-10))).otherwise($"outDeg"))
      .withColumn("iso", lit(1.0) / (lit(1.0) + $"totalDeg"))
    val maxes = withComponents
      .agg(max($"totalDeg").as("mT"), max($"imb").as("mI"), max($"iso").as("mO"))
    val scored = withComponents
      .crossJoin(broadcast(maxes))
      .select(
        $"vid",
        (lit(0.001)
          + lit(1.0 / 3) * when($"mT" > 0, $"totalDeg" / $"mT").otherwise(0.0)
          + lit(1.0 / 3) * when($"mI" > 0, $"imb" / $"mI").otherwise(0.0)
          + lit(1.0 / 3) * when($"mO" > 0, $"iso" / $"mO").otherwise(0.0)).as("raw"))
    val total = scored.agg(sum($"raw")).first().getDouble(0)
    scored.select($"vid", ($"raw" / lit(total)).as("value"))
  }

  /** risk_statistics block (pagerank.py:307-362) over propagated risk (vid,
    * value) joined with the original prior (vid, value). Single-row DataFrame.
    */
  def riskStatistics(propagated: DataFrame, prior: DataFrame): DataFrame = {
    val spark = propagated.sparkSession
    import spark.implicits._
    val joined = propagated
      .select($"vid", $"value".as("x"))
      .join(prior.select($"vid", $"value".as("r0")), Seq("vid"))
      .withColumn("amp", when($"r0" > 0, $"x" / $"r0").otherwise(lit(1.0)))

    val thr = joined.agg(
      percentile($"x", lit(0.9)).as("t90"),
      percentile($"x", lit(0.95)).as("t95"),
      percentile($"x", lit(0.99)).as("t99")).first()
    val (t90, t95, t99) = (thr.getDouble(0), thr.getDouble(1), thr.getDouble(2))

    joined.agg(
      avg($"x").as("mean_risk"),
      percentile($"x", lit(0.5)).as("median_risk"),
      stddev_pop($"x").as("std_risk"),
      max($"x").as("max_risk"),
      min($"x").as("min_risk"),
      (sum(when($"x" > lit(t90), $"x")) / sum($"x")).as("risk_concentration_90"),
      (sum(when($"x" > lit(t95), $"x")) / sum($"x")).as("risk_concentration_95"),
      (sum(when($"x" > lit(t99), $"x")) / sum($"x")).as("risk_concentration_99"),
      lit(t95).as("var_95"),
      lit(t99).as("var_99"),
      avg(when($"x" >= lit(t95), $"x")).as("expected_shortfall_95"),
      avg(when($"x" >= lit(t99), $"x")).as("expected_shortfall_99"),
      avg($"amp").as("mean_amplification"),
      max($"amp").as("max_amplification"),
      sum(when($"x" > lit(t90), 1L).otherwise(0L)).as("high_risk_count"),
      sum(when($"x" > lit(t99), 1L).otherwise(0L)).as("extreme_risk_count"),
      lit(t90).as("risk_threshold_90"),
      lit(t95).as("risk_threshold_95"),
      lit(t99).as("risk_threshold_99"))
  }

  /** Per-provider high-risk records (pagerank.py:364-386): providers above the
    * p90 threshold with amplification and empirical-CDF percentile, sorted by
    * risk desc (vid tiebreak for determinism).
    */
  def highRiskProviders(propagated: DataFrame, prior: DataFrame): DataFrame = {
    val spark = propagated.sparkSession
    import spark.implicits._
    val joined = propagated
      .select($"vid", $"value".as("x"))
      .join(prior.select($"vid", $"value".as("r0")), Seq("vid"))
    val thr = percentileOfExact(joined, "x", 0.9)
    val withCdf = percentileRank(joined, "x")
      .withColumnRenamed("pct_rank", "risk_percentile")
    withCdf
      .filter($"x" > lit(thr))
      .select(
        $"vid",
        $"x".as("risk_score"),
        $"r0".as("original_risk"),
        when($"r0" > 0, $"x" / $"r0").otherwise(lit(1.0)).as("amplification_factor"),
        $"risk_percentile")
      .orderBy($"risk_score".desc, $"vid")
  }

  /** hubs/authorities/central categories (pagerank.py:444-455): vertices above
    * the p90 of out-degree / in-degree / rank score respectively.
    */
  def keyProviders(graph: LinkGraph, ranks: DataFrame): DataFrame = {
    val spark = graph.spark
    import spark.implicits._
    val joined = graph.degreeTable
      .join(ranks.select($"vid", $"value".as("score")), Seq("vid"), "left")
      .na.fill(0.0, Seq("score"))
    val hubThr = percentileOfExact(joined, "outDeg", 0.9)
    val authThr = percentileOfExact(joined, "inDeg", 0.9)
    val centThr = percentileOfExact(joined, "score", 0.9)
    joined
      .select(
        $"vid", $"score".as("centrality_score"),
        $"outDeg".as("referrals_out"), $"inDeg".as("referrals_in"),
        ($"outDeg" > lit(hubThr)).as("is_hub"),
        ($"inDeg" > lit(authThr)).as("is_authority"),
        ($"score" > lit(centThr)).as("is_central"))
      .filter($"is_hub" || $"is_authority" || $"is_central")
      .orderBy($"vid")
  }

  /** Fixed-bin equi-width histogram over observed [min, max] — matplotlib
    * semantics: the max value falls in the LAST bin (right edge inclusive).
    * (visualizations.py:236 etc.) Returns (bin, lo, hi, cnt) sorted by bin.
    */
  def histogram(df: DataFrame, valueCol: String, bins: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valueCol).cast("double")
    val mm = df.agg(min(v).as("lo"), max(v).as("hi")).first()
    val lo = mm.getDouble(0)
    val hi = mm.getDouble(1)
    val width = if (hi > lo) (hi - lo) / bins else 1.0
    df.select(
        least(floor((v - lit(lo)) / lit(width)), lit(bins - 1L)).cast("long").as("bin"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("cnt"))
      .select($"bin", (lit(lo) + $"bin" * lit(width)).as("lo"),
        (lit(lo) + ($"bin" + 1) * lit(width)).as("hi"), $"cnt")
      .orderBy($"bin")
  }

  /** Rank-ordered score curve with strided decimation
    * (visualizations.py:211-221): top-k kept, then every `step`-th rank.
    */
  def rankCurve(scores: DataFrame, valueCol: String, top: Int, step: Int, limit: Int): DataFrame = {
    val spark = scores.sparkSession
    import spark.implicits._
    // TakeOrderedAndProject keeps the global sort distributed; the window only
    // ever sees the tiny prefix it needs (top + step·limit rows).
    val need = math.max(top, step * limit)
    val prefix = scores
      .orderBy(col(valueCol).desc, $"vid")
      .limit(need)
    prefix
      .withColumn("rank", row_number().over(Window.orderBy(col(valueCol).desc, $"vid")))
      .filter($"rank" <= top || ($"rank" % step === 0 && $"rank" <= step.toLong * limit))
      .select($"rank", col(valueCol).as("score"))
      .orderBy($"rank")
  }

  /** Empirical CDF percentile (pagerank.py:371): share of values <= v, ×100.
    * The running total is windowed over DISTINCT values only (then joined
    * back), so the single-partition window touches |distinct values| rows,
    * not n — degrees and scores are heavily tied at scale. Fully general
    * inputs with ~n distinct values should pre-bucket first.
    */
  def percentileRank(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = df.count().toDouble
    val cum = df
      .groupBy(col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum",
        sum($"__c").over(
          Window.orderBy($"__v").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"__v", ($"__cum" / lit(n) * 100.0).as("pct_rank"))
    df.join(cum, col(valueCol) === col("__v")).drop("__v")
  }
}
