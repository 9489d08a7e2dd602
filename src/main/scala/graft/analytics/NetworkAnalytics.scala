package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.graph.LinkGraph

/** The reference's relational analytics re-expressed as Catalyst plans.
  * Every percentile is EXACT with np.percentile's linear-interpolation rule
  * (never percentile_approx: it breaks 1e-6 parity), served by [[ValueDist]] —
  * ONE distribution build per (frame, column) answers every threshold, the
  * median, and the CDF; above ValueDist.SmallN it is a two-phase ranked sum
  * over distinct values, so no single task ever holds all n values (SQL
  * `percentile` is one ObjectHashAggregate buffer: 8 GB in one task at 10⁹
  * vertices). NumPy std is population σ → `stddev_pop`, not Spark's default
  * sample stddev. Threshold-dependent aggregates run as two phases
  * (percentile scalars first, then the conditional agg with literal
  * thresholds) because SQL forbids nesting aggregates.
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

  /** Sorted distinct values with global cumulative counts, computed with the
    * gini-style two-phase pattern (range-partition → local prefix sums →
    * exclusive-prefix offsets) — NO single-partition window, no single-task
    * ObjectHashAggregate holding all n values. Returns (frame of
    * (__v, __c, __cum), total row count, release handle).
    *
    * The sorted frame is persisted before the offsets job because
    * repartitionByRange SAMPLES its bounds per materialization — two
    * evaluations could disagree on partition boundaries and corrupt the
    * offsets. The release handle unpersists the sorted frame AND destroys the
    * offsets broadcast — after calling it the returned frame must not be
    * evaluated again.
    */
  private[analytics] def cumulativeCounts(df: DataFrame, valueCol: String): (DataFrame, Long, () => Unit) = {
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df
      .select(col(valueCol).cast("double").as("__v"))
      .groupBy($"__v")
      .agg(count(lit(1)).as("__c"))
    val p = math.max(1, spark.sparkContext.defaultParallelism)
    val sorted = counts
      .repartitionByRange(p, $"__v")
      .sortWithinPartitions($"__v")
      .as[(Double, Long)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partTotals = sorted
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var s = 0L
        var any = false
        it.foreach { case (_, c) => s += c; any = true }
        if (any) Iterator.single((pid, s)) else Iterator.empty
      }
      .collect()
      .sortBy(_._1)
    val n = partTotals.map(_._2).sum
    var acc = 0L
    val offsets: Map[Int, Long] =
      partTotals.map { case (pid, c) => val r = (pid, acc); acc += c; r }.toMap
    val bo = spark.sparkContext.broadcast(offsets)
    val cum = sorted
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var run = bo.value.getOrElse(pid, 0L)
        it.map { case (v, c) => run += c; (v, c, run) }
      }
      .toDF("__v", "__c", "__cum")
    (cum, n, () => { sorted.unpersist(); bo.destroy(); () })
  }

  /** Exact NumPy-interpolation percentiles, one [[ValueDist]] build serving
    * all requested ps (see ValueDist for the regime split; no single task
    * ever holds all n values in either regime).
    */
  def percentilesExact(df: DataFrame, valueCol: String, ps: Seq[Double]): Seq[Double] = {
    val dist = ValueDist.of(df, valueCol)
    try dist.percentiles(ps)
    finally dist.release()
  }

  /** Exact percentile (linear interpolation, NumPy-equal), distributed. */
  def percentileOfExact(df: DataFrame, valueCol: String, p: Double): Double =
    percentilesExact(df, valueCol, Seq(p)).head

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

    // thresholds + medians: ONE fused distribution job over the CACHED degree
    // table serves all three columns (degreeTable has exactly n rows — the
    // count job is skipped), each dist then serving both of its probes
    val Seq(distOut, distIn, distTot) =
      ValueDist.ofColumns(deg, Seq("outDeg", "inDeg", "totalDeg"), knownN = n)
    val Seq(p90out, medOut) = distOut.percentiles(Seq(0.9, 0.5))
    val Seq(p90in, medIn) = distIn.percentiles(Seq(0.9, 0.5))
    val p95tot = distTot.percentile(0.95)
    distOut.release(); distIn.release(); distTot.release()

    deg.agg(
      lit(n).as("total_providers"),
      lit(nnz).as("total_referrals"),
      lit(if (n > 1) nnz.toDouble / (n.toDouble * (n - 1)) else 0.0).as("network_density"),
      avg($"outDeg").as("average_referrals_out"),
      lit(medOut).as("median_referrals_out"),
      stddev_pop($"outDeg").as("std_referrals_out"),
      max($"outDeg").cast("long").as("max_referrals_out"),
      (sum(when($"outDeg" > lit(p90out), 1L).otherwise(0L)).cast("double") / lit(n.toDouble))
        .as("referral_concentration_out"),
      avg($"inDeg").as("average_referrals_in"),
      lit(medIn).as("median_referrals_in"),
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
    // maxes as DRIVER LITERALS: max() is order-insensitive (exact), and with
    // the scalars known at plan time the when()-branch resolves statically —
    // same per-row arithmetic (1/3 · c/max, or 1/3 · 0.0) as the previous
    // crossJoin(broadcast(maxes)) shape, minus one broadcast-exchange job and
    // a join in every downstream evaluation of the prior's plan (guide §2.4).
    val mrow = withComponents
      .agg(max($"totalDeg").as("mT"), max($"imb").as("mI"), max($"iso").as("mO"))
      .first()
    def mx(i: Int): Double = if (mrow.isNullAt(i)) 0.0 else mrow.getDouble(i)
    def term(c: Column, m: Double): Column =
      if (m > 0) lit(1.0 / 3) * (c / lit(m)) else lit(1.0 / 3) * lit(0.0)
    val scored = withComponents
      .select(
        $"vid",
        (lit(0.001)
          + term($"totalDeg", mx(0))
          + term($"imb", mx(1))
          + term($"iso", mx(2))).as("raw"))
    // pin the scored frame ONCE: the returned prior is consumed repeatedly
    // (the total below, the engine's normalization sum, its chunking pass,
    // risk statistics…) and every consumption used to replay the maxes
    // broadcast + degree join chain — 3+ full evaluations per risk query.
    // The localCheckpoint cache is reclaimed by the ContextCleaner when the
    // frame becomes unreferenced (same pattern as keyProviders).
    val (scoredP, _) = graft.graph.Lineage.pin(scored)
    val total = scoredP.agg(sum($"raw")).first().getDouble(0)
    scoredP.select($"vid", ($"raw" / lit(total)).as("value"))
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
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // ONE distribution build serves all four thresholds + the median
    val dist = ValueDist.of(joined, "x")
    val Seq(t90, t95, t99, medRisk) = dist.percentiles(Seq(0.9, 0.95, 0.99, 0.5))
    dist.release()

    val aggDf = joined.agg(
      avg($"x").as("mean_risk"),
      lit(medRisk).as("median_risk"),
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
    // single-row result: evaluate eagerly so the joined cache can be dropped
    // with zero persisted residue, and return a local relation
    val row = aggDf.collect()(0)
    joined.unpersist(false)
    spark.createDataFrame(java.util.Collections.singletonList(row), aggDf.schema)
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
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE distribution build serves both the p90 threshold and the CDF join
    val dist = ValueDist.of(joined, "x")
    val thr = dist.percentile(0.9)
    val withCdf = joinCdf(joined, "x", dist)
      .withColumnRenamed("pct_rank", "risk_percentile")
    val out = withCdf
      .filter($"x" > lit(thr))
      .select(
        $"vid",
        $"x".as("risk_score"),
        $"r0".as("original_risk"),
        when($"r0" > 0, $"x" / $"r0").otherwise(lit(1.0)).as("amplification_factor"),
        $"risk_percentile")
      .orderBy($"risk_score".desc, $"vid")
    if (dist.isLocal) {
      // result plan only references the (re-computable) join and a local CDF
      // relation — drop the scratch cache now, consumption re-runs one cheap join
      joined.unpersist(false)
      out
    } else {
      // large regime: pin the (n/10-row) result so the cumulative cache can be
      // freed; the pin is reclaimed by the ContextCleaner when unreferenced
      val (pinned, _) = graft.graph.Lineage.pin(out)
      dist.release()
      joined.unpersist(false)
      pinned
    }
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
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // left join on the full vertex table keeps exactly numVertices rows;
    // one fused distribution job answers all three thresholds
    val Seq(dHub, dAuth, dCent) =
      ValueDist.ofColumns(joined, Seq("outDeg", "inDeg", "score"), knownN = graph.numVertices)
    val hubThr = { val t = dHub.percentile(0.9); dHub.release(); t }
    val authThr = { val t = dAuth.percentile(0.9); dAuth.release(); t }
    val centThr = { val t = dCent.percentile(0.9); dCent.release(); t }
    // pin the (≤ 3n/10-row) result BEFORE dropping the scratch cache — round 3
    // unpersisted first, so every later consumption re-ran the degree⋈ranks
    // join; the pin is reclaimed by the ContextCleaner when unreferenced
    val result = joined
      .select(
        $"vid", $"score".as("centrality_score"),
        $"outDeg".as("referrals_out"), $"inDeg".as("referrals_in"),
        ($"outDeg" > lit(hubThr)).as("is_hub"),
        ($"inDeg" > lit(authThr)).as("is_authority"),
        ($"score" > lit(centThr)).as("is_central"))
      .filter($"is_hub" || $"is_authority" || $"is_central")
    val (pinned, _) = graft.graph.Lineage.pin(result)
    joined.unpersist(false)
    pinned.orderBy($"vid")
  }

  /** Band (quantile-trim) filter: keep rows with value inside the
    * [loQ, hiQ] percentile band — the reference trims q1..q99 outliers before
    * plotting distributions (visualizations.py:232-234, :824-826).
    */
  def bandFilter(df: DataFrame, valueCol: String, loQ: Double = 0.01, hiQ: Double = 0.99): DataFrame = {
    val Seq(lo, hi) = percentilesExact(df, valueCol, Seq(loQ, hiQ))
    df.filter(col(valueCol).cast("double").between(lo, hi))
  }

  /** Outlier-trimmed histogram: band-filter to the [loQ, hiQ] percentile band,
    * then bin what remains (visualizations.py:232-236 trim-then-hist shape).
    */
  def trimmedHistogram(
      df: DataFrame,
      valueCol: String,
      bins: Int,
      loQ: Double = 0.01,
      hiQ: Double = 0.99
  ): DataFrame =
    histogram(bandFilter(df, valueCol, loQ, hiQ), valueCol, bins)

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
    * Driver-local regime (n ≤ ValueDist.SmallN): broadcast join against a
    * local CDF relation — zero persisted residue. Large regime: the two-phase
    * ranked sum over distinct values (no single-partition window — round 1
    * fed ~n distinct doubles through one task here); the result is pinned and
    * the cumulative cache released before returning (round 2 leaked it for
    * the session), so the only cluster state left is the result itself,
    * reclaimed by the ContextCleaner when the frame is dropped.
    */
  def percentileRank(df: DataFrame, valueCol: String): DataFrame = {
    val dist = ValueDist.of(df, valueCol)
    val out = joinCdf(df, valueCol, dist)
    if (dist.isLocal) out
    else {
      val (pinned, _) = graft.graph.Lineage.pin(out)
      dist.release()
      pinned
    }
  }

  private def joinCdf(df: DataFrame, valueCol: String, dist: ValueDist): DataFrame = {
    val cdf = if (dist.isLocal) broadcast(dist.cdf) else dist.cdf
    df.join(cdf, col(valueCol).cast("double") === col("__v")).drop("__v")
  }
}
