package graft

import org.apache.spark.sql.functions._

import graft.analytics.{NetworkAnalytics, ValueDist}
import graft.graph.LinkGraph

class AnalyticsSpec extends GraftSuite {
  import spark.implicits._

  /** numpy-equivalent percentile (linear interpolation) on a sorted array. */
  private def npPercentile(sorted: Array[Double], p: Double): Double = {
    val idx = p / 100.0 * (sorted.length - 1)
    val lo = math.floor(idx).toInt
    val hi = math.ceil(idx).toInt
    if (lo == hi) sorted(lo) else sorted(lo) + (idx - lo) * (sorted(hi) - sorted(lo))
  }

  /** reference Gini (pagerank.py:221-243) verbatim. */
  private def refGini(values: Array[Double]): Double = {
    val s = values.sorted
    val n = s.length
    val cum = s.sum
    (2.0 * s.zipWithIndex.map { case (v, i) => (i + 1) * v }.sum) / (n * cum) - (n + 1.0) / n
  }

  private val vals = Array(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 5.0)

  test("exact percentile matches numpy linear interpolation") {
    val df = vals.toSeq.toDF("v")
    for (p <- Seq(50, 90, 95, 99)) {
      val got = NetworkAnalytics.percentileOfExact(df, "v", p / 100.0)
      val want = npPercentile(vals.sorted, p)
      assert(math.abs(got - want) < 1e-12, s"p$p: got $got want $want")
    }
  }

  test("distributed percentiles match numpy on a 10k multi-partition fixture") {
    val rng = new scala.util.Random(3)
    val big = Array.fill(10000)(math.floor(rng.nextDouble() * 4000.0) / 4.0 - 500.0) // heavy ties
    val df = big.toSeq.toDF("v").repartition(7)
    val ps = Seq(0.0, 0.01, 0.25, 0.5, 0.9, 0.95, 0.99, 1.0)
    val got = NetworkAnalytics.percentilesExact(df, "v", ps)
    val sorted = big.sorted
    ps.zip(got).foreach { case (p, g) =>
      val want = npPercentile(sorted, p * 100)
      assert(math.abs(g - want) <= 1e-9 * math.max(1.0, math.abs(want)), s"p=$p got $g want $want")
    }
  }

  test("percentileRank is the empirical CDF (share <= v, x100), no global window") {
    val df = vals.toSeq.toDF("v")
    val got = NetworkAnalytics.percentileRank(df, "v")
      .select($"v", $"pct_rank").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    vals.distinct.foreach { v =>
      val want = vals.count(_ <= v).toDouble / vals.length * 100.0
      assert(math.abs(got(v) - want) < 1e-12, s"v=$v")
    }
  }

  test("band filter keeps exactly the [q1, q99] percentile band") {
    val rng = new scala.util.Random(5)
    val data = Array.fill(2000)(rng.nextGaussian())
    val kept = NetworkAnalytics.bandFilter(data.toSeq.toDF("v"), "v", 0.01, 0.99)
      .collect().map(_.getDouble(0))
    val sorted = data.sorted
    val lo = npPercentile(sorted, 1)
    val hi = npPercentile(sorted, 99)
    assert(kept.length == data.count(x => x >= lo && x <= hi))
    assert(kept.forall(x => x >= lo && x <= hi))
  }

  test("gini matches the reference formula") {
    val df = vals.toSeq.toDF("v")
    val got = NetworkAnalytics.gini(df, "v").first().getDouble(0)
    assert(math.abs(got - refGini(vals)) < 1e-12)
    // known extremes
    val equal = NetworkAnalytics.gini(Seq(2.0, 2.0, 2.0, 2.0).toDF("v"), "v").first().getDouble(0)
    assert(math.abs(equal) < 1e-12)
  }

  test("stddev is population (numpy), not sample") {
    val df = vals.toSeq.toDF("v")
    val mean = vals.sum / vals.length
    val popStd = math.sqrt(vals.map(v => (v - mean) * (v - mean)).sum / vals.length)
    val got = df.agg(stddev_pop($"v")).first().getDouble(0)
    assert(math.abs(got - popStd) < 1e-12)
  }

  test("histogram puts the max value in the last bin (matplotlib semantics)") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val hist = NetworkAnalytics.histogram(df, "v", 10).collect()
    assert(hist.map(_.getAs[Long]("cnt")).sum == 100)
    assert(hist.map(_.getAs[Long]("bin")).max == 9)
    val last = hist.find(_.getAs[Long]("bin") == 9).get
    assert(last.getAs[Long]("cnt") == 10) // 91..100, max inclusive
  }

  test("composite risk is a probability distribution with the 0.001 baseline mix") {
    val g = LinkGraph.fromEdgeList(
      spark,
      Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 0L)).toDF("src", "dst"),
      numBlocks = 2)
    val risk = NetworkAnalytics.compositeRisk(g)
    val total = risk.agg(sum($"value")).first().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-12)
    assert(risk.filter($"value" <= 0).count() == 0)
    g.unpersistAll()
  }

  test("seeded sample is exact-k, a subset, and parallelism-independent") {
    import graft.analytics.FullAnalysis
    val data = (0 until 500).map(i => (i.toLong, s"row$i"))
    val narrow = data.toDF("id", "tag").repartition(1)
    val wide = data.toDF("id", "tag").repartition(7)
    val s1 = FullAnalysis.seededSample(narrow, 50, seed = 9).collect().map(_.getLong(0)).toSeq
    val s2 = FullAnalysis.seededSample(wide, 50, seed = 9).collect().map(_.getLong(0)).toSeq
    assert(s1.size == 50 && s1.distinct.size == 50)
    assert(s1 == s2, "sample must not depend on the input partitioning")
    assert(s1.toSet.subsetOf(data.map(_._1).toSet))
    val other = FullAnalysis.seededSample(wide, 50, seed = 10).collect().map(_.getLong(0)).toSeq
    assert(other != s1, "different seed, different sample")
  }

  test("ValueDist: distributed regime matches the driver-local regime and numpy") {
    import graft.analytics.ValueDist
    val rng = new scala.util.Random(11)
    val data = Array.fill(8000)(math.floor(rng.nextDouble() * 2000.0) / 8.0 - 100.0)
    val df = data.toSeq.toDF("v").repartition(5)
    val ps = Seq(0.0, 0.01, 0.5, 0.9, 0.95, 0.99, 1.0)
    val local = ValueDist.of(df, "v")
    assert(local.isLocal)
    val forced = ValueDist.of(df, "v", forceDistributed = true)
    assert(!forced.isLocal)
    val a = local.percentiles(ps)
    val b = forced.percentiles(ps)
    val sorted = data.sorted
    ps.indices.foreach { i =>
      val want = npPercentile(sorted, ps(i) * 100)
      assert(math.abs(a(i) - want) < 1e-9, s"local p=${ps(i)}")
      assert(math.abs(b(i) - want) < 1e-9, s"distributed p=${ps(i)}")
    }
    // CDF parity between regimes
    val cdfL = local.cdf.collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val cdfD = forced.cdf.collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(cdfL.keySet == cdfD.keySet)
    cdfL.foreach { case (v, p) => assert(math.abs(cdfD(v) - p) < 1e-9, s"v=$v") }
    forced.release()
    local.release()
  }

  test("percentile machinery leaves no cached state behind (round-2 leak fix)") {
    val sc = spark.sparkContext
    import graft.analytics.ValueDist
    val df = (1 to 3000).map(i => (i.toLong, (i % 97).toDouble)).toDF("vid", "value")
    // set-difference, not counts: the ContextCleaner may concurrently reap
    // stale RDDs from earlier tests, which would shrink a raw count
    def ids = sc.getPersistentRDDs.keySet
    val before = ids

    // driver-local consumers: zero residue
    NetworkAnalytics.percentileRank(df, "value").count()
    NetworkAnalytics.riskStatistics(df, df).collect()
    NetworkAnalytics.highRiskProviders(df, df).count()
    assert((ids -- before).isEmpty, s"leaked persistent RDDs: ${ids -- before}")

    // distributed regime: release() must drop the cumulative cache
    val dist = ValueDist.of(df, "value", forceDistributed = true)
    dist.percentiles(Seq(0.5, 0.9))
    assert((ids -- before).nonEmpty, "distributed regime should cache while alive")
    dist.release()
    assert((ids -- before).isEmpty, "release() must unpersist the cumulative frame")
  }

  test("ValueDist: wide-distinct column falls to the distributed regime, not a huge collect") {
    // 2M rows of UNIQUE doubles: n <= SmallN (row count alone would pick the
    // driver-local collect) but distinct pairs are far over MaxLocalDistinct —
    // the approx-distinct gate must route this to the distributed regime
    val n = 2L * 1024 * 1024
    val wide = spark.range(n).selectExpr("cast(id as double) as v")
    val d = ValueDist.of(wide, "v", knownN = Some(n))
    assert(!d.isLocal, "unique-double column must not be collected driver-locally")
    val Seq(p50) = d.percentiles(Seq(0.5))
    assert(math.abs(p50 - (n - 1) / 2.0) < 1e-9)
    d.release()
    // and a narrow column of the same row count stays driver-local (zero residue)
    val narrow = spark.range(n).selectExpr("cast(id % 97 as double) as v")
    val dn = ValueDist.of(narrow, "v", knownN = Some(n))
    assert(dn.isLocal)
    dn.release()
  }

  test("ValueDist: nulls are dropped in both regimes (NumPy-dropna semantics)") {
    val df = Seq[java.lang.Double](1.0, null, 3.0, null, 5.0).toDF("v")
    val d = ValueDist.of(df, "v")
    assert(d.n == 3)
    assert(math.abs(d.percentile(0.5) - 3.0) < 1e-12)
    val dd = ValueDist.of(df, "v", forceDistributed = true)
    assert(dd.n == 3)
    assert(math.abs(dd.percentile(0.5) - 3.0) < 1e-12)
    dd.release()
  }

  test("network metrics mirror hand-computed values on a tiny graph") {
    // 0->1 (x2 dup), 1->2; weighted degrees: in: [0,2,1], out: [2,1,0]
    val g = LinkGraph.fromEdgeList(
      spark,
      Seq((0L, 1L), (0L, 1L), (1L, 2L)).toDF("src", "dst"),
      numBlocks = 2)
    val m = NetworkAnalytics.networkMetrics(g).first()
    assert(m.getAs[Long]("total_providers") == 3)
    assert(m.getAs[Long]("total_referrals") == 2) // folded nnz
    assert(math.abs(m.getAs[Double]("average_referrals_out") - 1.0) < 1e-12)
    assert(math.abs(m.getAs[Double]("average_referrals_in") - 1.0) < 1e-12)
    assert(m.getAs[Long]("max_referrals_out") == 2)
    assert(m.getAs[Long]("isolated_providers") == 0)
    g.unpersistAll()
  }

  test("ValueDist.ofColumns: fused multi-column build matches per-column builds") {
    import spark.implicits._
    // ties, negatives, and several partitions — the fused single-job build
    // must produce bit-identical percentiles to three independent builds
    val rng = new scala.util.Random(7)
    val rows = Seq.tabulate(5000)(i =>
      (rng.nextInt(40).toDouble - 20.0, rng.nextDouble() * 10.0, (i % 17).toDouble))
    val df = rows.toDF("a", "b", "c").repartition(7)
    val fused = ValueDist.ofColumns(df, Seq("a", "b", "c"), knownN = rows.length.toLong)
    val single = Seq("a", "b", "c").map(c => ValueDist.of(df, c, Some(rows.length.toLong)))
    val ps = Seq(0.0, 0.01, 0.25, 0.5, 0.9, 0.95, 0.99, 1.0)
    fused.zip(single).foreach { case (f, s) =>
      val fp = f.percentiles(ps)
      val sp = s.percentiles(ps)
      fp.zip(sp).foreach { case (x, y) => assert(x == y, s"fused $x != single $y") }
    }
  }
}
