package graft

import org.apache.spark.sql.SparkSession

import graft.algo.{ConnectedComponents, LabelPropagation, PageRank, TriangleCount}
import graft.analytics.NetworkAnalytics
import graft.graph.LinkGraph
import graft.sources.{RepoFiles, SkewedEdges, TestdataGraph}

/** Benchmark main. Prints ONE JSON line:
  * {"metric":...,"value":N,"unit":"sec","queries":{...},"sf":...,
  *  "edges_per_sec_per_superstep":...,"scaling":{...}}
  *
  * Covers (a) the driver-contract queries over SPARK_GRAFT_SF_DIR, (b) a
  * fixed-scale synthetic link-graph kernel benchmark (edges/sec/superstep —
  * the BASELINE.json metric), and (c) the north-rule two-cluster-size
  * evidence: the identical kernel job at local[8] vs local[32] on the same
  * input, reporting throughput at both plus scaling efficiency (T8/T32)/4.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Mean superstep seconds over `iters` fixed supersteps (first 2 warm-up
    * supersteps excluded), using the engine's own per-superstep metrics.
    */
  private def kernelSuperstepSec(g: LinkGraph, iters: Int): Double = {
    val out = PageRank.run(g, damping = 0.85, tolerance = 0.0, maxIterations = iters)
    val times = out.metrics.drop(2).map(_.wallMs).sorted
    out.free()
    times(times.size / 2) / 1000.0 // median: robust to stray GC/dispatch stalls
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // kernel-bench scale: big enough that compute dominates fixed per-superstep
    // costs at high core counts, scaled down when few cores (graph build time)
    val (defN, defE) = if (cpus >= 16) ("4000000", "80000000") else ("1000000", "10000000")
    val benchVertices = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", defN).toLong
    val benchEdges = sys.env.getOrElse("SPARK_GRAFT_BENCH_E", defE).toLong

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]

    // ---- phase 1: driver-contract workload on the sf dir ----
    var spark = session(cpus)
    val (g, buildSec) = time {
      val gg = TestdataGraph.graph(spark, sfDir)
      gg.adjParts.count() // force CSR build
      gg
    }
    results += "graph_build" -> buildSec
    results += "pagerank_tol1e6" -> time(PageRank.run(g, tolerance = 1e-6).free())._2
    results += "risk_k6" -> time {
      val prior = NetworkAnalytics.compositeRisk(g)
      PageRank.propagateRisk(g, prior, tolerance = 0.0, maxIterations = 6).free()
    }._2
    results += "connected_components" -> time(ConnectedComponents.run(g).count())._2
    results += "lpa_k4" -> time(LabelPropagation.run(g, 4).count())._2
    results += "triangles" -> time(TriangleCount.perVertexTriangles(g).count())._2
    results += "network_metrics" -> time(NetworkAnalytics.networkMetrics(g).collect())._2

    // ---- phase 2: north-rule ingestion (repo files → shared-pattern graph) ----
    results += "repo_pipeline" -> time {
      val files = RepoFiles.table(spark, numRepos = 2000, filesPerRepo = 10, vocab = 2000)
      val rg = RepoFiles.linkGraph(spark, files, maxReposPerToken = 200)
      rg.adjParts.count()
      val out = PageRank.run(rg, tolerance = 0.0, maxIterations = 5)
      out.free(); rg.unpersistAll()
    }._2

    // ---- phases 3+4: kernel throughput + N vs 4N scaling, each in a FRESH
    // session: shared-session cache/GC residue from earlier phases was
    // measured to slow the kernel ~1.6x and mask the scaling signal ----
    g.unpersistAll()
    spark.stop()
    TestdataGraph.clearCache()

    def kernelLeg(cores: Int): (Long, Double, Double) = {
      val s = session(cores)
      val ((folded, perStep), total) = time {
        val eg = LinkGraph.fromEdgeList(s, SkewedEdges.edges(s, benchVertices, benchEdges))
        eg.gatherPartsRdd.count()
        val f = eg.numEdges
        val t = kernelSuperstepSec(eg, 12)
        eg.unpersistAll()
        (f, t)
      }
      s.stop()
      (folded, perStep, total)
    }

    // low leg FIRST: both legs share one JVM, and heap residue from a prior
    // leg slows the next one — running small-first biases the measured
    // speedup DOWNWARD (conservative).
    val lowCpus = math.max(1, cpus / 4)
    val (_, tLow, _) = kernelLeg(lowCpus)
    System.gc()

    val (foldedE, tMain, kernelSec) = kernelLeg(cpus)
    results += "kernel_pagerank_12steps" -> kernelSec
    val edgesPerSec = foldedE / tMain
    val efficiency = (tLow / tMain) / (cpus.toDouble / lowCpus)

    val total = results.values.sum
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    println(
      s"""{"metric":"edges-processed/sec per PageRank superstep","value":$total,"unit":"sec",""" +
        s""""queries":$qs,"sf":"$sfDir",""" +
        s""""kernel":{"vertices":$benchVertices,"requested_edges":$benchEdges,"folded_edges":$foldedE,""" +
        f""""superstep_sec_local$cpus%d":$tMain%.4f,"edges_per_sec_per_superstep":$edgesPerSec%.0f},""" +
        f""""scaling":{"superstep_sec_local$lowCpus%d":$tLow%.4f,"superstep_sec_local$cpus%d":$tMain%.4f,""" +
        f""""speedup_${lowCpus}_to_$cpus%d":${tLow / tMain}%.3f,"efficiency":$efficiency%.3f}}""")
  }
}
