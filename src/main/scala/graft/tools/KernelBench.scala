package graft.tools

import org.apache.spark.sql.SparkSession
import graft.graph.LinkGraph
import graft.algo.PageRank
import graft.sources.SkewedEdges

/** One kernel-benchmark leg in ONE fresh JVM: build the skewed synthetic
  * link graph, run fixed PageRank supersteps, print a single JSON line.
  *
  * Forked per leg by [[graft.Bench]] — the round-1 lesson: legs sharing a JVM
  * inherit heap/cache residue from whatever ran before them (measured ~1.6×
  * kernel slowdown), which inverted the N→4N scaling signal. A fresh process
  * per (core count) is the only clean way to compare parallelism levels on a
  * single box.
  *
  * args: cores numVertices numEdges [iterations]
  * stdout (last line): {"cores":C,"vertices":N,"requested_edges":E,
  *   "folded_edges":F,"superstep_sec":T,"edges_per_sec":R}
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val n = args(1).toLong
    val e = args(2).toLong
    val iters = if (args.length > 3) args(3).toInt else 12

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-kernel-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val g = LinkGraph.fromEdgeList(spark, SkewedEdges.edges(spark, n, e))
    g.gatherPartsRdd.count() // build + cache the CSR layout before timing
    val folded = g.numEdges
    val out = PageRank.run(g, damping = 0.85, tolerance = 0.0, maxIterations = iters)
    // median superstep, first two warm-up steps excluded: robust to stray GC
    val times = out.metrics.drop(2).map(_.wallMs).sorted
    val med = times(times.size / 2) / 1000.0
    out.free()
    g.unpersistAll()
    println(
      f"""{"cores":$cores,"vertices":$n,"requested_edges":$e,"folded_edges":$folded,""" +
        f""""superstep_sec":$med%.4f,"edges_per_sec":${folded / med}%.0f}""")
    spark.stop()
  }
}
