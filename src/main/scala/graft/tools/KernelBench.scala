package graft.tools

import org.apache.spark.sql.SparkSession
import graft.graph.LinkGraph
import graft.algo.PageRank
import graft.sources.SkewedEdges

/** Focused kernel scaling probe: same input, several core counts, repeats. */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("KB_N", "2000000").toLong
    val e = sys.env.getOrElse("KB_E", "20000000").toLong
    val coreList = sys.env.getOrElse("KB_CORES", "2,8,32").split(",").map(_.toInt)
    for (cpus <- coreList) {
      val spark = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val g = LinkGraph.fromEdgeList(spark, SkewedEdges.edges(spark, n, e))
      g.gatherPartsRdd.count()
      val out = PageRank.run(g, tolerance = 0.0, maxIterations = 12)
      val times = out.metrics.drop(2).map(_.wallMs).sorted
      val med = times(times.size / 2) / 1000.0
      val min = times.min / 1000.0
      println(f"[kb] cores=$cpus medStep=$med%.4f minStep=$min%.4f edges/s(med)=${g.numEdges / med}%.0f")
      g.unpersistAll()
      spark.stop()
    }
  }
}
