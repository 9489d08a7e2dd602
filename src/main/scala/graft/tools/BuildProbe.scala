package graft.tools

import org.apache.spark.sql.SparkSession

import graft.algo.PageRank
import graft.sources.{RepoFiles, TestdataGraph}

/** Focused fresh-JVM probe of the two build-heavy bench queries
  * (graph_build, repo_pipeline) so build-path changes can be measured
  * without paying for a full bench run. args: [sfDir] [cores]
  */
object BuildProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-build-probe")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[T](name: String)(b: => T): T = {
      val t0 = System.nanoTime()
      val r = b
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val g = t("graph_build") {
      val gg = TestdataGraph.graph(spark, sfDir)
      gg.adjParts.count()
      gg
    }
    println(s"[probe] caches after build: ${spark.sparkContext.getPersistentRDDs.size}")
    t("repo_pipeline") {
      val files = RepoFiles.table(spark, numRepos = 2000, filesPerRepo = 10, vocab = 2000)
      val rg = RepoFiles.linkGraph(spark, files, maxReposPerToken = 200)
      rg.adjParts.count()
      val out = PageRank.run(rg, tolerance = 0.0, maxIterations = 5)
      out.free(); rg.unpersistAll()
    }
    g.unpersistAll()
    TestdataGraph.clearCache()
    spark.stop()
  }
}
