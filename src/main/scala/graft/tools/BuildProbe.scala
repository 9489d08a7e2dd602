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
      .config("spark.local.dir", graft.util.FastLocalDir.sparkLocalDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[T](name: String)(b: => T): T = {
      val t0 = System.nanoTime()
      val r = b
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    if (args.length > 2 && args(2) == "repo-steps") {
      // sub-step breakdown of the repo pipeline for targeted optimization
      val files = RepoFiles.table(spark, numRepos = 2000, filesPerRepo = 10, vocab = 2000)
      t("repo_table_count")(files.count())
      val rt = t("repo_tokens_distinct")(
        { val r = RepoFiles.repoTokens(files).distinct(); r.count(); r })
      val e = RepoFiles.sharedPatternEdges(files, maxReposPerToken = 200)
      t("shared_edges_count")(println(s"[probe] pair rows: ${e.count()}"))
      // fromEdgeList internals, step by step
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val folded = e.select($"src".cast("long"), $"dst".cast("long"))
        .groupBy($"src", $"dst").agg(count(lit(1)).cast("double").as("weight"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("fel_fold")(println(s"[probe] folded edges: ${folded.count()}"))
      val dict = t("fel_dict")(graft.graph.LinkGraph.buildDictionary(spark, folded))
      val srcDict = dict.toDF("extId", "vid")
      val remapped = folded
        .join(srcDict.withColumnRenamed("extId", "src").withColumnRenamed("vid", "srcVid"), Seq("src"))
        .join(srcDict.withColumnRenamed("extId", "dst").withColumnRenamed("vid", "dstVid"), Seq("dst"))
        .select($"srcVid".as("src"), $"dstVid".as("dst"), $"weight")
      t("fel_remap_plan")(remapped.explain())
      t("fel_remap_count")(remapped.count())
      val rg = t("repo_from_edge_list_total")(
        { val g2 = graft.graph.LinkGraph.fromEdgeList(spark, e); g2.adjParts.count(); g2 })
      t("repo_pagerank5")({ val o = PageRank.run(rg, tolerance = 0.0, maxIterations = 5); o.free() })
      rg.unpersistAll()
      spark.stop()
      return
    }

    if (args.length > 2 && args(2) == "risk-steps") {
      // sub-step breakdown of the two regressed bench queries (risk_k6,
      // high_risk_providers), in bench order after the same warm-up, so the
      // r3→r4 delta can be attributed to a step instead of guessed at
      val g = t("graph_build") {
        val gg = TestdataGraph.graph(spark, sfDir); gg.adjParts.count(); gg
      }
      t("pagerank_tol1e6")(PageRank.run(g, tolerance = 1e-6).free())
      t("degree_table")(g.degreeTable.count())
      val prior = t("composite_prior") {
        val p = graft.analytics.NetworkAnalytics.compositeRisk(g)
        p.count(); p
      }
      t("risk_k6_total") {
        val p2 = graft.analytics.NetworkAnalytics.compositeRisk(g)
        PageRank.propagateRisk(g, p2, tolerance = 0.0, maxIterations = 6).free()
      }
      val out = t("propagate6")(
        PageRank.propagateRisk(g, prior, tolerance = 0.0, maxIterations = 6))
      val vdf = t("to_vertex_df")({ val v = out.toVertexDf(g); v.count(); v })
      t("risk_stats")(
        graft.analytics.NetworkAnalytics.riskStatistics(vdf, prior).collect())
      t("high_risk")(
        graft.analytics.NetworkAnalytics.highRiskProviders(vdf, prior).count())
      out.free()
      g.unpersistAll()
      TestdataGraph.clearCache()
      spark.stop()
      return
    }

    if (args.length > 2 && args(2) == "graph-steps") {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val raw = TestdataGraph.rawEdges(spark, sfDir)
      val folded = raw.select($"src".cast("long"), $"dst".cast("long"))
        .groupBy($"src", $"dst").agg(count(lit(1)).cast("double").as("weight"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("tg_fold")(println(s"[probe] folded: ${folded.count()}"))
      val dict = t("tg_dict")(graft.graph.LinkGraph.buildDictionary(spark, folded))
      t("tg_dict_n")(println(s"[probe] n: ${dict.count()}"))
      val g2 = t("tg_full_build")({
        val gg = TestdataGraph.graph(spark, sfDir); gg.adjParts.count(); gg
      })
      t("tg_gather")(g2.gatherPartsRdd.count())
      t("tg_degree")(g2.degreeTable.count())
      g2.unpersistAll()
      TestdataGraph.clearCache()
      spark.stop()
      return
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
