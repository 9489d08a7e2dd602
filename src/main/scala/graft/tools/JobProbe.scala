package graft.tools

import org.apache.spark.sql.SparkSession

import graft.algo.PageRank
import graft.sources.{RepoFiles, TestdataGraph}

/** Fresh-JVM cold probe of ONE bench query with a per-job timing listener:
  * prints every Spark job's wall seconds + description, so the cold-pass cost
  * (the only pass the driver's bench ever runs) is attributable job by job.
  * args: query [sfDir] [cores]   query ∈ {repo, graph, both}
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val which = if (args.nonEmpty) args(0) else "repo"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cores = if (args.length > 2) args(2).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-job-probe")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.util.FastLocalDir.sparkLocalDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val t0 = System.nanoTime()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        starts.put(j.jobId, (System.nanoTime(), desc)); ()
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(starts.get(j.jobId)).foreach { case (s, desc) =>
          val now = System.nanoTime()
          System.err.println(
            f"[job] id=${j.jobId}%-3d at=${(s - t0) / 1e9}%7.2f wall=${(now - s) / 1e9}%7.3f  $desc")
        }
      }
    })

    def t[T](name: String)(b: => T): T = {
      spark.sparkContext.setJobDescription(name)
      val s = System.nanoTime()
      val r = b
      System.err.println(f"[phase] $name: ${(System.nanoTime() - s) / 1e9}%.2f s")
      spark.sparkContext.setJobDescription(null)
      r
    }

    if (which == "graph" || which == "both") {
      val g = t("graph_build") {
        val gg = TestdataGraph.graph(spark, sfDir)
        gg.adjParts.count()
        gg
      }
      if (which == "graph") { g.unpersistAll(); TestdataGraph.clearCache() }
    }
    if (which == "repo2") { // warm second pass, per-job walls
      for (p <- 1 to 2) t(s"repo_pipeline_$p") {
        val files = RepoFiles.table(spark, numRepos = 2000, filesPerRepo = 10, vocab = 2000)
        val rg = t(s"repo_linkGraph_$p")(RepoFiles.linkGraph(spark, files, maxReposPerToken = 200))
        t(s"repo_adjParts_$p")(rg.adjParts.count())
        val out = t(s"repo_pagerank5_$p")(PageRank.run(rg, tolerance = 0.0, maxIterations = 5))
        out.free(); rg.unpersistAll()
      }
    }
    if (which == "repo" || which == "both") {
      t("repo_pipeline") {
        val files = RepoFiles.table(spark, numRepos = 2000, filesPerRepo = 10, vocab = 2000)
        val rg = t("repo_linkGraph")(RepoFiles.linkGraph(spark, files, maxReposPerToken = 200))
        t("repo_adjParts")(rg.adjParts.count())
        val out = t("repo_pagerank5")(PageRank.run(rg, tolerance = 0.0, maxIterations = 5))
        out.free(); rg.unpersistAll()
      }
    }
    spark.stop()
  }
}
