package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.algo.{ConnectedComponents, LabelPropagation}
import graft.sources.TestdataGraph

/** Per-stage wall breakdown for the iterative DataFrame algorithms (CC, LPA):
  * prints every completed stage's duration/task count so a slow round can be
  * attributed to a specific exchange/aggregate instead of guessed at.
  * args: [sfDir] [cc|lpa]
  */
object LoopProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val which = if (args.length > 1) args(1) else "lpa"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-loop-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.util.FastLocalDir.sparkLocalDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val ms = for {
          a <- si.completionTime; b <- si.submissionTime
        } yield a - b
        val m = si.taskMetrics
        System.err.println(
          f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%3d wall=${ms.getOrElse(-1L)}%5d ms " +
            f"cpu=${m.executorCpuTime / 1000000}%6d ms deser=${m.executorDeserializeTime}%5d ms " +
            f"gc=${m.jvmGCTime}%4d ms shR=${m.shuffleReadMetrics.totalBytesRead / 1024}%7d KB " +
            f"shW=${m.shuffleWriteMetrics.bytesWritten / 1024}%7d KB  ${si.name.take(60)}")
      }
    })
    val g = TestdataGraph.graph(spark, sfDir)
    g.edges.count()
    System.err.println(s"[probe] graph ready, running $which")
    val t0 = System.nanoTime()
    which match {
      case "cc" => ConnectedComponents.run(g).count()
      case _ => LabelPropagation.run(g, 4).count()
    }
    System.err.println(f"[probe] $which total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
