package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SkewedEdges

/** One-time kernel-bench input prep: generate the seed-pinned skewed edge
  * table, FOLD duplicates (weight = multiplicity, exactly
  * LinkGraph.fromEdgeList's folding), and write the folded (src, dst, weight)
  * parquet that every timing leg then reads.
  *
  * Rationale: the folded edge table is a pure function of (n, e, seed) — the
  * SAME bytes for every leg — but regenerating and re-folding it inside each
  * fresh-JVM leg charged the 1-core legs minutes of single-threaded setup
  * that is NOT part of what the legs compare (superstep time at fixed data
  * layout). Prep runs once at full cores; legs read the parquet.
  *
  * args: cores numVertices numEdges outPath
  */
object KernelPrep {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val n = args(1).toLong
    val e = args(2).toLong
    val outPath = args(3)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-kernel-prep")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    SkewedEdges.edges(spark, n, e)
      .groupBy($"src", $"dst")
      .agg(count(lit(1)).cast("double").as("weight"))
      .write.mode("overwrite").parquet(outPath)
    println(s"""{"prep":"$outPath"}""")
    spark.stop()
  }
}
