package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.LinkGraph

/** Link graph derived from the driver's TPC-H-ish testdata: one directed edge
  * per (order, lineitem) pair, customer → supplier; duplicate pairs fold to
  * weights exactly like the reference's duplicate-summing matrix constructor.
  * Purely relational and SQL-mirrorable, so every downstream analytic has a
  * DuckDB oracle. Graphs are cached per directory — SparkEntry queries share
  * one build.
  */
object TestdataGraph {

  private val cache = scala.collection.mutable.Map.empty[String, LinkGraph]

  def rawEdges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    orders
      .join(lineitem, $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey".as("src"), $"l_suppkey".as("dst"))
  }

  def graph(spark: SparkSession, dir: String): LinkGraph = synchronized {
    cache.getOrElseUpdate(dir, LinkGraph.fromEdgeList(spark, rawEdges(spark, dir)))
  }

  /** Drop cached graphs (required between SparkSession restarts). */
  def clearCache(): Unit = synchronized(cache.clear())

  /** (vid, extId) dictionary joined back so outputs can be keyed by external id. */
  def withExtId(g: LinkGraph, df: DataFrame): DataFrame =
    df.join(g.vertexDict.toDF("extId", "vid"), Seq("vid")).drop("vid")
}
