package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.graph.LinkGraph

/** Synchronous label propagation for community detection (north rule).
  *
  * Each vertex starts with its own vid as label. Every superstep, ALL vertices
  * simultaneously adopt the weighted mode of their neighbors' previous-step
  * labels (both edge directions, edge weight = duplicate multiplicity); ties
  * break to the smallest label; isolated vertices keep their label. A fixed
  * iteration budget keeps the result deterministic and exact-match testable
  * (synchronous LPA can oscillate; determinism is the contract here).
  */
object LabelPropagation {

  /** Returns (vid, label) after `iterations` synchronous supersteps. */
  def run(graph: LinkGraph, iterations: Int = 10): DataFrame = {
    val spark = graph.spark
    import spark.implicits._

    val und = graph.edges
      .select($"src", $"dst", $"weight")
      .union(graph.edges.select($"dst".as("src"), $"src".as("dst"), $"weight"))
      .groupBy($"src", $"dst")
      .agg(sum($"weight").as("weight"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    und.count()

    var (labels, freeLabels) = graft.graph.Lineage.pin(
      graph.vertexDict.select($"vid", $"vid".as("label")).toDF())

    var k = 0
    while (k < iterations) {
      val votes = und
        .join(labels, und("src") === labels("vid"))
        .groupBy(und("dst").as("vid"), $"label")
        .agg(sum($"weight").as("w"))
      val win = Window.partitionBy($"vid").orderBy($"w".desc, $"label".asc)
      val adopted = votes
        .withColumn("rn", row_number().over(win))
        .filter($"rn" === 1)
        .select($"vid", $"label")
      // vertices with no neighbors keep their previous label
      val (newLabels, freeNew) = graft.graph.Lineage.pin(
        labels
          .withColumnRenamed("label", "old")
          .join(adopted, Seq("vid"), "left")
          .select($"vid", coalesce($"label", $"old").as("label")))
      freeLabels()
      labels = newLabels
      freeLabels = freeNew
      k += 1
    }
    und.unpersist()
    labels
  }
}
