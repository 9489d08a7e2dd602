package graft.algo

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.graph.LinkGraph

/** Connected components by iterative min-label hash propagation (north rule).
  *
  * Components are of the *underlying undirected* graph. Every vertex starts
  * labeled with its own vid; each superstep every vertex takes the min of its
  * own label and all neighbor labels (both edge directions); convergence when
  * no label changed. Final labels are canonical: the min vid of the component.
  *
  * Scale notes: messages are one row per directed edge per superstep, hash
  * partitioned by the receiving vertex; `min` aggregation is partial+final
  * (map-side combine) so hub vertices do not concentrate rows; lineage is cut
  * per superstep with localCheckpoint. Iterations ≤ graph diameter.
  */
object ConnectedComponents {

  /** Returns (vid, label). */
  def run(graph: LinkGraph, maxIterations: Int = 200): DataFrame = {
    val spark = graph.spark
    import spark.implicits._

    // undirected neighbor list, deduped, cached for the loop
    val und = graph.edges
      .select($"src", $"dst")
      .union(graph.edges.select($"dst".as("src"), $"src".as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    und.count()

    var (labels, freeLabels) = graft.graph.Lineage.pin(
      graph.vertexDict.select($"vid", $"vid".as("label")).toDF())

    var iteration = 0
    var changed = 1L
    while (iteration < maxIterations && changed > 0) {
      val msgs = und
        .join(labels, und("src") === labels("vid"))
        .select(und("dst").as("vid"), $"label")
      val (newLabels, freeNew) = graft.graph.Lineage.pin(
        labels
          .union(msgs)
          .groupBy($"vid")
          .agg(min($"label").as("label")))
      changed = newLabels
        .join(labels.withColumnRenamed("label", "old"), Seq("vid"))
        .filter($"label" =!= $"old")
        .count()
      freeLabels()
      labels = newLabels
      freeLabels = freeNew
      iteration += 1
    }
    und.unpersist()
    labels
  }
}
