package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.graph.LinkGraph

/** Degree-ordered triangle counting + clustering coefficient (north rule).
  *
  * Realizes what the reference *claims* to compute for "isolation risk"
  * (/root/reference/README.md:161 "Inverse of clustering coefficient") but
  * never implements — its code uses inverse total degree instead
  * (/root/reference/pagerank.py:702); both variants are offered (see
  * [[graft.analytics.RiskScores]] for the reference-faithful one).
  *
  * Algorithm: undirected-dedupe edges, orient each edge from the endpoint with
  * smaller (degree, vid) to the larger — every triangle is then counted exactly
  * once, and each vertex's oriented out-degree is O(sqrt(m)), which bounds the
  * self-join's intermediate size (the standard degree-ordering trick). The
  * wedge self-join hashes on the shared lower endpoint; the closing-edge check
  * is an inner join against the oriented edge set.
  */
object TriangleCount {

  /** Undirected simple edges (u < v), one row each. */
  def undirectedEdges(graph: LinkGraph): DataFrame = {
    val spark = graph.spark
    import spark.implicits._
    graph.edges
      .select(
        least($"src", $"dst").as("u"),
        greatest($"src", $"dst").as("v"))
      .filter($"u" =!= $"v")
      .distinct()
  }

  /** Total triangle count in the undirected simple graph. */
  def totalTriangles(graph: LinkGraph): Long = {
    perEdgeTriangles(graph).agg(count(lit(1))).first().getLong(0)
  }

  /** One row per triangle: (a, b, c) with a < b < c under the degree order. */
  private def perEdgeTriangles(graph: LinkGraph): DataFrame = {
    val spark = graph.spark
    import spark.implicits._
    val und = undirectedEdges(graph)
    // undirected degree
    val deg = und
      .select($"u".as("vid"))
      .union(und.select($"v".as("vid")))
      .groupBy($"vid")
      .agg(count(lit(1)).as("deg"))
    // orient: (x, y) where (deg(x), x) < (deg(y), y)
    val withDeg = und
      .join(deg.withColumnRenamed("vid", "u").withColumnRenamed("deg", "du"), Seq("u"))
      .join(deg.withColumnRenamed("vid", "v").withColumnRenamed("deg", "dv"), Seq("v"))
    // NOT persisted: the three consumers (e1, e2, closing) share identical
    // exchange subtrees, which Catalyst deduplicates via ReuseExchange — an
    // explicit persist here leaked (two public entry points, no unpersist
    // hook on the lazily returned frame).
    val oriented = withDeg
      .select(
        when($"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v"), $"u").otherwise($"v").as("x"),
        when($"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v"), $"v").otherwise($"u").as("y"))
    // wedges centered at the low-order endpoint, then close with an oriented edge
    val e1 = oriented.select($"x", $"y".as("y1"))
    val e2 = oriented.select($"x", $"y".as("y2"))
    val wedges = e1.join(e2, Seq("x")).filter($"y1" < $"y2")
    val closing = oriented.select($"x".as("y1"), $"y".as("y2"))
      .union(oriented.select($"y".as("y1"), $"x".as("y2")))
      .select(least($"y1", $"y2").as("y1"), greatest($"y1", $"y2").as("y2"))
      .distinct()
    wedges.join(closing, Seq("y1", "y2")).select($"x".as("a"), $"y1".as("b"), $"y2".as("c"))
  }

  /** Per-vertex triangle counts, zero-filled over all vertices: (vid, triangles). */
  def perVertexTriangles(graph: LinkGraph): DataFrame = {
    val spark = graph.spark
    import spark.implicits._
    val tris = perEdgeTriangles(graph)
    val corners = tris.select($"a".as("vid"))
      .union(tris.select($"b".as("vid")))
      .union(tris.select($"c".as("vid")))
      .groupBy($"vid")
      .agg(count(lit(1)).as("triangles"))
    graph.vertexDict
      .join(corners, Seq("vid"), "left")
      .select($"vid", coalesce($"triangles", lit(0L)).as("triangles"))
  }

  /** Local clustering coefficient 2T(v) / (deg(v)·(deg(v)−1)) over the
    * undirected simple graph; 0 where deg < 2. Columns: vid, triangles, deg,
    * clustering_coeff.
    */
  def clusteringCoefficients(graph: LinkGraph): DataFrame = {
    val spark = graph.spark
    import spark.implicits._
    val und = undirectedEdges(graph)
    val deg = und
      .select($"u".as("vid"))
      .union(und.select($"v".as("vid")))
      .groupBy($"vid")
      .agg(count(lit(1)).as("deg"))
    perVertexTriangles(graph)
      .join(deg, Seq("vid"), "left")
      .select(
        $"vid",
        $"triangles",
        coalesce($"deg", lit(0L)).as("deg"),
        when(coalesce($"deg", lit(0L)) >= 2,
          lit(2.0) * $"triangles" / ($"deg" * ($"deg" - 1)))
          .otherwise(lit(0.0))
          .as("clustering_coeff"))
  }
}
