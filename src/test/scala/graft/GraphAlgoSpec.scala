package graft

import graft.graph.LinkGraph
import graft.algo.{ConnectedComponents, LabelPropagation, TriangleCount}

class GraphAlgoSpec extends GraftSuite {
  import spark.implicits._

  private def graphOf(edges: Seq[(Long, Long)], numBlocks: Int = 3): LinkGraph =
    LinkGraph.fromEdgeList(spark, edges.toDF("src", "dst"), numBlocks = numBlocks)

  // 3 disjoint triangles + a 2-chain + 1 isolate-ish pair (FIXTURES.md g_islands)
  private val islands: Seq[(Long, Long)] =
    Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (10L, 11L), (11L, 12L), (12L, 10L),
      (20L, 21L), (21L, 22L), (22L, 20L),
      (30L, 31L))

  test("connected components: exact min-extId labels on disjoint islands") {
    val g = graphOf(islands)
    val got = ConnectedComponents.run(g)
      .join(g.vertexDict.toDF("id", "v1"), $"vid" === $"v1")
      .join(g.vertexDict.toDF("comp", "v2"), $"label" === $"v2")
      .select($"id", $"comp")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val want = Map(
      0L -> 0L, 1L -> 0L, 2L -> 0L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L,
      30L -> 30L, 31L -> 30L)
    assert(got == want)
    g.unpersistAll()
  }

  test("connected components: direction is ignored (undirected semantics)") {
    // chain only in one direction: 5 -> 6 -> 7; all one component
    val g = graphOf(Seq((5L, 6L), (6L, 7L)))
    val labels = ConnectedComponents.run(g).select("label").distinct().count()
    assert(labels == 1)
    g.unpersistAll()
  }

  test("triangle counting: 3 islands of 1 triangle each; chain has none") {
    val g = graphOf(islands)
    assert(TriangleCount.totalTriangles(g) == 3)
    val per = TriangleCount.perVertexTriangles(g)
      .join(g.vertexDict.toDF("id", "v1"), $"vid" === $"v1")
      .select($"id", $"triangles")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(per(0L) == 1 && per(11L) == 1 && per(22L) == 1)
    assert(per(30L) == 0 && per(31L) == 0)
    g.unpersistAll()
  }

  test("triangle counting matches brute force on a seeded random graph") {
    val edges = DenseReference.randomEdges(30, 0.15, seed = 7).map(e => (e._1.toLong, e._2.toLong))
    val g = graphOf(edges)
    // brute force over the undirected simple graph
    val und = edges.flatMap { case (a, b) => Seq((a min b, a max b)) }.filter(e => e._1 != e._2).distinct.toSet
    var brute = 0
    for (a <- 0L until 30L; b <- a + 1 until 30L; c <- b + 1 until 30L)
      if (und(( a, b)) && und((b, c)) && und((a, c))) brute += 1
    assert(TriangleCount.totalTriangles(g) == brute)
    g.unpersistAll()
  }

  test("clustering coefficient: full triangle vertices have coeff 1") {
    val g = graphOf(Seq((0L, 1L), (1L, 2L), (2L, 0L)))
    val cc = TriangleCount.clusteringCoefficients(g).collect()
    assert(cc.forall(_.getAs[Double]("clustering_coeff") == 1.0))
    g.unpersistAll()
  }

  test("LPA: two dense cliques joined by one weak edge separate into two communities") {
    val cliqueA = for (i <- 0L to 4L; j <- 0L to 4L if i < j) yield (i, j)
    val cliqueB = for (i <- 10L to 14L; j <- 10L to 14L if i < j) yield (i, j)
    val g = graphOf(cliqueA ++ cliqueB ++ Seq((4L, 10L)))
    val labels = LabelPropagation.run(g, iterations = 10)
      .join(g.vertexDict.toDF("id", "v1"), $"vid" === $"v1")
      .select($"id", $"label")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val aLabels = (0L to 4L).map(labels).toSet
    val bLabels = (10L to 14L).map(labels).toSet
    assert(aLabels.size == 1 && bLabels.size == 1 && aLabels != bLabels)
    g.unpersistAll()
  }

  test("LPA is deterministic: same labels on repeated runs") {
    val edges = DenseReference.randomEdges(40, 0.1, seed = 11).map(e => (e._1.toLong, e._2.toLong))
    val g = graphOf(edges)
    def run() = LabelPropagation.run(g, 5).collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toSeq
    assert(run() == run())
    g.unpersistAll()
  }
}
