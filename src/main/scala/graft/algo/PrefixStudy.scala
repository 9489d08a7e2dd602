package graft.algo

import graft.graph.LinkGraph

/** One (prefix, solver) measurement of the scaling study. */
final case class PrefixStudyRow(
    prefix: Long,
    nodes: Long,
    edges: Long,
    solver: String,
    iterations: Int,
    converged: Boolean,
    wallSec: Double
)

/** The reference's prefix scaling study (original_pagerank/pagerank.py:166-213):
  * slice the induced prefix subgraph G[:k,:k] for each k, cross-run the
  * solver formulations on the same slice, and tabulate size / iterations /
  * wall time. `pr1` (dense direct solve) only runs while n stays below
  * `directSolveMax` — it is O(n³) on the driver by construction, exactly like
  * the reference's np.linalg dense path.
  */
object PrefixStudy {

  def run(
      graph: LinkGraph,
      sizes: Seq[Long],
      damping: Double = 0.85,
      tolerance: Double = 1e-8,
      maxIterations: Int = 200,
      directSolveMax: Long = 2000
  ): Seq[PrefixStudyRow] = {
    val ks = sizes.map(k => math.min(k, graph.numVertices)).distinct.sorted
    ks.flatMap { k =>
      val sub = graph.inducedPrefix(k)
      val nodes = sub.numVertices
      val nEdges = sub.numEdges
      val rows = scala.collection.mutable.ArrayBuffer.empty[PrefixStudyRow]

      def timed(name: String)(body: => (Int, Boolean)): Unit = {
        val t0 = System.nanoTime()
        val (iters, conv) = body
        rows += PrefixStudyRow(k, nodes, nEdges, name, iters, conv, (System.nanoTime() - t0) / 1e9)
      }

      if (nodes <= directSolveMax) timed("pr1_direct") {
        val es = sub.edges.collect().map(e => (e.src.toInt, e.dst.toInt, e.weight)).toSeq
        DirectSolve.solve(nodes.toInt, es, damping)
        (1, true)
      }
      timed("pr2_dangling") {
        val out = PageRank.runDangling(sub, damping, tolerance, maxIterations)
        val r = (out.run.iterations, out.run.converged)
        out.free(); r
      }
      timed("pr3_renorm") {
        val out = PageRank.run(sub, damping, tolerance, maxIterations)
        val r = (out.run.iterations, out.run.converged)
        out.free(); r
      }
      sub.unpersistAll()
      rows.toSeq
    }
  }
}
