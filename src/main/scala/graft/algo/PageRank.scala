package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model._
import graft.graph.LinkGraph
import graft.engine.{PageRankEngine, PageRankOutcome}

/** Public PageRank API mirroring the reference entry points
  * (/root/reference/pagerank.py:82-127, :129-219, :245-389 and
  * /root/reference/original_pagerank/pagerank.py:64-144).
  */
object PageRank {

  /** Classic reference-mode PageRank (renormalize each superstep). */
  def run(
      graph: LinkGraph,
      damping: Double = 0.85,
      tolerance: Double = 1e-8,
      maxIterations: Int = 1000,
      checkpointDir: Option[String] = None
  ): PageRankOutcome =
    new PageRankEngine(
      graph,
      PageRankConfig(damping, tolerance, maxIterations, PageRankMode.ReferenceRenorm,
        checkpointDir = checkpointDir)).run()

  /** Moler-style power method with explicit dangling-mass redistribution. */
  def runDangling(
      graph: LinkGraph,
      damping: Double = 0.85,
      tolerance: Double = 1e-8,
      maxIterations: Int = 100
  ): PageRankOutcome =
    new PageRankEngine(
      graph,
      PageRankConfig(damping, tolerance, maxIterations, PageRankMode.MolerDangling)).run()

  /** Personalized risk propagation (d=0.95, teleport = (1-d)·prior, no renorm). */
  def propagateRisk(
      graph: LinkGraph,
      prior: DataFrame, // (vid, value)
      damping: Double = 0.95,
      tolerance: Double = 1e-8,
      maxIterations: Int = 1000
  ): PageRankOutcome =
    new PageRankEngine(
      graph,
      PageRankConfig(damping, tolerance, maxIterations, PageRankMode.RiskPropagation,
        prior = Some(prior))).run()

  /** Convergence-performance sweep (pagerank.py:515-589): re-run the full power
    * iteration once per tolerance, tabulating iterations / time / final error.
    */
  def convergenceSweep(
      graph: LinkGraph,
      tolerances: Seq[Double] = Seq(1e-4, 1e-6, 1e-8, 1e-10),
      damping: Double = 0.85,
      maxIterations: Int = 1000
  ): Seq[ConvergenceRow] =
    tolerances.map { tol =>
      val out = run(graph, damping, tol, maxIterations)
      out.free()
      ConvergenceRow(tol, out.run.iterations, out.run.converged, out.run.finalError, out.run.wallTimeSec)
    }

  /** Resume a checkpointed run mid-iteration. */
  def resume(graph: LinkGraph, cfg: PageRankConfig): PageRankOutcome =
    new PageRankEngine(graph, cfg).resume()
}

/** Dense direct solve of (I - p·G·D) x = e — the reference's own correctness
  * cross-check (original_pagerank/pagerank.py:35-62, "pagerank1"). Driver-side,
  * n ≤ a few thousand; used by tests and the cross-algorithm agreement report.
  */
object DirectSolve {

  /** edges in dense vid space; returns normalized rank vector length n. */
  def solve(n: Int, edges: Seq[(Int, Int, Double)], damping: Double = 0.85): Array[Double] = {
    // c = column sums of G where G[src][dst] = w
    val c = new Array[Double](n)
    edges.foreach { case (_, dst, w) => c(dst) += w }
    // A = I - p * G * D  (A[i][j] = delta_ij - p * G[i][j] / c[j])
    val a = Array.fill(n, n)(0.0)
    var i = 0
    while (i < n) { a(i)(i) = 1.0; i += 1 }
    edges.foreach { case (src, dst, w) =>
      val cj = if (c(dst) != 0.0) c(dst) else 1.0
      a(src)(dst) -= damping * w / cj
    }
    val b = Array.fill(n)(1.0 / n)
    gaussianSolve(a, b)
    val s = b.sum
    b.map(_ / s)
  }

  /** In-place Gaussian elimination with partial pivoting; solution left in b. */
  private def gaussianSolve(a: Array[Array[Double]], b: Array[Double]): Unit = {
    val n = b.length
    var col = 0
    while (col < n) {
      var piv = col
      var r = col + 1
      while (r < n) { if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r; r += 1 }
      if (piv != col) {
        val t = a(piv); a(piv) = a(col); a(col) = t
        val tb = b(piv); b(piv) = b(col); b(col) = tb
      }
      val p = a(col)(col)
      require(math.abs(p) > 1e-14, s"singular system at column $col")
      r = col + 1
      while (r < n) {
        val f = a(r)(col) / p
        if (f != 0.0) {
          var k = col
          while (k < n) { a(r)(k) -= f * a(col)(k); k += 1 }
          b(r) -= f * b(col)
        }
        r += 1
      }
      col += 1
    }
    var row = n - 1
    while (row >= 0) {
      var s = b(row)
      var k = row + 1
      while (k < n) { s -= a(row)(k) * b(k); k += 1 }
      b(row) = s / a(row)(row)
      row -= 1
    }
  }
}
