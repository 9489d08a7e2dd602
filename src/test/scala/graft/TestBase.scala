package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", graft.util.FastLocalDir.sparkLocalDir)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class GraftSuite extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  def assertAllClose(got: Array[Double], want: Array[Double], tol: Double = 1e-9): Unit = {
    assert(got.length == want.length, s"length ${got.length} != ${want.length}")
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(math.abs(g - w) <= tol + tol * math.abs(w), s"at $i: got $g want $w")
    }
  }
}

/** Reference-faithful dense re-implementations of the three kernels — the
  * golden oracle. Each mirrors the cited numpy code line by line (array-order
  * summation, update/renormalize/residual ordering, iteration counting).
  */
object DenseReference {

  /** Build dense G[src][dst] += w from an edge list (duplicate-summing, as
    * scipy.sparse.csc_matrix does at /root/reference/pagerank.py:638-640),
    * then c = column sums (pagerank.py:170).
    */
  private def buildGD(n: Int, edges: Seq[(Int, Int, Double)]): (Array[Array[Double]], Array[Double]) = {
    val g = Array.fill(n, n)(0.0)
    edges.foreach { case (s, t, w) => g(s)(t) += w }
    val c = new Array[Double](n)
    var j = 0
    while (j < n) { var i = 0; while (i < n) { c(j) += g(i)(j); i += 1 }; j += 1 }
    (g, c)
  }

  /** y = G @ D @ x with D = diag(1/where(c!=0,c,1)) (pagerank.py:173-174, :194). */
  private def matvec(g: Array[Array[Double]], c: Array[Double], x: Array[Double]): Array[Double] = {
    val n = x.length
    val y = new Array[Double](n)
    var i = 0
    while (i < n) {
      var j = 0
      var s = 0.0
      while (j < n) {
        if (g(i)(j) != 0.0) {
          val cj = if (c(j) != 0.0) c(j) else 1.0
          s += g(i)(j) * x(j) / cj
        }
        j += 1
      }
      y(i) = s
      i += 1
    }
    y
  }

  /** Reference main kernel, pagerank.py:129-219. Returns (x, iterations, converged, err). */
  def pagerank(
      n: Int,
      edges: Seq[(Int, Int, Double)],
      damping: Double = 0.85,
      tol: Double = 1e-8,
      maxIter: Int = 1000
  ): (Array[Double], Int, Boolean, Double) = {
    val (g, c) = buildGD(n, edges)
    var x = Array.fill(n)(1.0 / n)
    var converged = false
    var error = 0.0
    var iteration = 0
    var k = 0
    while (k < maxIter && !converged) {
      val xOld = x.clone()
      val gx = matvec(g, c, x)
      val sumX = x.sum
      val delta = (1.0 - damping) / n
      x = gx.map(v => damping * v + delta * sumX)
      val sumNew = x.sum
      x = x.map(_ / sumNew)
      error = x.zip(xOld).map { case (a, b) => math.abs(a - b) }.sum
      iteration = k
      if (error < tol) converged = true
      k += 1
    }
    (x, iteration + 1, converged, error)
  }

  /** Risk propagation, pagerank.py:285-305: teleport=(1-d)*r0 (normalized), no renorm. */
  def propagateRisk(
      n: Int,
      edges: Seq[(Int, Int, Double)],
      rawPrior: Array[Double],
      damping: Double = 0.95,
      tol: Double = 1e-8,
      maxIter: Int = 1000
  ): (Array[Double], Array[Double]) = {
    val (g, c) = buildGD(n, edges)
    val ps = rawPrior.sum
    val r0 = rawPrior.map(_ / ps)
    var x = r0.clone()
    val delta = r0.map(_ * (1.0 - damping))
    var k = 0
    var done = false
    while (k < maxIter && !done) {
      val xOld = x.clone()
      val gx = matvec(g, c, x)
      x = gx.zip(delta).map { case (v, dl) => damping * v + dl }
      if (x.zip(xOld).map { case (a, b) => math.abs(a - b) }.sum < tol) done = true
      k += 1
    }
    (x, r0)
  }

  /** Moler-dangling power method, original_pagerank/pagerank.py:105-144. */
  def pagerankDangling(
      n: Int,
      edges: Seq[(Int, Int, Double)],
      damping: Double = 0.85,
      tol: Double = 1e-8,
      maxIter: Int = 100
  ): Array[Double] = {
    val (g, c) = buildGD(n, edges)
    var x = Array.fill(n)(1.0 / n)
    val z = Array.tabulate(n)(i => if (c(i) != 0.0) 1.0 / n - damping / n else 1.0 / n)
    var k = 0
    var done = false
    while (k < maxIter && !done) {
      val xOld = x.clone()
      val gx = matvec(g, c, x)
      val zx = z.zip(x).map { case (a, b) => a * b }.sum
      x = gx.zipWithIndex.map { case (v, _) => damping * v }.map(_ + zx / n)
      if (x.zip(xOld).map { case (a, b) => math.abs(a - b) }.sum < tol) done = true
      k += 1
    }
    val s = x.sum
    x.map(_ / s)
  }

  /** Seeded pseudo-random digraph (deterministic, no wall clock). */
  def randomEdges(n: Int, p: Double, seed: Long): Seq[(Int, Int, Double)] = {
    val rng = new scala.util.Random(seed)
    val b = Seq.newBuilder[(Int, Int, Double)]
    for (i <- 0 until n; j <- 0 until n if i != j)
      if (rng.nextDouble() < p) b += ((i, j, 1.0))
    b.result()
  }
}
