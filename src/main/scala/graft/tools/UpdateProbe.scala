package graft.tools

/** Microbench of the resident kernel's driver-side update passes (no Spark):
  * replicates the exact ReferenceRenorm update on n-double arrays to separate
  * "host can't stream faster" from "code is slow". args: [n] [iters]
  */
object UpdateProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 4000000
    val iters = if (args.length > 1) args(1).toInt else 15
    val d = 0.85
    var x = Array.tabulate(n)(i => 1.0 / n + (i % 7) * 1e-12)
    val gx = Array.tabulate(n)(i => 1.0 / n + (i % 5) * 1e-12)
    var sink = 0.0
    for (k <- 0 until iters) {
      val t0 = System.nanoTime()
      val xOld = x
      var s = 0.0
      var i = 0
      while (i < xOld.length) { s += xOld(i); i += 1 }
      val t1 = System.nanoTime()
      val t = (1.0 - d) / n * s
      val y = new Array[Double](gx.length)
      i = 0; while (i < y.length) { y(i) = d * gx(i) + t; i += 1 }
      val t2 = System.nanoTime()
      var sy = 0.0
      i = 0; while (i < y.length) { sy += y(i); i += 1 }
      val t3 = System.nanoTime()
      i = 0; while (i < y.length) { y(i) /= sy; i += 1 }
      val t4 = System.nanoTime()
      var err = 0.0
      i = 0; while (i < y.length) { err += math.abs(y(i) - xOld(i)); i += 1 }
      val t5 = System.nanoTime()
      x = y
      sink += err + s
      println(f"iter $k%2d sum=${(t1 - t0) / 1e6}%6.1f map=${(t2 - t1) / 1e6}%6.1f " +
        f"sumY=${(t3 - t2) / 1e6}%6.1f div=${(t4 - t3) / 1e6}%6.1f err=${(t5 - t4) / 1e6}%6.1f ms")
    }
    println(s"sink=$sink")
  }
}
