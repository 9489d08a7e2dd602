package graft.engine

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.storage.StorageLevel

import graft.model._
import graft.graph.LinkGraph

/** Result bundle of an engine run. */
final case class PageRankOutcome(
    ranks: Dataset[RankChunk],
    run: PageRankRun,
    metrics: Seq[SuperstepMetrics]
) {
  /** Ranks as a (vid, value) DataFrame. */
  def toVertexDf(graph: LinkGraph): DataFrame = graph.chunksToVertexDf(ranks)
}

/** Distributed power-iteration engine over destination-blocked adjacency.
  *
  * Exact math of the reference kernels (SURVEY.md §1.3): for every folded edge
  * (src, dst, w) the superstep sends `x[dst] * w / c[dst]` to `src`, where
  * c = weighted in-degree (column sums — /root/reference/pagerank.py:170,:194).
  * Three teleport/normalization policies selected by [[PageRankMode]].
  *
  * Physical strategy (SURVEY.md §4.2), two regimes chosen by rank-vector size:
  *
  *  - '''Vector-resident regime''' (n·8B < [[PageRankEngine.BroadcastThresholdBytes]]):
  *    the rank vector lives in a driver array, broadcast each superstep; the
  *    kernel scans the cached adjacency with ZERO shuffle in, pre-combines
  *    scatter-adds per part in an open-address map, and one narrow shuffle
  *    assembles per-block contribution sums, collected back (n doubles). The
  *    teleport/renormalize/residual arithmetic runs on the driver in exactly
  *    the reference's operation order. One Spark job per superstep.
  *
  *  - '''Distributed regime''' (large n): chunks stay a Dataset; each superstep
  *    joins the cached block-partitioned adjacency with the (small) rank
  *    chunks so only the rank vector shuffles; residual / normalizer come from
  *    DoubleAccumulators updated in the result stage (exactly-once per
  *    partition — Spark dedups result-stage accumulator updates on retry).
  *    Lineage is cut per superstep behind an ExternalRDD pin (see [[pin]]).
  *
  * Optional durable parquet checkpoints + a JSON manifest give mid-iteration
  * resume (north rule). Per-superstep shuffle rows/bytes are captured by a
  * SparkListener.
  */
final class PageRankEngine(graph: LinkGraph, cfg: PageRankConfig) extends Serializable {
  import graph.spark
  import spark.implicits._

  private val n: Long = graph.numVertices
  private val d: Double = cfg.damping
  private def driverResident: Boolean = n * 8L < PageRankEngine.BroadcastThresholdBytes

  def run(): PageRankOutcome = runFrom(initialVector(), 0)

  /** Resume from the newest durable checkpoint under cfg.checkpointDir. */
  def resume(): PageRankOutcome = {
    val dir = cfg.checkpointDir.getOrElse(
      throw new IllegalArgumentException("resume() requires checkpointDir"))
    CheckpointManager.latest(dir) match {
      case Some((k, residual)) =>
        val df = spark.read.parquet(CheckpointManager.dataPath(dir, k))
        val chunks = graph.chunksOf(df)
        if (residual < cfg.tolerance)
          PageRankOutcome(chunks, PageRankRun(k, converged = true, residual, 0.0, n, graph.numEdges), Nil)
        else runFrom(chunks, k)
      case None => run()
    }
  }

  // ---------------------------------------------------------------- initial state

  private def initialVector(): Dataset[RankChunk] = cfg.mode match {
    case PageRankMode.RiskPropagation =>
      // x starts at the normalized prior (pagerank.py:285, :292)
      normalizedPriorChunks()
    case _ =>
      graph.uniformChunks() // x = ones(n)/n (pagerank.py:180)
  }

  /** Materialize a chunk dataset behind an ExternalRDD boundary.
    *
    * NOT Dataset.localCheckpoint: its LogicalRDD carries the origin plan's
    * statistics forward, so an iterative self-referencing loop squares
    * sizeInBytes every superstep — by ~20 supersteps Catalyst's join-size
    * product is a million-digit BigInteger and planning time explodes.
    * ExternalRDD reports constant default stats, keeping planning O(1) per
    * superstep while still truncating lineage (the RDD is persisted and
    * counted here). Returns the dataset plus the RDD handle for unpersist.
    */
  private def pin[T: Encoder](ds: Dataset[T]): (Dataset[T], RDD[T]) = {
    // RDD-level localCheckpoint: truncates dependencies after materialization
    // (plain persist() keeps the parent chain and task deserialization
    // eventually stack-overflows on 70+ superstep loops).
    val rdd = ds.rdd.localCheckpoint()
    rdd.count()
    (spark.createDataset(rdd), rdd)
  }

  private def normalizedPriorChunks(): Dataset[RankChunk] = {
    val prior = cfg.prior.filter(_ != null).getOrElse(
      throw new IllegalArgumentException("RiskPropagation requires cfg.prior (vid, value)"))
    val total = prior.agg(sum($"value")).first().getDouble(0)
    graph.chunksOf(prior.select($"vid", ($"value" / lit(total)).as("value")))
  }

  /** z = 1/n - (p/n)·[c != 0]  (original_pagerank/pagerank.py:130-134). */
  private lazy val zChunks: Dataset[RankChunk] = {
    val zBase = 1.0 / n
    val zLinked = zBase - d / n
    graph.vertexDict
      .join(graph.inDegrees, Seq("vid"), "left")
      .select($"vid",
        when($"deg".isNotNull && $"deg" =!= 0.0, lit(zLinked)).otherwise(lit(zBase)).as("value"))
      .transform(df => graph.chunksOf(df))
      .transform(ds => pin(ds)._1)
  }

  /** delta = (1-d) * normalizedPrior (pagerank.py:295). */
  private lazy val deltaChunks: Dataset[RankChunk] =
    normalizedPriorChunks()
      .map(c => RankChunk(c.blockId, c.loVid, c.values.map(_ * (1.0 - d))))
      .transform(ds => pin(ds)._1)

  // ---------------------------------------------------------------- main loop

  private def runFrom(start: Dataset[RankChunk], startIter: Int): PageRankOutcome = {
    val t0 = System.nanoTime()
    val sc = spark.sparkContext
    val listener = new ShuffleMetricsListener
    sc.addSparkListener(listener)
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    // stable per-superstep plans & partitioning inside the loop (SURVEY §4.2.4)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // force build+cache of the regime's adjacency layout before timing
    if (driverResident) graph.gatherPartsRdd else graph.adjParts
    try {
      if (driverResident) runResident(start, startIter, t0, listener)
      else runDistributed(start, startIter, t0, listener)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
      sc.removeSparkListener(listener)
    }
  }

  private def finishChunks(x: Array[Double]): Dataset[RankChunk] = {
    val bs = graph.blockSize
    val nb = graph.numBlocks
    val local = x
    spark.range(nb).as[Long].map { b =>
      val lo = b * bs
      val len = math.min(bs, local.length - lo).toInt
      RankChunk(b.toInt, lo, java.util.Arrays.copyOfRange(local, lo.toInt, lo.toInt + len))
    }.transform(ds => pin(ds)._1)
  }

  /** Vector-resident regime: rank vector on the driver, kernel on the cluster. */
  private def runResident(
      start: Dataset[RankChunk],
      startIter: Int,
      t0: Long,
      listener: ShuffleMetricsListener
  ): PageRankOutcome = {
    val sc = spark.sparkContext
    val bs = graph.blockSize
    val nv = n
    val metrics = scala.collection.mutable.ArrayBuffer.empty[SuperstepMetrics]

    var x = new Array[Double](n.toInt)
    start.collect().foreach(c => System.arraycopy(c.values, 0, x, c.loVid.toInt, c.values.length))
    start.unpersist()

    // mode-constant driver vectors
    val deltaVec: Array[Double] = cfg.mode match {
      case PageRankMode.RiskPropagation =>
        val dv = new Array[Double](n.toInt)
        deltaChunks.collect().foreach(c => System.arraycopy(c.values, 0, dv, c.loVid.toInt, c.values.length))
        dv
      case _ => null
    }
    val zVec: Array[Double] = cfg.mode match {
      case PageRankMode.MolerDangling =>
        val zv = new Array[Double](n.toInt)
        zChunks.collect().foreach(c => System.arraycopy(c.values, 0, zv, c.loVid.toInt, c.values.length))
        zv
      case _ => null
    }

    var iteration = startIter
    var converged = false
    var error = Double.MaxValue
    var done = false

    while (iteration < cfg.maxIterations && !done) {
      val iterT0 = System.nanoTime()
      listener.snapshot()

      // one shuffle-free job: broadcast x; each src-major part GATHERS its own
      // output slice (gx[i] = Σ wNorm · x[dst]) — tasks never share output, so
      // there is no cross-task combine stage at all; the driver adds the
      // (block-aligned, possibly split) slices into gx. Collect volume = n
      // doubles total, independent of parallelism.
      val bcast: Broadcast[Array[Double]] = sc.broadcast(x)
      val slices = graph.gatherPartsRdd
        .map { part =>
          val xs = bcast.value
          val lo = part.blockId.toLong * bs
          val len = math.min(bs, nv - lo).toInt
          val out = new Array[Double](len)
          PageRankEngine.gatherSlice(part, xs, out)
          RankChunk(part.blockId, lo, out)
        }
        .collect()
      bcast.destroy()
      val gx = new Array[Double](n.toInt)
      slices.foreach { s =>
        var i = 0
        val base = s.loVid.toInt
        while (i < s.values.length) { gx(base + i) += s.values(i); i += 1 }
      }

      // driver-side update in the reference's exact operation order
      val xOld = x
      x = cfg.mode match {
        case PageRankMode.ReferenceRenorm =>
          val sumX = xOld.sum // np.sum(x), pagerank.py:194
          val delta = (1.0 - d) / n
          val y = gx.map(v => d * v + delta * sumX)
          val sumY = y.sum
          var i = 0; while (i < y.length) { y(i) /= sumY; i += 1 } // pagerank.py:197
          y
        case PageRankMode.RiskPropagation =>
          val y = new Array[Double](n.toInt)
          var i = 0; while (i < y.length) { y(i) = d * gx(i) + deltaVec(i); i += 1 } // pagerank.py:301
          y
        case PageRankMode.MolerDangling =>
          var zx = 0.0
          var i = 0; while (i < n.toInt) { zx += zVec(i) * xOld(i); i += 1 } // z@x, original:138
          val t = zx / n
          val y = new Array[Double](n.toInt)
          i = 0; while (i < y.length) { y(i) = d * gx(i) + t; i += 1 }
          y
      }
      error = { var s = 0.0; var i = 0; while (i < x.length) { s += math.abs(x(i) - xOld(i)); i += 1 }; s }
      iteration += 1

      val sh = listener.delta()
      metrics += SuperstepMetrics(iteration, error, sh.readBytes, sh.writeBytes,
        sh.readRows, sh.writeRows, (System.nanoTime() - iterT0) / 1000000L)
      if (error < cfg.tolerance) { converged = true; done = true }

      cfg.checkpointDir.foreach { dir =>
        if (done || iteration % cfg.checkpointEvery == 0) {
          val chunks = finishChunks(x)
          CheckpointManager.write(graph, dir, iteration, error,
            metrics.takeRight(cfg.checkpointEvery).toSeq, chunks)
          chunks.unpersist()
        }
      }
    }

    val finalX = cfg.mode match {
      case PageRankMode.MolerDangling =>
        val s = x.sum; x.map(_ / s) // final renorm only (original_pagerank/pagerank.py:144)
      case _ => x
    }
    PageRankOutcome(
      finishChunks(finalX),
      PageRankRun(iteration, converged, error, (System.nanoTime() - t0) / 1e9, n, graph.numEdges),
      metrics.toSeq)
  }

  /** Distributed regime: chunked vector as a Dataset, accumulator residuals. */
  private def runDistributed(
      start: Dataset[RankChunk],
      startIter: Int,
      t0: Long,
      listener: ShuffleMetricsListener
  ): PageRankOutcome = {
    val sc = spark.sparkContext
    val metrics = scala.collection.mutable.ArrayBuffer.empty[SuperstepMetrics]

    var (x, xRdd) = pin(start)
    // np.sum(x) carried across supersteps (renorm mode teleport term)
    var sumX = cfg.mode match {
      case PageRankMode.ReferenceRenorm => x.map(_.values.sum).reduce(_ + _)
      case _ => 0.0
    }
    // z·x carried across supersteps (Moler mode)
    var zx = cfg.mode match {
      case PageRankMode.MolerDangling => dot(x, zChunks)
      case _ => 0.0
    }

    var iteration = startIter
    var converged = false
    var error = Double.MaxValue
    var done = false

    while (iteration < cfg.maxIterations && !done) {
      val iterT0 = System.nanoTime()
      listener.snapshot()

      val contribs = contributionChunks(x)
      val xAliased = x
      val joined = xAliased.joinWith(contribs, xAliased("blockId") === contribs("blockId"), "left_outer")

      cfg.mode match {
        case PageRankMode.ReferenceRenorm =>
          // job 1: y = d*Gx + delta*sum(x); accumulate sum(y)
          val accSumY = sc.doubleAccumulator("graft.sumY")
          val teleport = (1.0 - d) / n * sumX
          val raw = joined
            .map { case (old, contrib) =>
              val y = new Array[Double](old.values.length)
              var s = 0.0
              var i = 0
              while (i < y.length) {
                val c = if (contrib != null) contrib.values(i) else 0.0
                y(i) = d * c + teleport
                s += y(i)
                i += 1
              }
              accSumY.add(s)
              (RankChunk(old.blockId, old.loVid, y), old.values)
            }
          val (rawDs, rawRdd) = pin(raw)
          val sumY = accSumY.value
          // job 2: normalize (pagerank.py:197), residual + next sum via accumulators
          val accErr = sc.doubleAccumulator("graft.residual")
          val accSum = sc.doubleAccumulator("graft.sumX")
          val stepped = rawDs
            .map { case (yc, old) =>
              val v = new Array[Double](yc.values.length)
              var diff = 0.0
              var s = 0.0
              var i = 0
              while (i < v.length) {
                v(i) = yc.values(i) / sumY
                diff += math.abs(v(i) - old(i))
                s += v(i)
                i += 1
              }
              accErr.add(diff); accSum.add(s)
              RankChunk(yc.blockId, yc.loVid, v)
            }
          val (nextDs, nextRdd) = pin(stepped)
          rawRdd.unpersist(false)
          xRdd.unpersist(false)
          x = nextDs; xRdd = nextRdd
          error = accErr.value
          sumX = accSum.value

        case PageRankMode.RiskPropagation =>
          val delta = deltaChunks
          val accErr = sc.doubleAccumulator("graft.residual")
          val stepped = joined
            .joinWith(delta, $"_1.blockId" === delta("blockId"))
            .map { case ((old, contrib), del) =>
              val y = new Array[Double](old.values.length)
              var diff = 0.0
              var i = 0
              while (i < y.length) {
                val c = if (contrib != null) contrib.values(i) else 0.0
                y(i) = d * c + del.values(i) // pagerank.py:301
                diff += math.abs(y(i) - old.values(i))
                i += 1
              }
              accErr.add(diff)
              RankChunk(old.blockId, old.loVid, y)
            }
          val (nextDs, nextRdd) = pin(stepped)
          xRdd.unpersist(false)
          x = nextDs; xRdd = nextRdd
          error = accErr.value

        case PageRankMode.MolerDangling =>
          val z = zChunks
          val teleport = zx / n
          val accErr = sc.doubleAccumulator("graft.residual")
          val accZx = sc.doubleAccumulator("graft.zx")
          val stepped = joined
            .joinWith(z, $"_1.blockId" === z("blockId"))
            .map { case ((old, contrib), zc) =>
              val y = new Array[Double](old.values.length)
              var diff = 0.0
              var zdot = 0.0
              var i = 0
              while (i < y.length) {
                val c = if (contrib != null) contrib.values(i) else 0.0
                y(i) = d * c + teleport
                diff += math.abs(y(i) - old.values(i))
                zdot += zc.values(i) * y(i)
                i += 1
              }
              accErr.add(diff); accZx.add(zdot)
              RankChunk(old.blockId, old.loVid, y)
            }
          val (nextDs, nextRdd) = pin(stepped)
          xRdd.unpersist(false)
          x = nextDs; xRdd = nextRdd
          error = accErr.value
          zx = accZx.value
      }

      iteration += 1
      val sh = listener.delta()
      metrics += SuperstepMetrics(iteration, error, sh.readBytes, sh.writeBytes,
        sh.readRows, sh.writeRows, (System.nanoTime() - iterT0) / 1000000L)
      if (PageRankEngine.debug)
        println(s"[graft] superstep=$iteration ms=${metrics.last.wallMs} residual=$error")
      if (error < cfg.tolerance) { converged = true; done = true }

      cfg.checkpointDir.foreach { dir =>
        if (done || iteration % cfg.checkpointEvery == 0)
          CheckpointManager.write(graph, dir, iteration, error,
            metrics.takeRight(cfg.checkpointEvery).toSeq, x)
      }
    }

    val finalRanks = cfg.mode match {
      case PageRankMode.MolerDangling =>
        val s = x.map(_.values.sum).reduce(_ + _)
        val out = pin(x.map(c => RankChunk(c.blockId, c.loVid, c.values.map(_ / s))))._1
        xRdd.unpersist(false)
        out
      case _ => x
    }
    PageRankOutcome(
      finalRanks,
      PageRankRun(iteration, converged, error, (System.nanoTime() - t0) / 1e9, n, graph.numEdges),
      metrics.toSeq)
  }

  private def dot(a: Dataset[RankChunk], b: Dataset[RankChunk]): Double =
    a.joinWith(b, a("blockId") === b("blockId"))
      .map { case (ac, bc) =>
        var s = 0.0
        var i = 0
        while (i < ac.values.length) { s += ac.values(i) * bc.values(i); i += 1 }
        s
      }
      .reduce(_ + _)

  /** The gather-scatter matvec for the distributed regime: contribution sums
    * per src, chunked by src block — `G @ D @ x` (pagerank.py:194) under the
    * §1.3 orientation. Only the rank chunks shuffle; the adjacency is cached.
    */
  private def contributionChunks(x: Dataset[RankChunk]): Dataset[RankChunk] = {
    val bs = graph.blockSize
    val nv = n
    graph.adjParts
      .joinWith(x, graph.adjParts("blockId") === x("blockId"))
      .flatMap { case (part, chunk) =>
        PageRankEngine.scatter(part, i => chunk.values(i), bs)
      }
      .groupByKey(_.blockId)
      .mapGroups { (blockId, it) =>
        val lo = blockId.toLong * bs
        val len = math.min(bs, nv - lo).toInt
        val arr = new Array[Double](len)
        it.foreach(c => arr(c.local) += c.value)
        RankChunk(blockId, lo, arr)
      }
  }
}

object PageRankEngine {
  /** Below this rank-vector size the vector-resident regime is used. Bounded
    * by per-task dense-scatter memory: every concurrent task holds one
    * n-double accumulator, so cores × threshold must fit the executor heap.
    */
  var BroadcastThresholdBytes: Long = 64L * 1024 * 1024

  /** Per-superstep stderr progress (env GRAFT_DEBUG). */
  val debug: Boolean = sys.env.contains("GRAFT_DEBUG")

  /** Gather one src-major part (resident regime): out[srcLocal] = Σ over its
    * edges of wNorm · x[dst] — sequential writes, the JVM twin of SciPy's C
    * matvec inner loop (pagerank.py:194).
    */
  private[engine] def gatherSlice(part: AdjPart, xs: Array[Double], out: Array[Double]): Unit = {
    var i = 0
    while (i < part.keys.length) {
      var s = 0.0
      var j = part.offsets(i)
      val end = part.offsets(i + 1)
      while (j < end) {
        s += part.wNorm(j) * xs(part.adj(j).toInt)
        j += 1
      }
      out(part.keys(i)) += s // += — a key's edges may straddle split parts
      i += 1
    }
  }

  /** Scatter one dst-major part (distributed regime): for each local dst slot
    * with x != 0, add wNorm * x[dst] to every src; pre-combined in an
    * open-address map.
    */
  private[engine] def scatter(part: AdjPart, xAt: Int => Double, blockSize: Long): Iterator[Contrib] = {
    val map = new LongDoubleMap(math.min(part.adj.length * 2 + 8, 1 << 22))
    var i = 0
    while (i < part.keys.length) {
      val xv = xAt(part.keys(i))
      if (xv != 0.0) {
        var j = part.offsets(i)
        val end = part.offsets(i + 1)
        while (j < end) {
          map.add(part.adj(j), part.wNorm(j) * xv)
          j += 1
        }
      }
      i += 1
    }
    map.iterator.map { case (src, v) =>
      Contrib((src / blockSize).toInt, (src % blockSize).toInt, v)
    }
  }
}

/** Minimal open-address long→double accumulation map (linear probing, grows at
  * 0.7 load). Avoids boxing in the superstep hot path — the JVM-array analog
  * of SciPy's C matvec inner loop.
  */
private[engine] final class LongDoubleMap(initialCapacity: Int) {
  private var cap = Integer.highestOneBit(math.max(16, initialCapacity) - 1) << 1
  private var keys = new Array[Long](cap)
  private var used = new Array[Boolean](cap)
  private var vals = new Array[Double](cap)
  private var size = 0

  def add(k: Long, v: Double): Unit = {
    var idx = (java.lang.Long.hashCode(k * -7046029254386353131L) & (cap - 1))
    while (used(idx) && keys(idx) != k) idx = (idx + 1) & (cap - 1)
    if (!used(idx)) {
      used(idx) = true; keys(idx) = k; vals(idx) = v; size += 1
      if (size * 10 > cap * 7) grow()
    } else vals(idx) += v
  }

  private def grow(): Unit = {
    val ok = keys; val ou = used; val ov = vals; val oc = cap
    cap <<= 1
    keys = new Array[Long](cap); used = new Array[Boolean](cap); vals = new Array[Double](cap)
    size = 0
    var i = 0
    while (i < oc) { if (ou(i)) add(ok(i), ov(i)); i += 1 }
  }

  def iterator: Iterator[(Long, Double)] = new Iterator[(Long, Double)] {
    private var i = -1
    private def advance(): Unit = { i += 1; while (i < cap && !used(i)) i += 1 }
    advance()
    def hasNext: Boolean = i < cap
    def next(): (Long, Double) = { val r = (keys(i), vals(i)); advance(); r }
  }
}
