package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.graph.{LinkGraph, Lineage}

/** Connected components by alternating large-star / small-star contraction
  * (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14)
  * over the underlying undirected graph. Final labels are canonical: the min
  * vid of the component — the same fixpoint as naive min-label propagation
  * (north rule), reached in O(log n) rounds instead of O(diameter) supersteps.
  * At web-graph diameters (hundreds) that is the difference between ~5 and
  * ~hundreds of shuffle rounds, which is why the naive hash-min loop this
  * replaces could not carry a 100× scale-up.
  *
  *  - large-star(u): ∀v ∈ Γ(u) with v > u, emit (v, m) where m = min(Γ⁺(u))
  *  - small-star(u): over edges oriented high→low, emit (v, m) for
  *    v ∈ Γ≤(u) ∪ {u} \ {m}, m = min(Γ≤(u) ∪ {u})
  *
  * Both steps are groupBy(min) + equi-join — no neighbor lists are ever
  * collected, so hub vertices cost rows, not memory. Convergence is decided
  * by a DEFINITIVE fixpoint test against the ORIGINAL edges (one join +
  * count per round; skipped on round 0, where real graphs are never already
  * contracted and an extra contraction is a fixpoint no-op anyway — and the
  * candidate-label aggregation it needs is the SAME groupBy-min large-star
  * needs, so one pinned frame serves both): candidate labels
  * l(x) = min(x, Γ(x)) are constant
  * across every original edge iff every component has fully contracted and
  * l is exactly the component minimum (l(m) = m for the component min m
  * because current edges only ever connect vertices of one component).
  * A round that exits the loop without passing the test throws rather than
  * returning silently-wrong labels.
  */
object ConnectedComponents {

  /** Per-vertex frames pinned via [[Lineage.pin]] report DEFAULT (huge)
    * statistics, so the planner would sort-merge-join them against the
    * edge-scale side — shuffling the big side once per round. Below this
    * bound (≈4M vertices × 16 B) the label frame gets an explicit broadcast
    * hint instead; above it the joins stay shuffle-based, which is the right
    * shape at cluster scale.
    */
  private val BroadcastLabelBytes: Long = 64L * 1024 * 1024

  /** Below this bound on the deduped undirected edge set (16 B/edge) the
    * labels are computed DRIVER-RESIDENT: one collect + union-find with
    * min-representative roots, which produces the IDENTICAL canonical
    * labeling (label = min vid of the component — a property of the result,
    * not of the algorithm) in O(E α(E)) driver time instead of 3+ shuffle
    * rounds of 6 exchanges each. The same small-graph/large-graph regime
    * split as PageRankEngine.BroadcastThresholdBytes: a 100 TB graph takes
    * the star-contraction path, the contract-scale graph doesn't pay
    * cluster-coordination prices for sub-second work. Mutable test hook —
    * set 0 to force the distributed path.
    */
  var ResidentEdgeBytes: Long = 64L * 1024 * 1024

  /** Returns (vid, label) for every vertex in the dictionary. */
  def run(graph: LinkGraph, maxIterations: Int = 50): DataFrame = {
    val spark = graph.spark
    import spark.implicits._
    // labels/mins frames are ≤ numVertices rows of two longs
    val hintSmall: DataFrame => DataFrame =
      if (graph.numVertices * 16 < BroadcastLabelBytes) broadcast(_) else identity
    // (measured: disabling AQE inside this loop cut job count 31→19 but left
    // the wall unchanged at contract scale, while losing AQE's runtime skew
    // handling at cluster scale — so AQE stays ON here, with the join
    // strategy pinned by the explicit size-gated hints above)

    // Resident regime decides from the (already counted) FOLDED edge cache —
    // union-find is insensitive to duplicates, orientation and self-loops, so
    // the undirected-dedup exchange the distributed path needs is pure setup
    // cost here (guide §2.4): one collect of the cached edge frame replaces
    // distinct + persist + count + collect. The folded count bounds the
    // undirected count from above, so the gate is (slightly) conservative.
    if (graph.numEdges * 16 < ResidentEdgeBytes && graph.numVertices <= Int.MaxValue.toLong) {
      val labels = residentLabels(graph, graph.edgesLocal)
      val b = spark.sparkContext.broadcast(labels)
      val out = spark
        .range(graph.numVertices)
        .as[Long]
        .mapPartitions { it =>
          val l = b.value
          it.map(v => (v, l(v.toInt)))
        }
        .toDF("vid", "label")
      val (pinned, _) = Lineage.pin(out)
      b.destroy()
      return pinned
    }

    val orig = graph.edges
      .select(least($"src", $"dst").as("u"), greatest($"src", $"dst").as("v"))
      .filter($"u" =!= $"v")
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val origCount = orig.count()

    var (cur, freeCur) = Lineage.pin(orig.toDF())
    var labels: DataFrame = null
    var freeLabels: () => Unit = () => ()
    var converged = false
    var iteration = 0

    val debug = sys.env.contains("GRAFT_DEBUG")
    while (iteration < maxIterations && !converged) {
      val roundT0 = System.nanoTime()
      // candidate labels from the current edge set: l(x) = min(x, Γ(x)) —
      // ONE pinned aggregation serves BOTH the fixpoint check and large-star
      // (they are the same groupBy-min; round 3 computed it twice per round)
      val bidir = cur.select($"u", $"v").union(cur.select($"v".as("u"), $"u".as("v")))
      val nbrMin = bidir
        .groupBy($"u".as("x"))
        .agg(min($"v").as("lmin"))
        .select($"x", least($"x", $"lmin").as("l"))
      val (lab, freeLab) = Lineage.pin(nbrMin)

      // definitive check: labels constant across every ORIGINAL edge
      // (left joins + coalesce so a vertex absent from the current edge set
      // can never silently pass the test). Cadence: skipped on the first
      // round — contraction from an already-converged state is a fixpoint
      // (star edges stay star edges), so the only cost is one extra cheap
      // round on trivial inputs, and every multi-round graph saves a full
      // original-edge join. maxIterations == 1 keeps the round-0 check so a
      // converged input can still be certified inside the budget.
      val bad =
        if (iteration == 0 && maxIterations > 1) -1L
        else orig
          .join(hintSmall(lab.select($"x".as("u"), $"l".as("lu"))), Seq("u"), "left")
          .join(hintSmall(lab.select($"x".as("v"), $"l".as("lv"))), Seq("v"), "left")
          .filter(coalesce($"lu", $"u") =!= coalesce($"lv", $"v"))
          .count()

      if (bad == 0L) {
        converged = true
        freeLabels = freeLab
        labels = lab
      } else {
        // ---- large-star (reuses the pinned candidate-label aggregation) ----
        // no intermediate distinct: duplicate (v, m) rows are absorbed by
        // small-star's min-aggregation and final distinct anyway, and the
        // dedup exchange here was a full shuffle of an edge-scale frame per
        // round for no change in the round's output set (guide §2.4)
        val large = bidir
          .filter($"v" > $"u")
          .join(hintSmall(lab.select($"x".as("u"), $"l".as("m"))), Seq("u"))
          .select($"v".as("u"), $"m".as("v"))
        // ---- small-star ----
        val le = large.select(greatest($"u", $"v").as("u"), least($"u", $"v").as("v"))
          .filter($"u" =!= $"v")
        val mins2 = le.groupBy($"u").agg(min($"v").as("m")) // m = min(Γ≤(u) ∪ {u})
        val small = le
          .join(hintSmall(mins2), Seq("u"))
          .filter($"v" =!= $"m")
          .select($"v".as("u"), $"m".as("v"))
          .union(mins2.select($"u", $"m".as("v")))
          .distinct()
        val (next, freeNext) = Lineage.pin(small)
        freeLab() // candidate labels are consumed once `next` is materialized
        freeCur()
        cur = next
        freeCur = freeNext
        iteration += 1
      }
      if (debug)
        System.err.println(
          f"[graft] cc round=$iteration converged=$converged ${(System.nanoTime() - roundT0) / 1e9}%.2f s")
    }

    if (!converged) {
      freeCur()
      orig.unpersist()
      throw new IllegalStateException(
        s"connected components did not converge in $maxIterations star-contraction rounds")
    }

    // zero-fill: isolated vertices (and contracted roots) label themselves
    val out = graph.vertexDict
      .join(hintSmall(labels.select($"x".as("vid"), $"l")), Seq("vid"), "left")
      .select($"vid", coalesce($"l", $"vid").as("label"))
    val (pinned, _) = Lineage.pin(out)
    freeLabels()
    freeCur()
    orig.unpersist()
    pinned
  }

  /** Driver-resident labeling: union-find with path compression, always
    * attaching the LARGER root under the smaller so every final root is the
    * component minimum — the same canonical labels the star-contraction
    * fixpoint certifies. Isolated vertices keep themselves (parent identity).
    * The fixpoint certificate survives as a driver-side pass: every edge's
    * endpoints must share a label, or we throw rather than return.
    */
  private def residentLabels(graph: LinkGraph, edges: Array[graft.model.Edge]): Array[Long] = {
    val n = graph.numVertices.toInt
    val parent = new Array[Int](n)
    var i = 0
    while (i < n) { parent(i) = i; i += 1 }
    def find(a: Int): Int = {
      var r = a
      while (parent(r) != r) r = parent(r)
      var c = a
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    var e = 0
    while (e < edges.length) {
      val u = edges(e).src.toInt
      val v = edges(e).dst.toInt
      if (u != v) {
        val ru = find(u)
        val rv = find(v)
        if (ru != rv) {
          if (ru < rv) parent(rv) = ru else parent(ru) = rv
        }
      }
      e += 1
    }
    val labels = new Array[Long](n)
    i = 0
    while (i < n) { labels(i) = find(i).toLong; i += 1 }
    // definitive certificate, same property the distributed path proves
    e = 0
    while (e < edges.length) {
      val u = edges(e).src.toInt
      val v = edges(e).dst.toInt
      if (labels(u) != labels(v))
        throw new IllegalStateException(
          s"cc resident labeling violates edge (${edges(e).src}, ${edges(e).dst})")
      e += 1
    }
    labels
  }
}
