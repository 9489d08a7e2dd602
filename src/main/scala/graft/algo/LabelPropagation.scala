package graft.algo

import org.apache.spark.sql.DataFrame
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
  *
  * Superstep shape (round-2 bench regression fix): the weighted mode is a
  * `max(struct(weight, −label))` aggregation — no per-vid `row_number` window
  * (which added a full sort per superstep) — and each vertex also casts a
  * weight-0 self-vote, which removes the keep-old-label left join entirely.
  * PRECONDITION of that self-vote: every surviving neighbor vote must carry
  * strictly positive weight, or a zero-weight neighbor group would tie the
  * self-vote at w=0 and the min-label tie-break could flip a vertex that the
  * keep-old-only-when-isolated semantics would have kept. Edge-fold weights
  * (duplicate multiplicities) are always ≥ 1, but `fromDenseWeighted` graphs
  * can carry zero or negative weights — so the undirected fold below drops
  * aggregate weights ≤ 0, treating such edges as absent (ties inside a
  * positive-weight label group are unaffected because the self-vote adds 0
  * to the sum). The
  * undirected edge table is hash-partitioned by `src` ONCE and cached with
  * that layout, so the per-superstep join reshuffles only the n-row label
  * frame, never the 2|E|-row edge table (at contract sizes the planner
  * broadcasts the label side and the edge cache never moves at all).
  *
  * `pinEvery = 1` (measured fastest, default): `labels` feeds each superstep
  * TWICE — the neighbor join and the self-vote union — so an un-pinned plan
  * tree DOUBLES per superstep (2^k leaves by superstep k; measured 4-superstep
  * sf0.1 walls: pin-every-step 6.8 s, every-3rd 11.9 s, never 18.1 s).
  * Pinning each superstep keeps the plan flat for the cost of one
  * materialization that the next superstep needs anyway.
  */
object LabelPropagation {

  /** Returns (vid, label) after `iterations` synchronous supersteps. */
  def run(graph: LinkGraph, iterations: Int = 10, pinEvery: Int = 1): DataFrame = {
    val spark = graph.spark
    import spark.implicits._

    val p = math.max(1, spark.sparkContext.defaultParallelism)
    // ONE exchange builds the undirected fold in join-key layout: the
    // repartition by src comes FIRST and hashpartitioning(src) satisfies the
    // (src, dst) aggregation's clustered-distribution requirement (subset
    // rule), so the groupBy runs in place and its output KEEPS the src layout
    // every superstep join reuses — the previous agg-then-repartition shape
    // paid a second full shuffle of the 2|E| frame (guide §2.4).
    val und = graph.edges
      .select($"src", $"dst", $"weight")
      .union(graph.edges.select($"dst".as("src"), $"src".as("dst"), $"weight"))
      .repartition(p, $"src") // join-key layout, reused by every superstep
      .groupBy($"src", $"dst")
      .agg(sum($"weight").as("weight"))
      .filter($"weight" > 0) // self-vote precondition: votes must outweigh w=0
      .persist(StorageLevel.MEMORY_AND_DISK)
    und.count()

    // pinned frames report default (huge) stats, so without the hint the
    // planner sort-merge-joins the n-row label frame against the cached edge
    // table — re-sorting 2|E| rows per superstep. Broadcast only below the
    // size bound; at cluster scale the shuffle join is the right shape.
    val hintSmall: DataFrame => DataFrame =
      if (graph.numVertices * 16 < 64L * 1024 * 1024) broadcast(_) else identity

    var (labels, freeLabels) = graft.graph.Lineage.pin(
      graph.vertexDict.select($"vid", $"vid".as("label")).toDF())

    val debug = sys.env.contains("GRAFT_DEBUG")
    var k = 0
    while (k < iterations) {
      val stepT0 = System.nanoTime()
      val votes = und
        .join(hintSmall(labels), und("src") === labels("vid"))
        .select(und("dst").as("vid"), $"label", $"weight".as("w"))
        .union(labels.select($"vid", $"label", lit(0.0).as("w")))
      val adopted = votes
        .groupBy($"vid", $"label")
        .agg(sum($"w").as("w"))
        .groupBy($"vid")
        .agg(max(struct($"w", (-$"label").as("nl"))).as("m"))
        .select($"vid", (-$"m.nl").as("label"))
      k += 1
      if (k % pinEvery == 0 || k == iterations) {
        val (newLabels, freeNew) = graft.graph.Lineage.pin(adopted)
        freeLabels()
        labels = newLabels
        freeLabels = freeNew
      } else {
        labels = adopted
      }
      if (debug)
        System.err.println(
          f"[graft] lpa superstep=$k ${(System.nanoTime() - stepT0) / 1e9}%.2f s")
    }
    und.unpersist()
    labels
  }
}
