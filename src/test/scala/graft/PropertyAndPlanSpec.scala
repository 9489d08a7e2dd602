package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.rng.Seed

import graft.algo.{ConnectedComponents, PageRank}
import graft.graph.LinkGraph
import graft.sources.{IcebergLite, RepoFiles}

class PropertyAndPlanSpec extends GraftSuite {
  import spark.implicits._

  private val smallDigraph: Gen[Seq[(Long, Long)]] =
    for {
      n <- Gen.choose(3, 14)
      m <- Gen.choose(n, 4 * n)
      edges <- Gen.listOfN(m, for {
        s <- Gen.choose(0, n - 1)
        t <- Gen.choose(0, n - 1)
      } yield (s.toLong, t.toLong))
    } yield edges

  /** ScalaCheck generator driven by fixed seeds (no scalatestplus bridge in
    * the offline cache) — deterministic property-style sweep.
    */
  private def forAllSeeded[T](gen: Gen[T], cases: Int)(body: T => Unit): Unit =
    (1 to cases).foreach { i =>
      gen(org.scalacheck.Gen.Parameters.default, Seed(1000L + i)).foreach(body)
    }

  test("property: ranks form a probability simplex on random digraphs") {
    forAllSeeded(smallDigraph, 8) { edges =>
      if (edges.nonEmpty) {
        val g = LinkGraph.fromEdgeList(spark, edges.toDF("src", "dst"), numBlocks = 2)
        val x = PageRank.run(g, tolerance = 1e-8, maxIterations = 60)
          .toVertexDf(g).agg(sum($"value")).first().getDouble(0)
        g.unpersistAll()
        assert(math.abs(x - 1.0) < 1e-9)
      }
    }
  }

  test("property: CC labels equal the min external id of each component") {
    forAllSeeded(smallDigraph, 8) { edges =>
      if (edges.nonEmpty) {
        val g = LinkGraph.fromEdgeList(spark, edges.toDF("src", "dst"), numBlocks = 2)
        val got = ConnectedComponents.run(g)
          .join(g.vertexDict.toDF("id", "v1"), $"vid" === $"v1")
          .join(g.vertexDict.toDF("comp", "v2"), $"label" === $"v2")
          .select($"id", $"comp").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        g.unpersistAll()
        // union-find ground truth
        val ids = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
        def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
        edges.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb }
        val want = ids.map(i => i -> ids.filter(j => find(j) == find(i)).min).toMap
        assert(got == want)
      }
    }
  }

  test("fromDenseWeighted auto block count scales with edges, not just vertices") {
    // small-but-dense: n = 2048 but > 1M edges. The vertex-only n/1024 fallback
    // sized this at 2 blocks (near-serial supersteps); the edge-aware autoBlocks
    // must hit the parallelism cap instead (round-4 verdict task #2 — the same
    // fix fromEdgeList got, routed through fromDenseWeighted / inducedPrefix).
    val n = 2048L
    val edges = spark.range(1100000L)
      .select(($"id" % n).as("src"), (($"id" / n).cast("long") % n).as("dst"), lit(1.0).as("weight"))
      .as[graft.model.Edge]
    val g = LinkGraph.fromDenseWeighted(spark, edges, n)
    try {
      assert(g.numEdges > 1000000L)
      assert(g.numBlocks > 2, s"dense graph still vertex-sized: ${g.numBlocks} blocks")
      assert(g.numBlocks == spark.sparkContext.defaultParallelism * 2)
    } finally g.unpersistAll()
  }

  test("property: duplicate-edge multiplicity equals integer edge weights") {
    forAllSeeded(Gen.choose(1, 5), 5) { k =>
      val raw = Seq.fill(k)((1L, 2L)) ++ Seq((2L, 3L))
      val g = LinkGraph.fromEdgeList(spark, raw.toDF("src", "dst"), numBlocks = 1)
      val w = g.edges.collect().map(e => (e.src, e.dst) -> e.weight).toMap
      g.unpersistAll()
      assert(w((0L, 1L)) == k.toDouble) // vids: 1->0, 2->1, 3->2
    }
  }

  test("IcebergLite: atomic snapshots, manifest-resolved reads, time travel") {
    val dir = Files.createTempDirectory("graft-ice").toString
    val t0 = RepoFiles.table(spark, numRepos = 5, filesPerRepo = 2, vocab = 20)
    val s0 = IcebergLite.commit(t0, dir, partitionBy = Seq("lang"))
    val t1 = RepoFiles.table(spark, numRepos = 9, filesPerRepo = 2, vocab = 20)
    val s1 = IcebergLite.commit(t1, dir, partitionBy = Seq("lang"))
    assert(IcebergLite.snapshots(dir) == Seq(0L, 1L) && s0 == 0 && s1 == 1)
    assert(IcebergLite.read(spark, dir).count() == t1.count()) // latest
    assert(IcebergLite.read(spark, dir, Some(0L)).count() == t0.count()) // pinned
    // a torn commit (data written, no manifest) is invisible
    t0.write.parquet(s"$dir/snap-99")
    assert(IcebergLite.snapshots(dir) == Seq(0L, 1L))
    assert(IcebergLite.read(spark, dir).count() == t1.count())
    // sha256 per-row invariant column exists and is stable (input_hint check)
    val h = RepoFiles.withContentHash(IcebergLite.read(spark, dir, Some(0L)))
    assert(h.select("content_sha256").distinct().count() == t0.count())
  }

  test("plans: filters and projections push down to the parquet scan") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter($"l_suppkey" === 3L)
      .select($"l_orderkey", $"l_suppkey")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_suppkey"), plan.take(500))
    assert(plan.contains("ReadSchema") && !plan.contains("l_comment"))
    val scanLine = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(scanLine.contains("l_orderkey") && !scanLine.contains("l_quantity"),
      s"column pruning failed: $scanLine")
  }

  test("plans: testdata edge derivation broadcasts no side unnecessarily and prunes columns") {
    val plan = graft.sources.TestdataGraph
      .rawEdges(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // only the join keys + projected columns are read
    assert(!plan.contains("o_comment") && !plan.contains("l_quantity"))
  }

  test("plans: LSH pair search is bucket-join shaped — no cartesian product") {
    val rng = new scala.util.Random(41)
    val vecs = (0L until 64L).map(i => (i, Array.fill(16)(rng.nextGaussian().toFloat)))
      .toDF("id", "vec")
    val pairs = graft.sim.Ann.cosinePairsLsh(vecs, threshold = 0.8, dim = 16)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    val topk = graft.sim.Ann.lshTopK(
      vecs, vecs.limit(3).select($"id".as("qid"), $"vec".as("qvec")), k = 2, dim = 16)
    val planK = topk.queryExecution.executedPlan.toString
    assert(!planK.contains("CartesianProduct"), planK.take(800))
  }
}
