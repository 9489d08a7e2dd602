package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic power-law-ish synthetic edge table for kernel benchmarks:
  * both endpoints drawn with a u² skew toward low ids, so a few hub vertices
  * carry a large share of in-edges (the reference dataset's power-law shape,
  * README.md:70-72). Pure Catalyst — distributed, seed-pinned generation.
  */
object SkewedEdges {

  /** Quantization grid for the uniform draw. Must be ≫ numVertices: the
    * round-2 grid of 10⁶ silently capped DISTINCT endpoint ids at ~10⁶, so a
    * "4M-vertex" bench graph actually had under 1M occupied vertices and the
    * headline kernel measured a smaller working set than claimed.
    */
  private val Grid: Long = 1L << 30

  def edges(spark: SparkSession, numVertices: Long, numEdges: Long, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    def endpoint(salt: Int) = {
      val u = pmod(xxhash64($"id", lit(seed + salt)), lit(Grid)).cast("double") / Grid.toDouble
      floor(lit(numVertices) * pow(u, 2.0)).cast("long")
    }
    spark
      .range(numEdges)
      .select(endpoint(1).as("src"), endpoint(2).as("dst"))
      .filter($"src" =!= $"dst")
  }
}
