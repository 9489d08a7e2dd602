package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic power-law-ish synthetic edge table for kernel benchmarks:
  * both endpoints drawn with a u² skew toward low ids, so a few hub vertices
  * carry a large share of in-edges (the reference dataset's power-law shape,
  * README.md:70-72). Pure Catalyst — distributed, seed-pinned generation.
  */
object SkewedEdges {

  def edges(spark: SparkSession, numVertices: Long, numEdges: Long, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    def endpoint(salt: Int) = {
      val u = pmod(xxhash64($"id", lit(seed + salt)), lit(1000000)).cast("double") / 1000000.0
      floor(lit(numVertices) * pow(u, 2.0)).cast("long")
    }
    spark
      .range(numEdges)
      .select(endpoint(1).as("src"), endpoint(2).as("dst"))
      .filter($"src" =!= $"dst")
  }
}
