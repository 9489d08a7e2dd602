package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  * Dot products are `zip_with` + `aggregate` column expressions in double
  * precision (codegen; summation in index order, so results are deterministic
  * and engine-portable). Brute-force top-k is the exactness baseline; the
  * scale path buckets by random-hyperplane LSH so candidate generation is a
  * bucket join instead of a cross join.
  */
object Ann {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force top-k cosine neighbors for each query vector.
    * Queries are expected small (broadcast side); corpus scales out.
    * Output: (query_id, neighbor_id, cosine, rank) — ties broken by id.
    */
  def bruteForceTopK(
      corpus: DataFrame, // (id, vec)
      queries: DataFrame, // (qid, qvec)
      k: Int
  ): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val scored = corpus
      .crossJoin(broadcast(queries))
      .filter(col("id") =!= col("qid"))
      .select(
        col("qid").as("query_id"),
        col("id").as("neighbor_id"),
        cosine(col("vec"), col("qvec")).as("cosine"))
    scored
      .withColumn("rank",
        row_number().over(
          Window.partitionBy($"query_id").orderBy($"cosine".desc, $"neighbor_id")))
      .filter($"rank" <= k)
  }

  /** Deterministic random hyperplanes: numPlanes × dim, seeded. */
  private def hyperplanes(dim: Int, numPlanes: Int, seed: Long): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(numPlanes, dim)(rng.nextGaussian())
  }

  /** Sign-bit LSH bucket id of a vector under the given hyperplanes. */
  private def bucketExpr(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.foldLeft(lit(0L)) { case (acc, (p, i)) =>
      val planeCol = array(p.map(lit): _*)
      acc.bitwiseOR(
        shiftleft(when(dot(vec, planeCol) >= 0, 1L).otherwise(0L), i))
    }

  /** Approximate top-k: candidates restricted to same-bucket vectors under
    * `tables` independent sign-LSH bucketings (multi-table boosts recall),
    * then exact cosine + window rank. Bucket join replaces the cross join —
    * the path that survives a 100× corpus.
    */
  def lshTopK(
      corpus: DataFrame, // (id, vec)
      queries: DataFrame, // (qid, qvec)
      k: Int,
      dim: Int,
      planesPerTable: Int = 12,
      tables: Int = 4,
      seed: Long = 42L
  ): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val corpusBuckets = (0 until tables)
      .map { t =>
        val planes = hyperplanes(dim, planesPerTable, seed + t)
        corpus.select(col("id"), col("vec"), lit(t).as("table"),
          bucketExpr(col("vec"), planes).as("bucket"))
      }
      .reduce(_ unionAll _)
    val queryBuckets = (0 until tables)
      .map { t =>
        val planes = hyperplanes(dim, planesPerTable, seed + t)
        queries.select(col("qid"), col("qvec"), lit(t).as("table"),
          bucketExpr(col("qvec"), planes).as("bucket"))
      }
      .reduce(_ unionAll _)
    val cands = corpusBuckets
      .join(queryBuckets, Seq("table", "bucket"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid").as("query_id"), col("id").as("neighbor_id"),
        col("vec"), col("qvec"))
      .dropDuplicates("query_id", "neighbor_id")
    cands
      .select($"query_id", $"neighbor_id", cosine(col("vec"), col("qvec")).as("cosine"))
      .withColumn("rank",
        row_number().over(
          Window.partitionBy($"query_id").orderBy($"cosine".desc, $"neighbor_id")))
      .filter($"rank" <= k)
  }
}
