package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Readers for the reference's two on-disk edge-list formats. */
object EdgeListSource {

  private val schema3 = StructType(Seq(
    StructField("src", LongType),
    StructField("dst", LongType),
    StructField("fileWeight", LongType)))

  /** Comma-separated int64 `src,dst[,weight]`; the weight column is DROPPED
    * exactly like the reference (pagerank.py:617, :621 — `edges_raw[:, :2]`).
    */
  def csv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema3).csv(path).select(col("src"), col("dst"))

  /** Tab-separated with `#` comment header lines
    * (original_pagerank/pagerank.py:156-160).
    */
  def tsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(StructType(schema3.take(2)))
      .option("sep", "\t")
      .option("comment", "#")
      .csv(path)
      .select(col("src"), col("dst"))
}
