package graft.engine

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Dataset

import graft.model.{RankChunk, SuperstepMetrics}
import graft.graph.LinkGraph

/** Durable superstep checkpoints: parquet rank snapshots plus an append-only
  * JSON manifest committed by atomic rename — the Iceberg-style
  * snapshot/manifest pattern at file granularity (no Iceberg jars ship in this
  * sandbox; the interface is narrow enough that a real catalog slots in on a
  * cluster). A superstep is visible iff its manifest entry exists, so a crash
  * mid-write leaves the previous superstep as the resume point (north rule:
  * mid-iteration resume with per-partition lineage + metrics).
  */
object CheckpointManager {

  def dataPath(dir: String, superstep: Int): String =
    s"$dir/superstep=$superstep/ranks"

  private def manifestDir(dir: String): Path = Paths.get(dir, "_manifest")

  /** Write ranks + manifest entry for superstep k. Parquet first, then the
    * manifest entry via temp-file + atomic rename = the commit point.
    */
  def write(
      graph: LinkGraph,
      dir: String,
      superstep: Int,
      residual: Double,
      recent: Seq[SuperstepMetrics],
      chunks: Dataset[RankChunk]
  ): Unit = {
    graph
      .chunksToVertexDf(chunks)
      .write
      .mode("overwrite")
      .parquet(dataPath(dir, superstep))
    val md = manifestDir(dir)
    Files.createDirectories(md)
    val metricsJson = recent
      .map(m =>
        s"""{"superstep":${m.superstep},"residual":${m.residual},""" +
          s""""shuffleReadBytes":${m.shuffleReadBytes},"shuffleWriteBytes":${m.shuffleWriteBytes},""" +
          s""""shuffleReadRows":${m.shuffleReadRows},"shuffleWriteRows":${m.shuffleWriteRows},""" +
          s""""wallMs":${m.wallMs}}""")
      .mkString("[", ",", "]")
    val entry =
      s"""{"superstep":$superstep,"residual":$residual,"metrics":$metricsJson}"""
    val tmp = md.resolve(s".${superstep}.json.tmp")
    Files.writeString(tmp, entry)
    Files.move(tmp, md.resolve(s"$superstep.json"), StandardCopyOption.ATOMIC_MOVE)
  }

  /** Newest committed superstep: (superstep, residual). */
  def latest(dir: String): Option[(Int, Double)] = {
    val md = manifestDir(dir)
    if (!Files.isDirectory(md)) return None
    val entries = Files.list(md).iterator().asScala.toList
      .filter(_.getFileName.toString.matches("\\d+\\.json"))
    if (entries.isEmpty) return None
    val best = entries.maxBy(p => p.getFileName.toString.stripSuffix(".json").toInt)
    val k = best.getFileName.toString.stripSuffix(".json").toInt
    val txt = Files.readString(best)
    val residual = "\"residual\":([-+0-9.eE]+)".r
      .findFirstMatchIn(txt)
      .map(_.group(1).toDouble)
      .getOrElse(Double.MaxValue)
    Some((k, residual))
  }

  /** All committed supersteps in order (for resume tests / metrics queries). */
  def committedSupersteps(dir: String): Seq[Int] = {
    val md = manifestDir(dir)
    if (!Files.isDirectory(md)) return Nil
    Files.list(md).iterator().asScala.toList
      .map(_.getFileName.toString)
      .filter(_.matches("\\d+\\.json"))
      .map(_.stripSuffix(".json").toInt)
      .sorted
  }
}
