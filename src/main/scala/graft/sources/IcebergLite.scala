package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal Iceberg-style table emulation (no Iceberg jars ship in this
  * sandbox — verified against /opt/spark/jars): immutable snapshot data dirs
  * plus a JSON manifest per snapshot listing the exact data files, committed
  * by temp-file + atomic rename. Readers resolve a snapshot (latest or
  * pinned — time travel) from the manifest, never by listing the data dir, so
  * a crashed half-written commit is invisible. The interface is deliberately
  * narrow so a real Iceberg catalog slots in on a cluster.
  */
object IcebergLite {

  private def manifestDir(table: String): Path = Paths.get(table, "_manifests")

  /** Append a new snapshot of `df`; returns the snapshot id. */
  def commit(df: DataFrame, table: String, partitionBy: Seq[String] = Nil): Long = {
    val snapshot = snapshots(table).lastOption.getOrElse(-1L) + 1
    val dataDir = Paths.get(table, s"snap-$snapshot")
    var writer = df.write.mode("errorifexists")
    if (partitionBy.nonEmpty) writer = writer.partitionBy(partitionBy: _*)
    writer.parquet(dataDir.toString)
    val files = Files
      .walk(dataDir)
      .iterator()
      .asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .map(_.toString)
      .toSeq
      .sorted
    val md = manifestDir(table)
    Files.createDirectories(md)
    val json =
      s"""{"snapshot":$snapshot,"rowCount":${df.count()},"files":[""" +
        files.map(f => "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"").mkString(",") +
        "]}"
    val tmp = md.resolve(s".$snapshot.json.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, md.resolve(s"$snapshot.json"), StandardCopyOption.ATOMIC_MOVE) // commit point
    snapshot
  }

  /** Committed snapshot ids, ascending. */
  def snapshots(table: String): Seq[Long] = {
    val md = manifestDir(table)
    if (!Files.isDirectory(md)) return Nil
    Files.list(md).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.matches("\\d+\\.json"))
      .map(_.stripSuffix(".json").toLong)
      .toSeq
      .sorted
  }

  /** Read a snapshot (default: latest) strictly via its manifest file list. */
  def read(spark: SparkSession, table: String, snapshot: Option[Long] = None): DataFrame = {
    val snap = snapshot.orElse(snapshots(table).lastOption).getOrElse(
      throw new IllegalStateException(s"no committed snapshots in $table"))
    val txt = Files.readString(manifestDir(table).resolve(s"$snap.json"))
    val files = "\"files\":\\[(.*)\\]".r
      .findFirstMatchIn(txt)
      .map(_.group(1))
      .filter(_.nonEmpty)
      .map(_.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\"").replace("\\\"", "\"").replace("\\\\", "\\")))
      .getOrElse(Seq.empty)
    if (files.isEmpty) spark.emptyDataFrame else spark.read.parquet(files: _*)
  }
}
