package graft.engine

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicLong

final case class ShuffleDelta(
    readBytes: Long,
    writeBytes: Long,
    readRows: Long,
    writeRows: Long
)

/** Accumulates cluster-wide shuffle metrics from completed stages; the engine
  * snapshots between supersteps to attribute rows/bytes shuffled per superstep
  * (north rule: per-superstep metrics — rows, bytes shuffled, residual).
  */
final class ShuffleMetricsListener extends SparkListener {
  private val readBytes = new AtomicLong
  private val writeBytes = new AtomicLong
  private val readRows = new AtomicLong
  private val writeRows = new AtomicLong
  @volatile private var mark = ShuffleDelta(0, 0, 0, 0)

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val m = sc.stageInfo.taskMetrics
    if (m != null) {
      readBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      writeBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      readRows.addAndGet(m.shuffleReadMetrics.recordsRead)
      writeRows.addAndGet(m.shuffleWriteMetrics.recordsWritten)
    }
  }

  def snapshot(): Unit =
    mark = ShuffleDelta(readBytes.get, writeBytes.get, readRows.get, writeRows.get)

  def delta(): ShuffleDelta =
    ShuffleDelta(
      readBytes.get - mark.readBytes,
      writeBytes.get - mark.writeBytes,
      readRows.get - mark.readRows,
      writeRows.get - mark.writeRows)
}
