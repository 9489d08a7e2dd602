package graft.util

/** Cheap host/process counters for per-superstep attribution on a shared VM.
  *
  * The bench host steals cpu and DRAM bandwidth from outside the guest on a
  * minutes timescale; wall time alone cannot distinguish "the engine was
  * slow" from "the hypervisor took the cpu" from "the process waited".
  * These two counters close that gap: process cpu time (getrusage-backed via
  * the JMX OperatingSystemMXBean) and stolen time for THIS process's pinned
  * cpus (per-cpu rows of /proc/stat, column 8, USER_HZ=100). Both are one
  * syscall-ish read per superstep — noise-free relative to multi-second
  * steps — and both return -1 rather than throwing anywhere /proc or the
  * platform bean is missing, so library callers never fail on exotic hosts.
  */
object HostProbe {

  /** Cpus named by KB_PIN_CPUS ("16-19" / "0,2,4"), empty = not pinned.
    * Set by the bench harness next to the taskset pin; a library user
    * running unpinned gets machine-wide steal, which is still honest, just
    * noisier (idle vcpus accrue timer-tick steal).
    */
  private lazy val pinnedCpus: Set[Int] =
    sys.env.get("KB_PIN_CPUS").map { spec =>
      try
        spec.split(',').flatMap { r =>
          r.split('-') match {
            case Array(a, b) => (a.trim.toInt to b.trim.toInt).toSeq
            case Array(a) => Seq(a.trim.toInt)
            case _ => Seq.empty[Int]
          }
        }.toSet
      catch { case _: Exception => Set.empty[Int] }
    }.getOrElse(Set.empty)

  /** Cumulative stolen cpu-seconds on this process's pinned cpus (all cpus
    * when unpinned); -1 when /proc/stat is unavailable.
    */
  def stealSec(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val lines = src.getLines().toSeq
        // -1 when the steal column is absent (pre-2.6.11 kernels, some
        // container runtimes): "counter unavailable" must not read as "no
        // steal" — everywhere else in this API unavailability is -1
        // (round-5 ADVICE)
        def stealOf(cols: Array[String]): Double =
          if (cols.length > 8) cols(8).toDouble / 100.0 else -1.0
        if (pinnedCpus.nonEmpty) {
          val rows = lines.filter { l =>
            l.startsWith("cpu") && l.length > 3 && l(3).isDigit &&
            pinnedCpus.contains(l.drop(3).takeWhile(_.isDigit).toInt)
          }
          if (rows.isEmpty) -1.0
          else {
            val vals = rows.map(l => stealOf(l.trim.split("\\s+")))
            if (vals.exists(_ < 0)) -1.0 else vals.sum
          }
        } else stealOf(lines.head.trim.split("\\s+"))
      } finally src.close()
    } catch { case _: Exception => -1.0 }

  /** Cumulative cpu-seconds consumed by THIS process (all threads); -1 when
    * the platform bean is unavailable.
    */
  def procCpuSec(): Double =
    try
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean =>
          val ns = os.getProcessCpuTime
          if (ns < 0) -1.0 else ns / 1e9
        case _ => -1.0
      }
    catch { case _: Exception => -1.0 }

  /** Cumulative stop-the-world GC seconds across all collectors; -1 when
    * unavailable.
    */
  def gcSec(): Double =
    try {
      var ms = 0L
      val it = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.iterator()
      while (it.hasNext) { val t = it.next().getCollectionTime; if (t > 0) ms += t }
      ms / 1000.0
    } catch { case _: Exception => -1.0 }

  /** Loaded-class count — a steadily growing value across supersteps means
    * the engine GENERATES classes per superstep (encoder/codegen churn),
    * which keeps the JIT busy forever; -1 when unavailable.
    */
  def loadedClasses(): Double =
    try
      java.lang.management.ManagementFactory.getClassLoadingMXBean.getTotalLoadedClassCount.toDouble
    catch { case _: Exception => -1.0 }

  /** Cumulative JIT compilation seconds (compiler-thread time; on a
    * cpu-pinned JVM the compiler competes with compute for the same cpus,
    * which round-5 step traces implicate in 8× step-to-step cpu variance);
    * -1 when unavailable.
    */
  def jitSec(): Double =
    try {
      val c = java.lang.management.ManagementFactory.getCompilationMXBean
      if (c != null && c.isCompilationTimeMonitoringSupported) c.getTotalCompilationTime / 1000.0
      else -1.0
    } catch { case _: Exception => -1.0 }
}
