package graft.tools

/** Standalone twin of the fixed CPU calibration loop embedded in
  * [[graft.Bench]] (r13 verdict ask #6): the SAME constant
  * single-thread xorshift kernel (600M steps, pure register
  * arithmetic), JIT-warmed then timed `reps` times. Run it next to an
  * isolated QTime re-pin so the measurement carries the host's
  * per-core throughput at that moment — the normalizer that lets two
  * records taken in different host states be compared without
  * re-litigating the 1.3-1.7x band.
  *
  * Usage: runMain graft.tools.CpuCalib [reps]
  */
object CpuCalib {
  def xorshiftLoop(n: Long): Long = {
    var x = 0x9E3779B97F4A7C15L; var i = 0L
    while (i < n) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
    x
  }

  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 3
    val warm = xorshiftLoop(5000000L)
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val x = xorshiftLoop(600000000L)
      val sec = (System.nanoTime() - t0) / 1e9
      if (x == 42L && warm == 42L) System.err.println("")
      sec
    }
    val loadavg =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .trim.split(" ").take(3).mkString(" ")
      catch { case _: Throwable => "unavailable" }
    println(f"""CPUCALIB ${times.map(t => f"$t%.3f").mkString(" ")} min=${times.min}%.3f loadavg="$loadavg"""")
  }
}
