package graft

/** Crash-safety net for [[Bench]] (round-2 post-mortem: the driver's bench
  * JVM was SIGKILLed by the kernel OOM killer mid-spatial-section, leaving
  * NO machine-readable output — BENCH_r02.json `parsed: null`).
  *
  * Bench forks this tiny JVM at startup with stdout INHERITED (the same
  * pipe the sbt runner captures) and keeps a pipe to its stdin. Bench
  * writes a cumulative result-snapshot JSON line to `args(0)` after every
  * section. Protocol:
  *   - normal completion: Bench prints the final JSON itself, then writes
  *     "ok" to our stdin → we exit silently (exactly ONE JSON line in the
  *     bench output).
  *   - Bench dies (SIGKILL/OOM/crash): our stdin hits EOF without "ok" →
  *     we print the last snapshot (still exactly ONE JSON line).
  *
  * SIGKILL cannot be trapped in-process; a separate watcher process whose
  * liveness is tied to the parent's pipe is the only reliable mechanism.
  * This JVM runs with -Xmx64m and allocates nothing of note, so the OOM
  * killer (which targets the largest RSS) never picks it.
  */
object BenchReporter {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val buf = new Array[Byte](64)
    var ok = false
    var acc = "" // accumulate across reads: "ok" may arrive split
    var n = System.in.read(buf) // blocks until parent writes or dies
    while (n > 0 && !ok) {
      acc = (acc + new String(buf, 0, n, "UTF-8")).takeRight(8)
      if (acc.contains("ok")) ok = true
      else n = System.in.read(buf)
    }
    if (!ok) {
      try {
        val bytes = java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path))
        val line = new String(bytes, "UTF-8").trim
        if (line.nonEmpty) { System.out.println(line); System.out.flush() }
      } catch { case _: Throwable => () }
    }
  }
}
