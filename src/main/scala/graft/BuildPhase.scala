package graft

/** Build-vs-serve accounting for the lifecycle gates.
  *
  * The persisted-index gates construct a full index INSIDE the timed
  * gate body (write + lifecycle ops) and then return a DataFrame that
  * serves from it — so their bench number is dominated by one-time
  * index-construction I/O, not the serving latency the artifact exists
  * for. Gates wrap construction in [[timed]]; [[Bench]] resets the
  * accumulator per query and reports a `build_sec` map alongside the
  * wall times, making `wall − build` the citable serve latency without
  * changing what the gate tests (the full lifecycle still runs, and
  * Verify still hashes the result).
  *
  * Single-accumulator design: Bench runs queries sequentially on one
  * thread, and the construction calls are synchronous — no per-thread
  * bookkeeping needed. Nested [[timed]] calls would double-count, so
  * gates wrap the OUTERMOST construction block only. */
object BuildPhase {
  private val nanos = new java.util.concurrent.atomic.AtomicLong()

  /** Run `f`, adding its wall time to the current query's build total. */
  def timed[T](f: => T): T = {
    val t0 = System.nanoTime()
    try f finally nanos.addAndGet(System.nanoTime() - t0)
  }

  /** Zero the accumulator (Bench, before each query). */
  def reset(): Unit = nanos.set(0L)

  /** Seconds accumulated since the last [[reset]]. */
  def taken(): Double = nanos.get() / 1e9
}
