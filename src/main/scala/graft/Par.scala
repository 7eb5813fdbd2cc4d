package graft

/** Run INDEPENDENT Spark actions from concurrent driver threads —
  * optimization guide §2.6 ("overlap independent jobs"): actions are
  * only sequential because driver code calls them sequentially, and a
  * lifecycle pass that maintains two disjoint relations (postings +
  * docstats, codes + vecs) or materializes two retrieval legs leaves
  * executors idle during each job's planning, scheduling and stage
  * tails. FIFO scheduling lets the second job's tasks back-fill
  * executors the first job is not using; results are unchanged — the
  * thunks touch disjoint state by contract.
  */
object Par {

  /** Execute the thunks concurrently (one driver thread each) and
    * return when ALL have finished — including when one fails: every
    * future is awaited before anything is rethrown, so the caller
    * never returns (or propagates) while a sibling write is still in
    * flight racing cleanup or retry logic. The FIRST failure is
    * rethrown unwrapped (callers' loud require contracts are
    * unchanged); later failures ride along as suppressed exceptions.
    * Degenerate arities run inline. */
  def run(thunks: (() => Unit)*): Unit = {
    if (thunks.lengthCompare(2) < 0) thunks.foreach(t => t())
    else {
      val pool =
        java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
      try {
        val futures = thunks.map(t =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            override def call(): Unit = t()
          }))
        val failures = futures.flatMap { f =>
          try { f.get(); None }
          catch {
            case e: java.util.concurrent.ExecutionException =>
              Some(e.getCause)
          }
        }
        failures.headOption.foreach { first =>
          failures.drop(1).foreach(first.addSuppressed)
          throw first
        }
      } finally pool.shutdown()
    }
  }
}
