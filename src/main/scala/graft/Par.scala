package graft

/** Run INDEPENDENT Spark actions concurrently (optimization guide §2.6:
  * "actions are only sequential because your driver code calls them
  * sequentially"). The multi-store scenario entries write several named
  * stores / delta batches whose contents derive only from the input
  * frames, never from each other — submitting them from a small pool
  * lets the next write's tasks back-fill executors freed by the current
  * write's straggler tail, locally and on a real cluster alike.
  *
  * Failure contract: waits for ALL thunks, then rethrows the FIRST
  * failure (unwrapped), so a crash surfaces exactly as in the
  * sequential form and no write is silently abandoned mid-flight.
  */
object Par {
  /** 2-3 jobs in flight is plenty (guide §2.6): enough to back-fill the
    * straggler tail, not so many that concurrently-materialized write
    * inputs compound memory pressure — an unbounded pool doubled the
    * bench JVM's RSS (12 → 23 GB) and slowed co-resident entries. */
  private val MaxInFlight = 3

  def jobs(thunks: (() => Unit)*): Unit = {
    if (thunks.sizeIs <= 1) { thunks.foreach(_.apply()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(MaxInFlight, thunks.size))
    try {
      val futs = thunks.map { t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = t()
        })
      }
      var firstErr: Throwable = null
      futs.foreach { f =>
        try { if (firstErr == null || !firstErr.isInstanceOf[InterruptedException]) f.get() }
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (firstErr == null) firstErr = e.getCause
            else firstErr.addSuppressed(e.getCause)
          case e: InterruptedException =>
            // caller is being cancelled (e.g. StreamingQuery.stop()):
            // restore the interrupt status, cancel what hasn't run, and
            // stop blocking on the rest
            Thread.currentThread().interrupt()
            futs.foreach(_.cancel(true))
            if (firstErr == null) firstErr = e else firstErr.addSuppressed(e)
          case e: Throwable =>
            if (firstErr == null) firstErr = e else firstErr.addSuppressed(e)
        }
      }
      if (firstErr != null) throw firstErr
    } finally pool.shutdown()
  }
}
