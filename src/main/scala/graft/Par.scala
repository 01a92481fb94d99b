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
  def jobs(thunks: (() => Unit)*): Unit = {
    if (thunks.sizeIs <= 1) { thunks.foreach(_.apply()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
    try {
      val futs = thunks.map { t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = t()
        })
      }
      var firstErr: Throwable = null
      futs.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (firstErr == null) firstErr = e.getCause
          case e: Throwable => if (firstErr == null) firstErr = e
        }
      }
      if (firstErr != null) throw firstErr
    } finally pool.shutdown()
  }
}
