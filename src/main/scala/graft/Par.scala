package graft

/** Driver-side overlap of independent Spark actions (optimization
  * guide §2.6): actions are only sequential because driver code calls
  * them sequentially — independent eager builds (localCheckpoint
  * chains, per-unit commit rewrites) submitted from a small thread
  * pool back-fill executors freed by one job's tail with the next
  * job's tasks under the default FIFO scheduler.
  */
object Par {

  /** Run independent thunks concurrently, results in input order; the
    * first failure rethrows its ORIGINAL exception. Use only for
    * thunks that are independent and deterministic — everything
    * submitted here produces the same result it would sequentially;
    * only the job schedule changes. */
  def inParallel[T](thunks: Seq[() => T]): Seq[T] =
    if (thunks.sizeIs <= 1) thunks.map(_())
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
      try {
        val futs = thunks.map { t =>
          pool.submit(new java.util.concurrent.Callable[T] { def call(): T = t() })
        }
        futs.map { f =>
          try f.get()
          catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
        }
      } finally { pool.shutdown(); () }
    }
}
