package graft.operators

/** Run independent Spark ACTIONS concurrently from the driver — the
  * lifecycle operators' barrier-count lever. A bootstrap or refresh
  * ends with several writes that share no data dependency (band
  * append, shingle append, merge-log version): run sequentially each
  * pays its own full driver round-trip (analysis, AQE stage
  * scheduling, commit protocol), and at delta scale that fixed
  * overhead IS the wall (r13/r14 verdicts). SparkSession is
  * thread-safe for concurrent actions; the scheduler interleaves
  * their stages, so wall ≈ max instead of sum.
  *
  * Failure: every thunk is awaited (no orphaned writes mutating state
  * after the caller saw an error); the FIRST failure is rethrown with
  * any others suppressed.
  */
private[graft] object Par {
  def run(thunks: (() => Unit)*): Unit = {
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val wrapped = thunks.map { f =>
      val t = new Thread(() =>
        try f() catch { case e: Throwable => errs.add(e) })
      t.setDaemon(true)
      t.start()
      t
    }
    wrapped.foreach(_.join())
    val it = errs.iterator()
    if (it.hasNext) {
      val first = it.next()
      while (it.hasNext) first.addSuppressed(it.next())
      throw first
    }
  }
}
