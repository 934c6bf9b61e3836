package graft.ops

/** Overlap INDEPENDENT Spark actions from driver threads (optimization
  * guide §2.6): Spark's scheduler happily runs several jobs at once in
  * one application — lifecycle operators that mutate two unrelated
  * tables (clone bands ∥ clone reps, compact bands ∥ compact reps,
  * corpus append ∥ index appends) were paying the jobs' fixed costs
  * back-to-back when the second job's tasks could back-fill the first
  * one's tail. ONLY for actions with no ordering dependency: never two
  * commits to the SAME table (OCC would serialize them with retries),
  * never a publish that must stay last (manifest swaps).
  *
  * Failure semantics: waits for every branch, then rethrows the first
  * failure (suppressing the rest) — same observable outcome as the
  * sequential code, minus which-branch-threw ordering. */
private[graft] object Par {
  def run(work: (() => Unit)*): Unit = {
    if (work.sizeIs <= 1) { work.foreach(_.apply()); return }
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = work.map { f =>
      val t = new Thread(() => try f() catch { case e: Throwable => errs.add(e) })
      t.setDaemon(true)
      t.start()
      t
    }
    threads.foreach(_.join())
    val it = errs.iterator()
    if (it.hasNext) {
      val first = it.next()
      while (it.hasNext) first.addSuppressed(it.next())
      throw first
    }
  }
}
