package graft

/** Overlap INDEPENDENT eagerly-materializing branches of one query's
  * construction — the "overlap independent jobs" pattern (optimization
  * guide §2.6): Spark's scheduler happily runs several jobs at once
  * inside one application; actions are only sequential because the
  * calling code invokes them sequentially. Many experiment operators
  * here build two or three branches (exact yardstick vs candidate
  * index, plain vs permuted ladder) whose internal `localCheckpoint` /
  * `collect` actions otherwise serialize on the driver thread, leaving
  * the executor pool idle in each branch's scheduling tail. Evaluating
  * the branches on separate threads lets the second branch's tasks
  * back-fill the cores the first branch's tail leaves free.
  *
  * Results are UNCHANGED — each branch builds exactly the plan it
  * built before; only the wall-clock shrinks toward max(branch) from
  * sum(branches). Scale note: on a real cluster this is the same win
  * (FIFO scheduling back-fills executors freed by a branch's straggler
  * tail); nothing here is local-mode-specific.
  *
  * The pool is unbounded-but-daemon (threads die with the JVM and are
  * reused when idle); one branch always runs on the CALLER's thread,
  * so nesting `sections` inside a branch cannot deadlock and the
  * caller's thread-local job description labels at least one branch. */
object Par {
  private lazy val pool = java.util.concurrent.Executors.newCachedThreadPool(
    new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger(1)
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"graft-par-${n.getAndIncrement()}")
        t.setDaemon(true)
        t
      }
    })

  private def submit[A](a: => A): java.util.concurrent.Future[A] =
    pool.submit(new java.util.concurrent.Callable[A] { def call(): A = a })

  /** Re-throw the branch's ORIGINAL failure, not the pool's wrapper —
    * callers (and tests) must see the same exception class a serial
    * evaluation would have thrown. */
  private def await[A](f: java.util.concurrent.Future[A]): A =
    try f.get()
    catch {
      case e: java.util.concurrent.ExecutionException =>
        throw Option(e.getCause).getOrElse(e)
    }

  /** Evaluate `a` on a pool thread while `b` runs on the caller's
    * thread; return both. */
  def sections[A, B](a: => A, b: => B): (A, B) = {
    val fa = submit(a)
    val rb = b
    (await(fa), rb)
  }

  /** Three-way [[sections]]: `a` and `b` on pool threads, `c` on the
    * caller's thread. */
  def sections3[A, B, C](a: => A, b: => B, c: => C): (A, B, C) = {
    val fa = submit(a)
    val fb = submit(b)
    val rc = c
    (await(fa), await(fb), rc)
  }
}
