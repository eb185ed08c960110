package graft.ext

/** Session-scoped build-at-most-once memoization for persisted stores
  * (ADVICE r13). The previous pattern — `ConcurrentHashMap.newKeySet
  * .add(key)` guarding the build call — published the key BEFORE the
  * build ran, so a concurrent second caller raced past the guard and
  * read the store while the winner was still mid-write; and a FAILED
  * build left the key marked built for the rest of the session, so the
  * store was never retried.
  *
  * Here the key maps to a future that completes only AFTER the build:
  * losers block until the winner finishes (then see a fully-written
  * store), and a thrown build unregisters the key so the next caller
  * retries instead of trusting a half-written store. Keys are store
  * paths (warehouse-scoped, content-hashed), so one process-wide map
  * serves every store family without collision.
  */
private[graft] object SessionOnce {
  private val builds =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.CompletableFuture[Void]]()

  /** Run `body` at most once per `key` per session; every caller returns
    * only after a successful build (the winner builds, losers wait on the
    * winner's future). A thrown build unregisters the key — the next
    * caller retries — and rethrows to the winner. */
  def apply(key: String)(body: => Unit): Unit = {
    var done = false
    while (!done) {
      val mine = new java.util.concurrent.CompletableFuture[Void]()
      val cur = builds.putIfAbsent(key, mine)
      if (cur == null) {
        try { body; mine.complete(null); done = true }
        catch { case e: Throwable =>
          builds.remove(key, mine)
          mine.completeExceptionally(e)
          throw e
        }
      } else done = !failed(cur) // winner failed+unregistered -> retry
    }
  }

  /** Mark `key` built without running anything — for harness twins that
    * just rebuilt the store explicitly (idempotence arms), so the session
    * arm reuses their work. Never clobbers an IN-FLIGHT build (that would
    * re-open the publish-before-complete hole this class closes: later
    * callers would stop waiting on the winner); only absent or
    * previously-failed entries are replaced. */
  def markBuilt(key: String): Unit = {
    val done = java.util.concurrent.CompletableFuture.completedFuture[Void](null)
    val cur = builds.putIfAbsent(key, done)
    if (cur != null && cur.isDone && cur.isCompletedExceptionally)
      builds.replace(key, cur, done)
  }

  /** Await `f`; true iff it completed exceptionally (or was cancelled). */
  private def failed(f: java.util.concurrent.CompletableFuture[Void]): Boolean =
    try { f.join(); false }
    catch {
      case _: java.util.concurrent.CompletionException => true
      case _: java.util.concurrent.CancellationException => true
    }
}

/** [[SessionOnce]]'s value-returning sibling: session-scoped
  * compute-at-most-once memoization for DRIVER-RESIDENT model artifacts
  * (quantizer structures, calibrated probe depths, PQ codebooks,
  * fixture-audit ground truth). Same winner/loser/retry discipline — the
  * future completes only AFTER the computation, losers wait on the winner,
  * a thrown body unregisters the key so the next caller retries.
  *
  * Scope contract: only DETERMINISTIC functions of an immutable input may
  * be cached (every key embeds the SF directory); values must be bounded
  * driver-side data — the same contract as the frozen-model collects
  * (centroid tables, merge tables, codebooks). Because the values live on
  * the driver, they survive `spark.catalog.clearCache()` (the bench's
  * per-query isolation), which is the point: a deployment builds an
  * index/ground-truth artifact once per corpus and serves queries against
  * it, so warm-pass timings measure the serving shape, not a rebuild
  * (VERDICT r14 #1/#3 prescribe exactly this session-state sharing). */
private[graft] object SessionVal {
  private val vals =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.CompletableFuture[AnyRef]]()

  def apply[T <: AnyRef](key: String)(body: => T): T = {
    while (true) {
      val mine = new java.util.concurrent.CompletableFuture[AnyRef]()
      val cur = vals.putIfAbsent(key, mine)
      if (cur == null) {
        val v =
          try body
          catch { case e: Throwable =>
            vals.remove(key, mine)
            mine.completeExceptionally(e)
            throw e
          }
        mine.complete(v)
        return v
      } else {
        try return cur.join().asInstanceOf[T]
        catch { // winner failed + unregistered -> retry the loop
          case _: java.util.concurrent.CompletionException => ()
          case _: java.util.concurrent.CancellationException => ()
        }
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Primitive-friendly wrapper for memoized Ints (probe depths). */
  def int(key: String)(body: => Int): Int =
    apply[java.lang.Integer](key)(Int.box(body)).intValue
}
