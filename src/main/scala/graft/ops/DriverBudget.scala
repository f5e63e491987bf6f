package graft.ops

/** JVM-wide serialization of the fits-the-driver fast paths (VERDICT r8 #7).
  *
  * Two cap-guarded paths deliberately move a bounded working set onto the
  * driver: dedup clustering's union-find collect
  * ([[graft.analytics.Dedup]]'s `LocalCcEdgeCap`, ~16 B/edge → ≤ 64 MB) and
  * BPE training's local finish ([[graft.analytics.Pipeline]]'s
  * `LocalFinishVocabCap`, a Heaps-law vocab → a few hundred MB). Each cap
  * bounds ONE query; N concurrent sessions in the same driver JVM would
  * otherwise stack N compute peaks on top of each other. This single fair
  * permit serializes the COLLECT-AND-COMPUTE peaks — the edge collect +
  * union-find scratch, the vocab collect + per-merge rewrite arrays. What
  * it deliberately does NOT cover is each query's RESULT (the labels
  * local relation, the segmented vocab rows): results must outlive the
  * section to be consumed by the rest of the plan, so concurrent sessions
  * can still hold one result-sized residual each — smaller than the peak
  * (no scratch structures), accounted for when sizing the caps. The queue
  * cost is bounded by the fast paths' own premise (seconds of driver
  * work), and the distributed fallbacks never touch the permit.
  */
object DriverBudget {
  private val permit = new java.util.concurrent.Semaphore(1, true)
  private val holders = new java.util.concurrent.atomic.AtomicInteger(0)
  private val peakVar = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Run `f` holding the single driver-residency permit. */
  def withPermit[T](f: => T): T = {
    permit.acquire()
    val h = holders.incrementAndGet()
    peakVar.getAndUpdate(p => math.max(p, h))
    try f
    finally { holders.decrementAndGet(); permit.release() }
  }

  /** Max concurrent holders ever observed — 1 by construction (spec law). */
  private[graft] def peakHolders: Int = peakVar.get()
}
