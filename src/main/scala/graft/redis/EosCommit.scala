package graft.redis

/** The ONE exactly-once commit protocol for every redis-DESTINATION
  * relay engine ([[RedisEosPump]], [[RedisEosRelay]],
  * [[graft.iggy.IggyEosRelay]]'s redis leg via [[commit]], and the file
  * shipper [[graft.ss.SsEosShip]]'s multi-key sub-epochs via
  * [[commitKeyed]]) — the round-16 self-review found the
  * WATCH/skip/filter/floor/MULTI/EXEC/retry machinery triplicated and
  * already drifting, and round 17 folded the shipper's last private
  * variant in (VERDICT r16 ask #4):
  *
  *   - WATCH the ledger AND the destination keys, then read the cursor
  *     UNDER the watch (a rival attempt of this coordinate cannot win
  *     silently — its EXEC moves a watched key, ours nils); the whole
  *     pre-MULTI phase — WATCH, cursor GET, every tip-ms floor probe —
  *     pipelines as ONE round trip (ordered server-side), so the
  *     conflict window never stacks K latencies;
  *   - an ADVANCE-ONLY call (no entries — consumed/aborted positions)
  *     watches the ledger alone: the ledger WATCH fully fences rival
  *     cursor attempts, and a legal foreign producer appending to the
  *     destination would otherwise nil a pure cursor advance repeatedly
  *     with no batch to shrink (ADVICE r16). The same de-escalation
  *     applies mid-call when a rival turns the remainder into a pure
  *     advance;
  *   - a rival's PARTIAL commit filters frame-exactly by entry
  *     position (its epoch may have planned a shorter range);
  *   - the destination tip-ms floors are read under the watch and every
  *     id clamps monotone, so real redis can never refuse a lower
  *     explicit `<ms>-*` INSIDE the EXEC while the cursor SET lands
  *     (that throw would be erasable by a task retry — silent loss);
  *   - the queue runs through `pipelineRaw` ([[RedisClient.pipeline]]
  *     THROWS on the first Err with the remaining replies unread — the
  *     refusal check must both fire and keep the connection drained);
  *   - a nil'd EXEC retries from the in-memory batch with a fresh
  *     cursor and floors after a JITTERED sit-out, and the committed
  *     batch SHRINKS geometrically: the watch window scales with the
  *     batch, so under a legal foreign producer on the destination
  *     stream a full-cap window (seconds) would nil forever — halving
  *     until the window fits between foreign appends guarantees
  *     progress (down to one entry per transaction). Each LANDED batch
  *     grows the limit back (doubling, capped at the entry count) and
  *     decays the nil budget by one: an early contention burst must not
  *     degrade the rest of a cap-sized drain into single-entry
  *     transactions (ADVICE r16), and the loop stays bounded — every
  *     regrow step pairs with a landed batch, so total passes ≤ 2× the
  *     entry count plus `maxNils`;
  *   - EXEC element errors fail LOUD (unreachable for the id class by
  *     construction — floors are watched); a top-level EXEC error
  *     (e.g. EXECABORT) surfaces through [[RedisClient.RedisError]],
  *     re-framed here — the old `case Resp.Err` arms after
  *     `command(EXEC)` were dead code, `command` throws first.
  *
  * Entries are `(pos, dstKey, tsMs, payload)` ascending by `pos` — the
  * engine's cursor space (packed redis ids for the pump, kafka/iggy
  * offsets for the relays, frame end-offsets minus one for the file
  * shipper, whose cursor values are always frame boundaries). After the
  * WHOLE batch lands the ledger reads `finalCursor` (≥ last pos + 1 —
  * engines use it to consume trailing aborted/expired positions); a
  * partial (shrunk) commit sets `last committed pos + 1` and loops for
  * the remainder. Returns the number of entries THIS call committed (a
  * rival's share is excluded).
  *
  * The `gate`/`gated`/`onNil`/`onApplied` seam lets the file shipper
  * serialize commit sections per destination node adaptively (one redis
  * node applies every EXEC under a single mutation thread — overlapping
  * WATCH windows on shared keys only nil each other); the retry sleep
  * stays OUTSIDE the gated section either way.
  */
private[graft] object EosCommit {

  private sealed trait Outcome
  /** A rival landed everything up to the final cursor — nothing pends. */
  private case object Landed extends Outcome
  /** This attempt's EXEC applied `n` entries; `full` = cursor at final. */
  private final case class Applied(n: Int, full: Boolean) extends Outcome
  /** A watched key moved before EXEC — nothing applied. */
  private case object Nilled extends Outcome
  /** A rival consumed every entry; only the trailing cursor advance
    * pends — re-fence as advance-only (ledger WATCH alone). */
  private case object DropKeyWatch extends Outcome

  /** Single-destination-key form — the pump/relay engines' shape. */
  def commit(rc: RedisClient, ledger: String, dstKey: String,
      entries: Vector[(Long, Long, Array[Byte])],
      finalCursor: Long, label: String,
      crashBeforeCommit: Option[String] = None,
      raceAfterRead: Option[String] = None,
      raceBeforeExec: Option[String] = None,
      maxNils: Int = 16): Long =
    commitKeyed(rc, ledger,
      entries.map { case (pos, tsMs, p) => (pos, dstKey, tsMs, p) },
      finalCursor, label, crashBeforeCommit, raceAfterRead,
      raceBeforeExec, maxNils)

  def commitKeyed(rc: RedisClient, ledger: String,
      entries: Vector[(Long, String, Long, Array[Byte])],
      finalCursor: Long, label: String,
      crashBeforeCommit: Option[String] = None,
      raceAfterRead: Option[String] = None,
      raceBeforeExec: Option[String] = None,
      maxNils: Int = 16,
      nilHint: String = "a live rival or a foreign producer keeps " +
        "touching the ledger/destination key even at single-entry " +
        "transactions",
      backoffStepMs: Long = 50L, backoffCapMs: Long = 400L,
      gate: Option[Object] = None,
      gated: () => Boolean = () => false,
      onNil: () => Unit = () => (),
      onApplied: () => Unit = () => ()): Long = {
    // watch the union of the batch's possible keys: a shrunk batch writes
    // a subset, and watching the superset is correct (extra nils at
    // worst, which the shrink absorbs)
    val allKeys = entries.map(_._2).distinct.sorted
    var limit = math.max(1, entries.size)
    var attempts = 0
    var total = 0L
    var watchDst = entries.nonEmpty
    while (true) {
      def attemptOnce(): Outcome = {
        val keys = if (watchDst) allKeys else Nil
        // one-round-trip pre-MULTI phase: WATCH ledger(+keys), GET
        // cursor, tip-ms floor probes — ordered server-side
        val replies = rc.pipelineRaw(
          RedisStreams.watch(ledger +: keys: _*) +:
            RedisStreams.get(ledger) +:
            keys.map(k => RedisStreams.xrevrangeTip(k)))
        replies.head match {
          case Resp.Err(m) =>
            throw new IllegalStateException(s"WATCH refused: $m")
          case _ => ()
        }
        val committed = replies(1) match {
          case Resp.Bulk(bs) => new String(bs, "UTF-8").toLong
          // pipelineRaw surfaces Err replies as values (unlike command,
          // which throws): a refused cursor read — e.g. WRONGTYPE from a
          // foreign process squatting the ledger name — must fail LOUD;
          // falling through to 0 would re-ship the whole batch, a silent
          // exactly-once violation (round-17 self-review)
          case Resp.Err(m) =>
            throw new IllegalStateException(s"ledger GET refused: $m")
          case _ => 0L
        }
        raceAfterRead.foreach(graft.ops.Failpoints.fireHook)
        if (committed >= finalCursor) {
          rc.command(RedisStreams.unwatch: _*)
          return Landed
        }
        val live = entries.filter(_._1 >= committed)
        if (live.isEmpty && watchDst) {
          rc.command(RedisStreams.unwatch: _*)
          return DropKeyWatch
        }
        val batch = live.take(limit)
        val full = batch.size == live.size
        // destination tip-ms floors, read UNDER the watch (pre-MULTI)
        val lastMs = scala.collection.mutable.Map.empty[String, Long]
        keys.zip(replies.drop(2)).foreach { case (k, v) =>
          // a squatted destination key (WRONGTYPE) must refuse with the
          // same diagnostic shape as the WATCH/GET checks above, not leak
          // a "bad XRANGE reply" from the decoder (round-17 advice)
          v match {
            case Resp.Err(m) =>
              throw new IllegalStateException(s"tip probe refused ($k): $m")
            case _ => ()
          }
          lastMs(k) = RedisStreams.decodeEntriesWithIds(v, "", 0L)
            .headOption.map(e =>
              RedisStreams.parseEntryId(e._1)._1).getOrElse(0L)
        }
        rc.command(RedisStreams.multi: _*)
        // 2000-command pipeline chunks: replies inside MULTI are tiny
        // (+QUEUED), so the in-flight reply bound stays ~20 kB while the
        // chunk-sync round trips drop 4x
        batch.grouped(2000).foreach { chunk =>
          rc.pipelineRaw(chunk.map { case (_, k, tsMs, payload) =>
            val ms = math.max(tsMs, lastMs(k))
            lastMs(k) = ms
            RedisStreams.xadd(k, ms, payload)
          }).collectFirst { case Resp.Err(m) =>
            throw new IllegalStateException(s"MULTI queue refused: $m")
          }
        }
        // the advanced cursor queues LAST, inside the same MULTI —
        // entries and resume point commit atomically at EXEC
        val cursorAfter = if (full) finalCursor else batch.last._1 + 1L
        rc.command(RedisStreams.set(ledger, cursorAfter.toString): _*)
        if (crashBeforeCommit.exists(graft.ops.Failpoints.fire))
          throw new IllegalStateException(
            s"injected crash: $label queued, not EXECed")
        raceBeforeExec.foreach(graft.ops.Failpoints.fireHook)
        val reply =
          try rc.command(RedisStreams.exec: _*)
          catch {
            case e: RedisClient.RedisError =>
              throw new IllegalStateException(s"EXEC failed: ${e.msg}", e)
          }
        reply match {
          case Resp.NullArr => Nilled
          case Resp.Arr(rs) =>
            rs.collectFirst { case Resp.Err(m) =>
              throw new IllegalStateException(
                s"EXEC element refused (state needs repair): $m")
            }
            Applied(batch.size, full)
          case other =>
            throw new IllegalStateException(s"EXEC reply: $other")
        }
      }
      val outcome =
        if (gated() && gate.isDefined) gate.get.synchronized(attemptOnce())
        else attemptOnce()
      outcome match {
        case Landed => return total
        case DropKeyWatch =>
          watchDst = false // not a nil: re-fence and advance the cursor
        case Applied(n, full) =>
          total += n
          onApplied()
          if (full) return total
          limit = math.min(math.max(1, entries.size), limit * 2)
          attempts = math.max(0, attempts - 1)
        case Nilled =>
          onNil()
          attempts += 1
          require(attempts <= maxNils,
            s"$label: EXEC nil'd $attempts times — $nilHint")
          limit = math.max(1, limit / 2)
          // the sit-out runs OUTSIDE any commit gate
          Thread.sleep(1L + java.util.concurrent.ThreadLocalRandom
            .current().nextLong(math.min(backoffStepMs * attempts,
              backoffCapMs)))
      }
    }
    0L // unreachable
  }
}
