package graft.redis

/** The ONE exactly-once commit protocol for every redis-DESTINATION
  * relay engine ([[RedisEosPump]], [[RedisEosRelay]],
  * [[graft.iggy.IggyEosRelay]]'s redis leg) — the round-16 self-review
  * found the WATCH/skip/filter/floor/MULTI/EXEC/retry machinery
  * triplicated and already drifting, so the protocol now lives here
  * once:
  *
  *   - WATCH the ledger AND the destination key, then read the cursor
  *     UNDER the watch (a rival attempt of this coordinate cannot win
  *     silently — its EXEC moves a watched key, ours nils);
  *   - a rival's PARTIAL commit filters frame-exactly by entry
  *     position (its epoch may have planned a shorter range);
  *   - the destination tip-ms floor is read under the watch and every
  *     id clamps monotone, so real redis can never refuse a lower
  *     explicit `<ms>-*` INSIDE the EXEC while the cursor SET lands
  *     (that throw would be erasable by a task retry — silent loss);
  *   - the queue runs through `pipelineRaw` ([[RedisClient.pipeline]]
  *     THROWS on the first Err with the remaining replies unread — the
  *     refusal check must both fire and keep the connection drained);
  *   - a nil'd EXEC retries from the in-memory batch with a fresh
  *     cursor and floor after a JITTERED sit-out, and the committed
  *     batch SHRINKS geometrically: the watch window scales with the
  *     batch, so under a legal foreign producer on the destination
  *     stream a full-cap window (seconds) would nil forever — halving
  *     until the window fits between foreign appends guarantees
  *     progress (down to one entry per transaction);
  *   - EXEC element errors fail LOUD (unreachable for the id class by
  *     construction — floors are watched); a top-level EXEC error
  *     (e.g. EXECABORT) surfaces through [[RedisClient.RedisError]],
  *     re-framed here — the old `case Resp.Err` arms after
  *     `command(EXEC)` were dead code, `command` throws first.
  *
  * `entries` are `(pos, tsMs, payload)` ascending by `pos` — the
  * engine's cursor space (packed redis ids for the pump, kafka/iggy
  * offsets for the relays). After the WHOLE batch lands the ledger
  * reads `finalCursor` (≥ last pos + 1 — engines use it to consume
  * trailing aborted/expired positions); a partial (shrunk) commit sets
  * `last committed pos + 1` and loops for the remainder. An EMPTY
  * batch with `finalCursor` above the cursor commits an advance-only
  * transaction (consumed positions, the aborted-range case). Returns
  * the number of entries THIS call committed (a rival's share is
  * excluded).
  */
private[graft] object EosCommit {

  def commit(rc: RedisClient, ledger: String, dstKey: String,
      entries: Vector[(Long, Long, Array[Byte])],
      finalCursor: Long, label: String,
      crashBeforeCommit: Option[String] = None,
      raceAfterRead: Option[String] = None,
      raceBeforeExec: Option[String] = None,
      maxNils: Int = 16): Long = {
    var limit = math.max(1, entries.size)
    var attempts = 0
    var total = 0L
    while (true) {
      rc.command(RedisStreams.watch(ledger, dstKey): _*)
      val committed = rc.command(RedisStreams.get(ledger): _*) match {
        case Resp.Bulk(bs) => new String(bs, "UTF-8").toLong
        case _ => 0L
      }
      raceAfterRead.foreach(graft.ops.Failpoints.fireHook)
      if (committed >= finalCursor) {
        rc.command(RedisStreams.unwatch: _*)
        return total // landed (ours and/or a rival's) — nothing pends
      }
      val live = entries.filter(_._1 >= committed)
      val batch = live.take(limit)
      val full = batch.size == live.size
      // destination tip-ms floor, read UNDER the watch (pre-MULTI)
      var lastMs = RedisStreams.decodeEntriesWithIds(
        rc.command(RedisStreams.xrevrangeTip(dstKey): _*), "", 0L)
        .headOption.map(e =>
          RedisStreams.parseEntryId(e._1)._1).getOrElse(0L)
      rc.command(RedisStreams.multi: _*)
      batch.grouped(2000).foreach { chunk =>
        rc.pipelineRaw(chunk.map { case (_, tsMs, payload) =>
          lastMs = math.max(tsMs, lastMs)
          RedisStreams.xadd(dstKey, lastMs, payload)
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
        case Resp.NullArr =>
          // a watched key moved — rival attempt or foreign append;
          // nothing applied. Shrink + sit out + retry with fresh state.
          attempts += 1
          require(attempts <= maxNils,
            s"$label: EXEC nil'd $attempts times — a live rival or a " +
              "foreign producer keeps touching the ledger/destination " +
              "key even at single-entry transactions")
          limit = math.max(1, limit / 2)
          Thread.sleep(1L + java.util.concurrent.ThreadLocalRandom
            .current().nextLong(math.min(50L * attempts, 400L)))
        case Resp.Arr(rs) =>
          rs.collectFirst { case Resp.Err(m) =>
            throw new IllegalStateException(
              s"EXEC element refused (state needs repair): $m")
          }
          total += batch.size
          if (full) return total
        // else: loop — the next pass re-reads the cursor (now past this
        // batch) and commits the remainder
        case other =>
          throw new IllegalStateException(s"EXEC reply: $other")
      }
    }
    0L // unreachable
  }
}
