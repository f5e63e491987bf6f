package graft.ss

import java.io.File

import graft.ss.SsFormat._

/** Surveyor-parity point seek over one `.ss` file
  * (sea-streamer-file/src/surveyor.rs:16-122): binary-search the beacon
  * prefix-max markers for the last boundary known to sit entirely at/below
  * the threshold, then frame-walk at most ~one beacon stride to the exact
  * first qualifying frame — O(log B) beacon reads instead of a scan from the
  * file front.
  *
  * Laws (SURVEY §2.4, messages.rs:262-279): seek is `timestamp > T`
  * (strict), rewind is `sequence >= S`. Like the reference surveyor this
  * assumes the file is written in nondecreasing (per-stream) order — the
  * shape every producer in this library emits; on a non-monotone file the
  * start point is still frame-exact but later out-of-order frames are not
  * re-filtered (use the batch scan's pushdown for that).
  */
object SsSurveyor {

  /** Byte offset of the first frame passing the seek/rewind predicate, or
    * the end of the last complete frame when nothing (yet) qualifies —
    * either way a frame-exact stream start.
    */
  def seekOffset(
      path: String,
      minTsExclusiveMs: Option[Long],
      minSeqInclusive: Option[Long]): Long = {
    val size = new File(path).length()
    if (size <= HeaderSize) return 0L
    val interval = SsReader.readHeader(path).beaconInterval.toLong
    val lastBeacon = (size - 1) / interval

    // A beacon vouches that everything before it fails the predicate only
    // when its marker set covers every stream (count below the rotation
    // budget) and every prefix-max sits at/below the threshold.
    def safeBelow(k: Long): Boolean =
      SsReader.readBeaconAt(path, k * interval) match {
        case Some(b) if b.items.nonEmpty &&
          b.items.length < numMarkers(interval.toInt) =>
          minTsExclusiveMs.forall(t => b.items.forall(_.maxTimestampMillis <= t)) &&
            minSeqInclusive.forall(s => b.items.forall(_.maxSeqNo < s))
        case _ => false
      }

    // Largest beacon with safeBelow (marker rotation can make the predicate
    // locally non-monotone; the loop only ever lands on a beacon that
    // answered true, so the start is always sound, merely possibly early).
    var lo = 0L
    var hi = lastBeacon
    while (lo < hi) {
      val mid = (lo + hi + 1) / 2
      if (safeBelow(mid)) lo = mid else hi = mid - 1
    }

    def walkFrom(r: SsReader): Long =
      try {
        var pos = r.currentOffset
        var res = -1L
        while (res < 0) r.next() match {
          case Some(rec) =>
            val m = rec.message
            val hit =
              minTsExclusiveMs.forall(t => m.timestamp.getTime > t) &&
                minSeqInclusive.forall(s => m.sequence >= s)
            if (hit) res = rec.startOffset else pos = rec.endOffset
          case None => res = pos
        }
        res
      } finally r.close()

    if (lo >= 1) {
      val r = SsReader.openAt(path, lo, verifyChecksum = false, skim = true)
      // a truncated splice (writer died mid-frame) leaves no decodable frame
      // boundary at this beacon — fall back to the exact walk from the front
      if (!r.isTruncated) return walkFrom(r)
      r.close()
    }
    walkFrom(SsReader.open(path, verifyChecksum = false, skim = true))
  }
}
