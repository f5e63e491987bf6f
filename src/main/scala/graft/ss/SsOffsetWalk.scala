package graft.ss

/** Frame-exact end-offset discovery for the streaming source, with driver
  * work BOUNDED per trigger regardless of how many bytes were appended.
  *
  * The old walk skimmed every newly appended frame header driver-side —
  * O(new bytes) per trigger, the admission bottleneck at 100 TB/day ingest.
  * This walk exploits the format's two invariants instead:
  *
  *   1. single sequential appender ⇒ the file is a PREFIX of the logical
  *      stream: every frame that lies entirely below `file.length()` is
  *      complete — only a frame straddling EOF can be incomplete;
  *   2. a beacon sits at every `beaconInterval` boundary and records the
  *      spliced frame's remaining bytes (format.rs:29-56), so
  *      [[SsReader.openAt]] can enter the stream at any boundary and land
  *      on the next frame start.
  *
  * So the last complete frame end is found by entering at the highest
  * enterable beacon boundary at/below the target and walking only the tail
  * interval: O(#beacon-probes + beaconInterval) driver work per (file,
  * trigger), metadata (`File.length`) otherwise. A probe fails (truncated)
  * only when the spliced frame under that boundary itself crosses EOF — the
  * walk then steps one boundary down, converging on the incomplete frame's
  * start.
  */
object SsOffsetWalk {

  /** @param offset      frame-exact safe end (a frame start/end boundary —
    *                     every frame below it is complete)
    * @param walkedBytes bytes traversed by the frame walk (observability:
    *                     the boundedness law asserted by SsOffsetWalkSpec)
    * @param probes      beacon entry probes attempted
    */
  final case class End(offset: Long, walkedBytes: Long, probes: Int)

  /** Largest safe end E in `(from, min(fileEnd, from+budget)+one frame]`:
    * the first frame end at/after the target, or the last complete frame
    * end (equivalently the EOF-straddling frame's start) when the file ends
    * first. Returns `from` when nothing new is readable.
    *
    * `from` must be a frame boundary or `<= HeaderSize` (the offsets this
    * function itself produced, or the surveyor's seek offsets).
    */
  def safeEnd(path: String, from: Long, budget: Long = Long.MaxValue): End = {
    val size = new java.io.File(path).length()
    if (size <= SsFormat.HeaderSize) return End(from, 0L, 0)
    val start = math.max(from, SsFormat.HeaderSize.toLong)
    if (start >= size) return End(from, 0L, 0)
    val target = if (budget >= size - start) size else start + budget

    val interval = SsReader.readHeader(path).beaconInterval.toLong
    // entry: highest beacon boundary in (start, target] whose spliced
    // remainder is intact; everything below a valid entry is complete
    var probes = 0
    var k = target / interval
    var entry: Option[SsReader] = None
    while (entry.isEmpty && k >= 1 && k * interval > start) {
      probes += 1
      val r = SsReader.openAt(path, k, verifyChecksum = false, skim = true)
      if (r.isTruncated) { r.close(); k -= 1 } else entry = Some(r)
    }
    val reader = entry.getOrElse(
      SsReader.openAtOffset(path, start, verifyChecksum = false, skim = true))
    try {
      val walkFrom = reader.currentOffset
      var end = walkFrom
      var done = false
      while (!done) reader.next() match {
        case Some(rec) =>
          end = rec.endOffset
          if (end >= target) done = true
        case None => done = true
      }
      if (end <= start) End(from, 0L, probes)
      else End(end, end - walkFrom, probes)
    } finally reader.close()
  }

  /** Row-capped safe end: the end offset of the `maxRows`-th complete
    * frame at/after `from` (or of the last complete frame when the file
    * holds fewer). Returns the end plus the number of frames admitted, so
    * a shared budget drains across files like [[safeEnd]]'s byte budget.
    *
    * Unlike the byte budget — O(#beacon-probes + beaconInterval) driver
    * work — a row cap must COUNT frames, so this walk skims exactly the
    * admitted frames' headers: O(cap) header seeks per (file, trigger),
    * Kafka's `maxOffsetsPerTrigger` planning class paid in seeks because
    * ss offsets are bytes, not row numbers. At ingest scale prefer
    * `maxBytesPerTrigger`; the row cap exists for semantic parity
    * (deterministic row-counted micro-batches).
    */
  def safeEndRows(path: String, from: Long, maxRows: Long): (End, Long) = {
    val size = new java.io.File(path).length()
    if (size <= SsFormat.HeaderSize || maxRows <= 0L) return (End(from, 0L, 0), 0L)
    val start = math.max(from, SsFormat.HeaderSize.toLong)
    if (start >= size) return (End(from, 0L, 0), 0L)
    val reader =
      SsReader.openAtOffset(path, start, verifyChecksum = false, skim = true)
    try {
      val walkFrom = reader.currentOffset
      var end = walkFrom
      var rows = 0L
      var done = false
      while (!done && rows < maxRows) reader.next() match {
        case Some(rec) => end = rec.endOffset; rows += 1
        case None => done = true
      }
      if (end <= start) (End(from, 0L, 0), 0L)
      else ((End(end, end - walkFrom, 0)), rows)
    } finally reader.close()
  }
}
