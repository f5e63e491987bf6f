package graft.ss

import java.io.{BufferedOutputStream, File, FileOutputStream}

/** Admin/trim operations on a `.ss` store (directory of part files) — the
  * `XTRIM MAXLEN ~` / `MINID ~` parity surface
  * (sea-streamer-redis/src/producer.rs:168-218,520-560). Like Redis's `~`
  * forms these are APPROXIMATE: whole part files are dropped when their
  * entire content is below the cutoff — no rewriting, O(#files) metadata
  * work, which is the only shape that scales on an object store.
  */
object SsAdmin {

  private def parts(dir: String): Seq[File] =
    graft.ss.spark.SsDataSource.listFiles(dir)

  /** Max timestamp across a part file. Fast path: prefix-max from the LAST
    * beacon when its marker set covers every stream (items < budget), plus a
    * bounded tail walk. When the beacon can't vouch for all streams the whole
    * file is walked (skim mode — frame headers only) so the answer is always
    * sound: trimming must never act on a stale max.
    */
  private def fileMaxTs(f: File): Option[Long] = {
    val header = SsReader.readHeader(f.getPath)
    val interval = header.beaconInterval.toLong
    val lastBeacon = (f.length() - 1) / interval

    def walkMax(r: SsReader): Option[Long] =
      try {
        var tail = Long.MinValue
        var done = false
        while (!done) r.next() match {
          case Some(rec) => tail = math.max(tail, rec.message.timestamp.getTime)
          case None => done = true
        }
        if (tail != Long.MinValue) Some(tail) else None
      } finally r.close()

    if (lastBeacon >= 1) {
      val r = SsReader.openAt(f.getPath, lastBeacon,
        verifyChecksum = false, skim = true)
      val fullCoverage = !r.isTruncated && r.lastBeacon.exists { b =>
        b.items.nonEmpty && b.items.length < SsFormat.numMarkers(interval.toInt)
      }
      if (fullCoverage) {
        val beaconMax = r.lastBeacon.get.items.map(_.maxTimestampMillis).max
        return Some((beaconMax +: walkMax(r).toSeq).max)
      }
      r.close()
    }
    walkMax(SsReader.open(f.getPath, verifyChecksum = false, skim = true))
  }

  /** Drop whole part files whose newest message is older than `minTsMillis`
    * (MINID ~ analogue). Returns the deleted paths.
    */
  def trimMinTimestamp(dir: String, minTsMillis: Long): Seq[String] =
    parts(dir).filter { f =>
      fileMaxTs(f).exists(_ < minTsMillis)
    }.map { f => f.delete(); f.getPath }

  /** Keep roughly the newest `maxMessages` (MAXLEN ~ analogue): drop oldest
    * part files (by max-ts) while the remainder still holds enough messages.
    * Message counts come from a bounded frame walk per candidate file only.
    */
  def trimMaxLen(dir: String, maxMessages: Long): Seq[String] = {
    val withTs = parts(dir).map(f => (f, fileMaxTs(f).getOrElse(Long.MaxValue)))
      .sortBy(-_._2) // newest first
    var kept = 0L
    val deleted = Seq.newBuilder[String]
    withTs.foreach { case (f, _) =>
      if (kept >= maxMessages) { f.delete(); deleted += f.getPath }
      else {
        val r = SsReader.open(f.getPath, verifyChecksum = false, skim = true)
        try kept += r.iterator.size finally r.close()
      }
    }
    deleted.result()
  }
}
