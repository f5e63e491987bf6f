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

  /** Max timestamp across a part file — prefix-max from the LAST beacon that
    * covers all streams, then a bounded tail walk (never a full scan).
    */
  private def fileMaxTs(f: File): Option[Long] = {
    val header = SsReader.readHeader(f.getPath)
    val interval = header.beaconInterval.toLong
    val lastBeacon = (f.length() - 1) / interval
    val r = if (lastBeacon >= 1) SsReader.openAt(f.getPath, lastBeacon)
    else SsReader.open(f.getPath)
    try {
      val beaconMax = r.lastBeacon
        .filter(_.items.length < SsFormat.numMarkers(interval.toInt))
        .map(_.items.map(_.maxTimestampMillis).max)
      var tail = Long.MinValue
      var done = false
      while (!done) r.next() match {
        case Some(rec) => tail = math.max(tail, rec.message.timestamp.getTime)
        case None => done = true
      }
      (beaconMax.toSeq ++ (if (tail != Long.MinValue) Seq(tail) else Nil))
        .maxOption
    } finally r.close()
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
        val r = SsReader.open(f.getPath, verifyChecksum = false)
        try kept += r.iterator.size finally r.close()
      }
    }
    deleted.result()
  }
}
