package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession

import graft.core.{StreamUrl, SeaStreamErr}
import graft.facade.SeaStreamer
import graft.facade.SeaStreamer.{AutoStreamReset, ConsumerMode, ConsumerOptions}

/** The reference's `relay` demo program (sea-streamer-socket/src/bin/
  * relay.rs; README "The `relay` program redirect messages from `input`
  * to `output`"): redirect messages between ANY two backends selected at
  * runtime by StreamUrl —
  *
  * {{{
  * runMain graft.Relay --input stdio:///clock --output redis://localhost:6379/clock
  * runMain graft.Relay --input redis://localhost:6379/clock --output kafka://localhost:9092/clock
  * runMain graft.Relay --input kafka://localhost:9092/clock --output stdio:///clock --offset start
  * }}}
  *
  * Semantics mirror relay.rs: `--offset start|end` maps to the consumer's
  * earliest/latest reset, the input may subscribe several stream keys
  * while the output anchors exactly one, and `input == output` is refused
  * unless the protocol is stdio (relay.rs:58-60). `stdio:///` as input
  * means THIS process's stdin (the reference's dedicated stdin thread),
  * bridged through a spool file for the `stdio-lines` source;
  * `stdio://<path>` reads that line file directly. Output `stdio` prints
  * producer-format lines on the driver's stdout — so `clock | relay`
  * composes exactly like the reference README's pipeline.
  *
  * `--once` is the bounded form (drain the input's current contents,
  * send, exit) — the Replay-mode twin of the reference's endless loop,
  * and what makes the program drainable in shell pipelines and tests.
  * This is an at-least-once demo pipe like the reference's; the
  * exactly-once engines live behind `SeaStreamer.relayExactlyOnce`.
  */
object Relay {

  /** Live-mode stdin-spool size cap. The spool is a bridge, not a store:
    * once the streaming query has shipped a prefix, those bytes are dead
    * weight, and an uncapped spool makes a long-lived `clock | relay`
    * leak disk without bound. When the spool exceeds the cap AND the
    * query has committed progress, the consumed prefix is dropped by
    * rotation (see [[StdinSpool.rotate]]).
    */
  val DefaultSpoolCapBytes: Long = 256L << 20

  def main(args: Array[String]): Unit = {
    var input: Option[String] = None
    var output: Option[String] = None
    var offsetStart: Option[Boolean] = None
    var once = false
    var spoolCap = DefaultSpoolCapBytes
    var i = 0
    def usage(): Nothing = {
      System.err.println("usage: relay --input <url> --output <url> " +
        "[--offset start|end] [--once] [--spool-cap-mb N]")
      sys.exit(2)
    }
    while (i < args.length) {
      args(i) match {
        case "--input" if i + 1 < args.length =>
          input = Some(args(i + 1)); i += 2
        case "--output" if i + 1 < args.length =>
          output = Some(args(i + 1)); i += 2
        case "--offset" if i + 1 < args.length =>
          args(i + 1) match {
            case "start" => offsetStart = Some(true)
            case "end" => offsetStart = Some(false)
            case other =>
              System.err.println(s"unknown Offset: $other"); sys.exit(2)
          }
          i += 2
        case "--once" => once = true; i += 1
        case "--spool-cap-mb" if i + 1 < args.length =>
          spoolCap =
            try {
              val mb = args(i + 1).toLong
              if (mb <= 0) throw new NumberFormatException(args(i + 1))
              mb << 20
            } catch { case _: NumberFormatException =>
              System.err.println(
                s"--spool-cap-mb must be a positive number: ${args(i + 1)}")
              usage()
            }
          i += 2
        case _ => usage()
      }
    }
    if (input.isEmpty || output.isEmpty) usage()
    val spark = GraftSession.get()
    try {
      val n = run(spark, input.get, output.get, offsetStart, once,
        spoolCapBytes = spoolCap)
      if (once) System.err.println(s"[relay] relayed $n messages")
    } finally spark.stop()
  }

  /** Best-effort recursive delete (spool + checkpoint cleanup). */
  private def deleteTree(root: java.nio.file.Path): Unit =
    if (Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(root)
      try walk.iterator().asScala.toSeq.reverseIterator
        .foreach(p => try Files.deleteIfExists(p)
          catch { case _: java.io.IOException => () })
      finally walk.close()
    }

  /** ONE shutdown hook for every spool dir this JVM ever creates — a
    * hook per StdinSpool instance would accumulate one never-removed
    * hook thread per live relay run in a long-lived embedding JVM (the
    * same never-dropped-entry shape as the per-rotation deleteOnExit
    * this registry replaced).
    */
  private val spoolDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()
  private val spoolHookArmed =
    new java.util.concurrent.atomic.AtomicBoolean(false)
  private def registerSpoolDir(d: java.nio.file.Path): Unit = {
    if (spoolHookArmed.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        spoolDirs.forEach(p => deleteTree(p)), "relay-spool-cleanup"))
    spoolDirs.add(d)
    ()
  }

  /** The live relay's bounded stdin bridge: one appender thread spools
    * stdin lines into the current file; [[rotate]] drops a consumed
    * prefix by copying the unconsumed tail into a FRESH file and
    * switching the appender — readers holding the old file see a
    * consistent snapshot (posix unlink semantics), new micro-batches
    * read the new path from byte 0 with their line ordinals re-anchored
    * via the stdio source's `lineBase` option.
    *
    * All spool files live in `dir`, cleaned by ONE shutdown hook — a
    * per-file `deleteOnExit` would pin one DeleteOnExitHook entry per
    * rotation for the relay's possibly-weeks-long life (each rotation
    * makes a fresh file, and those hook entries are never dropped even
    * after `rotate()` deletes the file itself).
    */
  private[graft] final class StdinSpool(stdin: java.io.InputStream,
      val dir: java.nio.file.Path) {
    registerSpoolDir(dir)
    private def fresh(): java.nio.file.Path =
      Files.createTempFile(dir, "relay-stdin", ".log")
    private val lock = new Object
    private var cur: java.nio.file.Path = fresh()
    private var w = appender(cur)
    private var eof = false // stdin closed: never reopen an appender fd
    // buffered so each line is ONE write syscall (the flush drains the
    // buffer); a bare Files.newOutputStream pays two writes per line
    private def appender(p: java.nio.file.Path) =
      new java.io.BufferedOutputStream(
        Files.newOutputStream(p, StandardOpenOption.APPEND), 1 << 16)
    def path: java.nio.file.Path = lock.synchronized(cur)
    def size: Long = lock.synchronized(
      if (Files.exists(cur)) Files.size(cur) else 0L)
    private def append(line: String): Unit = lock.synchronized {
      w.write(line.getBytes("UTF-8")); w.write('\n'); w.flush()
    }
    /** Drop the consumed `[0, pos)` prefix; returns the new spool path.
      * Runs under the appender lock, so no line lands mid-copy.
      */
    def rotate(pos: Long): java.nio.file.Path = lock.synchronized {
      val next = fresh()
      val out = Files.newOutputStream(next, StandardOpenOption.APPEND)
      val in = Files.newInputStream(cur)
      try { in.skipNBytes(pos); in.transferTo(out) }
      finally { in.close(); out.close() }
      if (w != null) w.close()
      Files.deleteIfExists(cur)
      cur = next
      w = if (eof) null else appender(next)
      next
    }
    /** Daemon thread: stdin → current spool, line-at-a-time, flushed per
      * line (one appender held open — a Files.write(APPEND) per line
      * would pay an open/close pair per message on the ingest hot path).
      */
    def start(): Unit = {
      val t = new Thread(() => {
        val rdr = new java.io.BufferedReader(
          new java.io.InputStreamReader(stdin, "UTF-8"))
        try {
          var line = rdr.readLine()
          while (line != null) {
            append(line)
            line = rdr.readLine()
          }
        } finally lock.synchronized {
          // stdin EOF: no appender fd left open (nor reopened by later
          // rotations) for the relay's possibly-weeks-long life
          if (w != null) w.close()
          w = null
          eof = true
        }
      }, "relay-stdin-spool")
      t.setDaemon(true)
      t.start()
    }
  }

  /** Core, testable seam. Returns rows relayed in `--once` mode; a live
    * relay blocks until the query terminates and returns -1.
    *
    * `offsetStart`: None = the mode's natural default — live follows the
    * reference's `end` (relay.rs default), bounded `--once` drains from
    * the start (Replay semantics). `--once --offset end` is REFUSED: the
    * bounded readers have no "from the tip" form, and silently draining
    * the whole stream under an explicit `end` would re-ship everything
    * on every invocation.
    */
  def run(spark: SparkSession, input: String, output: String,
      offsetStart: Option[Boolean], once: Boolean,
      stdin: java.io.InputStream = System.in,
      spoolCapBytes: Long = DefaultSpoolCapBytes,
      /** Where live-mode stdin spools (and their per-generation streaming
        * checkpoints) live; None = a fresh temp directory. Tests pass
        * their own so concurrent JVMs' spools can't cross-contaminate a
        * tmpdir scan.
        */
      spoolDir: Option[java.nio.file.Path] = None,
      /** Per-message transform applied between consume and produce —
        * identity for the plain relay; [[graft.examples.Processor]] maps
        * the payload through its `process` step here (the reference's
        * processor IS a relay with this one hook, processor.rs:43-53).
        * Must be a column-level envelope→envelope map so it runs inside
        * the stream (never on the driver).
        */
      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        identity): Long = {
    if (once && offsetStart.contains(false))
      throw SeaStreamErr.Unsupported(
        "--once is a bounded start-to-tip drain; --offset end would " +
          "silently re-ship the whole stream (use a live relay for " +
          "latest-only)")
    val in = StreamUrl.parse(input)
    val out = StreamUrl.parse(output)
    val inProto = in.streamer.protocol.getOrElse(
      throw SeaStreamErr.Connect(s"no protocol in '$input'"))
    // relay.rs:58-60 — a self-relay would loop; stdio is exempt because
    // its input (stdin) and output (stdout) are distinct pipes
    if (input == output && inProto != "stdio")
      throw SeaStreamErr.Unsupported("input == output !!!")

    out.streamer.protocol.getOrElse(
      throw SeaStreamErr.Connect(s"no protocol in '$output'"))

    def connStr(u: StreamUrl): String = SeaStreamer.connString(u)

    // stdio:///key = THIS process's stdin: spool it to a line file the
    // stdio-lines source can read (bounded mode drains stdin to EOF
    // first; live mode tails the spool as it grows, ROTATING the
    // consumed prefix away so the spool stays under spoolCapBytes)
    val ownStdin = inProto == "stdio" && connStr(in) == "stdio://."
    val liveSpool: Option[StdinSpool] =
      if (ownStdin && !once) {
        val sp = new StdinSpool(stdin, spoolDir.getOrElse(
          Files.createTempDirectory("relay-spool")))
        sp.start()
        Some(sp)
      } else None
    val inUri =
      if (ownStdin && once) {
        val spool = Files.createTempFile("relay-stdin", ".log")
        spool.toFile.deleteOnExit()
        Files.copy(stdin, spool,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        s"stdio://$spool"
      } else liveSpool.map(sp => s"stdio://${sp.path}")
        .getOrElse(connStr(in))

    val sink = SeaStreamer.connect(connStr(out), spark)
    // a LIVE relay's rotation/restart loop re-ships any batch its stop
    // interrupted; with redis ts-packed ids those re-sends can sit at or
    // below the destination tip, so the producer floors them there
    // (duplicates, never a crash-looping "equal or smaller" refusal).
    // --once keeps the refusal loud: its only re-send source is the USER
    // re-running the drain, and silently duplicating a whole stream is
    // exactly what its --offset guard refuses to do quietly.
    val producer = sink.createProducer(out.streamKey,
      redisClampToTip = !once)
    def consume(uri: String, reset: AutoStreamReset, lineBase: Long) =
      transform(SeaStreamer.connect(uri, spark).createConsumer(in.streamKeys,
        ConsumerOptions(
          mode = ConsumerMode.RealTime,
          live = !once,
          autoStreamReset = reset,
          stdioLineBase = lineBase)))
    val reset0 =
      if (offsetStart.getOrElse(once)) AutoStreamReset.Earliest
      else AutoStreamReset.Latest
    if (once) {
      // bounded drain: pin the rows so count and send read one snapshot
      val batch = consume(inUri, reset0, 0L).localCheckpoint(true)
      val n = batch.count()
      producer.send(batch)
      n
    } else {
      def ship(consumer: org.apache.spark.sql.DataFrame,
          checkpoint: Option[java.nio.file.Path] = None) = {
        val w = consumer.writeStream
          .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) =>
            producer.send(df))
        checkpoint.foreach(p => w.option("checkpointLocation", p.toString))
        w.start()
      }
      liveSpool match {
        case None =>
          // the input is the user's own file/broker — not ours to rotate
          val q = ship(consume(inUri, reset0, 0L))
          q.awaitTermination()
          -1L
        case Some(sp) =>
          // our stdin spool: restart-on-rotation loop. Each query tails
          // the current spool file; when the file outgrows the cap and
          // the query has committed progress, stop it, drop the consumed
          // prefix into a fresh file, and restart there with the line
          // ordinals re-anchored (lineBase) so default sequences keep
          // counting — an at-least-once cut exactly like a process
          // restart (a batch in flight at the stop re-ships; committed
          // prefixes never do).
          def committedPos(q: org.apache.spark.sql.streaming.StreamingQuery) =
            Option(q.lastProgress)
              .flatMap(p => p.sources.headOption)
              .flatMap(s => Option(s.endOffset))
              .map(j => graft.stdio.spark.StdioOffset.fromJson(j))
          var lineBase = 0L
          var uri = inUri
          var reset = reset0
          var stoppedExternally = false
          while (!stoppedExternally) {
            // explicit per-generation checkpoint, deleted once this
            // generation's query has fully terminated: a rotation stop can
            // surface as query FAILURE (see below), and Spark retains an
            // implicit temp checkpoint on failed termination — one leaked
            // directory per forced cut, unbounded over the relay's life.
            // The restart never resumes a checkpoint (the rotated file is
            // a NEW source path; the cut position rides lineBase), so the
            // delete loses nothing.
            val ckpt = Files.createTempDirectory(sp.dir, "ckpt")
            var rotated = false
            try {
            val q = ship(consume(uri, reset, lineBase), Some(ckpt))
            while (q.isActive && !rotated) {
              q.awaitTermination(250)
              // only a query with COMMITTED progress is worth stopping:
              // a zero-progress cut would drop nothing yet still flip a
              // `latest` anchor to `earliest` on restart. And prefer a
              // QUIESCENT stop (no batch in flight) — stopping mid-send
              // makes the in-flight batch re-ship after restart
              // (at-least-once). The status snapshot races the stop (a
              // batch may start in between), so quiescence is best-effort
              // duplicate avoidance, not a guarantee; the cut POSITION is
              // still exact because it is re-read after termination. A
              // firehose that never goes idle forces the cut anyway at 4x
              // the cap: bounded disk wins over the duplicate-free cut
              // there, same trade a crash makes. (Duplicates are safe on
              // the wire: the redis producer's ms-* ids accept an equal-ms
              // re-send as a new entry.)
              val st = q.status
              val quiescent = !st.isTriggerActive && !st.isDataAvailable
              val size = sp.size
              if (q.isActive &&
                  (size > spoolCapBytes && quiescent ||
                    size > 4L * spoolCapBytes) &&
                  committedPos(q).exists(_.pos > 0)) {
                q.stop()
                // drain to full termination; if our stop interrupted a
                // batch mid-send the executor's exception may surface as a
                // query FAILURE (not every wrapped interrupt is recognized
                // by Spark) — that is still a terminated query, and the
                // restart from the committed position covers it, so don't
                // let the rethrow kill the long-lived relay
                while (q.isActive)
                  try q.awaitTermination(100)
                  catch {
                    case e: org.apache.spark.sql.streaming.StreamingQueryException =>
                      System.err.println(
                        s"[relay] query terminated by rotation stop: ${e.getMessage}")
                  }
                // the final completed batch's end offset = the committed
                // (shipped) prefix; re-read AFTER termination so no batch
                // lands behind our back
                val cut = committedPos(q).get
                val next = sp.rotate(cut.pos)
                System.err.println(
                  s"[relay] spool over cap: rotated ${cut.pos} consumed " +
                    s"bytes away, resuming at line ${cut.line} in $next")
                lineBase = cut.line
                uri = s"stdio://$next"
                // everything left in the fresh file is unconsumed
                reset = AutoStreamReset.Earliest
                rotated = true
              }
            }
            // in a finally: a generation that dies for a REAL reason (the
            // broker went away — awaitTermination rethrows the query
            // failure) must not leak its checkpoint either
            } finally deleteTree(ckpt)
            if (!rotated) stoppedExternally = true
          }
          -1L
      }
    }
  }
}
