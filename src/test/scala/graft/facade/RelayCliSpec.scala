package graft.facade

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.{Clock, Relay, TestSession}
import graft.core.SeaStreamErr
import graft.ops.StdioParser
import graft.redis.{EmbeddedRedis, RedisStreams}

/** Laws of the reference's demo CLI pair re-expressed here — `clock`
  * (sea-streamer-stdio/src/bin/clock.rs) and `relay`
  * (sea-streamer-socket/src/bin/relay.rs) — including the README's
  * `clock | relay` composition into a real broker.
  */
class RelayCliSpec extends AnyFunSuite {

  private lazy val spark = TestSession.spark
  import spark.implicits._

  private def captureOut(f: => Unit): Seq[String] = {
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf, true, "UTF-8"))(f)
    buf.toString("UTF-8").split('\n').toSeq.filter(_.nonEmpty)
  }

  test("clock emits producer-format lines with the reference's exact " +
      "payload shape, seq = tick ordinal, bounded by --ticks") {
    val lines = captureOut(Clock.main(Array(
      "--stream", "clock", "--interval", "1ms", "--ticks", "5")))
    assert(lines.length == 5)
    lines.zipWithIndex.foreach { case (l, i) =>
      assert(l.endsWith(s"""| clock | $i] { "tick": $i }"""), l)
    }
    // every line re-parses through the stdio consumer grammar
    val parsed = StdioParser.toEnvelope(spark.createDataset(lines).toDF("value"))
    assert(parsed.select("sequence").as[Long].collect().sorted.toSeq ==
      (0L until 5L))
  }

  test("clock duration grammar matches the reference (ns/us/ms/s/m)") {
    assert(Clock.parseDuration("100ms") == 100L)
    assert(Clock.parseDuration("1s") == 1000L)
    assert(Clock.parseDuration("2m") == 120000L)
    assert(Clock.parseDuration("1500us") == 1L)
    assert(Clock.parseDuration("1ns") == 1L) // sub-ms floors to 1ms
    intercept[IllegalArgumentException](Clock.parseDuration("1h"))
    // the reference parses the count as u64, whose FromStr takes one
    // optional leading '+' but no '-': `+1s` is legal there, `-1s` is a
    // PARSE error — not a raw IllegalArgumentException escaping from
    // Thread.sleep(-1000)
    assert(Clock.parseDuration("+1s") == 1000L)
    intercept[IllegalArgumentException](Clock.parseDuration("++1s"))
    intercept[IllegalArgumentException](Clock.parseDuration("-1s"))
    intercept[IllegalArgumentException](Clock.parseDuration("+s"))
    intercept[IllegalArgumentException](Clock.parseDuration("s"))
  }

  test("relay --once: stdio line file -> redis, then redis -> stdio; " +
      "the README's pipeline shape end-to-end against a broker") {
    val srv = new EmbeddedRedis
    try {
      // stage the `clock` output as the stdio input file
      val clockLines = captureOut(Clock.main(Array(
        "--stream", "clock", "--interval", "1ms", "--ticks", "4")))
      val f = Files.createTempFile("relaycli", ".log")
      Files.write(f, clockLines.mkString("", "\n", "\n").getBytes("UTF-8"))

      val n = Relay.run(spark, s"stdio://$f/clock",
        s"redis://${srv.host}:${srv.port}/clock",
        offsetStart = Some(true), once = true)
      assert(n == 4L)
      val vals = srv.entries("clock")
        .map(e => new String(e._2.head._2, "UTF-8"))
      assert(vals.toSet == (0 until 4).map(i => s"""{ "tick": $i }""").toSet)

      // and back out: redis -> stdio prints producer-format lines
      val out = captureOut {
        val m = Relay.run(spark, s"redis://${srv.host}:${srv.port}/clock",
          "stdio:///clock", offsetStart = Some(true), once = true)
        assert(m == 4L)
      }
      assert(out.length == 4)
      assert(out.forall(_.contains("| clock |")), out.mkString("\n"))
      assert(out.count(_.endsWith("""{ "tick": 2 }""")) == 1)
    } finally srv.close()
  }

  test("relay stdio:///key input reads THIS process's stdin (spooled), " +
      "exactly the reference's `clock | relay` composition") {
    val srv = new EmbeddedRedis
    try {
      val clockLines = captureOut(Clock.main(Array(
        "--stream", "piped", "--interval", "1ms", "--ticks", "3")))
      val stdin = new java.io.ByteArrayInputStream(
        clockLines.mkString("", "\n", "\n").getBytes("UTF-8"))
      val n = Relay.run(spark, "stdio:///piped",
        s"redis://${srv.host}:${srv.port}/piped",
        offsetStart = Some(true), once = true, stdin = stdin)
      assert(n == 3L)
      assert(srv.entries("piped").size == 3)
    } finally srv.close()
  }

  test("relay refuses input == output unless the protocol is stdio " +
      "(relay.rs:58-60)") {
    val e = intercept[SeaStreamErr.Unsupported](Relay.run(spark,
      "redis://localhost:6379/clock", "redis://localhost:6379/clock",
      offsetStart = Some(true), once = true))
    assert(e.getMessage.contains("input == output"))
    // stdio self-relay is legal: stdin and stdout are distinct pipes
    val out = captureOut {
      assert(Relay.run(spark, "stdio:///loop", "stdio:///loop",
        offsetStart = Some(true), once = true,
        stdin = new java.io.ByteArrayInputStream(Array.emptyByteArray)) == 0L)
    }
    assert(out.isEmpty)
  }

  test("relay subscribes several input keys while anchoring ONE output " +
      "key (StreamUrl grammar, streamer.rs:173-252)") {
    val srv = new EmbeddedRedis
    try {
      val lines = Seq(
        StdioParser.formatLine(new java.sql.Timestamp(1000L), "a", 0L, "pa"),
        StdioParser.formatLine(new java.sql.Timestamp(1001L), "b", 0L, "pb"),
        StdioParser.formatLine(new java.sql.Timestamp(1002L), "c", 0L, "pc"))
      val f = Files.createTempFile("relaycli2", ".log")
      Files.write(f, lines.mkString("", "\n", "\n").getBytes("UTF-8"))
      val n = Relay.run(spark, s"stdio://$f/a,b",
        s"redis://${srv.host}:${srv.port}/merged",
        offsetStart = Some(true), once = true)
      assert(n == 2L, "only the subscribed keys relay")
      val vals = srv.entries("merged")
        .map(e => new String(e._2.head._2, "UTF-8")).toSet
      assert(vals == Set("pa", "pb"))
      // an output url with zero or several keys is a typed error
      intercept[Exception](Relay.run(spark, s"stdio://$f/a",
        s"redis://${srv.host}:${srv.port}/x,y",
        offsetStart = Some(true), once = true))
    } finally srv.close()
  }

  test("relay live mode tails the input and ships every micro-batch " +
      "until stopped (the reference's endless loop, relay.rs:68-79)") {
    val srv = new EmbeddedRedis
    val before = spark.streams.active.map(_.id).toSet
    try {
      val f = Files.createTempFile("relaylive", ".log")
      Files.write(f, (0 until 2).map(i => StdioParser.formatLine(
        new java.sql.Timestamp(1000L + i), "live", i.toLong, s"l$i"))
        .mkString("", "\n", "\n").getBytes("UTF-8"))
      @volatile var result = 0L
      val t = new Thread(() => {
        result = Relay.run(spark, s"stdio://$f/live",
          s"redis://${srv.host}:${srv.port}/live",
          offsetStart = Some(true), once = false)
      }, "relay-live-test")
      t.start()
      def entries() = srv.entries("live").size
      val deadline = System.currentTimeMillis() + 60000
      while (entries() < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(entries() == 2, "initial lines must ship (earliest reset)")
      // append while live: the spool-file tail picks up the new line
      Files.write(f, (StdioParser.formatLine(
        new java.sql.Timestamp(1002L), "live", 2L, "l2") + "\n")
        .getBytes("UTF-8"), java.nio.file.StandardOpenOption.APPEND)
      while (entries() < 3 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(entries() == 3, "appended line must relay")
      // stop exactly the query this test started
      spark.streams.active.filterNot(q => before(q.id)).foreach(_.stop())
      t.join(30000)
      assert(!t.isAlive && result == -1L,
        "a stopped live relay returns -1 and unblocks")
      val vals = srv.entries("live")
        .map(e => new String(e._2.head._2, "UTF-8"))
      assert(vals == Seq("l0", "l1", "l2"), s"order violated: $vals")
    } finally srv.close()
  }

  test("relay live stdin spool stays under the cap: consumed prefixes " +
      "rotate away, nothing is lost or reordered across rotations") {
    val srv = new EmbeddedRedis
    val before = spark.streams.active.map(_.id).toSet
    // per-test spool dir: a concurrent JVM's relay spools land in ITS
    // own dir, never this scan (the old global-tmpdir enumeration could
    // see a parallel fork's files)
    val tmp = Files.createTempDirectory("relaycap-spool")
    def spools(): Set[java.nio.file.Path] = {
      val s = Files.list(tmp)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(_.getFileName.toString.startsWith("relay-stdin")).toSet
      } finally s.close()
    }
    val preexisting = spools()
    try {
      val n = 400
      val capBytes = 2048L
      val pipeIn = new java.io.PipedInputStream(1 << 20)
      val pipeOut = new java.io.PipedOutputStream(pipeIn)
      @volatile var result = 0L
      val t = new Thread(() => {
        result = Relay.run(spark, "stdio:///cap",
          s"redis://${srv.host}:${srv.port}/cap",
          offsetStart = Some(true), once = false, stdin = pipeIn,
          spoolCapBytes = capBytes, spoolDir = Some(tmp))
      }, "relay-cap-test")
      t.start()
      // ~40 bytes/line x 400 >> the 2 KiB cap; unique increasing ms per
      // entry (the redis producer packs ids from ts). Fed in WAVES, each
      // drained before the next, then a WRITE-FREE window two monitor
      // periods long: the status-vs-stop race needs a line to land in the
      // instant between the relay's quiescence snapshot and its stop, and
      // a quiet window guarantees any over-cap rotation runs with nothing
      // to race — so the exactly-once assert below is the code's
      // happy-path guarantee, not luck. (One wave is ~4 KB, under the 4x
      // force-cut bar, so no mid-wave cut either.)
      val lines = (0 until n).map(i => StdioParser.formatLine(
        new java.sql.Timestamp(100000L + i), "cap", i.toLong, s"m$i"))
      val observed = scala.collection.mutable.Set.empty[java.nio.file.Path]
      val deadline = System.currentTimeMillis() + 120000
      // DISTINCT count, not raw: if the best-effort sliver ever
      // duplicates a wave, raw counts would lead the true position and
      // desynchronize every later quiet window (quiet while still
      // shipping → more mid-flight cuts → compounding duplicates)
      def shipped() = srv.entries("cap")
        .map(e => new String(e._2.head._2, "UTF-8")).distinct.size
      lines.grouped(100).zipWithIndex.foreach { case (wave, w) =>
        wave.foreach { l =>
          pipeOut.write((l + "\n").getBytes("UTF-8"))
          pipeOut.flush()
        }
        val waveEnd = math.min((w + 1) * 100, n)
        while (shipped() < waveEnd &&
            System.currentTimeMillis() < deadline) {
          observed ++= (spools() -- preexisting)
          Thread.sleep(50)
        }
        Thread.sleep(600) // two 250 ms monitor periods, write-free
        observed ++= (spools() -- preexisting)
      }
      assert(shipped() >= n, s"only ${shipped()} of $n shipped")
      // all consumed: the next monitor tick must rotate the oversized
      // spool down to (at most) the cap
      def liveSize() = (spools() -- preexisting)
        .map(p => if (Files.exists(p)) Files.size(p) else 0L)
        .maxOption.getOrElse(0L)
      while (liveSize() > capBytes &&
          System.currentTimeMillis() < deadline) {
        observed ++= (spools() -- preexisting)
        Thread.sleep(50)
      }
      observed ++= (spools() -- preexisting)
      assert(liveSize() <= capBytes,
        s"spool still over cap after full consumption: ${liveSize()}")
      assert(observed.size >= 2,
        s"rotation never produced a fresh spool file: $observed")
      // values intact and IN ORDER across every rotation cut. The
      // write-free windows make a mid-flight cut overwhelmingly unlikely,
      // but quiescence is a best-effort SNAPSHOT (a line landing in the
      // instant between the status read and the stop can still start a
      // batch), so the law pinned here is the semantic one: no loss, no
      // reorder, and duplicates — if that sliver ever fires — bounded by
      // the one interrupted wave, not silently accepted wholesale.
      val vals = srv.entries("cap")
        .map(e => new String(e._2.head._2, "UTF-8"))
      assert(vals.distinct == (0 until n).map(i => s"m$i"),
        s"loss/reorder across rotations (got ${vals.size} values)")
      assert(vals.size - vals.distinct.size <= 100,
        s"more than one wave duplicated: ${vals.size - n}")
      // unblock the relay: stop whatever query generation is active (it
      // may be mid-restart, so retry until the thread exits)
      while (t.isAlive && System.currentTimeMillis() < deadline) {
        spark.streams.active.filterNot(q => before(q.id)).foreach(_.stop())
        t.join(500)
      }
      assert(!t.isAlive && result == -1L,
        "a stopped live relay returns -1 and unblocks")
    } finally srv.close()
  }

  test("relay firehose force-cut (4x cap, never quiescent): the spool " +
      "still rotates, disk stays bounded, delivery degrades to " +
      "at-least-once — every value arrives, duplicates allowed, the " +
      "relay survives a mid-flight stop") {
    val srv = new EmbeddedRedis
    val before = spark.streams.active.map(_.id).toSet
    val tmp = Files.createTempDirectory("relayfire-spool")
    def spools(): Set[java.nio.file.Path] = {
      val s = Files.list(tmp)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(_.getFileName.toString.startsWith("relay-stdin")).toSet
      } finally s.close()
    }
    val preexisting = spools()
    try {
      val n = 600
      val capBytes = 2048L // one burst is ~24 KB, 3x past the 8 KiB bar
      val pipeIn = new java.io.PipedInputStream(1 << 20)
      val pipeOut = new java.io.PipedOutputStream(pipeIn)
      @volatile var result = 0L
      val t = new Thread(() => {
        result = Relay.run(spark, "stdio:///fire",
          s"redis://${srv.host}:${srv.port}/fire",
          offsetStart = Some(true), once = false, stdin = pipeIn,
          spoolCapBytes = capBytes, spoolDir = Some(tmp))
      }, "relay-firehose-test")
      t.start()
      // sustained feed from a side thread, no drain pauses: the monitor
      // keeps seeing a growing spool with batches in flight, so over-cap
      // rotations land under pressure — including the 4x force cut that
      // may stop a batch mid-send (a one-shot burst drains before the
      // first monitor tick and never exercises any of this)
      val lines = (0 until n).map(i => StdioParser.formatLine(
        new java.sql.Timestamp(200000L + i), "fire", i.toLong, s"f$i"))
      val feeder = new Thread(() => {
        lines.foreach { l =>
          pipeOut.write((l + "\n").getBytes("UTF-8"))
          pipeOut.flush()
          Thread.sleep(5) // ~3 s of continuous arrival
        }
      }, "relay-firehose-feeder")
      feeder.start()
      val observed = scala.collection.mutable.Set.empty[java.nio.file.Path]
      val deadline = System.currentTimeMillis() + 120000
      def values() = srv.entries("fire")
        .map(e => new String(e._2.head._2, "UTF-8"))
      // at-least-once across forced cuts: wait until every DISTINCT value
      // has landed (re-shipped duplicates of an interrupted batch are the
      // documented trade)
      while (values().toSet.size < n &&
          System.currentTimeMillis() < deadline) {
        observed ++= (spools() -- preexisting)
        Thread.sleep(50)
      }
      feeder.join(30000)
      assert(!feeder.isAlive)
      val vals = values()
      assert(vals.toSet == (0 until n).map(i => s"f$i").toSet,
        s"lost values under forced cuts (${vals.toSet.size} of $n)")
      // duplicates only ever come from re-shipped cut batches — order
      // preserved among FIRST arrivals
      val firstSeen = vals.distinct
      assert(firstSeen == (0 until n).map(i => s"f$i"),
        "first arrivals reordered across forced cuts")
      // the relay survived every cut: once the feed stops, rotations
      // bring the spool back under the cap — bounded disk under pressure
      def liveSize() = (spools() -- preexisting)
        .map(p => if (Files.exists(p)) Files.size(p) else 0L)
        .maxOption.getOrElse(0L)
      while (liveSize() > capBytes &&
          System.currentTimeMillis() < deadline) {
        observed ++= (spools() -- preexisting)
        Thread.sleep(50)
      }
      observed ++= (spools() -- preexisting)
      assert(liveSize() <= capBytes,
        s"spool unbounded under firehose: ${liveSize()}")
      assert(observed.size >= 2,
        s"the firehose never rotated the spool: $observed")
      while (t.isAlive && System.currentTimeMillis() < deadline) {
        spark.streams.active.filterNot(q => before(q.id)).foreach(_.stop())
        t.join(500)
      }
      assert(!t.isAlive && result == -1L,
        "the relay survives forced cuts and stops cleanly")
      // forced cuts surface as query FAILURE, where Spark RETAINS an
      // implicit temp checkpoint — the relay's explicit per-generation
      // checkpoints must instead be deleted as each generation ends, or a
      // weeks-long firehose leaks one directory per cut
      val leftoverCkpts = {
        val s = Files.list(tmp)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala
            .filter(_.getFileName.toString.startsWith("ckpt")).toSet
        } finally s.close()
      }
      assert(leftoverCkpts.isEmpty,
        s"rotation generations leaked checkpoints: $leftoverCkpts")
    } finally srv.close()
  }

  test("relay refusals are typed, never raw crashes: protocol-less " +
      "output, and --once with an explicit --offset end (which would " +
      "silently re-ship the whole stream every invocation)") {
    val noProto = intercept[SeaStreamErr.Connect](Relay.run(spark,
      "stdio:///clock", "localhost:6379/clock",
      offsetStart = None, once = true,
      stdin = new java.io.ByteArrayInputStream(Array.emptyByteArray)))
    assert(noProto.getMessage.contains("no protocol"), noProto.getMessage)
    val onceEnd = intercept[SeaStreamErr.Unsupported](Relay.run(spark,
      "redis://localhost:6379/clock", "stdio:///clock",
      offsetStart = Some(false), once = true))
    assert(onceEnd.getMessage.contains("--once"), onceEnd.getMessage)
    // --once with NO explicit offset takes the bounded start default
    val f = Files.createTempFile("relaycli3", ".log")
    Files.write(f, StdioParser.formatLine(
      new java.sql.Timestamp(1000L), "d", 0L, "pd").getBytes("UTF-8"))
    val out = captureOut {
      assert(Relay.run(spark, s"stdio://$f/d", "stdio:///d",
        offsetStart = None, once = true) == 1L)
    }
    assert(out.length == 1 && out.head.endsWith("pd"))
  }
}
