package graft.ss

import java.io.{ByteArrayOutputStream, FileOutputStream, PrintStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.core.SeaMessage

/** Golden-output laws for the `ss-decode` parity utility against the
  * reference's documented line shapes (README.md "Decoder" section;
  * sea-streamer-file/src/bin/decoder.rs doc examples).
  */
class SsDecodeSpec extends AnyFunSuite {

  private def ts(s: String): java.sql.Timestamp =
    new java.sql.Timestamp(Instant.parse(s).toEpochMilli)

  private def msg(key: String, shard: Long, seq: Long, at: String,
      payload: Array[Byte]): SeaMessage =
    SeaMessage(key, shard, seq, ts(at), payload)

  private def decodeLines(path: String, format: String,
      headerOnly: Boolean = false): Seq[String] = {
    val buf = new ByteArrayOutputStream()
    val out = new PrintStream(buf, true, "UTF-8")
    SsDecode.decode(path, format, headerOnly, out)
    new String(buf.toByteArray, UTF_8).split("\n", -1).toSeq.dropRight(1)
  }

  private def withFile(beaconInterval: Int = 1024)(
      write: SsWriter => Unit): String = {
    val dir = Files.createTempDirectory("ssdecode").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "hello.ss").getPath
    val w = new SsWriter(new FileOutputStream(path), "hello",
      beaconInterval, createdAtMillis = 0L)
    write(w)
    w.close()
    path
  }

  test("log format matches the reference's documented example line") {
    val path = withFile() { w =>
      w.write(msg("hello", 0, 1, "2023-06-05T13:55:53.001Z",
        "message-1".getBytes(UTF_8)))
    }
    val lines = decodeLines(path, "log")
    // file header comment (decoder.rs:57-64): `# {json}`
    assert(lines.head ==
      """# {"file_name":"hello","created_at":"1970-01-01T00:00:00.0","beacon_interval":1024}""")
    // the README's exact example message line
    assert(lines(1) == "[2023-06-05T13:55:53.001 | hello | 1 | 0] message-1")
  }

  test("ndjson format matches the reference's documented example line") {
    val path = withFile() { w =>
      w.write(msg("hello", 0, 1, "2023-06-05T13:55:53.001Z",
        "message-1".getBytes(UTF_8)))
    }
    val lines = decodeLines(path, "ndjson")
    assert(lines.head ==
      """/* {"file_name":"hello","created_at":"1970-01-01T00:00:00.0","beacon_interval":1024} */""")
    assert(lines(1) ==
      """{"header":{"stream_key":"hello","shard_id":0,"sequence":1,"timestamp":"2023-06-05T13:55:53.001"},"payload":"message-1"}""")
  }

  test("payload rendering: JSON embeds verbatim, binary as byte array / <BINARY BLOB>") {
    val path = withFile() { w =>
      w.write(msg("j", 0, 1, "2023-06-05T13:55:53.100Z",
        """{"a":1,"b":"x"}""".getBytes(UTF_8)))
      w.write(msg("b", 2, 7, "2023-06-05T13:55:53Z",
        Array[Byte](0xFF.toByte, 0xFE.toByte)))
    }
    val nd = decodeLines(path, "ndjson")
    assert(nd(1) ==
      """{"header":{"stream_key":"j","shard_id":0,"sequence":1,"timestamp":"2023-06-05T13:55:53.1"},"payload":{"a":1,"b":"x"}}""")
    assert(nd(2) ==
      """{"header":{"stream_key":"b","shard_id":2,"sequence":7,"timestamp":"2023-06-05T13:55:53.0"},"payload":[255,254]}""")
    val log = decodeLines(path, "log")
    assert(log(2) == "[2023-06-05T13:55:53.0 | b | 7 | 2] <BINARY BLOB>")
  }

  test("empty and whitespace-only payloads render as JSON strings, " +
      "never as null (Jackson's MissingNode would otherwise leak)") {
    val path = withFile() { w =>
      w.write(msg("w", 0, 1, "2023-06-05T13:55:53Z", " ".getBytes(UTF_8)))
      w.write(msg("w", 0, 2, "2023-06-05T13:55:53Z", Array.emptyByteArray))
    }
    val nd = decodeLines(path, "ndjson")
    assert(nd(1).endsWith(""""payload":" "}"""), nd(1))
    assert(nd(2).endsWith(""""payload":""}"""), nd(2))
  }

  test("--header-only skips payloads in both formats") {
    val path = withFile() { w =>
      w.write(msg("hello", 0, 1, "2023-06-05T13:55:53.001Z",
        "message-1".getBytes(UTF_8)))
    }
    assert(decodeLines(path, "log", headerOnly = true)(1) ==
      "[2023-06-05T13:55:53.001 | hello | 1 | 0]")
    assert(decodeLines(path, "ndjson", headerOnly = true)(1) ==
      """{"header":{"stream_key":"hello","shard_id":0,"sequence":1,"timestamp":"2023-06-05T13:55:53.001"},"payload":null}""")
  }

  test("beacons print as marker-array comments after the crossing message") {
    // small interval so a handful of messages cross several boundaries
    // (but >= MarkerMaxSize*2: below that num_markers is 0 and beacons are
    // legitimately empty, format.rs: num_markers)
    val path = withFile(beaconInterval = 1024) { w =>
      (1 to 20).foreach { i =>
        w.write(msg("hello", 0, i.toLong, "2023-06-05T13:55:53.001Z",
          s"payload-$i-${"x" * 100}".getBytes(UTF_8)))
      }
    }
    val lines = decodeLines(path, "log")
    val beacons = lines.drop(1).filter(_.startsWith("# "))
    assert(beacons.nonEmpty)
    // each beacon is the serde array of markers: header + bare-number checksum
    val shape =
      """# \[\{"header":\{"stream_key":"hello","shard_id":0,"sequence":\d+,"timestamp":"[0-9T:.-]+"\},"running_checksum":\d+\}\]""".r
    beacons.foreach(b => assert(shape.matches(b), b))
    // beacons never lead: a crossing is only visible once a message spans it
    assert(!lines(1).startsWith("# "))
    // ndjson renders the same beacons in comment syntax
    val nd = decodeLines(path, "ndjson").drop(1).filter(_.startsWith("/* "))
    assert(nd.length == beacons.length)
    assert(nd.forall(l => l.startsWith("/* [") && l.endsWith(" */")))
  }

  test("the terminating EOS control frame prints, then the scan ends") {
    val path = withFile() { w =>
      w.write(msg("hello", 0, 1, "2023-06-05T13:55:53.001Z",
        "message-1".getBytes(UTF_8)))
      w.endOfStream()
    }
    val lines = decodeLines(path, "log")
    assert(lines.length == 3)
    assert(lines(2).contains("| SEA_STREAMER_INTERNAL | 0 | 0] EOS"))
  }

  test("a truncated tail decodes the complete prefix (reference's NotEnoughBytes warn)") {
    val path = withFile() { w =>
      w.write(msg("hello", 0, 1, "2023-06-05T13:55:53.001Z",
        "message-1".getBytes(UTF_8)))
      w.write(msg("hello", 0, 2, "2023-06-05T13:55:54.001Z",
        "message-2".getBytes(UTF_8)))
    }
    // chop mid-frame: drop the last 4 bytes
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(path))
    Files.write(java.nio.file.Paths.get(path),
      java.util.Arrays.copyOf(bytes, bytes.length - 4))
    val lines = decodeLines(path, "log")
    assert(lines.length == 2)
    assert(lines(1).endsWith("message-1"))
  }
}
