package graft.ops

import graft.ops.StdioParser.{ParseErr, PartialHeader}
import org.scalatest.funsuite.AnyFunSuite

/** Cases ported from sea-streamer-stdio/src/parser.rs:112-249. */
class StdioParserSpec extends AnyFunSuite {

  private val fixedNow = new java.sql.Timestamp(42000L)
  private def parse(s: String) = StdioParser.parseMeta(s, () => fixedNow)

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s.replace('T', ' '))
      .toInstant.atOffset(java.time.ZoneOffset.UTC) // local==UTC in tests
      .toInstant match { case i => new java.sql.Timestamp(i.toEpochMilli) }

  test("meta 0: plain lines pass through with now timestamp") {
    assert(parse("a plain, raw message") ==
      Right((PartialHeader(Some(fixedNow), None, None, None), "a plain, raw message")))
    assert(parse("""{ "payload": "anything" }""") ==
      Right((PartialHeader(Some(fixedNow), None, None, None), """{ "payload": "anything" }""")))
  }

  test("meta 1: timestamp only") {
    val Right((h, p)) = parse("""[2022-01-02T03:04:05] { "payload": "anything" }""")
    assert(h.timestamp.get.getTime == 1641092645000L)
    assert(h.streamKey.isEmpty && h.sequence.isEmpty && h.shardId.isEmpty)
    assert(p == """{ "payload": "anything" }""")
  }

  test("meta 2: subsec timestamp + key") {
    val Right((h, p)) = parse("""[2022-01-02T03:04:05.678 | my-fancy_topic.1] ["array", "of", "values"]""")
    assert(h.timestamp.get.getTime == 1641092645678L)
    assert(h.streamKey.contains("my-fancy_topic.1"))
    assert(h.sequence.isEmpty && h.shardId.isEmpty)
    assert(p == """["array", "of", "values"]""")
  }

  test("meta 3: ts + key + seq") {
    val Right((h, p)) = parse("[2022-01-02T03:04:05 | my-fancy_topic.1 | 123] a string payload")
    assert(h.sequence.contains(123L) && h.shardId.isEmpty)
    assert(p == "a string payload")
  }

  test("meta 4: full header") {
    val Right((h, _)) = parse("""[2022-01-02T03:04:05 | my-fancy_topic.1 | 123 | 4] { "payload": "anything" }""")
    assert(h.streamKey.contains("my-fancy_topic.1"))
    assert(h.sequence.contains(123L))
    assert(h.shardId.contains(4L))
  }

  test("meta 5-7: key-first variants") {
    val Right((h5, _)) = parse("""[my-fancy_topic.1] { "payload": "anything" }""")
    assert(h5 == PartialHeader(None, Some("my-fancy_topic.1"), None, None))
    val Right((h6, _)) = parse("""[my-fancy_topic.1 | 123] ["array", "of", "values"]""")
    assert(h6 == PartialHeader(None, Some("my-fancy_topic.1"), Some(123L), None))
    val Right((h7, _)) = parse("""[my-fancy_topic.1 | 123 | 4] { "payload": "anything" }""")
    assert(h7 == PartialHeader(None, Some("my-fancy_topic.1"), Some(123L), Some(4L)))
  }

  test("error: blank meta") {
    assert(parse("[ ]") == Left(ParseErr.Unknown("")))
  }

  test("round trip through producer line format") {
    val line = StdioParser.formatLine(
      new java.sql.Timestamp(1641092645678L), "topic.a", 7, "hello")
    val Right((h, p)) = parse(line)
    assert(h.timestamp.get.getTime == 1641092645678L)
    assert(h.streamKey.contains("topic.a"))
    assert(h.sequence.contains(7L))
    assert(p == "hello")
  }
}
