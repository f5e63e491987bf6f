package graft.core

/** Error taxonomy of the engine — the reference's `StreamErr` ADT
  * (sea-streamer-types/src/error.rs:7-40) re-expressed as a sealed hierarchy.
  * All are unchecked so they can cross Spark task boundaries untouched.
  */
sealed abstract class SeaStreamErr(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

object SeaStreamErr {
  final case class Connect(detail: String)
      extends SeaStreamErr(s"Failed to connect: $detail")
  case object TimeoutNotSet extends SeaStreamErr("Timeout not set")
  case object AlreadyAnchored extends SeaStreamErr("Producer already anchored")
  case object NotAnchored extends SeaStreamErr("Producer not anchored")
  case object ConsumerGroupIsSet extends SeaStreamErr("Consumer group is set")
  case object ConsumerGroupNotSet extends SeaStreamErr("Consumer group not set")
  case object StreamKeyEmpty extends SeaStreamErr("Stream key is empty")
  final case class StreamKeyNotFound(key: String)
      extends SeaStreamErr(s"Stream key not found: $key")
  final case class InvalidStreamKey(key: String)
      extends SeaStreamErr(s"Invalid stream key: '$key'")
  case object CommitNotAllowed
      extends SeaStreamErr("Commit not allowed in RealTime mode")
  final case class Utf8Error(detail: String)
      extends SeaStreamErr(s"Utf8 error: $detail")
  final case class UrlError(detail: String)
      extends SeaStreamErr(s"Url error: $detail")
  final case class Unsupported(what: String)
      extends SeaStreamErr(s"Unsupported: $what")
  final case class Backend(detail: String, underlying: Throwable = null)
      extends SeaStreamErr(s"Backend error: $detail", underlying)
  final case class RuntimeErr(detail: String, underlying: Throwable = null)
      extends SeaStreamErr(s"Runtime error: $detail", underlying)
}

/** StreamUrl parse errors (sea-streamer-types/src/streamer.rs). */
sealed abstract class StreamUrlErr(msg: String) extends RuntimeException(msg)

object StreamUrlErr {
  case object NoEndingSlash
      extends StreamUrlErr("Stream url must end with a '/'")
  case object ProtocolRequired extends StreamUrlErr("Protocol required")
  case object NotOneStreamKey
      extends StreamUrlErr("Expected exactly one stream key")
  final case class KeyErr(key: String)
      extends StreamUrlErr(s"Invalid stream key: '$key'")
  final case class UrlParse(url: String)
      extends StreamUrlErr(s"Cannot parse url: '$url'")
}
