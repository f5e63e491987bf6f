package graft.kafka

import java.net.{InetAddress, ServerSocket}
import javax.net.ssl.SSLSocket

/** TLS for the kafka wire pair — the `security.protocol` = SSL / SASL_SSL
  * half of the reference's connect-option surface
  * (sea-streamer-kafka/src/streamer.rs:52-66, librdkafka's
  * `security.protocol` + `ssl.ca.location` configs). SASL_SSL is
  * literally SASL_PLAINTEXT's byte stream inside the TLS channel: the
  * KIP-152 handshake/authenticate frames are unchanged, which is why
  * [[KafkaClient]] takes TLS as an independent socket-layer option.
  *
  * The socket machinery (context caching, eager handshake, NODELAY
  * ordering, keytool-generated ephemeral certs) is the shared
  * [[graft.core.TlsChannel]] — the same layer redis' `rediss://` scheme
  * rides; this object pins the kafka client defaults (endpoint
  * identification always ON, the Kafka client's
  * `ssl.endpoint.identification.algorithm=https` default).
  */
object KafkaTls {
  type Client = graft.core.TlsChannel.Client
  val Client = graft.core.TlsChannel.Client
  type Server = graft.core.TlsChannel.Server
  val Server = graft.core.TlsChannel.Server

  /** TLS listener socket for [[EmbeddedKafka]]. */
  def serverSocket(cfg: Server, backlog: Int,
      addr: InetAddress): ServerSocket =
    graft.core.TlsChannel.serverSocket(cfg, backlog, addr)

  /** Connect + eagerly handshake; hostname verification is NOT optional
    * on the kafka path (the Kafka client default).
    */
  def clientSocket(cfg: Client, host: String, port: Int): SSLSocket =
    graft.core.TlsChannel.clientSocket(cfg, host, port)

  def generate(): (Server, Client) = graft.core.TlsChannel.generate()

  /** One ephemeral pair per JVM, shared with the other backends. */
  def ephemeral: (Server, Client) = graft.core.TlsChannel.ephemeral
}
