package graft.kafka

import java.io.FileInputStream
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.file.{Files, Path}
import java.security.KeyStore
import javax.net.ssl.{KeyManagerFactory, SSLContext, SSLServerSocket,
  SSLSocket, TrustManagerFactory}

/** TLS for the kafka wire pair — the `security.protocol` = SSL / SASL_SSL
  * half of the reference's connect-option surface
  * (sea-streamer-kafka/src/streamer.rs:52-66, librdkafka's
  * `security.protocol` + `ssl.ca.location` configs), done with the JDK's
  * own TLS stack instead of OpenSSL: the broker listener wraps its accept
  * socket in an `SSLServerSocket` from a PKCS12 keystore, the client
  * connects through an `SSLSocketFactory` whose trust anchors come from a
  * truststore, with HTTPS-style endpoint identification ON (the Kafka
  * client default `ssl.endpoint.identification.algorithm=https`) — a
  * server certificate that doesn't name the connected host fails the
  * handshake even when the chain is trusted. SASL_SSL is literally
  * SASL_PLAINTEXT's byte stream inside the TLS channel: the KIP-152
  * handshake/authenticate frames are unchanged, which is why
  * [[KafkaClient]] takes TLS as an independent socket-layer option.
  *
  * Certificates are generated with the JDK's `keytool` (an ephemeral
  * per-JVM self-signed EC pair, SAN = IP:127.0.0.1 + DNS:localhost) —
  * nothing here is reusable credential material, exactly like a test
  * cluster's auto-generated certs.
  */
object KafkaTls {

  /** Client-side config — plain strings so it rides Spark's
    * `InputPartition` serialization to executors; the SSLContext is built
    * where the socket is opened.
    */
  final case class Client(truststore: String, password: String)

  /** Broker-side config: PKCS12 keystore holding the listener's key pair. */
  final case class Server(keystore: String, password: String)

  private def loadStore(path: String, password: String): KeyStore = {
    val ks = KeyStore.getInstance("PKCS12")
    val is = new FileInputStream(path)
    try ks.load(is, password.toCharArray) finally is.close()
    ks
  }

  private def serverContext(cfg: Server): SSLContext = {
    val ks = loadStore(cfg.keystore, cfg.password)
    val kmf = KeyManagerFactory.getInstance(
      KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, cfg.password.toCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }

  /** One SSLContext per truststore FILE per JVM — a PKCS12 load pays an
    * iteration-heavy KDF (measured: rebuilding per connection costs
    * ~98 ms, ~25× the TLS handshake itself), so per-task short-lived
    * connections must share the context the way the real Kafka client
    * shares its SslFactory. Keyed by (path, password, length, mtime): a
    * REWRITTEN truststore gets a fresh context instead of a stale memo
    * hit (the cappedShingleMemo lesson); entries are O(distinct
    * truststore files) — configuration-sized, not data-sized.
    */
  private val clientContexts =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Long, Long),
      SSLContext]

  private def clientContext(cfg: Client): SSLContext = {
    val f = new java.io.File(cfg.truststore)
    clientContexts.computeIfAbsent(
      (cfg.truststore, cfg.password, f.length, f.lastModified), _ => {
        // trust ONLY the configured truststore — never the JVM default
        // CAs (a kafka client's `ssl.truststore.location` semantics)
        val tmf = TrustManagerFactory.getInstance(
          TrustManagerFactory.getDefaultAlgorithm)
        tmf.init(loadStore(cfg.truststore, cfg.password))
        val ctx = SSLContext.getInstance("TLS")
        ctx.init(null, tmf.getTrustManagers, null)
        ctx
      })
  }

  /** TLS listener socket for [[EmbeddedKafka]]. */
  def serverSocket(cfg: Server, backlog: Int,
      addr: InetAddress): ServerSocket =
    serverContext(cfg).getServerSocketFactory
      .createServerSocket(0, backlog, addr)
      .asInstanceOf[SSLServerSocket]

  /** Connect + handshake a client socket; the handshake runs EAGERLY so a
    * trust or endpoint-identification failure surfaces at construction
    * (where [[KafkaClient]]'s SASL failures surface too), not on first IO.
    */
  def clientSocket(cfg: Client, host: String, port: Int): SSLSocket = {
    val s = clientContext(cfg).getSocketFactory.createSocket(host, port)
      .asInstanceOf[SSLSocket]
    try {
      // BEFORE the handshake: its multi-flight record exchange under
      // Nagle + delayed-ACK stalls ~40 ms per connection (measured
      // 48.8 → 1.8 ms with NODELAY on both ends)
      s.setTcpNoDelay(true)
      val params = s.getSSLParameters
      params.setEndpointIdentificationAlgorithm("HTTPS")
      s.setSSLParameters(params)
      s.startHandshake()
    } catch { case e: Throwable => try s.close() catch { case _: Throwable => () }; throw e }
    s
  }

  /** Generate a fresh self-signed key pair + matching truststore with the
    * JDK's keytool: `broker.p12` (PrivateKeyEntry) for the listener,
    * `trust.p12` (trusted-cert entry only — a PrivateKeyEntry contributes
    * NO trust anchors to a TrustManagerFactory) for clients.
    */
  def generate(): (Server, Client) = {
    val dir: Path = Files.createTempDirectory("graft-kafka-tls")
    dir.toFile.deleteOnExit()
    val pw = "graft-" + java.util.UUID.randomUUID().toString.take(8)
    val broker = dir.resolve("broker.p12").toString
    val cert = dir.resolve("broker.pem").toString
    val trust = dir.resolve("trust.p12").toString
    def keytool(args: String*): Unit = {
      val cmd = "keytool" +: args
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      val outBytes = p.getInputStream.readAllBytes()
      if (p.waitFor() != 0)
        throw new IllegalStateException("keytool failed: " +
          new String(outBytes, java.nio.charset.StandardCharsets.UTF_8))
    }
    keytool("-genkeypair", "-alias", "broker", "-keyalg", "EC",
      "-groupname", "secp256r1", "-dname", "CN=127.0.0.1",
      "-ext", "SAN=IP:127.0.0.1,DNS:localhost",
      "-validity", "2", "-storetype", "PKCS12",
      "-keystore", broker, "-storepass", pw, "-keypass", pw)
    keytool("-exportcert", "-alias", "broker", "-keystore", broker,
      "-storepass", pw, "-rfc", "-file", cert)
    keytool("-importcert", "-alias", "broker", "-noprompt",
      "-storetype", "PKCS12", "-keystore", trust, "-storepass", pw,
      "-file", cert)
    (Server(broker, pw), Client(trust, pw))
  }

  /** One ephemeral pair per JVM — keytool costs ~1 s; every embedded
    * listener and spec shares it (generating a DISTINCT pair, e.g. for an
    * untrusting-client law, calls [[generate]] directly).
    */
  lazy val ephemeral: (Server, Client) = generate()
}
