package graft.core

import java.io.FileInputStream
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.file.{Files, Path}
import java.security.KeyStore
import javax.net.ssl.{KeyManagerFactory, SSLContext, SSLServerSocket,
  SSLSocket, TrustManagerFactory}

/** Shared TLS socket layer for the wire backends (kafka's SSL/SASL_SSL
  * `security.protocol` modes, redis' `rediss://` scheme — reference
  * surfaces sea-streamer-kafka/src/streamer.rs:52-66 and
  * sea-streamer-redis/src/connection.rs:131-136), built on the JDK's own
  * TLS stack: a PKCS12-keystore listener socket broker-side, a
  * truststore-only client with HTTPS endpoint identification ON by
  * default (the reference's redis options expose exactly one knob here —
  * `disable_hostname_verification` — mirrored by `verifyHostname`).
  *
  * Two costs are engineered away because every Spark task opens its own
  * short-lived connection (measured in BENCH_LOCAL's round-12 receipts):
  * the SSLContext is cached per truststore FILE per JVM (a per-connection
  * PKCS12 load pays an iteration-heavy KDF, ~98 ms), and TCP_NODELAY is
  * set BEFORE the first handshake byte on both ends (the multi-flight
  * handshake under Nagle+delayed-ACK stalls ~40 ms per connection).
  *
  * Certificates are generated with the JDK's `keytool` (ephemeral per-JVM
  * self-signed EC pair, SAN = IP:127.0.0.1 + DNS:localhost) — test-grade
  * material, exactly like a dev cluster's auto-generated certs.
  */
object TlsChannel {

  /** Client-side config — plain strings so it rides Spark's
    * `InputPartition` serialization to executors; the SSLContext is built
    * (and cached) where the socket is opened. `keystore` (path, password)
    * adds a client CERTIFICATE for mutual TLS — the kafka
    * `ssl.keystore.*` surface.
    */
  final case class Client(truststore: String, password: String,
      keystore: Option[(String, String)] = None)

  /** Listener-side config: PKCS12 keystore holding the key pair.
    * `clientAuth` (truststore path, password) switches the listener to
    * MUTUAL TLS: connections must present a certificate chaining to that
    * truststore or the handshake is refused (`ssl.client.auth=required`).
    */
  final case class Server(keystore: String, password: String,
      clientAuth: Option[(String, String)] = None)

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
    val tms = cfg.clientAuth.map { case (path, pw) =>
      val tmf = TrustManagerFactory.getInstance(
        TrustManagerFactory.getDefaultAlgorithm)
      tmf.init(loadStore(path, pw))
      tmf.getTrustManagers
    }.orNull
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, tms, null)
    ctx
  }

  /** One SSLContext per truststore FILE per JVM — keyed with length+mtime
    * so a REWRITTEN truststore gets a fresh context instead of a stale
    * memo hit; entries are O(distinct truststore files),
    * configuration-sized.
    */
  private val clientContexts =
    new java.util.concurrent.ConcurrentHashMap[(Client, Long, Long),
      SSLContext]

  private def clientContext(cfg: Client): SSLContext = {
    val f = new java.io.File(cfg.truststore)
    clientContexts.computeIfAbsent(
      (cfg, f.length, f.lastModified), _ => {
        // trust ONLY the configured truststore — never the JVM default CAs
        val tmf = TrustManagerFactory.getInstance(
          TrustManagerFactory.getDefaultAlgorithm)
        tmf.init(loadStore(cfg.truststore, cfg.password))
        // a client keystore presents our certificate when the listener
        // requires mutual TLS
        val kms = cfg.keystore.map { case (path, pw) =>
          val kmf = KeyManagerFactory.getInstance(
            KeyManagerFactory.getDefaultAlgorithm)
          kmf.init(loadStore(path, pw), pw.toCharArray)
          kmf.getKeyManagers
        }.orNull
        val ctx = SSLContext.getInstance("TLS")
        ctx.init(kms, tmf.getTrustManagers, null)
        ctx
      })
  }

  /** TLS listener socket for the embedded brokers. */
  def serverSocket(cfg: Server, backlog: Int,
      addr: InetAddress): ServerSocket = {
    val s = serverContext(cfg).getServerSocketFactory
      .createServerSocket(0, backlog, addr)
      .asInstanceOf[SSLServerSocket]
    if (cfg.clientAuth.isDefined) s.setNeedClientAuth(true)
    s
  }

  /** Connect + handshake a client socket EAGERLY, so trust and
    * endpoint-identification failures surface at construction (where the
    * wire clients' auth failures surface too), not on first IO.
    * `verifyHostname=false` is the reference redis surface's
    * `disable_hostname_verification`: the certificate CHAIN is still
    * verified against the truststore — only the name check is waived.
    */
  def clientSocket(cfg: Client, host: String, port: Int,
      verifyHostname: Boolean = true,
      connectTimeoutMs: Int = 0): SSLSocket = {
    val raw = clientContext(cfg).getSocketFactory
    val s =
      if (connectTimeoutMs <= 0)
        raw.createSocket(host, port).asInstanceOf[SSLSocket]
      else {
        val plain = new Socket()
        plain.connect(new java.net.InetSocketAddress(host, port),
          connectTimeoutMs)
        raw.asInstanceOf[javax.net.ssl.SSLSocketFactory]
          .createSocket(plain, host, port, true).asInstanceOf[SSLSocket]
      }
    try {
      // BEFORE the handshake (the ~40 ms Nagle stall, see header)
      s.setTcpNoDelay(true)
      // the eager handshake READS — it must carry a timeout or a server
      // that accepts TCP and never answers the ClientHello (wedged
      // broker, half-open LB backend) hangs every caller forever; the
      // connect timeout bounds only the TCP connect. Callers re-set
      // their own soTimeout after construction.
      s.setSoTimeout(if (connectTimeoutMs > 0) connectTimeoutMs else 30000)
      if (verifyHostname) {
        val params = s.getSSLParameters
        params.setEndpointIdentificationAlgorithm("HTTPS")
        s.setSSLParameters(params)
      }
      s.startHandshake()
      s.setSoTimeout(0) // restore the blocking default post-handshake
    } catch {
      case e: Throwable =>
        try s.close() catch { case _: Throwable => () }
        throw e
    }
    s
  }

  /** Generate a fresh self-signed key pair + matching truststore with the
    * JDK's keytool: `server.p12` (PrivateKeyEntry) for the listener,
    * `trust.p12` (trusted-cert entry only — a PrivateKeyEntry contributes
    * NO trust anchors to a TrustManagerFactory) for clients.
    */
  def generate(): (Server, Client) =
    generate("SAN=IP:127.0.0.1,DNS:localhost")

  /** [[generate]] with an explicit SAN extension — lets a spec mint a
    * certificate that does NOT name the connected host, to exercise the
    * endpoint-identification / `verifyHostname` laws.
    */
  def generate(san: String): (Server, Client) = {
    val dir: Path = Files.createTempDirectory("graft-tls")
    dir.toFile.deleteOnExit()
    val pw = "graft-" + java.util.UUID.randomUUID().toString.take(8)
    val keys = dir.resolve("server.p12").toString
    val cert = dir.resolve("server.pem").toString
    val trust = dir.resolve("trust.p12").toString
    def keytool(args: String*): Unit = {
      val cmd = "keytool" +: args
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      val outBytes = p.getInputStream.readAllBytes()
      if (p.waitFor() != 0)
        throw new IllegalStateException("keytool failed: " +
          new String(outBytes, java.nio.charset.StandardCharsets.UTF_8))
    }
    keytool("-genkeypair", "-alias", "server", "-keyalg", "EC",
      "-groupname", "secp256r1", "-dname", "CN=127.0.0.1",
      "-ext", san,
      "-validity", "2", "-storetype", "PKCS12",
      "-keystore", keys, "-storepass", pw, "-keypass", pw)
    keytool("-exportcert", "-alias", "server", "-keystore", keys,
      "-storepass", pw, "-rfc", "-file", cert)
    keytool("-importcert", "-alias", "server", "-noprompt",
      "-storetype", "PKCS12", "-keystore", trust, "-storepass", pw,
      "-file", cert)
    (Server(keys, pw), Client(trust, pw))
  }

  /** One ephemeral pair per JVM — keytool costs ~1 s; every embedded
    * listener and spec shares it (a DISTINCT pair, e.g. for an
    * untrusting-client law, calls [[generate]] directly).
    */
  lazy val ephemeral: (Server, Client) = generate()

  /** A MUTUAL-TLS set: the [[generate]] server pair plus a client
    * key pair, cross-trusted — the listener requires certificates
    * chaining to the client cert (`ssl.client.auth=required`), the
    * client presents its keystore (`ssl.keystore.*`).
    */
  def generateMutual(): (Server, Client) = {
    val (server, clientTrust) = generate()
    val dir: Path = Files.createTempDirectory("graft-mtls")
    dir.toFile.deleteOnExit()
    val pw = "graft-" + java.util.UUID.randomUUID().toString.take(8)
    val clientKeys = dir.resolve("client.p12").toString
    val clientCert = dir.resolve("client.pem").toString
    val serverTrustsClient = dir.resolve("clients.p12").toString
    def keytool(args: String*): Unit = {
      val p = new ProcessBuilder(("keytool" +: args): _*)
        .redirectErrorStream(true).start()
      val outBytes = p.getInputStream.readAllBytes()
      if (p.waitFor() != 0)
        throw new IllegalStateException("keytool failed: " +
          new String(outBytes, java.nio.charset.StandardCharsets.UTF_8))
    }
    keytool("-genkeypair", "-alias", "client", "-keyalg", "EC",
      "-groupname", "secp256r1", "-dname", "CN=graft-client",
      "-validity", "2", "-storetype", "PKCS12",
      "-keystore", clientKeys, "-storepass", pw, "-keypass", pw)
    keytool("-exportcert", "-alias", "client", "-keystore", clientKeys,
      "-storepass", pw, "-rfc", "-file", clientCert)
    keytool("-importcert", "-alias", "client", "-noprompt",
      "-storetype", "PKCS12", "-keystore", serverTrustsClient,
      "-storepass", pw, "-file", clientCert)
    (server.copy(clientAuth = Some((serverTrustsClient, pw))),
      clientTrust.copy(keystore = Some((clientKeys, pw))))
  }
}
