package graft.facade

/** Kafka connect-option surface (sea-streamer-kafka/src/streamer.rs:38-106,
  * 122-170) mapped onto Spark's `kafka.`-prefixed passthrough options.
  * Everything lands verbatim on the Kafka client, exactly like the
  * reference's custom-options passthrough.
  */
object KafkaOptions {

  sealed abstract class SecurityProtocol(val value: String)
  object SecurityProtocol {
    case object Plaintext extends SecurityProtocol("PLAINTEXT")
    case object Ssl extends SecurityProtocol("SSL")
    case object SaslPlaintext extends SecurityProtocol("SASL_PLAINTEXT")
    case object SaslSsl extends SecurityProtocol("SASL_SSL")
  }

  sealed abstract class SaslMechanism(val value: String)
  object SaslMechanism {
    case object Plain extends SaslMechanism("PLAIN")
    case object Gssapi extends SaslMechanism("GSSAPI")
    case object ScramSha256 extends SaslMechanism("SCRAM-SHA-256")
    case object ScramSha512 extends SaslMechanism("SCRAM-SHA-512")
    case object OauthBearer extends SaslMechanism("OAUTHBEARER")
  }

  final case class SaslOptions(
      mechanism: SaslMechanism,
      username: Option[String] = None,
      password: Option[String] = None)

  /** TLS trust material for SSL / SASL_SSL — the client-side half of the
    * `security.protocol` surface (librdkafka's `ssl.ca.location` class of
    * configs, mapped to the Java client's truststore pair).
    */
  final case class SslOptions(
      truststoreLocation: String,
      truststorePassword: Option[String] = None)

  /** Spark reader/writer options for a secured cluster. */
  def securityOptions(
      protocol: SecurityProtocol,
      sasl: Option[SaslOptions] = None,
      ssl: Option[SslOptions] = None,
      custom: Map[String, String] = Map.empty): Map[String, String] = {
    val base = Map("kafka.security.protocol" -> protocol.value)
    val sslOpts = ssl.toSeq.flatMap { s =>
      Seq("kafka.ssl.truststore.location" -> s.truststoreLocation) ++
        s.truststorePassword.map("kafka.ssl.truststore.password" -> _)
    }
    val saslOpts = sasl.toSeq.flatMap { s =>
      // login module must match the mechanism (PlainLoginModule only speaks
      // PLAIN); OAUTHBEARER's non-production convention carries the
      // principal as the unsecured login module's sub claim (KIP-255 —
      // a real deployment swaps the module config for its OIDC endpoint);
      // GSSAPI needs an external krb5 config, never an inline JAAS
      val jaas = (s.mechanism, s.username, s.password) match {
        case (SaslMechanism.Plain, Some(u), Some(p)) =>
          Seq("kafka.sasl.jaas.config" ->
            ("org.apache.kafka.common.security.plain.PlainLoginModule " +
              s"""required username="$u" password="$p";"""))
        case (SaslMechanism.ScramSha256 | SaslMechanism.ScramSha512,
            Some(u), Some(p)) =>
          Seq("kafka.sasl.jaas.config" ->
            ("org.apache.kafka.common.security.scram.ScramLoginModule " +
              s"""required username="$u" password="$p";"""))
        case (SaslMechanism.OauthBearer, Some(u), _) =>
          Seq("kafka.sasl.jaas.config" ->
            ("org.apache.kafka.common.security.oauthbearer." +
              "OAuthBearerLoginModule required " +
              s"""unsecuredLoginStringClaim_sub="$u";"""))
        case _ => Seq.empty
      }
      Seq("kafka.sasl.mechanism" -> s.mechanism.value) ++ jaas
    }
    // custom options pass through verbatim, kafka.-prefixed if not already
    val customOpts = custom.map { case (k, v) =>
      (if (k.startsWith("kafka.")) k else s"kafka.$k") -> v
    }
    base ++ saslOpts ++ sslOpts ++ customOpts
  }
}
