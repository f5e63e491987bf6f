package graft.redis

/** One spelling of the `rediss://` client-option surface — the truststore
  * pair + the reference's `disable_hostname_verification` knob
  * (sea-streamer-redis/src/connection.rs:131-136) as option strings —
  * shared by the `redis-stream` DataSource (bare keys) and the facade's
  * connect surface (`redis.`-prefixed keys), so emit and parse can never
  * drift (the same non-drift contract [[graft.kafka.KafkaSecurity]]
  * carries for the kafka wire driver).
  */
object RedisSecurity {

  val TruststoreLocation = "ssl.truststore.location"
  val TruststorePassword = "ssl.truststore.password"
  val VerifyHostname = "ssl.verify.hostname"

  /** The facade's connect-level prefix (`redis.ssl.*`). */
  val ConnectPrefix = "redis."
  val ConnectKeys: Set[String] =
    Set(TruststoreLocation, TruststorePassword, VerifyHostname)
      .map(ConnectPrefix + _)

  /** Parse from a string-keyed lookup (bare keys). A present truststore
    * turns TLS on; a malformed verify-hostname value fails loudly as
    * IllegalArgumentException (callers wrap into their typed error) —
    * never silently defaults.
    */
  def parse(get: String => Option[String]): Option[RedisClient.Tls] =
    get(TruststoreLocation).map { loc =>
      val verify = get(VerifyHostname) match {
        case None => true
        case Some("true") => true
        case Some("false") => false
        case Some(other) => throw new IllegalArgumentException(
          s"$VerifyHostname must be true or false, got '$other'")
      }
      RedisClient.Tls(
        graft.core.TlsChannel.Client(loc,
          get(TruststorePassword).getOrElse("")),
        verifyHostname = verify)
    }

  /** Inverse of [[parse]] (bare keys) — the options the facade hands the
    * `redis-stream` DataSource.
    */
  def options(tls: RedisClient.Tls): Map[String, String] = Map(
    TruststoreLocation -> tls.conf.truststore,
    TruststorePassword -> tls.conf.password,
    VerifyHostname -> tls.verifyHostname.toString)
}
