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
  /** The reference's username/password connect options
    * (sea-streamer-redis/src/streamer.rs:23-24,140-152) as option strings.
    */
  val Username = "username"
  val Password = "password"

  /** The facade's connect-level prefix (`redis.ssl.*`). */
  val ConnectPrefix = "redis."
  val ConnectKeys: Set[String] =
    Set(TruststoreLocation, TruststorePassword, VerifyHostname,
      Username, Password)
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

  /** Parse connect credentials (bare keys). A password turns AUTH on;
    * a username without a password fails loudly — redis has no
    * password-less ACL login on this surface.
    */
  def parseAuth(get: String => Option[String]): Option[RedisClient.Auth] =
    (get(Username), get(Password)) match {
      case (_, Some(p)) => Some(RedisClient.Auth(get(Username), p))
      case (Some(u), None) => throw new IllegalArgumentException(
        s"redis username '$u' given without a password")
      case (None, None) => None
    }

  /** Inverse of [[parse]] (bare keys) — the options the facade hands the
    * `redis-stream` DataSource.
    */
  def options(tls: RedisClient.Tls): Map[String, String] = Map(
    TruststoreLocation -> tls.conf.truststore,
    TruststorePassword -> tls.conf.password,
    VerifyHostname -> tls.verifyHostname.toString)

  /** Inverse of [[parseAuth]] (bare keys). */
  def authOptions(auth: RedisClient.Auth): Map[String, String] =
    Map(Password -> auth.password) ++
      auth.username.map(Username -> _).toMap
}
