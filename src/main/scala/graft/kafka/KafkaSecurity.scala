package graft.kafka

/** One parser for the wire driver's security option surface — the strings
  * [[graft.facade.KafkaOptions.securityOptions]] emits (the builtin
  * connector's exact names: `kafka.security.protocol`,
  * `kafka.sasl.mechanism`, `kafka.sasl.jaas.config`,
  * `kafka.ssl.truststore.location`/`password`), parsed back into the wire
  * client's (sasl, mechanism, tls) triple. Shared by the `kafka-wire`
  * DataSource (CaseInsensitiveStringMap) and the facade's bounded
  * read/write paths (plain Map) so the two can never drift.
  */
object KafkaSecurity {

  final case class Wire(
      sasl: Option[(String, String)],
      saslMechanism: String,
      tls: Option[graft.core.TlsChannel.Client])

  /** Protocols the wire driver speaks end-to-end. */
  val WireProtocols: Set[String] =
    Set("PLAINTEXT", "SASL_PLAINTEXT", "SSL", "SASL_SSL")

  /** Parse from a string-keyed lookup. Fails loudly on anything the wire
    * driver cannot actually do — never silently connects unauthenticated
    * or unencrypted.
    */
  def parse(get: String => Option[String]): Wire = {
    val mechOpt = get("kafka.sasl.mechanism")
    val jaas = get("kafka.sasl.jaas.config")
    val sasl: Option[(String, String)] = (mechOpt, jaas) match {
      case (None, None) => None
      case (Some("GSSAPI"), _) =>
        // Kerberos carries no inline credentials: the JGSS bid reads the
        // ambient ticket cache/keytab (krb5 system properties), exactly
        // like the Java client's sasl.kerberos.* convention — the (user,
        // pass) pair is a placeholder the mechanism never reads
        Some(("", ""))
      case (Some("OAUTHBEARER"), Some(j)) =>
        // the Java client's non-production convention (KIP-255): the
        // unsecured login module's sub claim IS the principal; no
        // password exists on this mechanism
        val sub = "unsecuredLoginStringClaim_sub=\"([^\"]*)\""
          .r.findFirstMatchIn(j)
        require(sub.isDefined, "OAUTHBEARER jaas must carry " +
          "unsecuredLoginStringClaim_sub (the unsecured-bearer principal)")
        Some((sub.get.group(1), ""))
      case (Some(m), Some(j)) =>
        require(m == "PLAIN" || KafkaWire.Scram.Mechanisms.contains(m),
          s"kafka-wire driver supports PLAIN/SCRAM-SHA-256/512/" +
            s"OAUTHBEARER via JAAS options (GSSAPI via the ambient " +
            s"krb5 environment), got $m")
        val user = "username=\"([^\"]*)\"".r.findFirstMatchIn(j)
        val pass = "password=\"([^\"]*)\"".r.findFirstMatchIn(j)
        require(user.isDefined && pass.isDefined,
          "kafka.sasl.jaas.config must carry username and password")
        Some((user.get.group(1), pass.get.group(1)))
      case _ => throw new IllegalArgumentException(
        "SASL needs both kafka.sasl.mechanism and kafka.sasl.jaas.config")
    }
    val proto = get("kafka.security.protocol")
      .map(_.toUpperCase(java.util.Locale.ROOT))
      .getOrElse(if (sasl.isDefined) "SASL_PLAINTEXT" else "PLAINTEXT")
    require(WireProtocols.contains(proto),
      s"unknown security protocol $proto")
    require(!(proto.startsWith("SASL") ^ sasl.isDefined),
      s"$proto inconsistent with the SASL options " +
        "(SASL_* requires mechanism+JAAS; SSL/PLAINTEXT forbid them)")
    val tls =
      if (proto == "SSL" || proto == "SASL_SSL") {
        val loc = get("kafka.ssl.truststore.location")
          .getOrElse(throw new IllegalArgumentException(
            s"$proto requires kafka.ssl.truststore.location"))
        // ssl.keystore.* presents a client certificate — mutual TLS
        // against an `ssl.client.auth=required` listener
        val keystore = get("kafka.ssl.keystore.location").map(ks =>
          (ks, get("kafka.ssl.keystore.password").getOrElse("")))
        Some(graft.core.TlsChannel.Client(loc,
          get("kafka.ssl.truststore.password").getOrElse(""), keystore))
      } else None
    Wire(sasl, mechOpt.getOrElse("PLAIN"), tls)
  }

  def parse(options: Map[String, String]): Wire = parse(options.get _)
}
