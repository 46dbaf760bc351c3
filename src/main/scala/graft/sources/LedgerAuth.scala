package graft.sources

import java.nio.charset.StandardCharsets
import java.util.Base64

/** Pluggable connection-auth hook for the ledger source/sink.
  *
  * Reference surface: `ViestiUtils.scala:10-51` resolves an OAuth2
  * client-credentials flow into broker client params — a `data:` URL
  * holding the base64 JSON credential blob, plus an auth-plugin class
  * name — and `Utility.getAuthentication:96-117` picks the provider from
  * job config. The Spark-native analog is options-driven: `authProvider`
  * names a built-in (`oauth2`, `token`) or a user class implementing
  * [[LedgerAuthProvider]]; the resolved provider turns validated reader
  * options into the connection params a broker client would receive.
  * Resolution happens at table-construction time (fail-fast at planning,
  * not mid-job on an executor), and every secret-bearing param is
  * registered for redaction — the raw blob never reaches `toString`,
  * plans, or error messages.
  *
  * There is no broker in this environment, so the params map IS the
  * contract surface: what matters (and what the specs pin) is that the
  * blob is built deterministically from the options, that resolution
  * fails cleanly, and that secrets stay redacted end-to-end.
  */
trait LedgerAuthProvider {
  /** Connection params merged into the broker client conf (lowercase keys). */
  def clientParams(options: Map[String, String]): Map[String, String]
  /** Param keys whose values must never be rendered (lowercase). */
  def secretParams: Set[String]
}

object LedgerAuth {

  /** Minimal JSON object writer (stable field order, full string escaping)
    * — the blob must be byte-deterministic for a given option map, which
    * insertion-ordered hand-rolled JSON guarantees and a reflective
    * mapper would not.
    */
  private[sources] def jsonObj(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) => s""""${escape(k)}":"${escape(v)}"""" }
      .mkString("{", ",", "}")

  private def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** OAuth2 client-credentials: the credential blob rides a `data:` URL
    * (reference `ViestiConfig.getEncodedData` — base64 JSON with
    * `type: client_credentials`), and the client param map carries the
    * blob URL, issuer, and audience (`getAuthParamString`, audience
    * defaulting to the reference's fixed "authn").
    */
  object OAuth2Provider extends LedgerAuthProvider {
    override def clientParams(options: Map[String, String]): Map[String, String] = {
      val issuer = options("oauth2.issuerurl")
      val blob = jsonObj(Seq(
        "type" -> "client_credentials",
        "client_id" -> options("oauth2.clientid"),
        "client_secret" -> options("oauth2.clientsecret"),
        "issuer_url" -> issuer))
      val dataUrl = "data:application/json;base64," +
        Base64.getEncoder.encodeToString(blob.getBytes(StandardCharsets.UTF_8))
      Map(
        "authpluginclassname" -> "oauth2-client-credentials",
        "authparams" -> jsonObj(Seq(
          "privateKey" -> dataUrl,
          "issuerUrl" -> issuer,
          "audience" -> options.getOrElse("oauth2.audience", "authn"))))
    }
    override def secretParams: Set[String] = Set("authparams")
  }

  /** Static-token auth: the pre-existing `authToken` option becomes the
    * token param directly (the reference's non-OAuth fallback path).
    */
  object TokenProvider extends LedgerAuthProvider {
    override def clientParams(options: Map[String, String]): Map[String, String] =
      Map("authpluginclassname" -> "token", "authtoken" -> options("authtoken"))
    override def secretParams: Set[String] = Set("authtoken")
  }

  /** Resolve the provider named by `authProvider`: a built-in alias or a
    * fully-qualified class with a no-arg constructor. Clean
    * IllegalArgumentException on anything else — option typos and
    * classpath mistakes surface at planning time with the option name,
    * never a secret value.
    */
  def resolve(norm: Map[String, String]): Option[LedgerAuthProvider] =
    norm.get("authprovider").map {
      case "oauth2" => OAuth2Provider
      case "token"  => TokenProvider
      case cls =>
        val inst =
          try Class.forName(cls).getDeclaredConstructor().newInstance()
          catch {
            case _: ClassNotFoundException => throw new IllegalArgumentException(
              s"graft-ledger: authProvider class not found: $cls " +
                "(built-ins: oauth2, token)")
            case _: ReflectiveOperationException => throw new IllegalArgumentException(
              s"graft-ledger: authProvider class $cls must have a public no-arg constructor")
          }
        inst match {
          case p: LedgerAuthProvider => p
          case _ => throw new IllegalArgumentException(
            s"graft-ledger: authProvider class $cls does not implement graft.sources.LedgerAuthProvider")
        }
    }

  /** The connection-auth params for a validated option map (empty when no
    * provider is configured). Called from the table constructor.
    */
  def clientConf(norm: Map[String, String]): Map[String, String] =
    resolve(norm).fold(Map.empty[String, String])(_.clientParams(norm))

  /** Rendering-safe view of a client conf: provider-declared secret keys
    * masked, same rule as [[LedgerOptions.redact]] applies to options.
    */
  def redactClientConf(norm: Map[String, String],
      conf: Map[String, String]): Map[String, String] = {
    val secret = resolve(norm).fold(Set.empty[String])(_.secretParams)
    conf.map { case (k, v) => k -> (if (secret(k.toLowerCase)) "***" else v) }
  }
}
