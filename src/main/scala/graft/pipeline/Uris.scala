package graft.pipeline

import java.net.{URI, URLDecoder}

/** URI helpers for the `[name+]scheme://host/path?k=v` pipeline syntax.
  *
  * Semantics match the reference CLI (see
  * /root/reference/core/src/main/scala/dev/mauch/spark/dfio/UriHelpers.scala:1-40):
  * `a+b+scheme` names input/output views, dashes in names normalize to
  * underscores, query params are `k=v` pairs.
  */
object Uris {
  final case class ParsedUri(uri: URI) {
    def scheme: String = uri.getScheme
    def host: Option[String] = Option(uri.getHost)
    def port: Int = uri.getPort
    def path: String = Option(uri.getPath).getOrElse("")
    /** Path with the leading slash stripped. */
    def relPath: String = if (path.startsWith("/")) path.substring(1) else path
    def pathParts: Seq[String] = path.split("/").toSeq.filter(_.nonEmpty)
    def queryParams: Map[String, String] =
      Option(uri.getRawQuery)
        .map(
          _.split("&").toSeq
            .filter(_.nonEmpty)
            .map { kv =>
              kv.split("=", 2) match {
                case Array(k, v) => decode(k) -> decode(v)
                case Array(k)    => decode(k) -> ""
              }
            }
            .toMap
        )
        .getOrElse(Map.empty)
  }

  def decode(s: String): String = URLDecoder.decode(s, "UTF-8")

  private def normName(s: String): Option[String] =
    Some(s.replaceAll("-", "_")).filter(_.nonEmpty)

  /** Splits `a+b+scheme://rest` → (names=[a,b], bare URI with scheme `scheme`). */
  def splitNames(raw: String): (Seq[String], ParsedUri) = {
    val uri = URI.create(raw)
    val parts = uri.getScheme.split("\\+").toSeq
    val (names, scheme) = (parts.init.flatMap(normName), parts.last)
    val ssp = raw.substring(raw.indexOf(':') + 1)
    (names, ParsedUri(URI.create(s"$scheme:$ssp")))
  }

  /** `[name+]scheme` for sources/sinks: at most one name. */
  def sourceOrSinkUri(raw: String, default: String): (String, ParsedUri) = {
    val (names, uri) = splitNames(raw)
    (names.headOption.getOrElse(default), uri)
  }

  /** `[in+][out+]scheme` for transforms. */
  def transformUri(raw: String): (String, String, ParsedUri) = {
    val (names, uri) = splitNames(raw)
    names match {
      case Seq(in, out) => (in, out, uri)
      case Seq(in)      => (in, "sink", uri)
      case _            => ("source", "sink", uri)
    }
  }
}
