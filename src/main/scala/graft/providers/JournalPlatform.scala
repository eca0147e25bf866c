package graft.providers

/** Journal-platform detection over a corpus-resident `html` column — the
  * in-corpus face of the reference's OJS/Janeway `_is_my_platform` sniffs
  * (reference: journals/ojs.py:54-62, journals/janeway.py:57-72). The
  * reference fetches the landing page to sniff it; an engine whose pages
  * already sit in a table runs the same test as a narrow column function,
  * which is why these two rungs are network-gated in [[Dispatch]] but fully
  * offline here. Checked in ladder order (OJS's generator fingerprint is
  * unambiguous; Janeway's is broader — extent.py:100-103).
  */
object JournalPlatform {

  private val metaTag = "(?is)<meta\\s+[^>]*>".r
  private val linkTag = "(?is)<link\\s+[^>]*>".r
  private val Ws = java.util.regex.Pattern.compile("\\s+")
  // per-attribute-name compiled pattern cache (the old path rebuilt the
  // regex per tag per attribute on the landing-page sniff path)
  private val attrRe =
    new java.util.concurrent.ConcurrentHashMap[String, scala.util.matching.Regex]()
  private def attr(tag: String, name: String): Option[String] =
    attrRe.computeIfAbsent(name, n => s"""(?i)$n\\s*=\\s*["']([^"']*)["']""".r)
      .findFirstMatchIn(tag).map(_.group(1))

  private def generatorContent(html: String): Option[String] =
    metaTag.findAllIn(html).toSeq.iterator
      .filter(t => attr(t, "name").exists(_.equalsIgnoreCase("generator")))
      .flatMap(t => attr(t, "content"))
      .nextOption()

  def isOjs(html: String): Boolean =
    generatorContent(html).exists(_.toLowerCase.contains("open journal systems"))

  def isJaneway(html: String, url: String): Boolean = {
    if (generatorContent(html).exists(_.toLowerCase.contains("janeway"))) return true
    val geoJsonAlternate = linkTag.findAllIn(html).exists { t =>
      attr(t, "rel").exists(r => Ws.split(r.toLowerCase).contains("alternate")) &&
        attr(t, "type").exists(_.toLowerCase.contains("geo+json"))
    }
    if (geoJsonAlternate) return true
    html.contains("/static/geometadata/") && url != null && url.contains("/article/id/")
  }

  /** First platform whose fingerprint matches, ladder order. */
  def detect(html: String, url: String): Option[String] =
    if (html == null) None
    else if (isOjs(html)) Some("OJS")
    else if (isJaneway(html, url)) Some("Janeway")
    else None
}
