package graft.providers

import scala.util.Try
import scala.util.matching.Regex

/** S7 remote providers — the OFFLINE face of the reference's 38-rung
  * content-provider dispatch ladder (reference: extent.py:67-113
  * `_get_content_providers` for the order, content_providers/providers.py:16-77
  * `find_provider` for the two-phase selection, and each provider's
  * `validate_provider`). The network half (doi.org resolution, API probes,
  * landing-page sniffs, downloads) cannot exist in this sandbox; the
  * reference itself defines what happens then — `get_url` falls back to the
  * raw DOI (providers.py:577-589) and probe failures make a rung pass —
  * so the OFFLINE dispatch is a well-defined total function. Its contract is
  * captured from the reference's own code running in this sandbox
  * (tools/capture_provider_goldens.py → tools/provider_goldens.json) and
  * locked by ProvidersSpec.
  *
  * Identifier recognition + record-id extraction here is what a 100 TB
  * link-corpus pass needs: a narrow, codegen-friendly classification of
  * billions of candidate identifiers into (provider, record) — the fetch
  * stage that follows is I/O-bound work a Spark job would hand to an async
  * sink, not this library.
  */
object Dispatch {

  final case class PMatch(provider: String, ids: Map[String, String])

  private final case class Rung(name: String, doiPrefixes: Seq[String],
                                validate: String => Option[PMatch])

  // ---- shared pieces (reference: helpfunctions.py:159-167) ----

  // idutils DOI pattern, unescaped inner dot preserved verbatim
  private val DoiRe: Regex =
    """(?i)^(?:doi:\s*|(?:https?://)?(?:dx\.)?doi\.org/)?(10\.\d+(?:.\d+)*/.+)$""".r

  private def rawDoi(ref: String): Option[String] =
    DoiRe.findFirstMatchIn(ref).map(_.group(1))

  /** `get_url` with the network down: DOI references collapse to the bare
    * DOI, links pass through (providers.py:571-590).
    */
  private def offlineUrl(ref: String): String = rawDoi(ref).getOrElse(ref)

  private val Uuid = "[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"
  private val UuidRe = s"(?i)$Uuid".r

  private def uri(s: String): Option[java.net.URI] = Try(new java.net.URI(s)).toOption
  private def hostOf(s: String): String =
    uri(s).flatMap(u => Option(u.getHost)).getOrElse("")
  private def pathOf(s: String): String =
    uri(s).flatMap(u => Option(u.getRawPath)).getOrElse("")
  private def fragmentOf(s: String): String =
    uri(s).flatMap(u => Option(u.getRawFragment)).getOrElse("")
  private def unquote(s: String): String =
    Try(java.net.URLDecoder.decode(s, "UTF-8")).getOrElse(s)
  private def lastSeg(url: String): String = {
    val c = url.reverse.dropWhile(_ == '/').reverse
    c.substring(c.lastIndexOf('/') + 1)
  }

  // compiled-pattern cache: the ladder probes dozens of regexes per
  // identifier, and `pattern.r` recompiled each one per call — a fixed,
  // small pattern set, so cache by source string (identical match behavior)
  private val reCache = new java.util.concurrent.ConcurrentHashMap[String, scala.util.matching.Regex]()
  private def re(pattern: String): scala.util.matching.Regex = {
    val cached = reCache.get(pattern)
    if (cached != null) cached
    else reCache.computeIfAbsent(pattern, _.r)
  }
  private def re1(pattern: String, s: String): Option[String] =
    re(pattern).findFirstMatchIn(s).map(_.group(1))
  private def matches(pattern: String, s: String): Boolean =
    re(pattern).findFirstMatchIn(s).isDefined

  // ---- per-provider offline validators, ladder order ----

  private val wikidata = Rung("Wikidata", Nil, ref =>
    re1("""(?i)^Q(\d+)$""", ref).orElse(re1("""(?i)^https?://(?:www\.)?wikidata\.org/(?:wiki|entity)/Q(\d+)$""", ref))
      .map(n => PMatch("Wikidata", Map("qid" -> s"Q$n"))))

  private val dryadHosts = Seq(
    "https://datadryad.org/stash/dataset/", "http://datadryad.org/stash/dataset/",
    "https://datadryad.org/dataset/", "http://datadryad.org/dataset/")
  private val dryad = Rung("Dryad", Seq("10.5061/dryad"), ref => {
    val url = offlineUrl(ref)
    dryadHosts.find(url.startsWith).flatMap { h =>
      val rem = url.drop(h.length)
      if (rem.isEmpty || rem.replace("/", "").isEmpty) None
      else if (rem.contains("doi:")) {
        val doiPart = rem.split("doi:").last.stripPrefix("/").stripSuffix("/")
        if (doiPart.length < 5) None
        else Some(PMatch("Dryad", Map("record_id" -> s"doi:$doiPart")))
      } else if (rem.startsWith("10.")) {
        if (rem.split("\\.").length < 2 || rem.length < 10) None
        else {
          val parts = url.split("/")
          Some(PMatch("Dryad", Map("record_id" -> s"${parts(parts.length - 2)}/${parts.last}")))
        }
      } else None
    }
  })

  private val fourTuHosts = Seq("https://data.4tu.nl/articles/", "https://data.4tu.nl/datasets/")
  private val fourTu = Rung("FourTU", Seq("10.4121/"), ref => {
    val url = offlineUrl(ref)
    if (!fourTuHosts.exists(url.startsWith)) None
    else re1(s"""/datasets/($Uuid)(?:/\\d+)?/?$$""", url)
      .orElse(re1("""/(\d+)(?:/\d+)?/?$""", url))
      .map(id => PMatch("FourTU", Map("record_id" -> id)))
  })

  private val figshareHosts = Seq("https://figshare.com/articles/",
    "http://figshare.com/articles/", "https://api.figshare.com/v2/articles/")
  private val figshare = Rung("Figshare", Seq("10.6084/m9.figshare"), ref => {
    val url = offlineUrl(ref)
    val pat = """/(\d+)(?:/\d+)?/?$"""
    if (figshareHosts.exists(url.startsWith)) re1(pat, url).map(id => PMatch("Figshare", Map("record_id" -> id)))
    else if (hostOf(url).endsWith("figshare.com")) re1(pat, url).map(id => PMatch("Figshare", Map("record_id" -> id)))
    else None
  })

  private val zenodoHosts = Seq("https://zenodo.org/records/",
    "https://zenodo.org/record/", "https://zenodo.org/api/records/")
  private val zenodo = Rung("Zenodo", Seq("10.5281/zenodo"), ref => {
    val url = offlineUrl(ref)
    if (zenodoHosts.exists(url.startsWith))
      Some(PMatch("Zenodo", Map("record_id" -> lastSeg(url))))
    else re1("""(?i)^https://zenodo\.org/record/(\d+)$""", ref)
      .map(id => PMatch("Zenodo", Map("record_id" -> id)))
  })

  /** InvenioRDM instance registry (reference: InvenioRDM.py:15-120),
    * insertion order preserved — Zenodo's own entry is matched by the Zenodo
    * rung first, like the reference ladder.
    */
  private val invenioInstances: Seq[(String, Seq[String], Seq[String])] = Seq(
    ("Zenodo", Seq("10.5281/zenodo"), Seq("https://zenodo.org/records/", "https://zenodo.org/record/", "https://zenodo.org/api/records/")),
    ("CaltechDATA", Seq("10.22002"), Seq("https://data.caltech.edu/records/")),
    ("TU Wien Research Data", Seq("10.48436"), Seq("https://researchdata.tuwien.ac.at/records/")),
    ("Frei-Data", Seq("10.60493"), Seq("https://freidata.uni-freiburg.de/records/")),
    ("GEO Knowledge Hub", Seq("10.60566"), Seq("https://gkhub.earthobservations.org/records/", "https://gkhub.earthobservations.org/packages/")),
    ("TU Graz Repository", Seq("10.3217"), Seq("https://repository.tugraz.at/records/")),
    ("Materials Cloud Archive", Seq("10.24435"), Seq("https://archive.materialscloud.org/records/")),
    ("FDAT", Seq("10.57754"), Seq("https://fdat.uni-tuebingen.de/records/")),
    ("DataPLANT ARChive", Seq("10.60534"), Seq("https://archive.nfdi4plants.org/records/")),
    ("KTH Data Repository", Seq("10.71775"), Seq("https://datarepository.kth.se/records/")),
    ("Prism", Seq("10.18131"), Seq("https://prism.northwestern.edu/records/")),
    ("NYU Ultraviolet", Seq("10.58153"), Seq("https://ultraviolet.library.nyu.edu/records/")),
    ("B2SHARE", Seq("10.23728/b2share"), Seq("https://b2share.eudat.eu/records/", "https://b2share.eudat.eu/doi/")))
  private val invenio = Rung("InvenioRDM",
    invenioInstances.flatMap(_._2).distinct.filterNot(_ == "10.5281/zenodo"), ref => {
      val url = offlineUrl(ref)
      invenioInstances.iterator.flatMap { case (name, _, hosts) =>
        hosts.find(url.startsWith).flatMap { _ =>
          val rid = lastSeg(url)
          if (matches("""^[a-z0-9][-a-z0-9.]*$""", rid))
            Some(PMatch("InvenioRDM", Map("record_id" -> rid, "instance" -> name)))
          else None
        }
      }.nextOption()
    })

  private val pangaeaHosts = Seq("https://doi.pangaea.de/", "http://doi.pangaea.de/",
    "https://pangaea.de/", "http://pangaea.de/")
  private val pangaea = Rung("Pangaea", Seq("10.1594/PANGAEA"), ref => {
    re1("""10\.1594/PANGAEA\.(\d+)""", ref)
      .map(id => PMatch("Pangaea", Map("dataset_id" -> id)))
      .orElse {
        val url = offlineUrl(ref)
        if (pangaeaHosts.exists(url.startsWith)) {
          val id = lastSeg(url)
          if (id.nonEmpty && id.forall(_.isDigit)) Some(PMatch("Pangaea", Map("dataset_id" -> id)))
          else None
        } else None
      }
  })

  private val osf = Rung("OSF", Seq("10.17605/OSF.IO"), ref => {
    def m(p: String): Option[String] = re1("(?i)" + p, ref).map(_.toLowerCase)
    m("""^https?://(?:dx\.)?doi\.org/10\.17605/OSF\.IO/([A-Z0-9]{5})/?(?:[?#].*)?$""")
      .orElse(m("""^https?://(?:www\.)?doi\.org/10\.17605/OSF\.IO/([A-Z0-9]{5})/?(?:[?#].*)?$"""))
      .orElse(m("""^10\.17605/OSF\.IO/([A-Z0-9]{5})$"""))
      .orElse(m("""^OSF\.IO/([A-Z0-9]{5})$"""))
      .orElse(m("""https?://osf\.io/([A-Z0-9]{5})/?(?:[?#].*)?$"""))
      .orElse(m("""^([A-Z0-9]{5})$"""))
      .map(id => PMatch("OSF", Map("project_id" -> id)))
  })

  private val dataverseKnownHosts = Seq("dataverse.harvard.edu", "dataverse.nl",
    "demo.dataverse.nl", "dataverse.unc.edu", "data.library.virginia.edu",
    "dataverse.no", "recherche.data.gouv.fr", "data.fdz.ioer.de",
    "heidata.uni-heidelberg.de", "edmond.mpg.de")
  private val dataverseDoiPats = Seq("""10\.7910/DVN/""", """10\.34894/""",
    """10\.18710/""", """10\.5064/""", """10\.71830/""", """10\.11588/DATA/""", """10\.17617/""")
  private val dataverse = Rung("Dataverse",
    Seq("10.7910/DVN", "10.34894/", "10.18710/", "10.5064/", "10.71830/", "10.11588/DATA", "10.17617/"), ref => {
      def isDvDoi(doi: String): Boolean = dataverseDoiPats.exists(p => matches(p, doi))
      def clean(pid0: String): String = {
        val pid = unquote(pid0)
        if (!pid.startsWith("doi:") && !pid.startsWith("hdl:") && !pid.startsWith("urn:") && pid.startsWith("10."))
          s"doi:$pid"
        else pid
      }
      re1("""^(?:doi:)?(10\..+)$""", ref).filter(isDvDoi)
        .map(doi => PMatch("Dataverse", Map("persistent_id" -> s"doi:$doi")))
        .orElse(re1("""^https?://(?:dx\.)?doi\.org/(.+)""", ref).filter(isDvDoi)
          .map(doi => PMatch("Dataverse", Map("persistent_id" -> s"doi:$doi"))))
        .orElse {
          val url = offlineUrl(ref)
          re("""https?://([^/]+)/dataset\.xhtml\?persistentId=(.+)""").findFirstMatchIn(url)
            .orElse(re("""https?://([^/]+)/api/datasets/:persistentId\?persistentId=(.+)""").findFirstMatchIn(url))
            .filter(m => dataverseKnownHosts.exists(_.equalsIgnoreCase(m.group(1))))
            .map(m => PMatch("Dataverse", Map("persistent_id" -> clean(m.group(2)))))
        }
    })

  private val gfzHosts = Seq("https://dataservices.gfz-potsdam.de",
    "http://dataservices.gfz-potsdam.de", "dataservices.gfz-potsdam.de")
  private val gfz = Rung("GFZ", Seq("10.5880/GFZ"), ref =>
    re("""10\.5880/GFZ\.\d+\.\d+\.\d+\.\d+""").findFirstIn(ref)
      .map(doi => PMatch("GFZ", Map("doi" -> doi)))
      .orElse {
        if (gfzHosts.exists(ref.contains))
          re1("""showshort\.php\?id=([^&]+)""", ref).map(id => PMatch("GFZ", Map("dataset_id" -> id)))
        else None
      })

  private val radarHosts = Seq("www.radar-service.eu", "radar-service.eu", "radar.kit.edu")
  private val radar = Rung("RADAR", Seq("10.35097/"), ref => {
    if (matches("""10\.35097/""", ref)) Some(PMatch("RADAR", Map.empty))
    else {
      val h = hostOf(ref)
      if (radarHosts.exists(x => h == x || h.endsWith("." + x)))
        re1("""/radar/(?:en|de)/dataset/([^/?#]+)""", ref)
          .orElse(re1("""/radar-backend/archives/([^/?#/]+)""", ref))
          .map(id => PMatch("RADAR", Map("record_id" -> id)))
          .orElse(Some(PMatch("RADAR", Map.empty)))
      else None
    }
  })

  private val arctic = Rung("ArcticDataCenter", Seq("10.18739/"), ref => {
    if (matches("""10\.18739/""", ref))
      Some(PMatch("ArcticDataCenter",
        re1("""(10\.18739/[^\s]+)""", ref).map(d => Map("dataset_id" -> s"doi:$d")).getOrElse(Map.empty)))
    else re("(?i)urn:uuid:").findFirstIn(ref).flatMap(_ => re(s"(?i)(urn:uuid:$Uuid)").findFirstIn(ref))
      .map(u => PMatch("ArcticDataCenter", Map("dataset_id" -> u)))
      .orElse {
        val h = hostOf(ref)
        if (h == "arcticdata.io" || h.endsWith(".arcticdata.io")) {
          val p = unquote(pathOf(ref))
          re1("""(doi:10\.18739/[^\s/]+)""", p)
            .orElse(re(s"(?i)(urn:uuid:$Uuid)").findFirstMatchIn(p).map(_.group(1)))
            .map(id => PMatch("ArcticDataCenter", Map("dataset_id" -> id)))
            .orElse(Some(PMatch("ArcticDataCenter", Map.empty)))
        } else None
      }
  })

  private val dataone = Rung("DataOne", Seq("10.5063/", "10.6085/"), ref => {
    re("""(10\.5063/[^\s]+|10\.6085/[^\s]+)""").findFirstIn(ref)
      .map(d => PMatch("DataOne", Map("dataset_id" -> s"doi:$d")))
      .orElse {
        val h = hostOf(ref).toLowerCase
        val p = unquote(pathOf(ref))
        val frag = unquote(fragmentOf(ref))
        if (h == "search.dataone.org" || h == "dataone.org") {
          Seq(p, frag).iterator.flatMap(seg => re1("""/view/(.+)""", seg)).nextOption()
            .orElse(re1("""/datasets/(.+)""", p))
            .map(pid => PMatch("DataOne", Map("dataset_id" -> pid.trim.stripSuffix("/"))))
        } else if (h == "cn.dataone.org")
          re1("""/(?:object|resolve)/(.+)""", p)
            .map(pid => PMatch("DataOne", Map("dataset_id" -> pid.trim.stripSuffix("/"))))
        else None
      }
  })

  private val gbifPrefixes = Seq("10.15468/", "10.15470/", "10.15472/", "10.25607/", "10.71819/", "10.82144/")
  private val gbif = Rung("GBIF", gbifPrefixes, ref => {
    if (gbifPrefixes.exists(ref.contains)) Some(PMatch("GBIF", Map.empty))
    else {
      val h = hostOf(ref)
      if (h == "gbif.org" || h == "www.gbif.org" || h == "api.gbif.org")
        Some(PMatch("GBIF",
          UuidRe.findFirstIn(pathOf(ref)).map(u => Map("dataset_key" -> u)).getOrElse(Map.empty)))
      else None
    }
  })

  private val pensoftHosts = Seq("bdj", "zookeys", "phytokeys", "neobiota")
    .flatMap(j => Seq(s"https://$j.pensoft.net/article/", s"http://$j.pensoft.net/article/"))
  private val pensoft = Rung("Pensoft", Nil, ref => {
    // the DOI path (10.3897/…) requires doi.org resolution — network-only
    val url = offlineUrl(ref)
    if (pensoftHosts.exists(url.startsWith))
      Some(PMatch("Pensoft", Map("article_id" -> lastSeg(url))))
    else None
  })

  private val bgrHosts = Seq("https://geoportal.bgr.de", "http://geoportal.bgr.de",
    "geoportal.bgr.de", "https://resource.bgr.de", "http://resource.bgr.de", "resource.bgr.de")
  private val bgr = Rung("BGR", Seq("10.25928/"), ref => {
    // BGR DOIs need resolution to the portal URL — network-only, rung fails offline
    if (matches("""(?i)^(?:https?://(?:dx\.)?doi\.org/)?10\.25928/[\w.\-_]+""", ref)) None
    else if (bgrHosts.exists(ref.contains)) {
      re1(s"(?i)#/datasets/portal/($Uuid)", ref)
        .orElse(re1("""[?&]Id=([^&]+)""", ref).filter(id => matches(s"(?i)^$Uuid$$", id)))
        .orElse(re1("""[?&]id=([^&]+)""", ref).filter(id => matches(s"(?i)^$Uuid$$", id)))
        .orElse {
          val tail = ref.stripSuffix("/").split("/").last.split("[?#]")(0)
          if (matches(s"(?i)^$Uuid$$", tail)) Some(tail) else None
        }
        .map(id => PMatch("BGR", Map("catalog_record_uuid" -> id)))
    } else None // bare UUID path probes the CSW endpoint — network-only
  })

  private val baw = Rung("BAW", Seq("10.48437/"), ref => {
    if (matches("""(?i)^(?:https?://(?:dx\.)?doi\.org/)?10\.48437/[\w.\-_]+""", ref)) None // DOI → CSW resolve
    else if (Seq("https://datenrepository.baw.de", "http://datenrepository.baw.de",
        "datenrepository.baw.de", "https://dl.datenrepository.baw.de", "dl.datenrepository.baw.de").exists(ref.contains))
      re1(s"(?i)docuuid=($Uuid)", ref).map(u => PMatch("BAW", Map("record_uuid" -> u)))
        .orElse(UuidRe.findFirstIn(ref).map(u => PMatch("BAW", Map("record_uuid" -> u))))
    else None
  })

  private val mdide = Rung("MDIDE", Nil, ref => {
    if (ref.contains("nokis.mdi-de-dienste.org"))
      re1(s"(?i)docuuid=($Uuid)", ref).orElse(UuidRe.findFirstIn(ref))
        .map(u => PMatch("MDIDE", Map("record_uuid" -> u)))
    else None // bare UUIDs probe the CSW — network-only
  })

  private val gdide = Rung("GDIDE", Nil, ref => {
    if (ref.contains("geoportal.de") || ref.contains("gdk.gdi-de.org"))
      UuidRe.findFirstIn(ref).map(u => PMatch("GDIDE", Map("record_uuid" -> u)))
    else None
  })

  private val opara = Rung("Opara", Seq("10.25532/OPARA"), ref => {
    // DOI forms resolve via the DSpace API — network-only, offline False
    re1(s"(?i)https?://opara\\.zih\\.tu-dresden\\.de/items/([a-f0-9-]{36})/?(?:[?#].*)?$$", ref)
      .map(u => PMatch("Opara", Map("item_uuid" -> u)))
  })

  private val senckenberg = Rung("Senckenberg", Seq("10.12761/sgn"), ref => {
    val url = offlineUrl(ref)
    val hosts = Seq("https://dataportal.senckenberg.de/dataset/", "http://dataportal.senckenberg.de/dataset/")
    if (hosts.exists(url.startsWith)) {
      var c = url.stripSuffix("/")
      if (c.endsWith(".jsonld")) c = c.dropRight(7)
      Some(PMatch("Senckenberg", Map("dataset_id" -> lastSeg(c))))
    } else None // the sgn DOI branch resolves via doi.org — network-only
  })

  private val ckanExcluded = Set("dataportal.senckenberg.de")
  private val ckanKnown = Set("geokur-dmp.geo.tu-dresden.de", "ckan.publishing.service.gov.uk",
    "ckan.govdata.de", "open.canada.ca", "data.gov.au", "catalog.data.gov", "data.gov.ie", "data.gov.sg")
  private val ckan = Rung("CKAN", Nil, ref => {
    val url = offlineUrl(ref)
    re("""https?://([^/]+)(?:/[^/]+)*/dataset/([^/?#]+)""").findFirstMatchIn(url).flatMap { m =>
      val h = m.group(1).toLowerCase
      if (ckanExcluded.contains(h)) None
      else if (ckanKnown.contains(h)) Some(PMatch("CKAN", Map("dataset_id" -> m.group(2))))
      else None // unknown hosts are probed via /api/3/action/status_show — network-only
    }
  })

  private val mendeley = Rung("MendeleyData", Seq("10.17632/"), ref => {
    val url = offlineUrl(ref)
    val hosts = Seq("https://data.mendeley.com/datasets/", "http://data.mendeley.com/datasets/")
    val hostMatch =
      if (hosts.exists(url.startsWith))
        re1("""(?i)data\.mendeley\.com/datasets/([a-z0-9]+)(?:/\d+)?""", url)
      else None
    hostMatch.orElse(re1("""(?i)10\.17632/([a-z0-9]+)(?:\.\d+)?""", ref))
      .map(id => PMatch("MendeleyData", Map("record_id" -> id)))
  })

  private val deims = Rung("DEIMSSDR", Nil, ref =>
    re1(s"https?://deims\\.org/(?:api/)?dataset[s]?/($Uuid)", ref).map(u => PMatch("DEIMSSDR", Map("resource_uuid" -> u)))
      .orElse(re1(s"https?://deims\\.org/(?:api/)?site[s]?/($Uuid)", ref).map(u => PMatch("DEIMSSDR", Map("resource_uuid" -> u))))
      .orElse(re1(s"https?://deims\\.org/($Uuid)$$", ref).map(u => PMatch("DEIMSSDR", Map("resource_uuid" -> u)))))

  private val nfdi4earth = Rung("NFDI4Earth", Nil, ref =>
    re1("""https?://onestop4all\.nfdi4earth\.de/result/([\w-]+)/?$""", ref)
      .map(s => PMatch("NFDI4Earth", Map("cordra_id" -> s"n4e/$s")))
      .orElse(re1("""(?i)https?://cordra\.knowledgehub\.(?:nfdi4earth\.de|test\.n4e\.geo\.tu-dresden\.de)/objects/(n4e/[\w-]+)/?$""", ref)
        .map(id => PMatch("NFDI4Earth", Map("cordra_id" -> id)))))

  private val halodb = Rung("HALODB", Nil, ref =>
    re1("""https?://halo-db\.pa\.op\.dlr\.de/dataset/(\d+)""", ref)
      .map(id => PMatch("HALODB", Map("dataset_id" -> id))))

  private val seanoe = Rung("SEANOE", Seq("10.17882/"), ref =>
    re1("""10\.17882/(\d+)""", ref).map(id => PMatch("SEANOE", Map("record_id" -> id)))
      .orElse {
        val url = offlineUrl(ref)
        Seq("https://www.seanoe.org/data/", "https://seanoe.org/data/").find(url.startsWith)
          .flatMap(h => re1("""(\d+)/?$""", url.drop(h.length)))
          .map(id => PMatch("SEANOE", Map("record_id" -> id)))
      })

  private val gsw = Rung("GeoScienceWorld", Nil, ref => {
    // host alone is not enough: the reference's _GSW_URL_RE requires an
    // article(-abstract) or georef/record path (GeoScienceWorld.py:34-37)
    val pat = """^https?://pubs\.geoscienceworld\.org/(?:georef/record/|[^/]+/(?:[^/]+/)?article(?:-abstract)?/)"""
    if (matches(pat, ref)) Some(PMatch("GeoScienceWorld", Map("article_url" -> ref)))
    else {
      val url = offlineUrl(ref)
      if (matches(pat, url)) Some(PMatch("GeoScienceWorld", Map("article_url" -> url))) else None
    }
  })

  // OJS + Janeway sniff the landing page's generator meta tag — network-only
  private val ojs = Rung("OJS", Nil, _ => None)
  private val janeway = Rung("Janeway", Nil, _ => None)

  private val ukceh = Rung("UKCEH", Seq("10.5285/"), ref => {
    if (matches("""10\.5285/""", ref))
      UuidRe.findFirstIn(ref).map(u => PMatch("UKCEH", Map("record_id" -> u.toLowerCase)))
    else {
      val url = offlineUrl(ref)
      if (url.startsWith("https://catalogue.ceh.ac.uk/documents/"))
        UuidRe.findFirstIn(url).map(u => PMatch("UKCEH", Map("record_id" -> u.toLowerCase)))
      else None
    }
  })

  private val stacHosts = Set("earth-search.aws.element84.com", "planetarycomputer.microsoft.com",
    "geoservice.dlr.de", "cmr.earthdata.nasa.gov", "stac.dataspace.copernicus.eu",
    "api.stac.worldpop.org", "gep-supersites-stac.terradue.com", "api.lantmateriet.se")
  private val stac = Rung("STAC", Nil, ref =>
    uri(ref).flatMap { u =>
      val scheme = Option(u.getScheme).getOrElse("")
      val h = Option(u.getHost).getOrElse("")
      if (scheme != "http" && scheme != "https" || h.isEmpty) None
      else {
        val p = Option(u.getPath).getOrElse("")
        def collId: String =
          re1("""/collections/([^/]+)(?:/|$)""", p)
            .getOrElse(p.split("/").filter(_.nonEmpty).lastOption.getOrElse("unknown"))
        if (stacHosts.contains(h) || matches("""/stac(?:/|$)""", p))
          Some(PMatch("STAC", Map("collection_id" -> collId)))
        else None // unknown hosts fetch the JSON for stac_version — network-only
      }
    })

  private val github = Rung("GitHub", Nil, ref =>
    // full mirror of _GITHUB_URL_RE (GitHub.py:26-38): owner AND repo
    // required (a bare profile URL like github.com/solo is not a repository),
    // optional .git suffix, optional /tree/ref[/path], trailing slash, END
    // ANCHORED and case-insensitive — /blob/, /issues/ and other extra path
    // shapes must NOT claim (they fall through like the reference's None)
    if (matches("""(?i)^https?://github\.com/[^/]+/[^/]+?(?:\.git)?(?:/tree/[^/]+(?:/.+)?)?/?$""", ref))
      Some(PMatch("GitHub", Map.empty))
    else None)

  private val knownGitlabHosts = Set("gitlab.com", "git.rwth-aachen.de", "zivgitlab.uni-muenster.de",
    "git.gfz-potsdam.de", "codebase.helmholtz.cloud", "gitlab.opencode.de",
    "gitlab-forge.din.developpement-durable.gouv.fr", "gitlab.ethz.ch", "git.wur.nl",
    "git.wageningenur.nl", "code.vt.edu", "gitlab.eumetsat.int", "gitlab.orfeo-toolbox.org",
    "gitlab.inria.fr", "gitlab.in2p3.fr", "gitlab.huma-num.fr", "forge.inrae.fr",
    "baltig.infn.it", "gitlab.cern.ch", "framagit.org", "salsa.debian.org")
  private def gitSegments(path: String, dropPat: String): Int = {
    val clean = path.stripPrefix("/").stripSuffix("/")
      .replaceAll("""\.git$""", "").replaceAll(dropPat, "")
    clean.split("/").count(_.nonEmpty)
  }
  private val gitlab = Rung("GitLab", Nil, ref =>
    uri(ref).flatMap { u =>
      val scheme = Option(u.getScheme).getOrElse("")
      val h = Option(u.getHost).getOrElse("")
      if (scheme != "http" && scheme != "https" || h.isEmpty || h == "github.com") None
      else if (!(knownGitlabHosts.contains(h) || h.toLowerCase.contains("gitlab"))) None
      else if (gitSegments(Option(u.getPath).getOrElse(""), """/-/.*$""") >= 2)
        Some(PMatch("GitLab", Map.empty))
      else None
    })

  private val knownForgejoHosts = Set("codeberg.org", "datahub.hcdc.hereon.de", "hub.datalad.org")
  private val forgejo = Rung("Forgejo", Nil, ref =>
    uri(ref).flatMap { u =>
      val scheme = Option(u.getScheme).getOrElse("")
      val h = Option(u.getHost).getOrElse("")
      if (scheme != "http" && scheme != "https" || h.isEmpty || h == "github.com") None
      else if (knownGitlabHosts.contains(h)) None
      else if (!(knownForgejoHosts.contains(h) || h.toLowerCase.contains("forgejo") || h.toLowerCase.contains("gitea"))) None
      else if (gitSegments(Option(u.getPath).getOrElse(""), """/tree/.*$""") >= 2)
        Some(PMatch("Forgejo", Map.empty))
      else None
    })

  private val swhid = """^swh:1:(cnt|dir|rev|rel|snp|ori):([0-9a-f]{40})((?:;[a-z_]+=\S+)*)$""".r
  private val swh = Rung("SoftwareHeritage", Nil, ref => {
    if (swhid.findFirstMatchIn(ref).isDefined) Some(PMatch("SoftwareHeritage", Map.empty))
    else re1("""^https?://archive\.softwareheritage\.org/(swh:1:\S+)$""", ref)
      .filter(inner => swhid.findFirstMatchIn(inner).isDefined)
      .map(_ => PMatch("SoftwareHeritage", Map.empty))
      .orElse(
        if (matches("""^https?://archive\.softwareheritage\.org/browse/origin/directory/\?""", ref) ||
            matches("""^https?://archive\.softwareheritage\.org/browse/directory/([0-9a-f]{40})/?$""", ref) ||
            matches("""^https?://archive\.softwareheritage\.org/browse/revision/([0-9a-f]{40})/?$""", ref))
          Some(PMatch("SoftwareHeritage", Map.empty))
        else None)
  })

  private val remoteRaster = Rung("RemoteRaster", Nil, ref =>
    if (matches("""(?i)^https?://.+\.(tif|tiff)(\?.*)?$""", ref))
      Some(PMatch("RemoteRaster", Map("url" -> ref)))
    else None)

  /** The ladder, reference order (extent.py:69-113). */
  private val ladder: Seq[Rung] = Seq(wikidata, dryad, fourTu, figshare, zenodo,
    invenio, pangaea, osf, dataverse, gfz, radar, arctic, dataone, gbif, pensoft,
    bgr, baw, mdide, gdide, opara, senckenberg, ckan, mendeley, deims, nfdi4earth,
    halodb, seanoe, gsw, ojs, janeway, ukceh, stac, github, gitlab, forgejo, swh,
    remoteRaster)

  /** Every rung name in ladder order — the coverage surface ProvidersSpec
    * asserts goldens against, so a new rung without goldens fails CI.
    */
  def rungNames: Seq[String] = ladder.map(_.name)

  /** Offline `find_provider`: DOI-prefix fast path (first prefix owner only,
    * providers.py:31-51), then full in-order validation. Rungs never throw;
    * an exception skips the rung like the reference's catch-and-continue.
    */
  def validateOffline(ref: String): Option[PMatch] = {
    if (ref == null) return None
    val prefixOwner = ladder.find(r => r.doiPrefixes.exists(ref.contains))
    for (r <- prefixOwner; m <- Try(r.validate(ref)).toOption.flatten) return Some(m)
    ladder.iterator.flatMap(r => Try(r.validate(ref)).toOption.flatten).nextOption()
  }

  /** Phase-1 view alone: which provider OWNS the identifier's DOI prefix
    * (providers.py:31-51), regardless of whether full validation needs the
    * network. Pure substring logic — the SQL-expressible dispatch used by
    * the q74 oracle.
    */
  def prefixOwner(ref: String): Option[String] =
    if (ref == null) None
    else ladder.find(r => r.doiPrefixes.exists(ref.contains)).map(_.name)
}
