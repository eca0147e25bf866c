package graft.providers

import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Locks Dispatch.validateOffline to the reference's own offline behavior:
  * tools/provider_goldens.json is produced by running the reference's
  * `find_provider` ladder in this sandbox (tools/capture_provider_goldens.py,
  * network absent), so every (identifier → provider + ids) row below is the
  * reference deciding, not this repo.
  */
class ProvidersSpec extends AnyFunSuite {

  private val goldenPath = java.nio.file.Paths.get("tools/provider_goldens.json")

  private lazy val goldens: Map[String, Option[Map[String, String]]] = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(java.nio.file.Files.readAllBytes(goldenPath))
    root.properties().asScala.map { e =>
      val k = e.getKey
      val v = e.getValue
      if (v.isNull) k -> None
      else k -> Some(v.properties().asScala.map(f => f.getKey -> f.getValue.asText()).toMap)
    }.toMap
  }

  test("offline dispatch matches the reference's own offline find_provider on all goldens") {
    assume(java.nio.file.Files.exists(goldenPath), "goldens absent")
    assert(goldens.size > 100, s"suspiciously few goldens: ${goldens.size}")
    assert(!goldens.values.exists(_.exists(_.contains("error"))), "reference capture had errors")
    var checked = 0
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((ref, expected) <- goldens.toSeq.sortBy(_._1)) {
      val got = Dispatch.validateOffline(ref)
      expected match {
        case None =>
          if (got.isDefined) failures += s"'$ref': expected None, got $got"
        case Some(exp) =>
          val expProvider = exp("provider")
          got match {
            case None => failures += s"'$ref': expected $expProvider, got None"
            case Some(m) =>
              if (m.provider != expProvider)
                failures += s"'$ref': expected $expProvider, got ${m.provider}"
              else {
                // every id this impl extracts must agree with the reference's
                val expIds = exp - "provider" - "instance"
                for ((k, v) <- m.ids if k != "instance") {
                  if (expIds.get(k).exists(_ != v))
                    failures += s"'$ref': id $k='$v' but reference extracted '${expIds(k)}'"
                }
                // and when the reference extracted ids, so must this impl
                if (expIds.nonEmpty && (m.ids - "instance").isEmpty)
                  failures += s"'$ref': reference extracted $expIds, impl extracted none"
                // InvenioRDM instance attribution must agree when captured
                for (inst <- exp.get("instance"); mine <- m.ids.get("instance"); if inst != mine)
                  failures += s"'$ref': instance '$mine' vs reference '$inst'"
              }
          }
      }
      checked += 1
    }
    assert(failures.isEmpty, s"${failures.size}/$checked mismatches:\n${failures.mkString("\n")}")
  }

  /** Per-rung coverage table: every ladder rung gets ≥1 golden the rung
    * ACCEPTS and ≥1 in-family golden it must NOT claim (a rejection, a
    * DOI-form that is offline-None because it needs doi.org, or a
    * neighboring host another rung owns). OJS/Janeway are network-only —
    * their landing-page sniff cannot run offline, so their entire offline
    * contract is locked as None over well-formed journal URLs.
    */
  private val networkOnly = Set("OJS", "Janeway")
  private val rungCoverage: Map[String, (Seq[String], Seq[String])] = Map(
    "Wikidata" -> (Seq("Q26080", "q64", "https://www.wikidata.org/wiki/Q60786916") ->
      Seq("not an identifier at all")),
    "Dryad" -> (Seq("https://datadryad.org/dataset/doi:10.5061/dryad.0k6djhb7x",
      "https://datadryad.org/stash/dataset/10.5061/dryad.fqz612jw3") ->
      Seq("https://datadryad.org/dataset/", "10.5061/dryad.0k6djhb7x")),
    "FourTU" -> (Seq("https://data.4tu.nl/datasets/3035126d-ee51-4dbd-a187-5f6b0be85e9f/1") ->
      Seq("10.4121/19361018.v2")),
    "Figshare" -> (Seq("https://figshare.com/articles/dataset/x/1138736",
      "https://api.figshare.com/v2/articles/19248626") -> Seq("10.6084/m9.figshare.12345678")),
    "Zenodo" -> (Seq("https://zenodo.org/records/4593540", "https://zenodo.org/record/820562") ->
      Seq("10.5281/zenodo.4593540", "10.5281/zenodo.")),
    "InvenioRDM" -> (Seq("https://archive.materialscloud.org/records/2022.126",
      "https://data.caltech.edu/records/zd221-sqw79") ->
      Seq("10.22002/D1.1705", "10.48436/jpzv9-c8w75")),
    "Pangaea" -> (Seq("10.1594/PANGAEA.734969", "DOI: 10.1594/PANGAEA.150150") ->
      Seq("10.1594/PANGAEA.abc", "10.1594/INVALID.123")),
    "OSF" -> (Seq("OSF.IO/9JG2U", "https://osf.io/4xe6z", "ab3x9") ->
      Seq("https://accounts.osf.io/4xe6z", "doi:10.17605/osf.io/gfwhj")),
    "Dataverse" -> (Seq("10.7910/DVN/OMV93V", "10.34894/EXAMPLE1") ->
      Seq("https://dataverse.harvard.edu/dataset.xhtml")),
    "GFZ" -> (Seq("10.5880/GFZ.2.1.2020.001") -> Seq("10.5880/WRONG.2.1.2020.001")),
    "RADAR" -> (Seq("10.35097/600", "https://www.radar-service.eu/radar/en/search") ->
      Seq("https://arcticdata.io/about")),
    "ArcticDataCenter" -> (Seq("10.18739/A2KW57K57", "https://arcticdata.io/about") ->
      Seq("https://search.dataone.org/view/")),
    "DataOne" -> (Seq("10.5063/F1Z60M87", "10.6085/AA/PISCO_kelpforest.1.11") ->
      Seq("https://search.dataone.org/view/")),
    "GBIF" -> (Seq("10.15468/6bleia", "10.15472/lavgys", "https://www.gbif.org/occurrence/123") ->
      Seq("10.3897/BDJ.2.e1068")),
    "Pensoft" -> (Seq("https://bdj.pensoft.net/article/1068/") -> Seq("10.3897/BDJ.2.e1068")),
    "BGR" -> (Seq("http://geoportal.bgr.de/mapapps/resources/apps/geoportal/index.html?id=d764e73b-27e4-4aaa-b187-b6141c115eb4") ->
      Seq("10.25928/MEDKAM.1", "10.25929/HK1000")),
    "BAW" -> (Seq("https://datenrepository.baw.de/trefferanzeige?docuuid=c394f0fc-4b29-4fea-b073-2e00d3ec301a") ->
      Seq("10.48437/02.2023.K.0601.0001")),
    "MDIDE" -> (Seq("https://nokis.mdi-de-dienste.org/trefferanzeige?docuuid=b4a37fc6-87ea-4dd7-b02b-639a4faa9357") ->
      Seq("https://nokis.mdi-de-dienste.org/trefferanzeige?docuuid=")),
    "GDIDE" -> (Seq("https://www.geoportal.de/Metadata/b4a37fc6-87ea-4dd7-b02b-639a4faa9357",
      "https://gdk.gdi-de.org/gdi-de/srv/ger/catalog.search#/metadata/b4a37fc6-87ea-4dd7-b02b-639a4faa9357") ->
      Seq("https://www.geoportal.de/Metadata/")),
    "Opara" -> (Seq("https://opara.zih.tu-dresden.de/items/55a59955-12ed-4426-b5da-9495c12e64e9") ->
      Seq("10.25532/OPARA-581", "10.25532/INVALID-123")),
    "Senckenberg" -> (Seq("https://dataportal.senckenberg.de/dataset/lutra-lutra-collection") ->
      Seq("10.12761/sgn.2018.10225")),
    "CKAN" -> (Seq("https://ckan.govdata.de/dataset/some-dataset-id",
      "https://open.canada.ca/data/en/dataset/4cedd37e-0023-41fe-8eff-bea45385e469") ->
      Seq("https://unknownckan.example.org/dataset/foo")),
    "MendeleyData" -> (Seq("10.17632/ybx6zp2rfp.1", "https://data.mendeley.com/datasets/ybx6zp2rfp/1") ->
      Seq("https://data.mendeley.com/datasets/")),
    "DEIMSSDR" -> (Seq("https://deims.org/dataset/75a7f938-7c77-11e3-8832-005056ab003f",
      "https://deims.org/api/sites/deae80cc-10e6-4058-a45a-8ff9ee70b482") ->
      Seq("https://deims.org/about")),
    "NFDI4Earth" -> (Seq("https://onestop4all.nfdi4earth.de/result/D1032881050-SCIOPS") ->
      Seq("https://onestop4all.nfdi4earth.de/search?q=x")),
    "HALODB" -> (Seq("https://halo-db.pa.op.dlr.de/dataset/8951") ->
      Seq("https://halo-db.pa.op.dlr.de/")),
    "SEANOE" -> (Seq("10.17882/103743", "https://www.seanoe.org/data/00907/101837/") ->
      Seq("https://www.seanoe.org/home")),
    "GeoScienceWorld" -> (Seq("https://pubs.geoscienceworld.org/gsa/geology/article/46/3/203/526701") ->
      Seq("https://pubs.geoscienceworld.org/")),
    "OJS" -> (Seq.empty[String] ->
      Seq("https://revistas.ucm.es/index.php/FITE/article/view/61027",
        "https://journals.sfu.ca/index.php/abc/article/view/99")),
    "Janeway" -> (Seq.empty[String] ->
      Seq("https://journal.example.org/article/id/123/",
        "https://openlibhums.org/article/id/4577/")),
    "UKCEH" -> (Seq("10.5285/02977a5d-00a0-44f8-baee-d2e0eecb5df0",
      "https://catalogue.ceh.ac.uk/documents/02977a5d-00a0-44f8-baee-d2e0eecb5df0") ->
      Seq("10.5285/not-a-uuid")),
    "STAC" -> (Seq("https://planetarycomputer.microsoft.com/api/stac/v1/collections/landsat-c2-l2",
      "https://api.stac.worldpop.org/collections/CHE", "https://example.com/stac/collections/foo") ->
      Seq("https://example.com/collections")),
    "GitHub" -> (Seq("https://github.com/nuest/geoextent", "https://github.com/user/repo/tree/main/data",
      "https://github.com/user/repo.git", "https://GitHub.com/User/Repo/") ->
      Seq("https://github.com/solo", "https://github.com/o/r/blob/main/x",
        "https://github.com/o/r/issues/5")),
    "GitLab" -> (Seq("https://gitlab.com/user/project", "https://git.rwth-aachen.de/group/proj",
      "https://myhost-gitlab.example.org/grp/proj") -> Seq("https://gitlab.com/solo")),
    "Forgejo" -> (Seq("https://codeberg.org/user/repo") ->
      Seq("https://codeberg.org/solo", "https://bitbucket.org/user/repo")),
    "SoftwareHeritage" -> (Seq("swh:1:dir:94a9ed024d3859793618152ea559a168bbcbb5e2",
      "https://archive.softwareheritage.org/swh:1:dir:94a9ed024d3859793618152ea559a168bbcbb5e2") ->
      Seq("swh:1:dir:zzz")),
    "RemoteRaster" -> (Seq("https://example.com/dem/tile_12.tif", "https://example.com/DEM.TIF") ->
      Seq("https://example.com/photo.png")),
  )

  test("per-rung golden coverage: every ladder rung has accepting and rejecting goldens") {
    assume(java.nio.file.Files.exists(goldenPath), "goldens absent")
    val uncovered = Dispatch.rungNames.filterNot(rungCoverage.contains)
    assert(uncovered.isEmpty, s"ladder rungs without golden coverage: $uncovered")
    assert(rungCoverage.keySet === Dispatch.rungNames.toSet, "coverage names a rung the ladder lost")
    for ((rung, (pos, neg)) <- rungCoverage.toSeq.sortBy(_._1)) {
      if (networkOnly(rung)) {
        assert(pos.isEmpty, s"$rung is network-only; a positive golden is impossible offline")
        // the well-formed journal URLs must be locked to None BY THE
        // REFERENCE (not merely unmapped) and rejected by this impl too
        for (n <- neg) {
          assert(goldens.contains(n), s"$rung: '$n' not captured")
          assert(goldens(n).isEmpty, s"$rung: reference matched '$n' offline — not network-only?")
          assert(Dispatch.validateOffline(n).isEmpty, s"$rung: impl matched '$n'")
        }
      } else {
        assert(pos.nonEmpty, s"$rung has no accepting golden")
        for (p <- pos) {
          assert(goldens.contains(p), s"$rung: '$p' not captured")
          assert(goldens(p).exists(_("provider") == rung),
            s"$rung: golden for '$p' is ${goldens(p).map(_("provider"))}, not $rung")
        }
      }
      assert(neg.nonEmpty, s"$rung has no rejecting golden")
      for (n <- neg) {
        assert(goldens.contains(n), s"$rung: negative '$n' not captured")
        assert(!goldens(n).exists(_("provider") == rung),
          s"$rung: negative '$n' actually matches $rung")
      }
    }
  }

  test("prefix dispatch: DOI prefixes route to their ladder owner") {
    assert(Dispatch.prefixOwner("10.5281/zenodo.123") === Some("Zenodo"))
    assert(Dispatch.prefixOwner("10.5061/dryad.abc123") === Some("Dryad"))
    assert(Dispatch.prefixOwner("10.1594/PANGAEA.999") === Some("Pangaea"))
    assert(Dispatch.prefixOwner("10.6084/m9.figshare.1") === Some("Figshare"))
    assert(Dispatch.prefixOwner("10.17605/OSF.IO/ABCDE") === Some("OSF"))
    assert(Dispatch.prefixOwner("10.15468/xyz") === Some("GBIF"))
    assert(Dispatch.prefixOwner("10.17882/42") === Some("SEANOE"))
    assert(Dispatch.prefixOwner("10.9999/unknown") === None)
  }
}
