package graft.parse

import org.scalatest.funsuite.AnyFunSuite

/** Goldens for the landing-page ladder against the reference's own
  * checked-in journal-platform HTML fixtures (tests/testdata/journals/),
  * expectations from tests/test_api_journals_ojs.py:82-155 and
  * tests/test_api_journals_janeway.py:67-98 — real captured pages, not
  * synthesized markup.
  */
class JournalFixturesSpec extends AnyFunSuite {

  private val dir = "/root/reference/tests/testdata/journals"
  private def fixture(name: String): String = {
    val p = java.nio.file.Paths.get(dir, name)
    assume(java.nio.file.Files.exists(p), s"$name absent")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }
  private val tol = 0.01

  test("ojs_polygon.html: JSON-LD polygon over Hanover wins, publication date is not a tbox") {
    val r = HtmlMeta.extract(fixture("ojs_polygon.html"))
    val e = r.extent.get
    assert(math.abs(e.minLon - 9.5) < tol && math.abs(e.minLat - 52.2) < tol)
    assert(math.abs(e.maxLon - 10.0) < tol && math.abs(e.maxLat - 52.6) < tol)
    assert(r.spatialSource === Some("jsonld"))
    assert(r.tbox.isEmpty && r.temporalSource.isEmpty)
  }

  test("ojs_dc_temporal.html: DC temporal range + Brandenburg polygon") {
    val r = HtmlMeta.extract(fixture("ojs_dc_temporal.html"))
    assert(r.tbox === Some(("2008-01-01", "2018-12-31")))
    assert(Set("dc.temporal", "dc.periodoftime").contains(r.temporalSource.get))
    val e = r.extent.get
    assert(math.abs(e.minLon - 11.27) < tol && math.abs(e.minLat - 51.36) < tol)
    assert(math.abs(e.maxLon - 14.77) < tol && math.abs(e.maxLat - 53.56) < tol)
  }

  test("ojs_admin_only.html: empty features + 'not available' admin bbox yield nothing") {
    val r = HtmlMeta.extract(fixture("ojs_admin_only.html"))
    assert(r.extent.isEmpty, s"expected no extent, got ${r.extent}")
    assert(r.tbox.isEmpty)
  }

  test("platform sniff on the captured pages: OJS generator tag, Janeway fingerprints") {
    import graft.providers.JournalPlatform
    assert(JournalPlatform.detect(fixture("ojs_polygon.html"), "https://example.org/article/view/44") === Some("OJS"))
    assert(JournalPlatform.detect(fixture("ojs_dc_temporal.html"), "") === Some("OJS"))
    assert(JournalPlatform.detect(fixture("ojs_admin_only.html"), "") === Some("OJS"))
    assert(JournalPlatform.detect(fixture("janeway_full.html"),
      "http://localhost:8000/dqj/article/id/53/") === Some("Janeway"))
    assert(JournalPlatform.detect("<html><head></head></html>", "https://x.org/article/id/1/") === None)
    // Janeway-shaped URL without the plugin's assets must decline (janeway.py doc)
    assert(JournalPlatform.detect("<html><body>plain</body></html>", "https://x.org/article/id/9/") === None)
  }

  test("janeway_full.html: Indochina polygon from a polygon-carrying source") {
    val r = HtmlMeta.extract(fixture("janeway_full.html"))
    val e = r.extent.get
    assert(math.abs(e.minLon - 100.1) < tol && math.abs(e.minLat - 13.9) < tol)
    assert(math.abs(e.maxLon - 107.7) < tol && math.abs(e.maxLat - 22.5) < tol)
    assert(Set("jsonld", "dc.spatialcoverage:geojson", "dc.spatialcoverage:wkt", "iso19139")
      .contains(r.spatialSource.get), r.spatialSource)
    assert(r.tbox.isEmpty)
  }
}
