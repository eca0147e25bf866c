package graft.parse

import org.scalatest.funsuite.AnyFunSuite

/** Invariants that keep the scaled gazetteer honest: the token-indexed text
  * scan is equivalent to the old per-name sweep ONLY while no entry name is a
  * word-boundary substring of another, no name collides with the synthetic
  * corpus vocabulary (or a new entry would silently change q01/q29 extraction
  * on planted texts), and ring geometry stays off the probe lattice.
  */
class GazetteerSpec extends AnyFunSuite {

  private val names = GazetteerTable.entries.map(_.name)

  test("no entry name is a word-boundary substring of another") {
    def wordBoundaryContains(hay: String, needle: String): Boolean = {
      var idx = hay.indexOf(needle)
      while (idx >= 0) {
        val before = if (idx == 0) ' ' else hay.charAt(idx - 1)
        val after = if (idx + needle.length >= hay.length) ' ' else hay.charAt(idx + needle.length)
        if (!before.isLetter && !after.isLetter) return true
        idx = hay.indexOf(needle, idx + 1)
      }
      false
    }
    for (a <- names; b <- names if a != b)
      assert(!wordBoundaryContains(b, a), s"'$a' is a word-boundary substring of '$b'")
  }

  test("no entry name collides with corpus vocabulary (months, periods, payload tokens)") {
    val months = Seq("January", "February", "March", "April", "May", "June", "July",
      "August", "September", "October", "November", "December")
    val payloadWords = Seq("Survey", "Deposits", "Contact", "CHANGED")
    val periodSurfaces = PeriodTable.byFirstToken.values.flatten.toSet
    for (n <- names) {
      assert(!months.contains(n), s"month collision: $n")
      assert(!payloadWords.contains(n), s"payload-token collision: $n")
      assert(!periodSurfaces.contains(n), s"period-surface collision: $n")
      for (tok <- n.split(" "))
        assert(!months.contains(tok), s"month token inside name: $n")
    }
  }

  test("coordinates valid; rings closed rectangles with corners OFF the 1/128 probe lattice") {
    for (en <- GazetteerTable.entries; (lat, lon) <- en.hits) {
      assert(lat >= -90 && lat <= 90 && lon >= -180 && lon <= 180, s"bad coords: ${en.name}")
    }
    for (en <- GazetteerTable.regions) {
      val r = en.ring.get
      assert(r.length === 10, s"${en.name}: not a closed rect ring")
      assert(r(0) === r(8) && r(1) === r(9), s"${en.name}: ring not closed")
      assert(r(4) > r(0) && r(5) > r(1), s"${en.name}: degenerate rect")
      // corner * 128 must be non-integral so no 1/128-lattice probe can sit
      // exactly on an edge (the PIP edge rule never decides a result)
      for (v <- Seq(r(0), r(1), r(4), r(5)))
        assert((v * 128) % 1 != 0.0, s"${en.name}: ring corner $v on the probe lattice")
    }
  }

  test("token-indexed scan: multi-word names, region names, and planted texts") {
    val r1 = TextGeo.extract("Flights from New York to Rio de Janeiro and Addis Ababa.")
    assert(r1.places.map(_.value) === Seq("New York", "Rio de Janeiro", "Addis Ababa"))
    assert(r1.places.head.charStart === 13)
    // region entry matches like any other name
    val r2 = TextGeo.extract("A survey across Westphalia and Bavaria was conducted.")
    assert(r2.places.map(_.value) === Seq("Westphalia", "Bavaria"))
    // new ambiguous names resolve only under "top"
    val drop = TextGeo.extract("Meeting in Valencia next week.")
    assert(drop.places.map(_.value) === Seq("Valencia") && drop.points.isEmpty)
    val top = TextGeo.extract("Meeting in Valencia next week.", "top")
    assert(top.points === Seq((-0.375, 39.5)))
    // the planted page texts still yield exactly the planted mention
    for (d <- Seq(8L, 18L, 28L, 38L, 48L, 88L, 108L)) {
      val txt = graft.table.PayloadSpec.text(d * 10 + 8)
      val places = TextGeo.extract(txt).places.map(_.value)
      assert(places === Seq(graft.table.PayloadSpec.place(d * 10 + 8)),
        s"planted text for d=${d * 10 + 8} now extracts $places")
    }
  }

  test("PIP region hit beats nearest point entry (q50 rule) and ray-cast agrees with the rect") {
    import graft.geo.Geo
    val wf = GazetteerTable.regions.find(_.name == "Westphalia").get.ring.get
    assert(Geo.pointInRing(7.5, 51.5, wf)) // hot-cell anchor is inside Westphalia
    assert(!Geo.pointInRing(10.0, 51.5, wf))
    // strict-inequality rectangle check mirrors ray-cast for every corner combo
    val rnd = new scala.util.Random(7L)
    for (_ <- 0 until 200) {
      val lon = (rnd.nextInt(5121) - 2560) / 128.0 * 0.5 + 7.0 // 1/128-ish lattice near the ring
      val lat = (rnd.nextInt(2561) - 1280) / 128.0 * 0.5 + 51.0
      val inRect = lon > wf(0) && lon < wf(4) && lat > wf(1) && lat < wf(5)
      assert(Geo.pointInRing(lon, lat, wf) === inRect, s"PIP mismatch at ($lon,$lat)")
    }
  }
}
