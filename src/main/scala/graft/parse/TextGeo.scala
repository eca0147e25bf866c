package graft.parse

import graft.geo.{Extent, Geo, SignedIso}

import scala.collection.mutable.ArrayBuffer

/** Text handler: deterministic replacement for the reference's spaCy-NER +
  * online-gazetteer path (SURVEY §2 P7/P13).
  *
  * Place names are matched against a bundled offline gazetteer (broadcast-map
  * analog of the Nominatim forward-geocode at reference:
  * geoextent/lib/gazetteer.py:219-250); spatial extent is the envelope over hit
  * points (reference: geoextent/lib/handle_text.py:129-135,165-186). Date/period
  * phrases reproduce parse_date_entity semantics (reference:
  * geoextent/lib/text_extraction/dates.py:33-181): explicit dates, year →
  * whole-year envelope, decade "1990s", century "19th century", ranges
  * "between X and Y", and named geological periods from the bundled ICS GTS2020
  * gazetteer with signed-ISO deep time (reference:
  * geoextent/lib/period_gazetteer.py:43-79, data periods.json).
  *
  * Text is NFC-normalised for matching only; the stored `text` column passes
  * through byte-identical (reference: geoextent/lib/handle_text.py:333-335;
  * SURVEY §7 known-hard #3).
  */
object TextGeo {

  final case class Span(value: String, charStart: Int, charEnd: Int)
  final case class TextResult(extent: Option[Extent], tbox: Option[(String, String)],
                              places: Seq[Span], dates: Seq[Span], periods: Seq[Span],
                              points: Seq[(Double, Double)])

  /** Offline gazetteer: place name → ranked candidate (lat, lon) hits.
    * Deterministic stand-in for the reference's Nominatim lookups (limit-5
    * candidate lists, reference: gazetteer.py:594-650); coordinates are exact
    * binary fractions so downstream golden values are float-stable. Names with
    * several candidates exercise the drop/top ambiguity strategies. The
    * bundled table ([[GazetteerTable]]) carries ~300 entries plus region
    * boundary rings for the reverse-geocode path.
    */
  val gazetteer: Map[String, Seq[(Double, Double)]] = GazetteerTable.byName

  /** Ambiguity strategy (reference: gazetteer.py:606-607 + handle_text.py
    * ner_ambiguity default "drop"): a mention with >1 candidate hit is skipped
    * under "drop" and takes the top-ranked hit under "top".
    */
  def resolvePlace(name: String, ambiguity: String): Option[(Double, Double)] =
    gazetteer.get(name).flatMap { hits =>
      if (hits.length == 1) Some(hits.head)
      else if (ambiguity == "top") hits.headOption
      else None
    }

  /** Bundled geological-period gazetteer: the FULL ICS GTS2020 chart (178
    * periods/epochs/ages + aliases) in [[PeriodTable]] — the same public
    * chronostratigraphic data the reference ships in
    * geoextent/lib/data/periods.json; signed-ISO deep time, year 1950 =
    * "present" datum.
    */
  val periods: Map[String, (String, String)] = PeriodTable.envelope

  private val monthNames = Seq("January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December")
  private val monthNum: Map[String, Int] =
    monthNames.zipWithIndex.map { case (m, i) => m.toLowerCase -> (i + 1) }.toMap
  private val MonthAlt = monthNames.mkString("|")

  // gazetteer token scan — object-level like every other pattern here, so
  // the q01 hot path never recompiles it per document
  private val placeToken = "[A-Za-z]+".r

  private val isoDate = "\\b(\\d{4})-(\\d{2})-(\\d{2})\\b".r
  private val betweenRange = "(?i)between\\s+(\\d{4})\\s+and\\s+(\\d{4})".r
  // "January to March 2024" — left month inherits the right side's year
  // (reference dates.py:163-175 year-context inheritance)
  private val monthRange =
    s"(?i)\\b($MonthAlt)\\s+(?:to|and|until|through)\\s+($MonthAlt)\\s+(\\d{4})\\b".r
  // "1820–1850" / "1820—1850" / "1820 - 1850" year ranges
  // (reference range connectors dates.py:33-46)
  private val yearRangeDash = "\\b(\\d{4})\\s*[-–—]\\s*(\\d{4})\\b".r
  // "March 5, 2024" and "5 March 2024" month-name calendar dates
  private val monthDayYear = s"(?i)\\b($MonthAlt)\\s+(\\d{1,2}),?\\s+(\\d{4})\\b".r
  private val dayMonthYear = s"(?i)\\b(\\d{1,2})\\s+($MonthAlt)\\s+(\\d{4})\\b".r
  // "March 2024" month precision → whole-month envelope (dates.py:117-127)
  private val monthYear = s"(?i)\\b($MonthAlt)\\s+(\\d{4})\\b".r
  private val decade = "\\b(\\d{3})0s\\b".r
  private val century = "(?i)\\b(\\d{1,2})(?:st|nd|rd|th)\\s+century\\b".r
  private val bareYear = "\\b(\\d{3,4})\\b".r

  private def lastDay(year: Int, month: Int): Int =
    java.time.YearMonth.of(year, month).lengthOfMonth()
  private def monthEnvelope(year: Int, month: Int): (String, String) =
    (f"$year%04d-$month%02d-01", f"$year%04d-$month%02d-${lastDay(year, month)}%02d")

  def looksLikeText(s: String): Boolean = !s.trim.startsWith("<") && !s.trim.startsWith("{")

  /** One-pass case-insensitive month-name presence gate (gate use only:
    * regionMatches(true) folds a SUPERSET of the regexes' ASCII-only (?i), so
    * a gate pass never skips a text the regex would have matched). A single
    * scan keyed on month first letters replaces 12 separate substring scans.
    */
  private val monthsByFirst: Map[Char, Seq[String]] = Seq("January", "February",
    "March", "April", "May", "June", "July", "August", "September", "October",
    "November", "December").groupBy(m => Character.toLowerCase(m.charAt(0)))
  private def containsMonthName(text: String): Boolean = {
    var i = 0
    while (i < text.length) {
      val c = Character.toLowerCase(text.charAt(i))
      if (c == 'j' || c == 'f' || c == 'm' || c == 'a' || c == 's' ||
          c == 'o' || c == 'n' || c == 'd') {
        val cands = monthsByFirst.getOrElse(c, Nil)
        var k = 0
        while (k < cands.length) {
          val m = cands(k)
          if (text.regionMatches(true, i, m, 0, m.length)) return true
          k += 1
        }
      }
      i += 1
    }
    false
  }

  def extract(raw: String): TextResult = extract(raw, "drop")

  def extract(raw: String, ambiguity: String): TextResult = {
    // NFC normalisation internal to matching; offsets refer to the normalised view
    val text = java.text.Normalizer.normalize(
      if (raw.nonEmpty && raw.charAt(0) == '﻿') raw.substring(1) else raw,
      java.text.Normalizer.Form.NFC)

    // places: every gazetteer-name mention at word boundaries is a provenance
    // span; only mentions that RESOLVE (unambiguous, or top-ranked under
    // "top") contribute points. One token-indexed pass (the same PhraseMatcher
    // shape as the period scan below): each letter-run does a single hash
    // lookup into GazetteerTable.byFirstToken, then full surfaces (longest
    // first) verify in place — O(tokens) regardless of table size, where the
    // old per-name indexOf sweep was O(names × length) and priced a
    // 300-entry gazetteer into the q01 hot path. Equivalent by construction:
    // a token start has a non-letter before it, the after-check matches the
    // old loop, and no entry name is a word-boundary substring of another
    // (GazetteerSpec invariant), so per-position matches are unique.
    val places = ArrayBuffer.empty[Span]
    val points = ArrayBuffer.empty[(Double, Double)]
    val pts = ArrayBuffer.empty[Double]
    val periodSpans = ArrayBuffer.empty[Span]
    var tStart: String = null
    var tEnd: String = null
    def fold(s: String, e: String): Unit = {
      tStart = SignedIso.min(tStart, s)
      tEnd = SignedIso.max(tEnd, e)
    }
    // ONE shared token pass feeds both the gazetteer and the period
    // PhraseMatcher (they consumed identical "[A-Za-z]+" token streams in two
    // separate regex scans before; the lookups are independent, so fusing the
    // scans is result-invariant and halves the token-iteration cost of the
    // q01 hot path).
    for (m <- placeToken.findAllMatchIn(text)) {
      val start = m.start
      val tok = m.matched
      // places: the regex class is ASCII, so a run can start right after a
      // non-ASCII LETTER ("caféParis") — the old sweep's Unicode
      // word-boundary check must be re-applied on the preceding char
      if (start == 0 || !text.charAt(start - 1).isLetter)
        for (surfaces <- GazetteerTable.byFirstToken.get(tok)) {
          surfaces.find { name =>
            text.regionMatches(start, name, 0, name.length) &&
              (start + name.length >= text.length || !text.charAt(start + name.length).isLetter)
          }.foreach { name =>
            places += Span(name, start, start + name.length)
            resolvePlace(name, ambiguity).foreach { case (lat, lon) =>
              points += ((lon, lat))
              pts += lon; pts += lat
            }
          }
        }
      // periods: one token-indexed pass against the full ICS table — each
      // word token does a single hash lookup, then candidate surfaces
      // (longest first) are verified in place; the PhraseMatcher analog of
      // reference ner.py:110-141 without 178 indexOf passes per page.
      // Span.value is the canonical period name; offsets cover the matched
      // surface (incl. aliases like "Late Cretaceous Epoch").
      for (surfaces <- PeriodTable.byFirstToken.get(tok)) {
        surfaces.find { surf =>
          text.regionMatches(start, surf, 0, surf.length) &&
            (start + surf.length >= text.length || !text.charAt(start + surf.length).isLetter)
        }.foreach { surf =>
          val end = start + surf.length
          if (!periodSpans.exists(sp => start < sp.charEnd && end > sp.charStart)) {
            val canonical = PeriodTable.surfaceToCanonical(surf)
            periodSpans += Span(canonical, start, end)
            val (s, e) = PeriodTable.envelope(canonical)
            fold(s, e)
          }
        }
      }
    }
    val extent = Geo.envelope(pts.toArray)

    // dates: a priority-ordered mention scan — explicit/calendar shapes first,
    // ranges (incl. month ranges with year-context inheritance and -/–/— year
    // ranges) before month-precision, bare years last. Period matches win over
    // overlapping date entities (reference: ner.py:110-141), and an earlier
    // pattern's claim suppresses later overlapping matches (the spaCy-span
    // analog: one mention, one entity). Envelope semantics per shape follow
    // reference: geoextent/lib/text_extraction/dates.py:33-181.
    val dateSpans = ArrayBuffer.empty[Span]
    def overlapsClaimed(a: Int, b: Int): Boolean =
      periodSpans.exists(sp => a < sp.charEnd && b > sp.charStart) ||
        dateSpans.exists(sp => a < sp.charEnd && b > sp.charStart)
    def claim(m: scala.util.matching.Regex.Match, env: (String, String)): Unit = {
      dateSpans += Span(m.matched, m.start, m.end)
      fold(env._1, env._2)
    }
    // cheap NECESSARY-condition gates before the regex passes: every date
    // pattern (incl. bare year / decade / century) requires at least one
    // digit, and the four month-name patterns require a month-name substring
    // — a text failing a gate can't match, so skipping the pass is
    // result-invariant. A no-digit page (the plain-text corpus family) skips
    // all ten passes for the cost of one char scan.
    var hasDigit = false
    var di = 0
    while (di < text.length && !hasDigit) {
      val c = text.charAt(di); if (c >= '0' && c <= '9') hasDigit = true; di += 1
    }
    lazy val hasMonthName = containsMonthName(text)
    if (hasDigit) {
      for (m <- isoDate.findAllMatchIn(text) if !overlapsClaimed(m.start, m.end))
        claim(m, (m.matched, m.matched))
      for (m <- betweenRange.findAllMatchIn(text) if !overlapsClaimed(m.start, m.end))
        claim(m, (s"${m.group(1)}-01-01", s"${m.group(2)}-12-31"))
      if (hasMonthName)
        for (m <- monthRange.findAllMatchIn(text) if !overlapsClaimed(m.start, m.end)) {
          // "January to March 2024": the left month inherits the right year
          val y = m.group(3).toInt
          val m1 = monthNum(m.group(1).toLowerCase)
          val m2 = monthNum(m.group(2).toLowerCase)
          claim(m, (monthEnvelope(y, m1)._1, monthEnvelope(y, m2)._2))
        }
      for (m <- yearRangeDash.findAllMatchIn(text) if !overlapsClaimed(m.start, m.end))
        claim(m, (s"${m.group(1)}-01-01", s"${m.group(2)}-12-31"))
      if (hasMonthName) {
        for (m <- monthDayYear.findAllMatchIn(text) if !overlapsClaimed(m.start, m.end)) {
          val d0 = f"${m.group(3).toInt}%04d-${monthNum(m.group(1).toLowerCase)}%02d-${m.group(2).toInt}%02d"
          claim(m, (d0, d0))
        }
        for (m <- dayMonthYear.findAllMatchIn(text) if !overlapsClaimed(m.start, m.end)) {
          val d0 = f"${m.group(3).toInt}%04d-${monthNum(m.group(2).toLowerCase)}%02d-${m.group(1).toInt}%02d"
          claim(m, (d0, d0))
        }
        for (m <- monthYear.findAllMatchIn(text) if !overlapsClaimed(m.start, m.end))
          claim(m, monthEnvelope(m.group(2).toInt, monthNum(m.group(1).toLowerCase)))
      }
      for (m <- decade.findAllMatchIn(text) if !overlapsClaimed(m.start, m.end))
        claim(m, (s"${m.group(1)}0-01-01", s"${m.group(1)}9-12-31"))
      for (m <- century.findAllMatchIn(text) if !overlapsClaimed(m.start, m.end)) {
        val c = m.group(1).toInt
        claim(m, (f"${(c - 1) * 100 + 1}%04d-01-01", f"${c * 100}%04d-12-31"))
      }
      if (dateSpans.isEmpty && periodSpans.isEmpty) {
        // bare years only when no richer entity matched (mirrors the reference's
        // entity precedence: a year inside a matched date/range is not re-counted)
        for (m <- bareYear.findAllMatchIn(text)) {
          claim(m, (f"${m.group(1).toInt}%04d-01-01", f"${m.group(1).toInt}%04d-12-31"))
        }
      }
    }

    val tbox = if (tStart == null) None else Some((tStart, tEnd))
    TextResult(extent, tbox, places.sortBy(_.charStart).toSeq,
      dateSpans.sortBy(_.charStart).toSeq, periodSpans.sortBy(_.charStart).toSeq,
      points.toSeq)
  }
}
