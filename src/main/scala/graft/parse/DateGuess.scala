package graft.parse

import java.time.LocalDate
import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder}
import java.time.temporal.ChronoField

/** Deterministic date-format guessing ladder.
  *
  * Reproduces the reference's fixed fallback format list, in its order
  * (reference: geoextent/lib/helpfunctions.py:486-513 — 25 strptime patterns,
  * sample-based guess then whole-column parse). The engine uses the fixed
  * ladder directly (determinism > adaptivity, SURVEY §4).
  */
object DateGuess {

  private def fmt(p: String): DateTimeFormatter =
    new DateTimeFormatterBuilder()
      .appendPattern(p)
      .parseDefaulting(ChronoField.MONTH_OF_YEAR, 1)
      .parseDefaulting(ChronoField.DAY_OF_MONTH, 1)
      .toFormatter(java.util.Locale.US)
      .withResolverStyle(java.time.format.ResolverStyle.STRICT)

  /** (java pattern, has-date-part) in the reference ladder's order; time-only
    * patterns are kept for order fidelity but yield no date.
    */
  private val ladder: Array[(DateTimeFormatter, Boolean)] = Array(
    fmt("uuuu/MM/dd HH:mm:ss") -> true,
    fmt("uuuu-MM-dd HH:mm:ss") -> true,
    fmt("uuuu/MM/dd") -> true,
    fmt("uuuu-MM-dd") -> true,
    fmt("dd/MM/uuuu") -> true,
    fmt("dd-MM-uuuu") -> true,
    fmt("MM/dd/uuuu") -> true,
    fmt("MM-dd-uuuu") -> true,
    fmt("uuuuMMdd") -> true,
    fmt("dd.MM.uuuu") -> true,
    fmt("uuuu.MM.dd") -> true,
    fmt("uuuu-MM-dd'T'HH:mm:ss") -> true,
    fmt("uuuu-MM-dd'T'HH:mm:ss.SSSSSS") -> true,
    fmt("uuuu-MM-dd'T'HH:mm:ssX") -> true,
    fmt("uuuu-MM-dd HH:mm:ss.SSSSSS") -> true,
    fmt("dd MMMM uuuu") -> true,
    fmt("dd MMM uuuu") -> true,
    fmt("EEE, dd MMM uuuu HH:mm:ss xx") -> true,
    fmt("HH:mm:ss") -> false,
    fmt("HH:mm:ss.SSS") -> false,
    fmt("uuuu-MM") -> true,
    fmt("uuuu") -> true,
    fmt("uuuu-DDD") -> true,
    fmt("dd/MM/uu") -> true,
    fmt("MM/dd/uu") -> true,
    fmt("uuuu.MM.dd HH:mm:ss") -> true,
  )

  /** Cheap NECESSARY shape conditions per ladder entry, checked before the
    * (exception-throwing, ~µs-costly) formatter attempt. Faithful to the
    * reference's strptime semantics: %Y/%m/%d etc. are fixed-width, so length
    * and literal-separator positions are exact necessary conditions — a value
    * failing its shape check could never parse, and skipping the attempt is
    * result-invariant. Variable-width entries (month names, zone offsets) get
    * looser checks. Cuts the per-value guess cost ~an order of magnitude.
    */
  private def sep(t: String, i: Int, c: Char): Boolean = t.length > i && t.charAt(i) == c
  private def allDigits(t: String): Boolean = {
    var i = 0
    while (i < t.length) { if (!Character.isDigit(t.charAt(i))) return false; i += 1 }
    t.nonEmpty
  }
  private val shapes: Array[String => Boolean] = Array(
    t => t.length == 19 && sep(t, 4, '/') && sep(t, 7, '/') && sep(t, 10, ' '), // uuuu/MM/dd HH:mm:ss
    t => t.length == 19 && sep(t, 4, '-') && sep(t, 7, '-') && sep(t, 10, ' '), // uuuu-MM-dd HH:mm:ss
    t => t.length == 10 && sep(t, 4, '/') && sep(t, 7, '/'), // uuuu/MM/dd
    t => t.length == 10 && sep(t, 4, '-') && sep(t, 7, '-'), // uuuu-MM-dd
    t => t.length == 10 && sep(t, 2, '/') && sep(t, 5, '/'), // dd/MM/uuuu
    t => t.length == 10 && sep(t, 2, '-') && sep(t, 5, '-'), // dd-MM-uuuu
    t => t.length == 10 && sep(t, 2, '/') && sep(t, 5, '/'), // MM/dd/uuuu
    t => t.length == 10 && sep(t, 2, '-') && sep(t, 5, '-'), // MM-dd-uuuu
    t => t.length == 8 && allDigits(t), // uuuuMMdd
    t => t.length == 10 && sep(t, 2, '.') && sep(t, 5, '.'), // dd.MM.uuuu
    t => t.length == 10 && sep(t, 4, '.') && sep(t, 7, '.'), // uuuu.MM.dd
    t => t.length == 19 && sep(t, 10, 'T'), // uuuu-MM-dd'T'HH:mm:ss
    t => t.length == 26 && sep(t, 10, 'T') && sep(t, 19, '.'), // ...'T'HH:mm:ss.SSSSSS
    t => t.length >= 20 && sep(t, 10, 'T'), // ...'T'HH:mm:ssX (zone width varies)
    t => t.length == 26 && sep(t, 10, ' ') && sep(t, 19, '.'), // uuuu-MM-dd HH:mm:ss.SSSSSS
    t => t.length >= 10 && sep(t, 2, ' '), // dd MMMM uuuu (month name width varies)
    t => t.length == 11 && sep(t, 2, ' ') && sep(t, 6, ' '), // dd MMM uuuu
    t => t.length >= 25 && sep(t, 3, ','), // EEE, dd MMM uuuu HH:mm:ss xx
    t => t.length == 8 && sep(t, 2, ':') && sep(t, 5, ':'), // HH:mm:ss
    t => t.length == 12 && sep(t, 2, ':') && sep(t, 8, '.'), // HH:mm:ss.SSS
    t => t.length == 7 && sep(t, 4, '-'), // uuuu-MM
    t => t.length == 4 && allDigits(t), // uuuu
    t => t.length == 8 && sep(t, 4, '-'), // uuuu-DDD
    t => t.length == 8 && sep(t, 2, '/') && sep(t, 5, '/'), // dd/MM/uu
    t => t.length == 8 && sep(t, 2, '/') && sep(t, 5, '/'), // MM/dd/uu
    t => t.length == 19 && sep(t, 4, '.') && sep(t, 7, '.') && sep(t, 10, ' ')) // uuuu.MM.dd HH:mm:ss

  // Digit-only fast path for the fixed-width all-numeric ladder entries
  // (yPos, mPos, dPos char offsets). When every value position holds an ASCII
  // digit, LocalDate.of applies EXACTLY the validation the STRICT formatter
  // does (month 1-12, day valid for month/year), so the java.time parse —
  // ~1.5 µs of formatter machinery per value on the kernel's hottest CSV
  // branch — can be skipped with identical accept/reject behavior. Any value
  // with a non-digit in a value position (e.g. a signed year, which uuuu can
  // accept) falls through to the formatter unchanged.
  private val fastYmd: Array[Array[Int]] = {
    val a = new Array[Array[Int]](ladder.length)
    a(2) = Array(0, 5, 8)   // uuuu/MM/dd
    a(3) = Array(0, 5, 8)   // uuuu-MM-dd
    a(4) = Array(6, 3, 0)   // dd/MM/uuuu
    a(5) = Array(6, 3, 0)   // dd-MM-uuuu
    a(6) = Array(6, 0, 3)   // MM/dd/uuuu
    a(7) = Array(6, 0, 3)   // MM-dd-uuuu
    a(8) = Array(0, 4, 6)   // uuuuMMdd
    a(9) = Array(6, 3, 0)   // dd.MM.uuuu
    a(10) = Array(0, 5, 8)  // uuuu.MM.dd
    a
  }
  private def dig2(t: String, i: Int): Int = {
    val a = t.charAt(i); val b = t.charAt(i + 1)
    if (a < '0' || a > '9' || b < '0' || b > '9') -1 else (a - '0') * 10 + (b - '0')
  }
  private def dig4(t: String, i: Int): Int = {
    val hi = dig2(t, i); val lo = dig2(t, i + 2)
    if (hi < 0 || lo < 0) -1 else hi * 100 + lo
  }
  /** 1 = parses, 0 = definitively rejected, -1 = not fast-pathable. */
  private def fastProbe(idx: Int, t: String): Int = {
    val pos = fastYmd(idx)
    if (pos == null) return -1
    val y = dig4(t, pos(0)); val m = dig2(t, pos(1)); val d = dig2(t, pos(2))
    if (y < 0 || m < 0 || d < 0) return -1
    try { LocalDate.of(y, m, d); 1 } catch { case _: java.time.DateTimeException => 0 }
  }

  /** First ladder format that parses the sample value, as a ladder index. */
  def guessFormat(sample: String): Option[Int] = {
    if (sample == null) return None
    val t = sample.trim
    if (t.isEmpty) return None
    var i = 0
    while (i < ladder.length) {
      if (shapes(i)(t)) {
        fastProbe(i, t) match {
          case 1 => return Some(i)
          case 0 => // definitive reject; next ladder entry
          case _ =>
            try {
              ladder(i)._1.parse(t)
              return Some(i)
            } catch { case _: Exception => }
        }
      }
      i += 1
    }
    None
  }

  def parseWith(idx: Int, value: String): Option[LocalDate] = {
    val (f, hasDate) = ladder(idx)
    if (!hasDate) return None
    val t = value.trim
    val pos = fastYmd(idx)
    if (pos != null && shapes(idx)(t)) {
      val y = dig4(t, pos(0)); val m = dig2(t, pos(1)); val d = dig2(t, pos(2))
      if (y >= 0 && m >= 0 && d >= 0)
        return try Some(LocalDate.of(y, m, d)) catch { case _: java.time.DateTimeException => None }
    }
    try Some(LocalDate.from(f.parse(t)))
    catch { case _: Exception => None }
  }

  /** Guess on the first parseable value, then parse the whole column with that
    * format (the reference guesses on a 30-value sample,
    * reference: geoextent/lib/helpfunctions.py:155,401-554).
    */
  def parseColumn(values: Seq[String]): Seq[LocalDate] = {
    val fmtIdx = values.iterator.flatMap(guessFormat).buffered.headOption
    fmtIdx match {
      case None => Seq.empty
      case Some(i) => values.flatMap(v => parseWith(i, v))
    }
  }

  def parseOne(value: String): Option[LocalDate] =
    guessFormat(value).flatMap(parseWith(_, value))
}
