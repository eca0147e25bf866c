package graft.geo

/** Signed-ISO deep-time date handling.
  *
  * Geological periods reach back hundreds of millions of years, which overflows
  * `java.time` display conventions and `TimestampType` range; the reference keeps
  * such dates as signed-ISO strings like "-144998050-01-01" and compares them by
  * parsed (year,month,day) tuples (reference: geoextent/lib/helpfunctions.py:66-118).
  * This module reproduces those compare/min/max semantics on plain strings.
  */
object SignedIso {

  /** Parse "[-]YYYY…-MM-DD" into (year, month, day); year may be any width and
    * negative. Returns None on malformed input.
    */
  def parse(s: String): Option[(Long, Int, Int)] = {
    if (s == null || s.isEmpty) return None
    val neg = s.charAt(0) == '-'
    val body = if (neg) s.substring(1) else s
    val parts = body.split("-")
    if (parts.length != 3) return None
    try {
      val y = parts(0).toLong * (if (neg) -1 else 1)
      val m = parts(1).toInt
      val d = parts(2).toInt
      if (m < 1 || m > 12 || d < 1 || d > 31) None else Some((y, m, d))
    } catch { case _: NumberFormatException => None }
  }

  /** Orderable surrogate key: year*10000 + month*100 + day. Monotone in calendar
    * order for both CE and deep-time years (negative years sort before positive,
    * and within a negative year month/day still increase the key toward later
    * dates only when the year dominates — all bundled period boundaries are
    * 01-01 so the approximation is exact for them; for CE dates it is exact).
    */
  def key(s: String): Option[Long] = parse(s).map { case (y, m, d) => y * 10000L + m * 100L + d }

  def isDeepTime(s: String): Boolean = s != null && s.startsWith("-")

  def min(a: String, b: String): String =
    if (a == null) b else if (b == null) a
    else (key(a), key(b)) match {
      case (Some(ka), Some(kb)) => if (ka <= kb) a else b
      case (Some(_), None) => a
      case _ => b
    }

  def max(a: String, b: String): String =
    if (a == null) b else if (b == null) a
    else (key(a), key(b)) match {
      case (Some(ka), Some(kb)) => if (ka >= kb) a else b
      case (Some(_), None) => a
      case _ => b
    }
}
