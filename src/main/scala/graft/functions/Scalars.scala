package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Small scalar operators from the reference's helper surface (SURVEY §2.6),
  * expressed as built-in column expressions — codegen'd, no UDFs.
  */
object Scalars {

  /** X5: DOI normalisation — pull a bare DOI out of an identifier/URL
    * (reference: geoextent/lib/helpfunctions.py:165-167,1257-1265).
    */
  def doiNormalize(c: Column): Column =
    regexp_extract(c, "(10\\.\\d{2,9}/[^\\s]+)", 1)

  /** X9: "100MB"-style size parse → bytes, decimal multipliers
    * (reference: geoextent/lib/helpfunctions.py:1920-1946 via filesizelib).
    * Unparseable input → null.
    */
  def sizeToBytes(c: Column): Column = {
    val num = regexp_extract(c, "^\\s*([0-9]+(?:\\.[0-9]+)?)\\s*([KMGT]?B)\\s*$", 1)
    val unit = upper(regexp_extract(c, "^\\s*([0-9]+(?:\\.[0-9]+)?)\\s*([KMGT]?B)\\s*$", 2))
    when(num === "", lit(null).cast("long"))
      .otherwise((num.cast("double") *
        when(unit === "B", 1L)
          .when(unit === "KB", 1000L)
          .when(unit === "MB", 1000000L)
          .when(unit === "GB", 1000000000L)
          .when(unit === "TB", 1000000000000L)).cast("long"))
  }

  /** URL canonicalization for web-corpus URL-level dedup (CCNet/C4-style).
    * Deterministic rule set, identical under Java regex and RE2:
    * 1. strip the fragment; 2. lowercase scheme+authority (path case kept);
    * 3. drop the scheme's OWN default port only (https→:443, http→:80 — a
    * non-default port names a different resource and must survive);
    * 4. drop a leading `www.`; 5. strip one trailing slash.
    * Pure codegen'd expressions; no backreferences (Java uses $1 in
    * replacements, RE2 uses \1 — the oracle must mirror every rule verbatim).
    */
  def canonicalizeUrl(c: Column): Column = {
    val noFrag = regexp_replace(c, "#.*$", "")
    val auth = lower(regexp_extract(noFrag, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1))
    val rest = regexp_replace(noFrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    val auth2 = regexp_replace(
      when(auth.rlike("^https://.*:443$"), regexp_replace(auth, ":443$", ""))
        .when(auth.rlike("^http://.*:80$"), regexp_replace(auth, ":80$", ""))
        .otherwise(auth),
      "://www\\.", "://")
    regexp_replace(concat(auth2, rest), "/$", "")
  }

  /** Registrable host of a canonicalized URL (for per-domain stats/mixing):
    * the authority minus any userinfo and port.
    */
  def urlHost(canon: Column): Column =
    regexp_extract(canon, "^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:@]+)", 1)

  /** X8: axis-order swap — the reference's public API emits EPSG:4326-native
    * [lat,lon] while computing internally in GeoJSON [lon,lat] order
    * (reference: geoextent/lib/extent.py:149-183). Presentation projection.
    */
  def swapToLatLon(minLon: Column, minLat: Column, maxLon: Column, maxLat: Column): Column =
    struct(minLat.as("min_lat"), minLon.as("min_lon"), maxLat.as("max_lat"), maxLon.as("max_lon"))
}
