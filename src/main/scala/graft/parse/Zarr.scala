package graft.parse

import java.nio.{ByteBuffer, ByteOrder}

import graft.geo.{Extent, Geo}

/** Zarr store reader (v2 `.zarray/.zattrs` and v3 `zarr.json`) — the
  * reference reads Zarr through xarray/GDAL as a raster (handle_raster;
  * tests/testdata/zarr). A store is presented as member files (path → bytes),
  * the same shape an expanded archive or object listing produces. Extent =
  * the 1-D X/Y coordinate arrays' ranges extended by half a cell (raster
  * cell-center convention); CRS = the last `ID["EPSG",n]` of the data
  * variable's `_CRS` WKT, with UTM codes transformed through the engine's
  * inverse (raster two-corner contract). Codecs: raw, zlib (v2), gzip (v3) —
  * all JDK-native.
  */
object Zarr {

  final case class ZarrResult(extent: Extent, crs: String, nx: Int, ny: Int)

  /** zlib (RFC 1950) decompression; a truncated stream FAILS the read rather
    * than silently yielding a short coordinate array.
    */
  private def inflateZlib(bytes: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(bytes)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      require(n > 0 || !inf.needsInput(), "truncated zlib chunk in zarr store")
      out.write(buf, 0, n)
    }
    out.toByteArray
  }

  /** gzip (RFC 1952) — a DIFFERENT framing than zlib; numcodecs' 'gzip'
    * writes this, so it must go through GZIPInputStream, not a raw Inflater.
    */
  private def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  private def decompress(bytes: Array[Byte], codec: String): Array[Byte] = codec match {
    case "" => bytes
    case "zlib" => inflateZlib(bytes)
    case "gzip" => gunzip(bytes)
    case other => throw new IllegalArgumentException(s"unsupported zarr codec: $other")
  }

  private def decode(bytes: Array[Byte], dtype: String): Array[Double] = {
    val (little, kind, width) = dtype match {
      case "<f8" | "float64" => (true, 'f', 8)
      case "<f4" | "float32" => (true, 'f', 4)
      case "<i8" | "int64" => (true, 'i', 8)
      case "<i4" | "int32" => (true, 'i', 4)
      case ">f8" => (false, 'f', 8)
      case ">f4" => (false, 'f', 4)
      case other => throw new IllegalArgumentException(s"unsupported zarr dtype: $other")
    }
    val bb = ByteBuffer.wrap(bytes).order(
      if (little) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    Array.tabulate(bytes.length / width) { i =>
      (kind, width) match {
        case ('f', 8) => bb.getDouble(i * 8)
        case ('f', 4) => bb.getFloat(i * 4).toDouble
        case ('i', 8) => bb.getLong(i * 8).toDouble
        case _ => bb.getInt(i * 4).toDouble
      }
    }
  }

  /** Read a 1-D coordinate variable rooted at `prefix` from the store map. */
  private def coordArray(files: Map[String, Array[Byte]], prefix: String): Option[Array[Double]] = {
    // every stored chunk is padded to the full chunk shape, so the
    // concatenation must be TRIMMED to the declared array shape — otherwise
    // the last chunk's fill values poison the extent
    def chunks(keyOf: Int => String, codec: String, dtype: String, shape: Int): Array[Double] = {
      val parts = Iterator.from(0).map(keyOf).takeWhile(files.contains).map { k =>
        decode(decompress(files(k), codec), dtype)
      }.toArray
      parts.flatten.take(if (shape > 0) shape else Int.MaxValue)
    }
    files.get(s"$prefix/.zarray").flatMap { metaBytes => // v2
      GeoJson.parseJson(new String(metaBytes, "UTF-8")).map { m =>
        val dtype = m.get("dtype").asText()
        val shape = Option(m.get("shape")).filter(_.isArray).map(_.get(0).asInt()).getOrElse(0)
        val codec = Option(m.get("compressor")).filter(!_.isNull)
          .map(c => Option(c.get("id")).map(_.asText()).getOrElse("?")).getOrElse("")
        chunks(i => s"$prefix/$i", codec, dtype, shape) // decompress() rejects unknown codecs
      }
    }.orElse {
      files.get(s"$prefix/zarr.json").flatMap { metaBytes => // v3
        GeoJson.parseJson(new String(metaBytes, "UTF-8")).map { m =>
          val dtype = m.get("data_type").asText()
          val shape = Option(m.get("shape")).filter(_.isArray).map(_.get(0).asInt()).getOrElse(0)
          // v3 codec chain: 'bytes' (layout) plus at most one supported
          // compression codec; anything else must FAIL, not pass through as
          // raw floats
          val names = Option(m.get("codecs")).map { cs =>
            val it = cs.elements()
            val b = Seq.newBuilder[String]
            while (it.hasNext) b += it.next().get("name").asText()
            b.result()
          }.getOrElse(Seq.empty)
          val compression = names.filterNot(Set("bytes", "transpose", "endian"))
          require(compression.forall(_ == "gzip"),
            s"unsupported zarr v3 codecs: ${compression.mkString(",")}")
          chunks(i => s"$prefix/c/$i", if (compression.contains("gzip")) "gzip" else "", dtype, shape)
        }
      }
    }.filter(_.nonEmpty)
  }

  /** EPSG of the store: the LAST `ID["EPSG",n]` in any `_CRS` WKT attribute
    * (the final ID names the full CRS; earlier ones name its components).
    */
  private def storeEpsg(files: Map[String, Array[Byte]]): Option[Int] = {
    // the WKT lives inside a JSON string, so its quotes appear escaped (\")
    val re = "ID\\[\\\\?\"EPSG\\\\?\",(\\d+)\\]".r
    // sort candidates by path: `files` is an unordered Map, and two attrs
    // files carrying different _CRS codes must resolve deterministically
    files.toSeq.collect {
      case (name, bytes) if name.endsWith(".zattrs") || name.endsWith("zarr.json") =>
        (name, new String(bytes, "UTF-8"))
    }.sortBy(_._1)
      .flatMap { case (_, s) =>
        if (s.contains("_CRS")) re.findAllMatchIn(s).map(_.group(1).toInt).toSeq.lastOption else None
      }
      .headOption
  }

  /** Case-insensitive coordinate-variable discovery: X/lon/longitude and
    * Y/lat/latitude directories at any nesting level.
    */
  def readStore(files: Seq[(String, Array[Byte])]): Option[ZarrResult] = {
    val map = files.toMap
    val dirs = files.map(_._1).filter(n => n.endsWith("/.zarray") || n.endsWith("/zarr.json"))
      .map(n => n.substring(0, n.lastIndexOf('/')))
    def find(names: Set[String]): Option[String] =
      dirs.find(d => names(d.substring(d.lastIndexOf('/') + 1).toLowerCase))
    for {
      xDir <- find(Set("x", "lon", "longitude"))
      yDir <- find(Set("y", "lat", "latitude"))
      xs <- coordArray(map, xDir)
      ys <- coordArray(map, yDir)
    } yield {
      def halfStep(a: Array[Double]): Double =
        if (a.length > 1) math.abs(a(1) - a(0)) / 2 else 0.0
      val raw = Extent(xs.min - halfStep(xs), ys.min - halfStep(ys),
        xs.max + halfStep(xs), ys.max + halfStep(ys))
      storeEpsg(map) match {
        case Some(4326) => ZarrResult(raw, "4326", xs.length, ys.length)
        case Some(3857) => ZarrResult(Geo.mercExtentToWgs84(raw), "4326", xs.length, ys.length)
        case Some(code) =>
          Geo.utmExtentToWgs84(code, raw) match {
            case Some(t) => ZarrResult(t, "4326", xs.length, ys.length)
            case None => ZarrResult(raw, code.toString, xs.length, ys.length)
          }
        case None => ZarrResult(raw, if (Geo.plausibleWgs84(raw)) "4326" else "unknown", xs.length, ys.length)
      }
    }
  }
}
