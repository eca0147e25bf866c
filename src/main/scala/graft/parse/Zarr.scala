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

  private def inflate(bytes: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(bytes)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput()) return out.toByteArray
      out.write(buf, 0, n)
    }
    out.toByteArray
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
    def chunks(keyOf: Int => String, compressed: Boolean, dtype: String): Array[Double] = {
      val parts = Iterator.from(0).map(keyOf).takeWhile(files.contains).map { k =>
        val raw = files(k)
        decode(if (compressed) inflate(raw) else raw, dtype)
      }.toArray
      parts.flatten
    }
    files.get(s"$prefix/.zarray").flatMap { metaBytes => // v2
      GeoJson.parseJson(new String(metaBytes, "UTF-8")).map { m =>
        val dtype = m.get("dtype").asText()
        val comp = Option(m.get("compressor")).filter(!_.isNull)
        val compId = comp.map(c => Option(c.get("id")).map(_.asText()).getOrElse(""))
        require(compId.forall(Set("zlib", "gzip")), s"unsupported zarr compressor: $compId")
        chunks(i => s"$prefix/$i", compId.isDefined, dtype)
      }
    }.orElse {
      files.get(s"$prefix/zarr.json").flatMap { metaBytes => // v3
        GeoJson.parseJson(new String(metaBytes, "UTF-8")).map { m =>
          val dtype = m.get("data_type").asText()
          val gz = Option(m.get("codecs")).exists(_.elements().hasNext) && {
            val it = m.get("codecs").elements()
            var found = false
            while (it.hasNext) if (it.next().get("name").asText() == "gzip") found = true
            found
          }
          chunks(i => s"$prefix/c/$i", gz, dtype)
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
    files.collect {
      case (name, bytes) if name.endsWith(".zattrs") || name.endsWith("zarr.json") =>
        new String(bytes, "UTF-8")
    }.flatMap(s => if (s.contains("_CRS")) re.findAllMatchIn(s).map(_.group(1).toInt).toSeq.lastOption else None)
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
