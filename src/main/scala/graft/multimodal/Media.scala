package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import java.io.ByteArrayInputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Multimodal columns: image/audio/video payloads as opaque `binary` columns
  * with typed metadata, processed in batched partition passes.
  *
  * The payloads are REAL encoded media, decoded by real codecs:
  *   - images are genuine PNGs (hand-encoded with stored-deflate blocks so the
  *     byte size is a closed form the DuckDB oracle can recompute, decoded by
  *     the JDK's real PNG codec via `javax.imageio.ImageIO`);
  *   - audio is canonical 16-bit PCM mono WAV (44-byte RIFF header + samples);
  *   - video is a frame container ("GFV0": magic + frame count + length-prefixed
  *     PNG frames — a stand-in demux format; a production build swaps the
  *     container parser for an MP4 demuxer, the per-frame decode is already the
  *     real PNG path).
  * Pixel/sample values are deterministic closed forms of the media id, so the
  * decoded feature statistics are fully recomputable by the oracle (q39) —
  * the reference analog is raster pixel/metadata handling
  * (reference: geoextent/lib/handle_raster.py:23-53).
  */
object Media {

  // ImageIO defaults to a disk-backed stream cache: every ImageIO.read
  // creates (and deletes) a temp FILE before decoding — pure per-row I/O
  // overhead on the q39 decode path. The memory cache decodes
  // byte-identically. NOTE: this is a PROCESS-WIDE ImageIO setting, applied
  // when this object first loads (i.e. when any media operator runs); this
  // engine is javax.imageio's only user in-process, and the payloads it
  // decodes are small (< 64 KiB), so the on-heap stream buffer is safe.
  javax.imageio.ImageIO.setUseCache(false)

  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
                            width: Int, height: Int, format: String)
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                                 features: Array[Double])

  // ------------------------------------------------------------ PNG codec

  /** Gray-8 PNG encoder using stored (uncompressed) deflate blocks. Encoded
    * size is the closed form `68 + h*(w+1)` for raw < 64 KiB (one block):
    * 8 signature + 25 IHDR + (23 + raw) IDAT + 12 IEND, raw = h*(1+w)
    * scanline bytes (leading 0x00 "None" filter per row). Decoding goes
    * through the real JDK codec, so the pair is a true encode→decode check.
    */
  def encodePngGray(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
    val raw = new Array[Byte](h * (w + 1))
    var o = 0
    var y = 0
    while (y < h) {
      raw(o) = 0 // filter: None
      o += 1
      var x = 0
      while (x < w) { raw(o) = pix(x, y).toByte; o += 1; x += 1 }
      y += 1
    }
    require(raw.length < 65536, "single stored-deflate block encoder")
    val out = ByteBuffer.allocate(68 + raw.length)
    out.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.putInt(data.length)
      val tb = typ.getBytes("US-ASCII")
      out.put(tb)
      out.put(data)
      val crc = new java.util.zip.CRC32
      crc.update(tb); crc.update(data)
      out.putInt(crc.getValue.toInt)
    }
    val ihdr = ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h).put(8.toByte).put(0.toByte) // gray, bit depth 8
      .put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())
    val z = ByteBuffer.allocate(raw.length + 11)
    z.put(0x78.toByte).put(0x01.toByte) // zlib CMF/FLG (no preset, fastest)
    z.put(0x01.toByte) // BFINAL=1, BTYPE=00 (stored)
    z.order(ByteOrder.LITTLE_ENDIAN)
    z.putShort(raw.length.toShort).putShort((raw.length ^ 0xffff).toShort)
    z.order(ByteOrder.BIG_ENDIAN)
    z.put(raw)
    val adler = new java.util.zip.Adler32
    adler.update(raw)
    z.putInt(adler.getValue.toInt)
    chunk("IDAT", z.array())
    chunk("IEND", Array.empty)
    out.array()
  }

  /** Real PNG decode (JDK ImageIO codec) → gray sample matrix accessor. */
  def decodePng(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "not a decodable image payload")
    img
  }

  /** Decode an image and pool pixel statistics: [sum, min, max, width, height].
    * All integer-valued, so the oracle recomputes them exactly in SQL.
    */
  def imageFeatures(bytes: Array[Byte]): Array[Double] = {
    val img = decodePng(bytes)
    val r = img.getRaster
    val w = img.getWidth
    var sum = 0.0; var mn = Double.MaxValue; var mx = Double.MinValue
    // bulk per-row sample fetch (one raster call per row instead of one per
    // pixel); accumulation order (x inner, y outer) unchanged → identical sums
    val row = new Array[Int](w)
    var y = 0
    while (y < img.getHeight) {
      r.getSamples(0, y, w, 1, 0, row)
      var x = 0
      while (x < w) {
        val v = row(x).toDouble
        sum += v
        if (v < mn) mn = v
        if (v > mx) mx = v
        x += 1
      }
      y += 1
    }
    Array(sum, mn, mx, w.toDouble, img.getHeight.toDouble)
  }

  /** Real image resize: decode, nearest-neighbor resample, re-encode PNG. */
  def resize(row: MediaRow, w: Int, h: Int): MediaRow = {
    val img = decodePng(row.bytes)
    val r = img.getRaster
    val out = encodePngGray(w, h, (x, y) =>
      r.getSample(x * img.getWidth / w, y * img.getHeight / h, 0))
    row.copy(bytes = out, width = w, height = h)
  }

  // ------------------------------------------------------------ WAV codec

  /** Canonical 44-byte-header mono 16-bit PCM WAV; size = 44 + 2n. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val b = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1).putShort(1) // PCM, mono
    b.putInt(sampleRate).putInt(sampleRate * 2)
    b.putShort(2).putShort(16) // block align, bits/sample
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    for (s <- samples) b.putShort(s)
    b.array()
  }

  /** Parse the RIFF/WAVE header + PCM16 data chunk; statistics
    * [sum, min, max, n_samples, sample_rate] (integer-valued → oracle-exact).
    */
  def wavFeatures(bytes: Array[Byte]): Array[Double] = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag4(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    require(tag4(0) == "RIFF" && tag4(8) == "WAVE", "not a WAV payload")
    // walk chunks from offset 12 (tolerates non-canonical chunk layouts)
    var off = 12
    var rate = 0
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= bytes.length) {
      val id = tag4(off)
      val len = b.getInt(off + 4)
      // a malformed negative/oversized length must FAIL the row, not spin the
      // chunk walk in place (off += 8 + (-8) = no advance) or walk backwards
      require(len >= 0 && off + 8 + len <= bytes.length,
        s"malformed WAV chunk '$id' at $off: declared length $len")
      if (id == "fmt ") rate = b.getInt(off + 12)
      if (id == "data") { dataOff = off + 8; dataLen = len }
      off += 8 + len + (len & 1)
    }
    require(dataOff >= 0, "WAV payload without data chunk")
    val n = dataLen / 2
    var sum = 0.0; var mn = Double.MaxValue; var mx = Double.MinValue
    var i = 0
    while (i < n) {
      val v = b.getShort(dataOff + 2 * i).toDouble
      sum += v
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    Array(sum, mn, mx, n.toDouble, rate.toDouble)
  }

  // ------------------------------------------------------- video container

  val VideoMagic = "GFV0"

  /** Frame container: magic(4) + nFrames(4, BE) + per frame len(4, BE) + PNG. */
  def encodeVideo(frames: Array[Array[Byte]]): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + frames.map(_.length + 4).sum)
    b.put(VideoMagic.getBytes("US-ASCII")).putInt(frames.length)
    for (f <- frames) { b.putInt(f.length); b.put(f) }
    b.array()
  }

  /** Demux: byte offsets of every `everyK`-th frame payload (real container
    * parse — the production analog walks an MP4 sample table the same way).
    * Returns (frameCount, Array[(offset, length)] of the sampled frames).
    */
  def sampleFrameOffsets(bytes: Array[Byte], everyK: Int): (Int, Array[(Int, Int)]) = {
    val b = ByteBuffer.wrap(bytes)
    require(new String(bytes, 0, 4, "US-ASCII") == VideoMagic, "not a GFV0 video payload")
    val n = b.getInt(4)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var off = 8
    var i = 0
    while (i < n) {
      val len = b.getInt(off)
      if (i % math.max(1, everyK) == 0) out += ((off + 4, len))
      off += 4 + len
      i += 1
    }
    (n, out.toArray)
  }

  /** Demux + decode every 2nd frame (real per-frame PNG decode), pool pixel
    * statistics: [n_frames, sum, min, max, n_sampled].
    */
  def videoFeatures(bytes: Array[Byte]): Array[Double] = {
    val (nFrames, sampled) = sampleFrameOffsets(bytes, 2)
    var sum = 0.0; var mn = Double.MaxValue; var mx = Double.MinValue
    for ((off, len) <- sampled) {
      val f = imageFeatures(java.util.Arrays.copyOfRange(bytes, off, off + len))
      sum += f(0)
      if (f(1) < mn) mn = f(1)
      if (f(2) > mx) mx = f(2)
    }
    Array(nFrames.toDouble, sum, mn, mx, sampled.length.toDouble)
  }

  // ------------------------------------------------------------ media table

  /** Closed-form media dimensions (mirrored in the q39/q51 oracle SQL). */
  def imageDims(id: Long): (Int, Int) = (16 + (id % 8).toInt * 16, 16 + (id % 5).toInt * 16)
  def audioSamples(id: Long): Int = 256 + (id % 7).toInt * 128
  def videoFrames(id: Long): Int = 2 + (id % 4).toInt
  val AudioRate = 8000
  val FrameW = 16
  val FrameH = 16

  /** Synthetic media table: REAL encoded payloads with closed-form content —
    * image pixel (x + 3y + id) mod 256, audio sample ((37i + 11·id) mod 2^16)
    * − 2^15, video frame f pixel (x + 3y + 7f + id) mod 256.
    */
  def media(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id")).as[Long].map { id =>
      (id % 3) match {
        case 0 =>
          val (w, h) = imageDims(id)
          val bytes = encodePngGray(w, h, (x, y) => ((x + 3 * y + id) % 256).toInt)
          MediaRow(id, "image", bytes, w, h, "png")
        case 1 =>
          val n = audioSamples(id)
          val samples = Array.tabulate(n)(i => (((i.toLong * 37 + id * 11) % 65536) - 32768).toShort)
          MediaRow(id, "audio", encodeWav(AudioRate, samples), 0, 0, "wav")
        case _ =>
          val nf = videoFrames(id)
          val frames = Array.tabulate(nf)(f =>
            encodePngGray(FrameW, FrameH, (x, y) => ((x + 3 * y + 7 * f + id) % 256).toInt))
          MediaRow(id, "video", encodeVideo(frames), FrameW, FrameH, "gfv")
      }
    }
  }

  /** Per-payload decode dispatch → pooled feature statistics. */
  def decodeFeatures(kind: String, bytes: Array[Byte]): Array[Double] = kind match {
    case "image" => imageFeatures(bytes)
    case "audio" => wavFeatures(bytes)
    case _       => videoFeatures(bytes)
  }

  /** Batched feature extraction — one partition pass; codec state (ImageIO
    * reader lookup) is JVM-wide, matching the mapInPandas batch shape the
    * reference-scale pipeline would use for per-partition decoder init.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        MediaFeatures(m.media_id, m.kind, m.bytes.length.toLong, decodeFeatures(m.kind, m.bytes))
      }
    }
  }

  /** Features table as a DataFrame (schema: media_id, kind, n_bytes, features). */
  def featureTable(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(media(spark, sfDir)).toDF()
}
