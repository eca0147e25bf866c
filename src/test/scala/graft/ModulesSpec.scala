package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Tests for the round-1 add-on modules: multimodal media plumbing, streaming
  * sessionization, scalar operators, raster table.
  */
class ModulesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("media: deterministic REAL payloads, batched decode feature extraction") {
    val m = multimodal.Media.media(spark, sf).cache()
    try {
      val rows = m.collect()
      assert(rows.nonEmpty)
      assert(rows.map(_.kind).toSet === Set("image", "audio", "video"))
      // determinism: regeneration yields identical bytes
      val again = multimodal.Media.media(spark, sf).collect()
      assert(rows.sortBy(_.media_id).zip(again.sortBy(_.media_id))
        .forall { case (a, b) => java.util.Arrays.equals(a.bytes, b.bytes) })
      // closed-form encoded sizes (the q51 contract)
      for (r <- rows) r.kind match {
        case "image" => assert(r.bytes.length === 68 + r.height * (r.width + 1))
        case "audio" => assert(r.bytes.length === 44 + 2 * multimodal.Media.audioSamples(r.media_id))
        case _       => assert(r.bytes.length === 8 + 344 * multimodal.Media.videoFrames(r.media_id))
      }
      val feats = multimodal.Media.extractFeatures(m).collect()
      assert(feats.forall(_.features.length === 5))
      // decode is a pure function of bytes
      val r0 = rows.head
      val f0 = multimodal.Media.decodeFeatures(r0.kind, r0.bytes)
      assert(feats.find(_.media_id == r0.media_id).get.features.toList === f0.toList)
    } finally m.unpersist()
  }

  test("media: PNG encode decodes via the real JDK codec with exact pixels") {
    val w = 5; val h = 3
    val png = multimodal.Media.encodePngGray(w, h, (x, y) => (x * 40 + y * 7) % 256)
    assert(png.length === 68 + h * (w + 1))
    val img = multimodal.Media.decodePng(png)
    assert(img.getWidth === w && img.getHeight === h)
    for (y <- 0 until h; x <- 0 until w)
      assert(img.getRaster.getSample(x, y, 0) === (x * 40 + y * 7) % 256)
    val f = multimodal.Media.imageFeatures(png)
    val vals = for (y <- 0 until h; x <- 0 until w) yield (x * 40 + y * 7) % 256
    assert(f.toList === List(vals.sum.toDouble, vals.min.toDouble, vals.max.toDouble, w.toDouble, h.toDouble))
  }

  test("media: real resize (decode → nearest-neighbor → re-encode)") {
    val row = multimodal.Media.MediaRow(1L, "image",
      multimodal.Media.encodePngGray(32, 32, (x, y) => (x + y) % 256), 32, 32, "png")
    val small = multimodal.Media.resize(row, 8, 8)
    assert(small.width === 8 && small.height === 8)
    val img = multimodal.Media.decodePng(small.bytes)
    assert(img.getWidth === 8)
    // nearest-neighbor: output (x,y) samples source (4x, 4y)
    for (y <- 0 until 8; x <- 0 until 8)
      assert(img.getRaster.getSample(x, y, 0) === (4 * x + 4 * y) % 256)
  }

  test("media: WAV round-trip and GFV0 frame sampling") {
    val samples = Array.tabulate(100)(i => (i * 300 - 15000).toShort)
    val wav = multimodal.Media.encodeWav(8000, samples)
    assert(wav.length === 44 + 200)
    val f = multimodal.Media.wavFeatures(wav)
    assert(f.toList === List(samples.map(_.toDouble).sum, -15000.0, samples.last.toDouble, 100.0, 8000.0))
    val frames = Array.tabulate(5)(k => multimodal.Media.encodePngGray(4, 4, (x, y) => (x + y + k) % 256))
    val vid = multimodal.Media.encodeVideo(frames)
    val (n, sampled) = multimodal.Media.sampleFrameOffsets(vid, 2)
    assert(n === 5 && sampled.length === 3) // frames 0, 2, 4
    val frame2 = java.util.Arrays.copyOfRange(vid, sampled(1)._1, sampled(1)._1 + sampled(1)._2)
    assert(multimodal.Media.decodePng(frame2).getRaster.getSample(0, 0, 0) === 2)
  }

  test("media: malformed WAV chunk length fails the row instead of spinning the chunk walk") {
    val samples = Array.tabulate(10)(i => i.toShort)
    val wav = multimodal.Media.encodeWav(8000, samples)
    // corrupt the fmt chunk length to -8: off += 8 + (-8) would never advance
    val bad = wav.clone()
    val b = java.nio.ByteBuffer.wrap(bad).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(16, -8)
    val e = intercept[IllegalArgumentException](multimodal.Media.wavFeatures(bad))
    assert(e.getMessage.contains("malformed WAV chunk"))
  }

  test("sessionization: gap splitting and aggregation (batch mode)") {
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val events = Seq(
      streaming.EventWindows.Event(1, ts(0), 7, "a", 1.0),
      streaming.EventWindows.Event(2, ts(10), 7, "a", 2.0),
      streaming.EventWindows.Event(3, ts(100), 7, "a", 3.0), // > 30 min gap → new session
      streaming.EventWindows.Event(4, ts(5), 8, "b", 4.0)
    ).toDS()
    val sessions = streaming.EventWindows.sessionize(events, gapMinutes = 30)
      .collect().sortBy(s => (s.user_id, s.session_start.getTime))
    assert(sessions.length === 3)
    assert(sessions(0).user_id === 7 && sessions(0).n_events === 2 && sessions(0).total_value === 3.0)
    assert(sessions(1).user_id === 7 && sessions(1).n_events === 1)
    assert(sessions(2).user_id === 8 && sessions(2).n_events === 1)
  }

  test("streaming windowedCounts runs on a real stream and matches batch") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft-evw")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"), srcDir.resolve("e.parquet"))
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val q = streaming.EventWindows.windowedCounts(spark.readStream.schema(schema).parquet(srcDir.toString))
      .writeStream.outputMode("append").format("memory").queryName("evw").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("evw").count()
    val batch = streaming.EventWindows.windowedCounts(spark.read.parquet(s"$sf/events.parquet")).count()
    // append mode emits only watermark-closed windows; all but the last close
    assert(streamed >= batch - 4 && streamed <= batch)
  }

  test("scalars: DOI normalize and size parse") {
    val df = Seq(
      ("https://doi.org/10.5281/zenodo.820562", "100MB"),
      ("no doi here", "2.5GB"),
      ("prefix 10.1234/abc.def suffix", "garbage")
    ).toDF("url", "size")
    val got = df.select(
      functions.Scalars.doiNormalize(col("url")).as("doi"),
      functions.Scalars.sizeToBytes(col("size")).as("bytes")
    ).collect()
    assert(got(0).getString(0) === "10.5281/zenodo.820562")
    assert(got(0).getLong(1) === 100000000L)
    assert(got(1).getString(0) === "")
    assert(got(1).getLong(1) === 2500000000L)
    assert(got(2).getString(0) === "10.1234/abc.def")
    assert(got(2).isNullAt(1))
  }

  test("axis-order swap struct (reference extent.py:149-183)") {
    val got = Seq((1.0, 2.0, 3.0, 4.0)).toDF("a", "b", "c", "d")
      .select(functions.Scalars.swapToLatLon(col("a"), col("b"), col("c"), col("d")).as("s"))
      .select("s.min_lat", "s.min_lon", "s.max_lat", "s.max_lon")
      .as[(Double, Double, Double, Double)].head()
    assert(got === ((2.0, 1.0, 4.0, 3.0)))
  }

  test("cell_encode registered as a SQL function (Catalyst expression via registry)") {
    functions.GraftFunctions.register(spark)
    val got = spark.sql("SELECT cell_encode(51.5d, 7.5d, 4) AS c").collect().head.getLong(0)
    assert(got === cells.QuadKey.encode(51.5, 7.5, 4))
    // codegen path: runs inside a projection over a real table
    val n = spark.range(100).selectExpr("cell_encode(CAST(id AS DOUBLE)/2, CAST(id AS DOUBLE), 6) AS c")
      .distinct().count()
    assert(n > 1)
  }

  test("cosine_sim native expression: bit-equal to the Scala UDF, registered in SQL, codegen'd") {
    functions.GraftFunctions.register(spark)
    val rnd = new java.util.Random(7)
    val vecs = Seq.fill(50)((Array.fill(16)(rnd.nextFloat() - 0.5f), Array.fill(16)(rnd.nextFloat() - 0.5f)))
    val df = vecs.toDF("a", "b")
    val both = df.select(
      functions.CosineSim(col("a"), col("b")).as("expr"),
      sim.Ann.cosineUdf(col("a"), col("b")).as("udf")).collect()
    assert(both.forall(r => r.getDouble(0) === r.getDouble(1))) // bit-equal, not approx
    val viaSql = df.createOrReplaceTempView("cos_t")
    val n = spark.sql("SELECT cosine_sim(a, b) AS c FROM cos_t WHERE cosine_sim(a, b) > -2").count()
    assert(n === 50)
    // the expression must not break whole-stage codegen (no ScalaUDF node)
    val plan = df.select(functions.CosineSim(col("a"), col("b"))).queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("embedding-cosine near-dup: pairs symmetric-free, above threshold, subset of exact") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val pairs = sim.Ann.cosineNearDupPairs(emb, threshold = 0.1).collect()
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall(_.getDouble(2) >= 0.1))
    // re-check a pair's cosine against the direct computation
    if (pairs.nonEmpty) {
      val p = pairs.head
      val vecs = emb.filter(col("vec_id").isin(p.getLong(0), p.getLong(1)))
        .orderBy("vec_id").collect().map(_.getSeq[Float](1))
      assert(math.abs(sim.Ann.cosine(vecs(0), vecs(1)) - p.getDouble(2)) < 1e-9)
    }
  }

  test("raster table: extents within plausibility, tbox priority modes all present") {
    val r = table.RasterTable.rasters(spark, sf)
    val e = table.RasterTable.extents(r).collect()
    assert(e.length === r.count())
    assert(e.forall(x => x.getDouble(1) >= -180 && x.getDouble(3) <= 180))
    val t = table.RasterTable.tboxes(r)
    val byMode = r.select("raster_id", "m").join(t, "raster_id")
      .groupBy("m").count().collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(byMode.keySet === Set(0L, 1L, 2L, 3L)) // every chain stage fires
  }
}
