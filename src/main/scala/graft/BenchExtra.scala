package graft

import org.apache.spark.sql.SparkSession

/** Supplementary measurement mains (guide §1.4) — NOT part of the frozen
  * driver contract (Bench.scala is the contract; this file only produces
  * evidence for OPTIMIZATION_r06.md).
  *
  *  - `kernel`: per-payload-kind wall time of the raw parse kernel
  *    (parse.Extract.extract), single-threaded min-of-k — answers "which
  *    handler branch is the headline pipeline actually paying for".
  *  - `minhash`: per-doc wall of shingling + the 64-lane minhash signature.
  *  - `noop`: each headline query evaluated through the noop sink (all
  *    columns forced, no collect) in a fresh session, so a query's own wall
  *    is visible without the count()-only column pruning Bench's per-query
  *    phase allows.
  */
object BenchExtra {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-extra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val mode = if (args.nonEmpty) args(0) else "kernel"
    mode match {
      case "kernel" => kernelProfile()
      case "minhash" => minhashProfile()
      case "csv" => csvProfile()
      case "text" => textProfile()
      case "noop" => noopQueries(args.drop(1))
      case "repeat" => repeatQuery(args(1), if (args.length > 2) args(2).toInt else 3)
      case "flagship" => flagshipBreakdown()
      case other => sys.error(s"unknown mode $other")
    }
  }

  /** Per-kind parse kernel profile: N payloads per kind (k = d%10), timed
    * single-threaded, min over `reps` passes. Prints one line per kind plus a
    * weighted total (kinds are uniform in the corpus).
    */
  private def kernelProfile(): Unit = {
    val perKind = 20000
    val reps = 3
    println("kind  us_per_page  (payload family)")
    val fam = Array("geojson", "kml", "gpx", "csv-latlon", "csv-wkt",
      "html-jsonld", "html-dc", "html-icbm", "text-gazetteer", "text-plain")
    var totalUs = 0.0
    for (kind <- 0 until 10) {
      val ids = Array.tabulate(perKind)(i => kind.toLong + 10L * i)
      val payloads = ids.map(d =>
        (table.PayloadSpec.payload(d).getBytes(java.nio.charset.StandardCharsets.UTF_8),
          table.PayloadSpec.text(d)))
      // warm
      payloads.foreach(p => parse.Extract.extract(p._1, p._2, "en"))
      var best = Double.MaxValue
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        payloads.foreach(p => parse.Extract.extract(p._1, p._2, "en"))
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      val us = best / perKind * 1e6
      totalUs += us
      println(f"$kind%4d  $us%10.2f  (${fam(kind)})")
    }
    println(f"mean  ${totalUs / 10}%10.2f  us/page (uniform kind mix)")
  }

  /** Stage-level breakdown of the csv-latlon branch (the kernel profile's
    * most expensive kind).
    */
  private def csvProfile(): Unit = {
    val n = 20000
    val payloads = Array.tabulate(n)(i => table.PayloadSpec.payload(3L + 10L * i))
    def time(label: String)(f: String => Unit): Unit = {
      payloads.foreach(f)
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        payloads.foreach(f)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$label%-28s ${best / n * 1e6}%8.2f us/page")
    }
    time("parseCsv only")(p => parse.CsvGeo.parseCsv(p))
    time("isSupported")(p => parse.CsvGeo.isSupported(p))
    time("extractIfSupported (full)")(p => parse.CsvGeo.extractIfSupported(p))
    time("Extract.extract (dispatch)")(p =>
      parse.Extract.extract(p.getBytes(java.nio.charset.StandardCharsets.UTF_8), null, "en"))
  }

  /** Stage-level breakdown of the text branch. */
  private def textProfile(): Unit = {
    val n = 20000
    val texts8 = Array.tabulate(n)(i => table.PayloadSpec.text(8L + 10L * i))
    val texts9 = Array.tabulate(n)(i => table.PayloadSpec.text(9L + 10L * i))
    def time(label: String, arr: Array[String])(f: String => Unit): Unit = {
      arr.foreach(f)
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        arr.foreach(f)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$label%-28s ${best / n * 1e6}%8.2f us/page")
    }
    time("TextGeo.extract (k8)", texts8)(t => parse.TextGeo.extract(t))
    time("TextGeo.extract (k9)", texts9)(t => parse.TextGeo.extract(t))
    time("NFC normalize (k9)", texts9)(t =>
      java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC))
  }

  /** Shingle + minhash kernel: per-doc wall over PayloadSpec texts. */
  private def minhashProfile(): Unit = {
    val n = 20000
    val texts = Array.tabulate(n)(i => table.PayloadSpec.text(i.toLong))
    def run(f: String => Unit): Double = {
      texts.foreach(f) // warm
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        texts.foreach(f)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      best / n * 1e6
    }
    val shingleUs = run(t => text.TextOps.shingleHashes(t))
    val sigUs = run(t => text.TextOps.minhash(text.TextOps.shingleHashes(t), 64))
    println(f"shingles only : $shingleUs%8.2f us/doc")
    println(f"shingle+minhash64: $sigUs%8.2f us/doc")
  }

  /** Flagship job-1 cost decomposition over the materialized bench corpus:
    * parquet scan, scan+parse (noop), scan+parse+cache+count — isolates how
    * much of the headline's first job is kernel vs Dataset-encoder vs
    * columnar cache build.
    */
  private def flagshipBreakdown(): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val pagesPath = s"/tmp/graft_bench_pages_${sfDir.replaceAll("[^0-9.]", "")}"
    val s = session(cpus)
    def t(label: String)(f: => Unit): Unit = {
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$label%-34s $best%7.2f s (min of 3)")
    }
    val pages = s.read.parquet(pagesPath)
    t("scan html+text (noop)") {
      pages.select("d", "warc_ts", "html", "text", "lang")
        .write.format("noop").mode("overwrite").save()
    }
    t("scan+parse only (no row encode)") {
      import s.implicits._
      pages.select("d", "warc_ts", "html", "text", "lang").as[operators.PageIn]
        .mapPartitions { it =>
          var n = 0L
          it.foreach { p => parse.Extract.extract(p.html, p.text, p.lang); n += 1 }
          Iterator.single(n)
        }.reduce(_ + _)
    }
    t("scan+parse (noop, no cache)") {
      operators.Extractor.extract(pages).toDF()
        .write.format("noop").mode("overwrite").save()
    }
    t("scan+parse+cache+count (job 1)") {
      val e = operators.Extractor.extract(pages).toDF().cache()
      e.count()
      e.unpersist()
    }
    s.stop()
  }

  /** One query run `n` times in ONE session (Bench's per-query methodology:
    * count() action, cacheExtracted on). Separates first-run cost (codegen
    * compile + JIT + cache fill) from steady-state cost.
    */
  private def repeatQuery(name: String, n: Int): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = session(cpus)
    System.setProperty("graft.cacheExtracted", "true")
    val fn = SparkEntry.queries(name)
    for (i <- 1 to n) {
      val t0 = System.nanoTime()
      fn(s, sfDir).count()
      println(f"$name run $i: ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    s.stop()
  }

  /** Headline queries through the noop sink, one fresh session per query so
    * no parse cache is shared (isolates the full cost of each query).
    */
  private def noopQueries(names: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val qs = if (names.nonEmpty) names.toSeq else Seq(
      "q01_extract_extent", "q04_bbox_merge", "q07_pip_join", "q08_knn_join",
      "q10_tiles", "q17_dedup_exact", "q22_ann_topk", "q23_minhash_pairs",
      "q39_media_features")
    for (name <- qs) {
      val s = session(cpus)
      s.sparkContext.setJobDescription(s"noop:$name")
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(s, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-22s $sec%7.2f s (noop, cold session)")
      s.stop()
    }
  }
}
