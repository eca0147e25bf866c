package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** PII redaction, Gopher-style repetition metrics, and benchmark-contamination
  * scanning — closed-form inputs with known answers (the q57/q58/q59 oracles
  * re-check the same operators against DuckDB at the driver's scale).
  */
class PipelineOpsSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("redactPii: counts and replaces emails, phones, IPv4s; clean text untouched") {
    val docs = Seq(
      (1L, "mail me at jane.doe+x@sub.example.org or bob@x.io, call +4915712345678, host 192.168.0.1"),
      (2L, "no pii here, just words and 12.5 numbers"),
      (3L, "twice a@b.com c@d.net and ip 10.0.0.300")
    ).toDF("doc_id", "text")
    val out = TextOps.redactPii(docs).collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((2L, 1L, 1L)))
    assert(out(2L) === ((0L, 0L, 0L)))
    // the IPv4 pattern is syntactic (1-3 digits per octet, no <=255 range
    // check), so "10.0.0.300" counts — documented contract, same in RE2
    assert(out(3L) === ((2L, 0L, 1L)))
    val red = TextOps.redactPii(docs)
    val texts = docs.select(col("doc_id"),
      regexp_replace(regexp_replace(regexp_replace(col("text"),
        TextOps.EmailRe, "<EMAIL>"), TextOps.PhoneRe, "<PHONE>"), TextOps.IpRe, "<IP>").as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(texts(1L) === "mail me at <EMAIL> or <EMAIL>, call <PHONE>, host <IP>")
  }

  test("redactPii: sequential counts — a phone inside an email's local part is not double-counted") {
    val docs = Seq(
      (1L, "reach a+1234567@x.com today"), // phone-shaped run inside the email
      (2L, "user@1.2.3.4 mails")           // NOT an email (numeric TLD) — the IP stands alone
    ).toDF("doc_id", "text")
    val out = TextOps.redactPii(docs).collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((1L, 0L, 0L))) // counted as email only, not also as a phone
    assert(out(2L) === ((0L, 0L, 1L))) // numeric domain fails the email TLD rule; IP counts
  }

  test("stripBoilerplate: a doc whose every line is boilerplate survives with empty text") {
    // 20 docs share the same single line -> 100% doc frequency, all stripped
    val docs = (1L to 20L).map(i => (i, "same line everywhere")).toDF("doc_id", "text")
    val out = TextOps.stripBoilerplate(docs, maxDocFrac = 0.05).collect()
    assert(out.length === 20)
    assert(out.forall(_.getAs[String]("clean_text") === ""))
    assert(out.forall(_.getAs[Long]("n_lines_kept") === 0L))
  }

  test("repetitionMetrics: duplicate-line and top-bigram fractions are exact") {
    val docs = Seq(
      // 4 lines, "dup" twice: dup_line_frac = 2/4; chars: dup 3*2=6 of 6+5+9=20... lines "dup","dup","hello","abcdwxyz!" => chars 3+3+5+8=19, dup 6
      (1L, "dup\ndup\nhello\nabcdwxyz"),
      // bigrams of "a b a b a": [a b, b a, a b, b a] -> top 2/4
      (2L, "a b a b a")
    ).toDF("doc_id", "text")
    val out = TextOps.repetitionMetrics(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_lines") === 4L)
    assert(out(1L).getAs[Double]("dup_line_frac") === 0.5)
    assert(math.abs(out(1L).getAs[Double]("dup_line_char_frac") - 6.0 / 19.0) < 1e-12)
    assert(out(2L).getAs[Double]("dup_line_frac") === 0.0)
    assert(out(2L).getAs[Double]("top_bigram_frac") === 0.5)
  }

  test("canonicalizeUrl: scheme-aware default ports, non-default ports survive, userinfo-free host") {
    val docs = Seq(
      (1L, "HTTPS://WWW.Ex.ORG:443/Path/x#frag"), // default port for https -> stripped
      (2L, "http://example.com:443/x"),           // NON-default for http -> kept
      (3L, "http://example.com:80/x"),            // default for http -> stripped
      (4L, "https://user@Host.org/a/")            // userinfo not part of the host
    ).toDF("doc_id", "url")
    val out = docs.select(col("doc_id"),
      graft.functions.Scalars.canonicalizeUrl(col("url")).as("c"))
      .withColumn("h", graft.functions.Scalars.urlHost(col("c")))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(out(1L) === (("https://ex.org/Path/x", "ex.org")))
    assert(out(2L) === (("http://example.com:443/x", "example.com")))
    assert(out(3L) === (("http://example.com/x", "example.com")))
    assert(out(4L) === (("https://user@host.org/a", "host.org")))
  }

  test("contamination: planted 8-gram overlap found via broadcast eval set; clean docs absent") {
    val sentence = "zero one two three four five six seven eight nine"
    val train = Seq(
      (10L, "completely unrelated training words " + sentence),
      (11L, "another doc with nothing shared at all whatsoever here today")
    ).toDF("doc_id", "text")
    val evalSet = Seq((900L, "eval prefix " + sentence)).toDF("doc_id", "text")
    val out = TextOps.contamination(train, evalSet, n = 8).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(0) === 10L)
    // the 10-word sentence contributes 3 fully-internal 8-grams shared verbatim
    assert(r.getAs[Long]("n_shared") === 3L)
    assert(r.getAs[Long]("n_eval_docs") === 1L)
  }

  test("spanDupStats: copies fully duplicated, short docs windowless, unique docs clean") {
    val long = (1 to 20).map(i => s"tok$i").mkString(" ")           // 20 tokens
    val other = (100 to 119).map(i => s"word$i").mkString(" ")      // disjoint 20 tokens
    val docs = Seq(
      (1L, long),                      // base
      (2L, long),                      // exact copy: every window duplicated
      (3L, other),                     // unique: zero duplicated windows
      (4L, "only five little tokens here"),              // < 8 tokens: no windows
      (5L, "prefix " + long)           // shares all of long's windows, shifted
    ).toDF("doc_id", "text")
    val got = TextOps.spanDupStats(docs, w = 8).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_windows"), r.getAs[Long]("n_dup_windows"))).toMap
    assert(got(1L) === ((13L, 13L)))   // 20-8+1 windows, all shared with doc 2
    assert(got(2L) === ((13L, 13L)))
    assert(got(3L) === ((13L, 0L)))
    assert(got(4L) === ((0L, 0L)))
    // doc 5: 14 windows; the first starts at 'prefix' and exists nowhere else
    assert(got(5L) === ((14L, 13L)))
  }

  test("spanDupStats: within-doc repetition alone is not cross-doc duplication") {
    val eight = "a b c d e f g h"
    val docs = Seq((1L, s"$eight $eight"), (2L, "z y x w v u t s")).toDF("doc_id", "text")
    val got = TextOps.spanDupStats(docs, w = 8).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_dup_windows")).toMap
    // doc 1 repeats its own window twice but no OTHER doc shares it
    assert(got(1L) === 0L && got(2L) === 0L)
  }

  test("kmvDistinct: exact branch below k, estimator branch deterministic and in range") {
    // exact branch: 10 distinct values < k=32 → est == exact distinct
    val small = (0 until 40).map(i => (s"v${i % 10}", "g1")).toDF("key", "grp0")
    val gotS = Sketches.kmvDistinct(small, col("key"), col("grp0"), k = 32).collect().head
    assert(gotS.getAs[Long]("n_minima") === 10L)
    assert(gotS.getAs[Double]("est_distinct") === 10.0)
    // estimator branch: 5000 distinct values, k=64 → relative error well
    // inside 5σ of the KMV bound 1/sqrt(k-2) ≈ 0.127
    val big = (0 until 5000).map(i => (s"item-$i", "g2")).toDF("key", "grp0")
    val est1 = Sketches.kmvDistinct(big, col("key"), col("grp0"), k = 64).collect().head
    val est2 = Sketches.kmvDistinct(big.repartition(7), col("key"), col("grp0"), k = 64)
      .collect().head
    assert(est1.getAs[Double]("est_distinct") === est2.getAs[Double]("est_distinct"),
      "sketch must be partitioning-independent")
    assert(est1.getAs[String]("kth_hash") === est2.getAs[String]("kth_hash"))
    val est = est1.getAs[Double]("est_distinct")
    assert(est > 5000 * 0.5 && est < 5000 * 1.7, s"estimate $est implausible for 5000")
  }

  test("sampledQuantiles: percentile_disc semantics, threshold gates the sample, partition-independent") {
    // threshold "ffff" admits every row here (max hash prefix efe8 — checked
    // offline) → quantiles of the full set
    val vals = Seq(10L, 20L, 30L, 40L, 50L, 60L, 70L, 80L, 90L, 100L)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v, "g") }
      .toDF("id", "v", "grp0")
    val got = Sketches.sampledQuantiles(df, col("v"), col("grp0"), col("id"),
        salt = "t", thresholdHex = "ffff", probs = Seq(0.5, 1.0))
      .collect().map(r => r.getDouble(1) -> r.getLong(2)).toMap
    // rank ceil(0.5*10)=5 → 50; ceil(1.0*10)=10 → 100
    assert(got(0.5) === 50L && got(1.0) === 100L)
    // partitioning must not change the sample or the ranks
    val rep = Sketches.sampledQuantiles(df.repartition(7), col("v"), col("grp0"),
        col("id"), salt = "t", thresholdHex = "ffff", probs = Seq(0.5, 1.0))
      .collect().map(r => r.getDouble(1) -> r.getLong(2)).toMap
    assert(rep === got)
    // a narrow threshold draws a strict, deterministic subsample
    val narrow = Sketches.sampledQuantiles(df, col("v"), col("grp0"), col("id"),
        salt = "t", thresholdHex = "40", probs = Seq(1.0)).collect()
    assert(narrow.forall(_.getLong(3) < 10L))
  }

  test("sampledQuantiles matches a brute-force reference on seeded random data") {
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val r = new java.util.Random(99)
    val rows = (0 until 500).map(i => (i.toLong, (r.nextInt(1000) + 1).toLong,
      if (i % 3 == 0) "a" else "b"))
    val df = rows.toDF("id", "v", "grp0")
    val probs = Seq(0.25, 0.5, 0.75, 0.95)
    val got = Sketches.sampledQuantiles(df, col("v"), col("grp0"), col("id"),
        salt = "ref", thresholdHex = "80", probs = probs)
      .collect().map(r0 => (r0.getString(0), r0.getDouble(1)) -> (r0.getLong(2), r0.getLong(3))).toMap
    for (g <- Seq("a", "b")) {
      val sample = rows.filter(t => t._3 == g)
        .map(t => (t._2, md5hex(s"ref:${t._1}")))
        .filter(_._2.substring(0, 2) < "80").sorted
      for (p <- probs) {
        val rank = math.ceil(p * sample.size).toLong
        assert(got((g, p)) === ((sample(rank.toInt - 1)._1, sample.size.toLong)),
          s"group $g p=$p")
      }
    }
  }

  test("kmvDistinct: NULL keys are excluded (COUNT DISTINCT semantics)") {
    // with k distinct non-null keys plus a NULL, the NULL must not occupy a
    // minima slot (Spark sorts NULLS FIRST; an engine-side NULL row would
    // shift kth_hash and diverge from a NULLS-LAST oracle)
    val rows = (0 until 40).map(i => (Option(s"v$i"), "g")) :+ ((None: Option[String], "g"))
    val df = rows.toDF("key", "grp0")
    val got = Sketches.kmvDistinct(df, col("key"), col("grp0"), k = 32).collect().head
    val noNull = Sketches.kmvDistinct(df.filter(col("key").isNotNull),
      col("key"), col("grp0"), k = 32).collect().head
    assert(got.getAs[String]("kth_hash") === noNull.getAs[String]("kth_hash"))
    assert(got.getAs[Double]("est_distinct") === noNull.getAs[Double]("est_distinct"))
  }

  test("KMV merge theorem: merging per-shard sketches equals sketching the union") {
    // 3 disjoint shards with overlapping key sets; sketch each shard, merge
    // the sketch ROWS (never the raw keys), and the finished estimates must
    // be identical to sketching the union directly
    val k = 16
    val shards = Seq(
      (0 until 400).map(i => (s"key-${i * 3}", "g")),        // multiples of 3
      (0 until 400).map(i => (s"key-${i * 2}", "g")),        // multiples of 2 (overlap)
      (0 until 150).map(i => (s"key-${i + 5000}", "g"))      // disjoint tail
    ).map(_.toDF("key", "grp0"))
    val perShard = shards.map(s => Sketches.kmvMinima(s, col("key"), col("grp0"), k))
    val merged = Sketches.kmvFinish(
      Sketches.kmvMerge(perShard.reduce(_ unionByName _), k), k).collect().head
    val direct = Sketches.kmvDistinct(
      shards.reduce(_ unionByName _), col("key"), col("grp0"), k).collect().head
    assert(merged.getAs[String]("kth_hash") === direct.getAs[String]("kth_hash"))
    assert(merged.getAs[Long]("n_minima") === direct.getAs[Long]("n_minima"))
    assert(merged.getAs[Double]("est_distinct") === direct.getAs[Double]("est_distinct"))
  }

  test("kmvDistinct: the k minima are exactly the k smallest distinct-key hashes (merge rule)") {
    val df = (0 until 300).map(i => (s"k$i", if (i % 2 == 0) "a" else "b")).toDF("key", "grp0")
    val got = Sketches.kmvDistinct(df, col("key"), col("grp0"), k = 16).collect()
      .map(r => r.getString(0) -> r.getAs[String]("kth_hash")).toMap
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    for ((g, par) <- Seq("a" -> 0, "b" -> 1)) {
      val hs = (0 until 300).filter(_ % 2 == par).map(i => md5hex(s"k$i")).sorted
      assert(got(g) === hs(15), s"group $g kth hash mismatch")
    }
  }
}
