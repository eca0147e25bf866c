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
}
