package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-data pipeline operators over the `documents` table: deduplication
  * (exact, MinHash-LSH, SimHash, n-gram Jaccard), text quality, language id,
  * token counting, fingerprinting. All distributed-first: per-doc work is narrow;
  * pair generation only ever happens inside LSH buckets (never a global cross
  * join), so candidate volume scales with bucket skew, not corpus².
  */
object TextOps {

  // ---- exact dedup (hash-groupBy) ----

  /** Exact duplicate groups by content hash; canonical doc = min doc_id.
    * At scale this is one shuffle on a 128-bit key with partial aggregation.
    */
  def exactDupGroups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(to_binary(col("text"), lit("utf-8"))).as("content_hash"))
      .agg(count(lit(1)).as("cnt"), min("doc_id").as("canonical_doc"))
      .filter(col("cnt") > 1)

  // ---- shingling / MinHash ----

  /** Deterministic 64-bit string hash (FNV-1a) — engine-owned so results are
    * reproducible across Spark versions.
    */
  def fnv1a(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  // the "\\s+" split pattern, compiled once — String.split re-compiles any
  // multi-char regex on every call, and the tokenizer sits on the per-doc
  // hot path of every shingle/simhash operator
  private val WsPattern = java.util.regex.Pattern.compile("\\s+")

  /** FNV-1a over the space-joined tokens [from, from+k) — byte-identical to
    * fnv1a(toks.slice(from, from+k).mkString(" ")) without materializing the
    * shingle string (one fewer allocation per shingle on the q23/q85 kernel).
    */
  private def fnvJoined(toks: Array[String], from: Int, k: Int): Long = {
    var h = 0xcbf29ce484222325L
    var t = from
    val end = from + k
    while (t < end) {
      if (t > from) { h ^= ' '.toLong; h *= 0x100000001b3L }
      val s = toks(t)
      var i = 0
      while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
      t += 1
    }
    h
  }

  /** Word 3-shingle hash set of a document (lowercased, whitespace tokens). */
  def shingleHashes(text: String, k: Int = 3): Array[Long] = {
    if (text == null) return Array.empty
    val toks = WsPattern.split(text.toLowerCase).filter(_.nonEmpty)
    if (toks.length < k) return if (toks.isEmpty) Array.empty else Array(fnvJoined(toks, 0, toks.length))
    val out = new Array[Long](toks.length - k + 1)
    var i = 0
    while (i + k <= toks.length) {
      out(i) = fnvJoined(toks, i, k)
      i += 1
    }
    out.distinct
  }

  // MinHash permutation coefficients, derived once per signature width — the
  // old per-document derivation re-hashed 2·numHashes format strings per doc
  // (128 string builds + FNV passes per document at the default 64 lanes),
  // dwarfing the actual min-scan for short documents
  private val mhCoefCache = new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def mhCoefs(numHashes: Int): (Array[Long], Array[Long]) =
    mhCoefCache.computeIfAbsent(numHashes, n => {
      val a = Array.tabulate(n)(j => fnv1a(s"minhash-a-$j") | 1L)
      val b = Array.tabulate(n)(j => fnv1a(s"minhash-b-$j"))
      (a, b)
    })

  /** MinHash signature: numHashes permutations h_i(x) = (a_i·x + b_i) mod p with
    * fixed seeds (deterministic — no Math.random, per harness contract).
    */
  def minhash(shingles: Array[Long], numHashes: Int): Array[Long] = {
    val (as, bs) = mhCoefs(numHashes)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < numHashes) {
      val a = as(j)
      val b = bs(j)
      var i = 0
      var mn = Long.MaxValue
      while (i < shingles.length) {
        val x = shingles(i) & Long.MaxValue
        val v = (a * x + b) & Long.MaxValue // mix in [0, 2^63)
        if (v < mn) mn = v
        i += 1
      }
      sig(j) = mn
      j += 1
    }
    sig
  }

  val minhashUdf = udf((text: String, numHashes: Int) => minhash(shingleHashes(text), numHashes))
  val shinglesUdf = udf((text: String) => shingleHashes(text))

  /** Collapse exact-duplicate texts to one representative per content hash
    * (canonical = min doc_id). Identical texts produce identical LSH keys, so
    * a mass-duplicated boilerplate page would otherwise put its whole clone
    * set into ONE bucket and the bucket self-join would go O(n²) in a single
    * task — the canonical 100 TB dedup scale-killer. Exact-duplicate pairs
    * belong to `exactDupGroups`; the LSH operators own only near-duplicates.
    */
  def collapseExactDups(docs: DataFrame): DataFrame = {
    // canonical ids via hash aggregation, then a semi join to keep the text —
    // aggregating the text itself (first(text)) would force SortAggregate
    // (string agg buffers aren't hash-mutable), i.e. a full corpus sort
    val canon = docs.groupBy(md5(to_binary(col("text"), lit("utf-8"))).as("_h"))
      .agg(min("doc_id").as("doc_id"))
    docs.select("doc_id", "text")
      .join(canon.select("doc_id"), Seq("doc_id"), "left_semi")
  }

  /** Drop rows living in buckets with more than `cap` members. A bucket above
    * the cap is a degenerate near-clone cluster: its pair count grows
    * quadratically while its information content doesn't (its members are
    * already connected through smaller buckets or the exact-dup pass). The
    * occupancy count is a partial-aggregating groupBy on the same key as the
    * pair join — no new shuffle key.
    */
  private def capBuckets(keyed: DataFrame, keyCols: Seq[String], cap: Int): DataFrame = {
    val sizes = keyed.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("_bucket_n"))
    keyed.join(sizes.filter(col("_bucket_n") <= cap), keyCols).drop("_bucket_n")
  }

  // Persisted stage boundaries, BOUNDED: each LSH call persists intermediate
  // frames that nothing downstream can safely unpersist (the result is lazy),
  // so a long-lived session calling the operators repeatedly would accumulate
  // cached blocks without bound. A small FIFO evicts the oldest persisted
  // frames past a fixed cap — unpersist is always safe (Spark recomputes from
  // lineage if a late consumer still needs one).
  private val persistedStages = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private def persistBounded(df: DataFrame): DataFrame = {
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    persistedStages.add(df)
    while (persistedStages.size > 8) Option(persistedStages.poll()).foreach(_.unpersist(false))
    df
  }

  /** The exact band signature as a joinable key: the band's minhash values,
    * comma-joined. Shared by the batch and streaming LSH faces so a replayed
    * corpus lands in identical buckets in both.
    */
  def bandSig(sig: Column, from: Int, rowsPerBand: Int): Column =
    array_join(transform(slice(sig, from, rowsPerBand), _.cast("string")), ",")

  /** MinHash-LSH candidate pairs: signature → `bands` bands of `rows` hashes,
    * exact-band bucket join (self-join within buckets only, occupancy-capped),
    * pair dedup. Output (doc_a < doc_b, est_jaccard from full signatures).
    * Signatures are joined back AFTER pair dedup, so the band-bucket shuffle
    * carries only (band, band signature, doc_id) — a fraction of shipping
    * both 64-hash signatures through every bucket.
    *
    * The bucket key is the band's minhash values themselves (rendered as a
    * short string), NOT a fixed-width proxy hash: two documents share a
    * bucket IFF their `rowsPerBand` minhash rows truly agree. A 32-bit
    * `hash(slice)` proxy admitted 42 Jaccard≈0 pairs at the 500k-doc sf1
    * replay through band-hash collisions — an expected-count ≈
    * bands·C(n,2)·2⁻³² effect that grows QUADRATICALLY with corpus size
    * (a scale bug, not noise); the exact key makes spurious-candidate
    * probability zero by construction at any scale.
    */
  def minhashCandidatePairs(docs: DataFrame, bands: Int = 16, rowsPerBand: Int = 4,
                            bucketCap: Int = 1000): DataFrame = {
    val numHashes = bands * rowsPerBand
    // persist the signature and banded-bucket stages: they are each consumed
    // by several downstream branches (bucket sizes, both self-join sides, the
    // post-dedup signature joins), and without a materialization point every
    // branch re-runs the shingle+minhash UDF chain over the corpus — the
    // stage boundary a production dedup pipeline would write to a table
    // anyway. MEMORY_AND_DISK: evictable, recomputable, ~130 B/doc.
    val sigs = persistBounded(collapseExactDups(docs)
      .select(col("doc_id"), minhashUdf(col("text"), lit(numHashes)).as("sig")))
    val banded = sigs.select(col("doc_id"),
      posexplode(array((0 until bands).map(b =>
        bandSig(col("sig"), b * rowsPerBand + 1, rowsPerBand)): _*)).as(Seq("band", "bandsig")))
    val kept = persistBounded(capBuckets(banded, Seq("band", "bandsig"), bucketCap))
    val l = kept.select(col("band"), col("bandsig"), col("doc_id").as("doc_a"))
    val r = kept.select(col("band"), col("bandsig"), col("doc_id").as("doc_b"))
    val pairs = l.join(r, Seq("band", "bandsig"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .dropDuplicates("doc_a", "doc_b")
    pairs
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (aggregate(zip_with(col("sig_a"), col("sig_b"), (a, b) => when(a === b, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).cast("double") / numHashes).as("est_jaccard"))
  }

  /** Exact n-gram Jaccard for a candidate-pair DataFrame (doc_a, doc_b).
    * Only documents that actually appear in a pair are shingled (semi join
    * first): candidate verification must touch candidates, not re-scan the
    * corpus — at 100 TB the pair set is orders of magnitude smaller.
    */
  def exactJaccard(pairs: DataFrame, docs: DataFrame): DataFrame = {
    // explode, not a two-branch union: `pairs` may be an expensive un-cached
    // DAG (an LSH candidate generator) and each branch would re-evaluate it;
    // the id set is persisted for the call (bounded FIFO) because the Bloom
    // build below adds passes over it.
    // shuffle_hash hint: without stats Spark sorts both semi-join sides
    // (SortMergeJoin); the candidate id set is the small side but not
    // reliably broadcast-small at 100 TB, so hash-build it instead of
    // sorting the corpus
    val ids = persistBounded(
      pairs.select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id")).distinct())
    // Bloom pre-filter (optimization guide §3.2): candidate verification
    // touches candidates, which at corpus scale are orders of magnitude
    // fewer than documents — drop definitely-non-candidate docs BEFORE the
    // semi-join exchange, cutting the corpus-side shuffle to ~the candidate
    // set (+1 % false positives). No false negatives, and the semi join
    // still runs, so the result is byte-identical with or without the
    // filter.
    val nIds = math.max(1L, ids.count())
    val bf = ids.stat.bloomFilter("doc_id", nIds, 0.01)
    val bfB = docs.sparkSession.sparkContext.broadcast(bf)
    val mightMatch = udf((id: Long) => bfB.value.mightContainLong(id))
    val sh = docs.filter(mightMatch(col("doc_id")))
      .join(ids.hint("shuffle_hash"), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), shinglesUdf(col("text")).as("sh"))
    pairs
      .join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
      .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / col("uni")).as("jaccard"))
  }

  /** 64-bit SimHash over token FNV hashes. */
  def simhash(text: String): Long = {
    if (text == null) return 0L
    val counts = new Array[Int](64)
    for (tok <- WsPattern.split(text.toLowerCase) if tok.nonEmpty) {
      val h = fnv1a(tok)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  val simhashUdf = udf((text: String) => simhash(text))

  /** SimHash near-dup candidates: equal 16-bit chunks (Hamming ≤ 3 ⇒ at least
    * one of 4 chunks equal) → occupancy-capped bucket join, then exact Hamming
    * filter. Exact duplicates are pre-collapsed (identical text ⇒ identical
    * simhash ⇒ one degenerate bucket otherwise).
    */
  def simhashCandidatePairs(docs: DataFrame, maxHamming: Int = 3,
                            bucketCap: Int = 1000): DataFrame = {
    // same persisted stage boundary as minhashCandidatePairs: the chunked
    // frame feeds the occupancy count and both self-join sides
    val sh = persistBounded(
      collapseExactDups(docs).select(col("doc_id"), simhashUdf(col("text")).as("sh")))
    val chunked = sh.select(col("doc_id"), col("sh"),
      posexplode(array((0 until 4).map(c => shiftrightunsigned(col("sh"), c * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("chunk", "chunkval")))
    val kept = persistBounded(capBuckets(chunked, Seq("chunk", "chunkval"), bucketCap))
    val l = kept.select(col("chunk"), col("chunkval"), col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val r = kept.select(col("chunk"), col("chunkval"), col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    l.join(r, Seq("chunk", "chunkval"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .dropDuplicates("doc_a", "doc_b")
  }

  // ---- boilerplate removal (line-frequency, CCNet/RefinedWeb-style) ----

  /** Remove lines that occur in more than `maxDocFrac` of the corpus — the
    * canonical web-pipeline boilerplate strip (copyright footers, nav bars).
    * Distributed shape: one line explode, a partial-aggregating line-frequency
    * count, a broadcast of the scalar corpus size, and an anti join back —
    * no per-doc state, no driver-side text. Output: doc_id, clean_text
    * (lines rejoined in original order), n_lines_kept.
    */
  def stripBoilerplate(docs: DataFrame, maxDocFrac: Double): DataFrame = {
    val lines = docs.select(col("doc_id"),
      posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
    val nDocs = docs.agg(count(lit(1)).as("_n"))
    val frequent = lines.groupBy("line").agg(count_distinct(col("doc_id")).as("_d"))
      .crossJoin(broadcast(nDocs))
      .filter(col("_d") > col("_n") * maxDocFrac)
      .select("line")
    val keptAgg = lines.join(frequent, Seq("line"), "left_anti")
      .groupBy("doc_id")
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")), "\n").as("clean_text"),
        count(lit(1)).as("n_lines_kept"))
    // a doc whose every line is boilerplate must SURVIVE with empty text —
    // silently dropping it would lose documents from the corpus exactly when
    // the strip works hardest
    docs.select("doc_id").join(keptAgg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"))
  }

  // ---- PII redaction ----

  /** PII patterns chosen for identical semantics under Java regex (Spark) and
    * RE2 (DuckDB oracle): character classes, bounded repetition and `\b` only —
    * no backrefs or lookaround.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9]{7,15}"
  val IpRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Redact emails, E.164-style phone numbers and IPv4 addresses; emit per-doc
    * match counts plus an md5 of the redacted text. Pure codegen'd column
    * expressions (regexp_extract_all/regexp_replace) — narrow, no shuffle.
    * Replacement order (email → phone → ip) is part of the contract, and each
    * count is taken on the text AFTER the earlier patterns were consumed, so
    * the counts always agree with the emitted redaction (e.g. a phone-shaped
    * digit run inside an email's local part counts as part of the email, not
    * as a phone).
    */
  def redactPii(docs: DataFrame): DataFrame = {
    val t = col("text")
    val afterEmail = regexp_replace(t, EmailRe, "<EMAIL>")
    val afterPhone = regexp_replace(afterEmail, PhoneRe, "<PHONE>")
    docs.select(col("doc_id"),
      size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(afterEmail, lit(PhoneRe), lit(0))).cast("long").as("n_phones"),
      size(regexp_extract_all(afterPhone, lit(IpRe), lit(0))).cast("long").as("n_ips"),
      md5(to_binary(regexp_replace(afterPhone, IpRe, "<IP>"), lit("utf-8"))).as("redacted_md5"))
  }

  // ---- repetition metrics (Gopher-style quality filters) ----

  /** Per-document repetition metrics (Gopher §A1.3 family): fraction of lines
    * (and of line characters) inside exactly-duplicated lines, and the
    * occurrence share of the most frequent word bigram. All metrics are
    * per-document, so the right 100 TB plan is ONE narrow pass with per-doc
    * hash maps — an explode → groupBy(doc, line/bigram) formulation would
    * shuffle the whole exploded corpus twice to regroup what was never split
    * across partitions in the first place. (A deliberate UDF-over-builtins
    * call: the builtin route costs two corpus-wide shuffles.)
    */
  private val repMetricsUdf = udf((text: String) => {
    val lines = text.split("\n").filter(_.nonEmpty)
    val nLines = lines.length.toLong
    if (nLines == 0L) (0L, 0.0, 0.0, 0.0)
    else {
      val lc = new java.util.HashMap[String, Int]()
      lines.foreach(l => lc.merge(l, 1, Integer.sum _))
      var dupLines = 0L; var dupChars = 0L; var totChars = 0L
      lc.forEach { (l, c) =>
        totChars += c.toLong * l.length
        if (c > 1) { dupLines += c; dupChars += c.toLong * l.length }
      }
      val ws = WsPattern.split(text.toLowerCase).filter(_.nonEmpty)
      var topFrac = 0.0
      if (ws.length >= 2) {
        val bc = new java.util.HashMap[String, Int]()
        var i = 0
        while (i + 1 < ws.length) { bc.merge(ws(i) + " " + ws(i + 1), 1, Integer.sum _); i += 1 }
        var mx = 0
        bc.forEach((_, c) => if (c > mx) mx = c)
        topFrac = mx.toDouble / (ws.length - 1)
      }
      (nLines, dupLines.toDouble / nLines, dupChars.toDouble / totChars, topFrac)
    }
  })

  def repetitionMetrics(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), repMetricsUdf(col("text")).as("m"))
      .select(col("doc_id"), col("m._1").as("n_lines"), col("m._2").as("dup_line_frac"),
        col("m._3").as("dup_line_char_frac"), col("m._4").as("top_bigram_frac"))

  // ---- benchmark contamination ----

  /** Distinct lowercase word n-grams of a text column as strings (strings, not
    * hashes, so an SQL oracle can recompute them; a production run would wrap
    * this in xxhash64 to shrink the shuffle — same plan shape).
    */
  def ngramStrings(text: Column, n: Int): Column = {
    val ws = filter(split(lower(text), "\\s+"), w => w =!= "")
    when(size(ws) >= n,
      array_distinct(transform(sequence(lit(1), size(ws) - (n - 1)),
        i => array_join(slice(ws, i, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  /** Benchmark-contamination scan: flag training documents sharing at least
    * one word `n`-gram with any document of a (small) evaluation set. The eval
    * side's distinct n-grams are BROADCAST — the training corpus is scanned
    * once, never shuffled, which is the only viable plan when train is 100 TB
    * and eval is a few thousand benchmark documents.
    */
  def contamination(train: DataFrame, evalSet: DataFrame, n: Int = 8): DataFrame = {
    val trainNg = train.select(col("doc_id"), explode(ngramStrings(col("text"), n)).as("ng"))
    val evalNg = evalSet.select(col("doc_id").as("eval_id"),
      explode(ngramStrings(col("text"), n)).as("ng")).distinct()
    trainNg.join(broadcast(evalNg), Seq("ng"))
      .groupBy("doc_id")
      .agg(count_distinct(col("ng")).as("n_shared"),
        count_distinct(col("eval_id")).as("n_eval_docs"))
  }

  // ---- token-window chunking ----

  /** Split documents into overlapping token windows (the training-window
    * chunker: chunk i covers tokens [i·step, i·step+chunkTokens), step =
    * chunkTokens − overlap; the last chunk may be shorter). One narrow
    * explode per doc — no shuffle; chunk content is carried as an md5 so the
    * output stays thin. Whitespace tokens keep the contract SQL-mirrorable.
    */
  def chunkDocs(docs: DataFrame, chunkTokens: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens, "need 0 <= overlap < chunkTokens")
    val step = chunkTokens - overlap
    val ws = filter(split(col("text"), "\\s+"), w => w =!= "")
    val withWs = docs.select(col("doc_id"), ws.as("ws")).withColumn("n", size(col("ws")))
    val nChunks = when(col("n") <= chunkTokens, lit(1))
      .otherwise(floor((col("n") - chunkTokens + (step - 1)) / lit(step.toDouble)).cast("int") + 1)
    withWs.withColumn("chunk_idx", explode(sequence(lit(0), nChunks - 1)))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        slice(col("ws"), col("chunk_idx") * step + 1, lit(chunkTokens)).as("toks"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("toks")).cast("long").as("n_tokens"),
        md5(to_binary(array_join(col("toks"), " "), lit("utf-8"))).as("chunk_md5"))
  }

  // ---- quality / language / tokens / fingerprint ----

  /** Marker stopwords per language for the n-gram language-id heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "de" -> Seq(" der ", " und ", " die "),
    "fr" -> Seq(" le ", " et ", " les "),
    "es" -> Seq(" el ", " y ", " los "))

  private def occurrences(c: Column, needle: String): Column =
    ((length(c) - length(replace(c, lit(needle), lit("")))) / needle.length).cast("long")

  /** Deterministic language id: argmax of marker-word occurrence counts with
    * alphabetical tie-break; all-zero → "und".
    */
  def langIdCol(text: Column): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val scores = langMarkers.map { case (lang, markers) =>
      (lang, markers.map(m => occurrences(padded, m)).reduce(_ + _))
    }
    val best = scores.map(_._2).reduce((a, b) => when(a >= b, a).otherwise(b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && s > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Quality metrics: token count, punctuation ratio, uppercase ratio,
    * stopword ratio, mean token length.
    */
  def qualityMetrics(docs: DataFrame): DataFrame = {
    val t = col("text")
    val nChars = length(t).cast("double")
    val nTokens = size(split(trim(t), "\\s+"))
    val punct = (length(t) - length(regexp_replace(t, "[.,;:!?]", ""))).cast("double")
    val upper = (length(t) - length(regexp_replace(t, "[A-Z]", ""))).cast("double")
    val stopHits = Seq(" the ", " and ", " of ", " to ", " a ")
      .map(m => occurrences(concat(lit(" "), lower(t), lit(" ")), m)).reduce(_ + _)
    docs.select(col("doc_id"),
      nTokens.as("n_tokens"),
      (punct / nChars).as("punct_ratio"),
      (upper / nChars).as("upper_ratio"),
      (stopHits.cast("double") / nTokens).as("stopword_ratio"))
  }

  /** 60-bit content fingerprint from the md5 prefix (hex → long), usable as a
    * stable shard/dedup key.
    */
  def fingerprintCol(text: Column): Column =
    conv(substring(md5(to_binary(text, lit("utf-8"))), 1, 15), 16, 10).cast("long")

  /** Cumulative-size document selection (reference F5 semantics: running-sum
    * knapsack prefix in a deterministic order,
    * reference: geoextent/lib/helpfunctions.py:2012-2150).
    */
  def sizeLimitedSelect(docs: DataFrame, sizeCol: String, orderCol: String, limit: Long): DataFrame =
    graft.operators.PrefixSum
      .withRunningSum(docs, Seq(col(orderCol)), col(sizeCol), "cum_size")
      .filter(col("cum_size") <= limit)

  /** F5 size-limited selection over ATOMIC GROUPS with the reference's four
    * strategies (reference: helpfunctions.py:2012-2150; group atomicity — a
    * shapefile's component files are selected or skipped together —
    * helpfunctions.py:1949-2009). The strategy orders the groups, the running
    * cumsum of group sizes applies the limit, then members rejoin their
    * selected groups. "random" uses a deterministic md5-of-group-key order —
    * the engine's reproducible analog of the reference's random.seed(42)
    * shuffle (seeded-PRNG permutations aren't portable across engines; a
    * keyed hash order is equally uniform and oracle-checkable).
    */
  // ---- substring-level (window) dedup ----

  /** Duplicated-span statistics: per document, how many of its sliding
    * `w`-token windows occur verbatim in at least one OTHER document — the
    * hash-window variant of exact-substring training-data dedup (Lee et al.
    * 2022 dedupe repeated 50-token spans with a suffix array; a distributed
    * engine gets the same signal from fixed-width window hashes, the shape
    * CCNet/RefinedWeb use for paragraph/line dedup).
    *
    * Output: (doc_id, n_windows, n_dup_windows). A downstream filter on
    * `n_dup_windows / n_windows` is the span-level dedup policy knob.
    *
    * Scale shape: one narrow explode (corpus tokens × 1 window row per
    * position, each a 16-byte md5 key + doc_id — never the window text past
    * the first aggregation), then hash aggregations and an id-only semi join,
    * exactly the q55 boilerplate-strip topology. Nothing is ever pairwise:
    * a window shared by a million docs costs one aggregation row, not 1e12
    * pairs.
    */
  def spanDupStats(docs: DataFrame, w: Int = 8): DataFrame = {
    val base = docs.select(col("doc_id"),
      filter(split(col("text"), "\\s+"), t => t =!= lit("")).as("_toks"))
    // one row per window position; windows are md5-keyed immediately so the
    // shuffles below carry (16-byte hash, doc_id) — not window strings
    val winH = base.filter(size(col("_toks")) >= w)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("_toks")) - (w - 1)),
          p => array_join(slice(col("_toks"), p, lit(w)), " "))).as("_win"))
      .select(col("doc_id"), md5(to_binary(col("_win"), lit("utf-8"))).as("_wh"))
    // per-(window, doc) occurrence counts → windows seen in ≥2 distinct docs
    val occ = winH.groupBy("_wh", "doc_id").agg(count(lit(1)).as("_occ"))
    val dupW = occ.groupBy("_wh").agg(count(lit(1)).as("_nd"))
      .filter(col("_nd") >= 2).select("_wh")
    val perDoc = occ.join(dupW, Seq("_wh"), "left_semi")
      .groupBy("doc_id").agg(sum("_occ").as("n_dup_windows"))
    base.select(col("doc_id"),
        greatest(size(col("_toks")) - (w - 1), lit(0)).cast("long").as("n_windows"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"))
  }

  def groupedSizeSelect(docs: DataFrame, sizeCol: String, groupExpr: Column,
                        strategy: String, limit: Long): DataFrame = {
    val groups = docs.withColumn("_g", groupExpr)
      .groupBy("_g").agg(sum(col(sizeCol)).as("_gsize"))
    val order = strategy match {
      case "random" => Seq(md5(col("_g").cast("string")), col("_g"))
      case "smallest" => Seq(col("_gsize").asc, col("_g"))
      case "largest" => Seq(col("_gsize").desc, col("_g"))
      case _ => Seq(col("_g"))
    }
    val selected = graft.operators.PrefixSum
      .withRunningSum(groups, order, col("_gsize"), "_cum")
      .filter(col("_cum") <= limit)
    docs.withColumn("_g", groupExpr)
      .join(selected.select(col("_g"), col("_cum")), Seq("_g"), "inner")
      .withColumnRenamed("_g", "grp").withColumnRenamed("_cum", "grp_cum")
  }
}
