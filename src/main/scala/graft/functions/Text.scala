package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines:
  * tokenization, token counting (whitespace + BPE-ish), quality scoring,
  * language identification (stopword-marker heuristic), and document
  * fingerprinting. Built from codegen-friendly
  * `org.apache.spark.sql.functions` expressions where those exist, and
  * compiled per-document kernels (plain Scala UDFs over token arrays) where
  * the expression form would be a CodegenFallback higher-order function
  * (filter/transform run interpreted lambda-eval and break the surrounding
  * whole-stage-codegen span — round-12 profile). Everything is a per-row
  * map; these scale linearly over any document count.
  *
  * Numeric design: every ratio is an exact integer count divided once at the
  * end — deterministic, and replicable verbatim in the DuckDB oracle.
  */
object Text {

  /** Lowercase word tokens (letters/digits/apostrophes).
    *
    * `array_remove(..., "")`, not `filter(..., _ =!= "")`: identical output
    * (split never yields nulls, so removing ""-elements IS the non-empty
    * filter), but ArrayFilter is a CodegenFallback higher-order function —
    * it breaks whole-stage codegen for the entire projection around every
    * tokenize call — while ArrayRemove generates code.
    */
  def tokens(c: Column): Column =
    array_remove(split(lower(c), "[^a-z0-9']+"), "")

  /** Plain-Java tokenizer over ALREADY-LOWERCASED text, for fused kernels
    * (round 13): the maximal runs of `[a-z0-9']` — exactly what
    * `array_remove(split(lowered, "[^a-z0-9']+"), "")` yields, because
    * splitting on runs of non-class characters and dropping empty segments
    * IS "collect the maximal class-character runs". The character class is
    * pure ASCII, so per-char comparison and the regex agree on every
    * input (any non-ASCII unit, surrogates included, is a separator under
    * both). Lowercasing stays a Spark `lower()` expression upstream so
    * case-mapping semantics are Spark's, not ours. A linear scan with no
    * regex engine and no intermediate Spark array — the chain
    * tokens→kernel paid a regex split plus an ArrayData→Array[String]
    * conversion per document on every shingle/minhash path.
    */
  private[graft] def tokenizeLowered(s: String): Array[String] = {
    val len = s.length
    val out = new scala.collection.mutable.ArrayBuffer[String](
      math.min(len / 5 + 1, 64))
    var i = 0
    while (i < len) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '\'') {
        val start = i
        i += 1
        while (i < len && {
          val d = s.charAt(i)
          (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9') || d == '\''
        }) i += 1
        out += s.substring(start, i)
      } else i += 1
    }
    out.toArray
  }

  /** Fused drop-in for [[tokens]] over pre-lowercased text (round 13):
    * the linear-scan tokenizer in one UDF — no regex engine. The output
    * array still crosses the UDF boundary, so prefer the fully-fused
    * shingle/simhash/langid kernels where the consumer allows; this form
    * serves consumers that need the token ARRAY itself (explodes, slice
    * windows, multi-use caches). NULL text → NULL, like split's.
    */
  def tokensFromLowered(lowered: Column): Column = tokensFromLoweredK(lowered)

  private val tokensFromLoweredK = udf { (s: String) =>
    if (s == null) null else tokenizeLowered(s)
  }

  /** ≡ `array_distinct(tokens(c))`: distinct tokens in first-occurrence
    * order, one fused pass. NULL text → NULL. */
  def distinctTokensFromLowered(lowered: Column): Column =
    distinctTokensFromLoweredK(lowered)

  private val distinctTokensFromLoweredK = udf { (s: String) =>
    if (s == null) null
    else {
      val ts = tokenizeLowered(s)
      val set = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i < ts.length) { set.add(ts(i)); i += 1 }
      if (set.size == ts.length) ts else set.toArray(new Array[String](set.size))
    }
  }

  /** ≡ `size(tokens(c)).cast("long")` under ANSI semantics (NULL text →
    * NULL count), fused and regex-free — and config-robust where
    * legacy sizeOfNull would have yielded -1. */
  def tokenCountFromLowered(lowered: Column): Column = tokenCountFromLoweredK(lowered)

  private val tokenCountFromLoweredK = udf { (s: String) =>
    if (s == null) None
    else {
      // count maximal [a-z0-9'] runs without materializing substrings
      var n = 0L
      var i = 0
      val len = s.length
      var in = false
      while (i < len) {
        val c = s.charAt(i)
        val isTok = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '\''
        if (isTok && !in) { n += 1; in = true }
        else if (!isTok) in = false
        i += 1
      }
      Some(n)
    }
  }

  /** Counts use regexp_count (codegen'd, no array materialization) — same
    * result as sizing the extracted arrays, measurably cheaper.
    */
  def tokenCount(c: Column): Column =
    regexp_count(lower(c), lit("[a-z0-9']+")).cast("long")

  /** BPE-ish subword proxy: letter runs, single digits, single punctuation. */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  def bpeTokenCount(c: Column): Column =
    regexp_count(c, lit(BpePattern)).cast("long")

  def punctCount(c: Column): Column =
    regexp_count(c, lit("[^A-Za-z0-9\\s]")).cast("long")

  def wsTokenCount(c: Column): Column =
    regexp_count(c, lit("\\S+")).cast("long")

  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "as", "with", "at", "by", "from")

  private val StopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Stopwords.foreach(s.add)
    s
  }

  /** Compiled kernel (round 12): `size(filter(toks, isin(...)))` is an
    * interpreted higher-order expression — 18 string comparisons per token
    * through the lambda-eval path, on the q12/q31/q50 hot paths. One
    * hash-set probe per token instead; NULL token arrays still yield NULL
    * (size(filter(null)) was NULL).
    */
  private val stopCountK = udf { (ts: Array[String]) =>
    if (ts == null) None
    else {
      var c = 0L
      var i = 0
      while (i < ts.length) { if (StopSet.contains(ts(i))) c += 1; i += 1 }
      Some(c)
    }
  }

  def stopwordCount(toks: Column): Column = stopCountK(toks)

  /** [[stopCountK]] marked non-deterministic — identical values, but the
    * optimizer may not duplicate or reorder expressions containing it. Used
    * by [[qualityScoreFromOnce]] for query shapes that FILTER on the score:
    * a deterministic filter on a projected column is substituted through
    * the projection (and through joins below it), so the whole quality
    * expression — the stopword kernel plus a regexp_extract_all over the
    * full text — re-evaluates once in the pushed filter and again in the
    * projection (guide §4.4; seen verbatim in q31's executed plan).
    */
  private val stopCountNdK = stopCountK.asNondeterministic()

  /** Composite quality score in [0,1]: length, stopword density, punctuation
    * noise. Mirrors the shape of C4/Gopher-style heuristic filters.
    */
  def qualityScore(c: Column): Column = qualityScoreFrom(tokens(c), c)

  /** Quality score over an (ideally materialized) token column + raw text. */
  def qualityScoreFrom(toks: Column, c: Column): Column =
    qualityScoreImpl(toks, c, stopCountK(toks))

  /** [[qualityScoreFrom]] guaranteed to evaluate ONCE when filtered on —
    * same values (the non-deterministic marker is an optimizer fence, the
    * kernel is pure); prefer in pipelines that filter on the score. */
  def qualityScoreFromOnce(toks: Column, c: Column): Column =
    qualityScoreImpl(toks, c, stopCountNdK(toks))

  private def qualityScoreImpl(toks: Column, c: Column, stops: Column): Column = {
    val nTok = size(toks).cast("double")
    val stopRatio = stops / nullifZero(size(toks).cast("long"))
    val punctRatio = punctCount(c) / nullifZero(length(c).cast("long"))
    least(lit(1.0), nTok / 200.0) * 0.5 +
      coalesce(stopRatio, lit(0.0)) * 0.25 +
      (lit(1.0) - least(lit(1.0), coalesce(punctRatio, lit(0.0)) * 5.0)) * 0.25
  }

  private def nullifZero(c: Column): Column = when(c === 0, lit(null)).otherwise(c)

  /** Per-language marker words for the n-gram/stopword language-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is"),
    "es" -> Seq("el", "los", "de", "que", "y", "las"),
    "fr" -> Seq("le", "les", "et", "des", "une", "est"),
    "de" -> Seq("der", "die", "und", "das", "ein", "mit"),
    "zh" -> Seq("的", "是", "了", "在", "有", "我"))

  def langScore(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers: _*))).cast("long")

  /** Deterministic language-ID: argmax of marker-word counts with a fixed
    * tie-break cascade (en < es < fr < de < zh requires strictly greater).
    *
    * Prefer [[langIdFromTokens]] over a materialized token column in hot
    * paths — this convenience form references the tokenizer expression once
    * per score term, which interpreted eval recomputes.
    */
  def langId(c: Column): Column = langIdFromTokens(tokens(c))

  /** Language-ID over an (ideally materialized) token-array column.
    *
    * Compiled kernel (round 12): the expression form ran five interpreted
    * `filter(isin)` passes (one per language, 6 marker comparisons per
    * token each) through the higher-order lambda-eval path. One pass with
    * hash-map marker lookup computes the identical counts; the tie cascade
    * is replicated verbatim (strictly-greater, en < es < fr < de < zh). A
    * NULL token array scored NULL everywhere, which fell through every
    * strict comparison to "en" — same as counting zero markers.
    */
  // java.lang.Integer values, NOT Int: with a HashMap[String, Int], Scala
  // auto-unboxes get()'s result — unboxToInt(null) is 0, so every
  // non-marker token silently counted as language 0 ("en") and the
  // null-guard below was constant-true (the round-12 kernel shipped with
  // exactly this bug; the oracle-checked corpus classifies all-en at the
  // small SFs, which masked it). Integer keeps the miss observable.
  private val LangIndex: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    LangMarkers.zipWithIndex.foreach { case ((_, markers), li) =>
      markers.foreach { w =>
        // single-map scoring assumes marker sets are pairwise disjoint (they
        // are); a shared marker would need one count pass per language
        require(m.put(w, Integer.valueOf(li)) == null,
          s"marker '$w' appears in two languages")
      }
    }
    m
  }

  private val langIdK = udf { (ts: Array[String]) =>
    val c = new Array[Long](5) // en, es, fr, de, zh — LangMarkers order
    if (ts != null) {
      var i = 0
      while (i < ts.length) {
        val li = LangIndex.get(ts(i))
        if (li ne null) c(li.intValue) += 1
        i += 1
      }
    }
    val (en, es, fr, de, zh) = (c(0), c(1), c(2), c(3), c(4))
    if (zh > math.max(math.max(en, es), math.max(fr, de))) "zh"
    else if (de > math.max(math.max(en, es), fr)) "de"
    else if (fr > math.max(en, es)) "fr"
    else if (es > en) "es"
    else "en"
  }

  def langIdFromTokens(toks: Column): Column = langIdK(toks)

  /** Fused [[langId]] over pre-lowercased text (round 13): tokenize +
    * marker counting in one pass, nothing but the winning label crosses
    * the UDF boundary. NULL text counts zero markers → "en", exactly like
    * the token form's NULL array.
    */
  def langIdFromLowered(lowered: Column): Column = langIdFromLoweredK(lowered)

  private val langIdFromLoweredK = udf { (s: String) =>
    val c = new Array[Long](5) // en, es, fr, de, zh — LangMarkers order
    if (s != null) {
      val ts = tokenizeLowered(s)
      var i = 0
      while (i < ts.length) {
        val li = LangIndex.get(ts(i))
        if (li ne null) c(li.intValue) += 1
        i += 1
      }
    }
    val (en, es, fr, de, zh) = (c(0), c(1), c(2), c(3), c(4))
    if (zh > math.max(math.max(en, es), math.max(fr, de))) "zh"
    else if (de > math.max(math.max(en, es), fr)) "de"
    else if (fr > math.max(en, es)) "fr"
    else if (es > en) "es"
    else "en"
  }

  /** Canonical content fingerprint: md5 over the sorted distinct token set.
    * Word-order-insensitive (bag-of-words identity), cheap to group on.
    */
  def fingerprint(c: Column): Column = fingerprintFromTokens(tokens(c))

  /** [[fingerprint]] over an already-tokenized column — lets a pipeline
    * tokenize once and share the frame across stages (q31). */
  def fingerprintFromTokens(toks: Column): Column =
    md5(array_join(array_sort(array_distinct(toks)), " "))

  /** Fused tokenize + fingerprint over pre-lowercased text (round 13):
    * one pass yields struct(_1 = token array, _2 = fingerprint) —
    * replaces the tokens → array_distinct → array_sort → array_join → md5
    * chain. Identical values: tokens are ASCII-only by construction, so
    * TreeSet (UTF-16) order equals array_sort's UTF8-binary order; md5 hex
    * is lowercase like Spark's; NULL text → NULL struct, whose fields read
    * back as the NULL token array and NULL fingerprint the chain produced.
    * Zero tokens → md5("") exactly like the chain's empty-array join.
    */
  def tokensAndFingerprintFromLowered(lowered: Column): Column = tokFpK(lowered)

  private val tokFpK = udf { (s: String) =>
    if (s == null) None
    else {
      val ts = tokenizeLowered(s)
      val set = new java.util.TreeSet[String]()
      var i = 0
      while (i < ts.length) { set.add(ts(i)); i += 1 }
      val sb = new java.lang.StringBuilder
      val it = set.iterator()
      while (it.hasNext) {
        if (sb.length > 0) sb.append(' ')
        sb.append(it.next())
      }
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new Array[Char](32)
      val digits = "0123456789abcdef"
      var k = 0
      while (k < 16) {
        hex(2 * k) = digits((d(k) >> 4) & 0xf)
        hex(2 * k + 1) = digits(d(k) & 0xf)
        k += 1
      }
      Some((ts, new String(hex)))
    }
  }

  /** Token n-gram shingles as strings; documents shorter than n tokens
    * collapse to a single whole-text shingle.
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - n + 1),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array(array_join(toks, " ")))

  /** Compiled kernel form of [[shingles]] (round 12): identical output —
    * order and duplicates preserved, short-doc whole-text fallback, NULL
    * tokens → [NULL] (matching array_join's NULL propagation) — but one
    * compiled pass per document instead of the transform/slice/array_join
    * higher-order chain, whose interpreted lambdas re-evaluate per array
    * element and dominated the q29/q33/q47 shingle profiles.
    */
  def shinglesK(toks: Column, n: Int): Column = {
    val f = udf { (tsIn: Array[String]) =>
      if (tsIn == null) Array(null: String)
      else if (tsIn.length >= n) {
        val out = new Array[String](tsIn.length - n + 1)
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i <= tsIn.length - n) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(tsIn(i + j))
            j += 1
          }
          out(i) = sb.toString
          i += 1
        }
        out
      } else Array(tsIn.mkString(" "))
    }
    f(toks)
  }

  /** Fused [[shinglesK]] over pre-lowercased text (round 13): tokenize +
    * order/duplicate-preserving shingling in one pass. Identical output to
    * `shinglesK(tokens(c), n)` including NULL text → [NULL] and the
    * zero/short-token whole-text fallback ([""], [single token], …).
    */
  def shinglesFromLowered(lowered: Column, n: Int): Column = {
    val f = udf { (s: String) =>
      if (s == null) Array(null: String) // tokens(NULL) = NULL → [NULL]
      else {
        val ts = tokenizeLowered(s)
        if (ts.length >= n) {
          val out = new Array[String](ts.length - n + 1)
          val sb = new java.lang.StringBuilder
          var i = 0
          while (i <= ts.length - n) {
            sb.setLength(0)
            var j = 0
            while (j < n) {
              if (j > 0) sb.append(' ')
              sb.append(ts(i + j))
              j += 1
            }
            out(i) = sb.toString
            i += 1
          }
          out
        } else Array(ts.mkString(" "))
      }
    }
    f(lowered)
  }

  /** Gopher-style within-document repetition metrics over token n-grams:
    * the fraction of n-gram occurrences that are repeats of an earlier
    * occurrence, and the fraction claimed by the single most frequent
    * n-gram — the two standard filters for boilerplate / degenerate text.
    *
    * Exact integer counts divided once at the end (oracle-replicable).
    * Round 12 tranche 2: the metrics are PER-DOCUMENT functions of the
    * token array, so one compiled kernel computes them in a single map
    * pass — the previous explode → (doc, gram) hash aggregate → per-doc
    * rollup shuffled the full gram table twice for a result each document
    * can produce alone. Gram semantics are [[shinglesK]]'s verbatim: short
    * docs collapse to one whole-text gram, NULL token arrays to one NULL
    * gram, so every doc has ≥1 gram — no zero division. Division shape
    * unchanged (long counts → one double divide).
    *
    * @return (idCol, n_grams, dup_gram_frac, top_gram_frac)
    */
  def repetitionDf(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 2
  ): org.apache.spark.sql.DataFrame = {
    // fused (round 13): tokenize inside the kernel — one string in, three
    // numbers out; NULL text takes the old NULL-token-array branch
    val kernel = udf { (s: String) =>
      val ts = if (s == null) null else tokenizeLowered(s)
      val counts = new java.util.HashMap[String, Long]()
      if (ts == null) counts.put(null, 1L) // shinglesK(null) = [NULL]
      else if (ts.length >= n) {
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i <= ts.length - n) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(ts(i + j))
            j += 1
          }
          val k = sb.toString
          counts.put(k, counts.getOrDefault(k, 0L) + 1L)
          i += 1
        }
      } else counts.put(ts.mkString(" "), 1L) // whole-text fallback
      var total = 0L
      var mx = 0L
      val it = counts.values().iterator()
      while (it.hasNext) {
        val c = it.next()
        total += c
        if (c > mx) mx = c
      }
      val m = counts.size.toLong
      (total, (total - m).toDouble / total, mx.toDouble / total)
    }
    df.select(col(idCol), kernel(lower(col(textCol))).as("__m"))
      .select(col(idCol),
        col("__m._1").as("n_grams"),
        col("__m._2").as("dup_gram_frac"),
        col("__m._3").as("top_gram_frac"))
  }

  /** PII patterns. Constraint: must compile and match identically under
    * Java regex (Spark codegen) and RE2 (the DuckDB oracle) — so no
    * lookaround, no backreferences; `\b` is the ASCII word boundary in both.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+\\d{1,3}-\\d{3}-\\d{4}\\b"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redact emails, then phones, then IPv4s (fixed order — emails can
    * contain digits and dots, so they must be rewritten before the IP pass
    * scans the text). Pure codegen'd string rewriting, no UDFs.
    */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailPattern, "<EMAIL>"),
        PhonePattern, "<PHONE>"),
      Ipv4Pattern, "<IP>")

  /** Per-document PII inventory + redacted text.
    * @return (idCol, n_emails, n_phones, n_ips, redacted)
    */
  def piiDf(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String
  ): org.apache.spark.sql.DataFrame =
    df.select(
      col(idCol),
      regexp_count(col(textCol), lit(EmailPattern)).cast("long").as("n_emails"),
      regexp_count(col(textCol), lit(PhonePattern)).cast("long").as("n_phones"),
      regexp_count(col(textCol), lit(Ipv4Pattern)).cast("long").as("n_ips"),
      redactPii(col(textCol)).as("redacted"))

  /** URLs as they appear in running text; domain is capture group 1. */
  val UrlPattern = "https?://[A-Za-z0-9.-]+[A-Za-z0-9./_-]*"
  val DomainPattern = "https?://([A-Za-z0-9.-]+)"

  /** Per-domain link statistics over a corpus: URL mentions and distinct
    * documents citing the domain. Extract-all → explode → one hash
    * aggregate; the standard source-mix / link-spam audit at corpus scale.
    * @return (domain, n_urls, n_docs)
    */
  def domainStatsDf(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String
  ): org.apache.spark.sql.DataFrame =
    df.select(col(idCol),
        explode(regexp_extract_all(col(textCol), lit(UrlPattern), lit(0)))
          .as("__url"))
      .select(col(idCol),
        regexp_extract(col("__url"), DomainPattern, 1).as("domain"))
      .groupBy(col("domain"))
      .agg(
        count(lit(1)).as("n_urls"),
        countDistinct(col(idCol)).as("n_docs"))

  /** Per-document distinguishing terms: the tf-idf idea with an
    * integer-exact ranking — terms scored by in-document frequency
    * descending, then corpus document-frequency ascending (rarer wins),
    * then term text — so the oracle needs no floating-point `log`, whose
    * libm rounding may differ across engines.
    *
    * Scale shape: per-doc term counts (hash agg with map-side combine),
    * corpus document frequencies (hash agg), shuffle join on term, then
    * one window over doc partitions for the top-k cut. The df table is
    * bounded by vocabulary size — broadcastable when small, shuffle join
    * otherwise (AQE decides).
    *
    * @return (idCol, term, tf, df, term_rank), top `k` per document
    */
  def topTermsDf(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3
  ): org.apache.spark.sql.DataFrame = {
    val terms = df
      .select(col(idCol), col(textCol))
      // explicit-width spread of the raw text: single-row-group inputs scan
      // as one task, which would tokenize+explode the whole corpus serially
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol), explode(tokensFromLowered(lower(col(textCol)))).as("term"))
    // persisted (lazily — round 12 measured an eager barrier slower at
    // sf0.1; the racing duplicate producer overlaps on idle cores): tf
    // feeds BOTH the df aggregation and the probe side of the join.
    // Lifetime = the returned frame (module convention; sessions running
    // many queries sweep persistent RDDs between them, as Bench does)
    val tf = terms.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(dfreq, "term")
      .withColumn("term_rank", row_number().over(w).cast("long"))
      .where(col("term_rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("term_rank"))
  }

  /** Winnowing-style rolling-hash fingerprint: hash each shingle, keep the
    * min hash of each sliding window of `window` shingles, distinct. Robust
    * to local edits; the standard document-fingerprint scheme at scale.
    *
    * Staged as a DataFrame op (tokens → shuffle → shingle hashes → windows)
    * so each pipeline step evaluates once per row: higher-order lambdas that
    * reference derived expressions re-evaluate them per array element in
    * interpreted eval.
    *
    * @return (idCol, fingerprints ARRAY<BIGINT>)
    */
  def winnowFingerprintDf(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      window: Int = 4
  ): org.apache.spark.sql.DataFrame =
    df.select(col(idCol), col(textCol))
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
      // fused order/duplicate-preserving shingle kernel (round 13): the
      // tokens → higher-order shingles chain in one compiled pass
      .select(col(idCol), shinglesFromLowered(lower(col(textCol)), n).as("__sh"))
      .select(col(idCol),
        transform(col("__sh"), s => xxhash64(s)).as("__h"))
      .select(col(idCol),
        when(size(col("__h")) >= window,
          array_distinct(transform(sequence(lit(1), size(col("__h")) - window + 1),
            i => array_min(slice(col("__h"), i, lit(window))))))
          .otherwise(array_distinct(col("__h"))).as("fingerprints"))
}
