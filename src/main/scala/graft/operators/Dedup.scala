package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Deduplication operators for training-data pipelines: exact (hash
  * group-by), MinHash+LSH near-dup (shingle → minhash signature → banded
  * bucket join → exact-Jaccard verify), and SimHash.
  *
  * Scale design (the point of LSH): candidate generation is
  * O(docs × bands) with one shuffle on (band, bucket) — never the O(n²)
  * cross join. Signatures and exact verification run in compiled UDF
  * kernels (Spark's higher-order array functions are interpreted); exact
  * verification runs only on bucket-colliding pairs. At 100 TB the bucket join partitions by bucket
  * hash and AQE handles skewed buckets (e.g. boilerplate-heavy shingles).
  */
object Dedup {

  /** Exact duplicate groups by content hash of `col`. */
  def exactGroups(df: DataFrame, c: Column): DataFrame =
    df.groupBy(md5(c).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"))

  /** Compiled MinHash → banded-LSH kernel: one 64-bit base hash per
    * shingle, `bands × rows` derived minima via avalanche mixing, bands
    * hashed to bucket ids tagged with their band index. One UDF call per
    * document; ~20× the throughput of the equivalent higher-order
    * expression form (interpreted lambdas).
    */
  def minhashBands(sh: Column, bands: Int, rowsPerBand: Int): Column = {
    val numHashes = bands * rowsPerBand
    val f = udf { (shinglesIn: Array[String]) =>
      // NULL array (null text upstream) ≅ no shingles: UDFs receive null for
      // reference-typed args, where the expression forms propagated it
      val shingles = if (shinglesIn == null) Array.empty[String] else shinglesIn
      val sig = Array.fill(numHashes)(Long.MaxValue)
      var s = 0
      while (s < shingles.length) {
        val str = shingles(s)
        val base = (scala.util.hashing.MurmurHash3.stringHash(str, 0x9747b28c).toLong << 32) |
          (scala.util.hashing.MurmurHash3.stringHash(str, 0x85ebca6b.toInt).toLong & 0xffffffffL)
        var i = 0
        while (i < numHashes) {
          var x = base ^ (i * 0x9E3779B97F4A7C15L)
          x ^= (x >>> 33); x *= 0xFF51AFD7ED558CCDL; x ^= (x >>> 33)
          if (x < sig(i)) sig(i) = x
          i += 1
        }
        s += 1
      }
      val out = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        var h = 0x9E3779B97F4A7C15L * (b + 1)
        var r = 0
        while (r < rowsPerBand) {
          h ^= sig(b * rowsPerBand + r)
          h *= 0xFF51AFD7ED558CCDL
          h ^= (h >>> 33)
          r += 1
        }
        out(b) = h
        b += 1
      }
      out
    }
    f(sh)
  }

  /** Compiled shingle kernel: token n-grams joined by spaces, distinct,
    * sorted. Identical output to
    * `array_sort(array_distinct(Text.shingles(toks, n)))` but one compiled
    * pass per document instead of interpreted higher-order expressions
    * (transform/slice/array_join run via `eval`, not codegen, and dominated
    * profile CPU on document workloads).
    */
  def shingleSortedSet(toks: Column, n: Int): Column = {
    val f = udf { (tsIn: Array[String]) =>
      val ts = if (tsIn == null) Array.empty[String] else tsIn // null text ≅ no tokens
      shingleSortedSetJ(ts, n)
    }
    f(toks)
  }

  private def shingleSortedSetJ(ts: Array[String], n: Int): Array[String] =
    if (ts.length >= n) {
      val set = new java.util.TreeSet[String]()
      var i = 0
      val sb = new java.lang.StringBuilder
      while (i <= ts.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(ts(i + j))
          j += 1
        }
        set.add(sb.toString)
        i += 1
      }
      set.toArray(new Array[String](set.size))
    } else Array(ts.mkString(" "))

  /** Fused tokenize + distinct-shingle kernel over ALREADY-LOWERCASED text
    * (round 13): one string crosses the UDF boundary and one compiled pass
    * tokenizes (Text.tokenizeLowered — provably the regex tokenizer's
    * output) and shingles — the split chain paid a regex pass, a Spark
    * array materialization, and an ArrayData→Array[String] conversion per
    * document. Returns NULL for NULL text and for zero-token documents —
    * the callers' `where(size(tokens) > 0)` gate becomes `isNotNull` (a
    * zero-token doc has no content to compare; its whole-text "" shingle
    * would diverge from the DuckDB oracle, whose empty-list aggregate is
    * NULL and never joins). Non-empty outputs are identical to
    * `shingleSortedSet(tokens(text), n)`.
    */
  def shingleSetFromLowered(lowered: Column, n: Int): Column = {
    val f = udf { (s: String) =>
      if (s == null) null
      else {
        val ts = graft.functions.Text.tokenizeLowered(s)
        if (ts.length == 0) null else shingleSortedSetJ(ts, n)
      }
    }
    f(lowered)
  }

  /** Near-duplicate pairs by token-n-gram Jaccard ≥ `threshold`.
    *
    * Implementation: MinHash+LSH candidate generation, then exact Jaccard on
    * the candidates only. With bands×rows sized for the threshold the miss
    * probability is negligible (e.g. 16 bands × 3 rows: P(miss | j=0.8) ≈
    * 1e-5), so results match an exact O(n²) oracle while scaling linearly.
    *
    * @return (id_a, id_b, jaccard) with id_a < id_b
    */
  def nearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      shingleLen: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 3,
      maxBucketSize: Int = 10000
  ): DataFrame =
    nearDupPairsFromShingles(
      // spread the raw text BEFORE tokenizing: single-row-group inputs scan
      // as one task, and tokenize-before-exchange ran the regex serially
      // (0.37 s of the q9 wall at sf0.1, §1 profile). Fused kernel (round
      // 13): tokenize+shingle in one compiled pass over the lowered text —
      // NULL output ≡ the old zero-token filter.
      df.select(col(idCol), col(textCol))
        .repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
        .select(col(idCol),
          shingleSetFromLowered(lower(col(textCol)), shingleLen).as("__sh"))
        .where(col("__sh").isNotNull),
      idCol, "__sh", threshold, bands, rowsPerBand, maxBucketSize)

  /** [[nearDupPairs]] over an already-tokenized frame — lets a pipeline
    * (q31) tokenize once and share the token frame across its fingerprint,
    * near-dup, and quality stages instead of re-splitting per stage.
    */
  def nearDupPairsFromTokens(
      df: DataFrame,
      idCol: String,
      toksCol: String,
      threshold: Double,
      shingleLen: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 3,
      maxBucketSize: Int = 10000
  ): DataFrame =
    nearDupPairsFromShingles(
      df.select(col(idCol), col(toksCol))
        // Zero-token documents carry no content to compare — and their
        // whole-text "" shingle would diverge from the DuckDB oracle, whose
        // empty-list aggregate is NULL and never joins. Exact dedup is the
        // right operator for them.
        .where(size(col(toksCol)) > 0)
        .select(col(idCol), shingleSortedSet(col(toksCol), shingleLen).as("__sh")),
      idCol, "__sh", threshold, bands, rowsPerBand, maxBucketSize)

  /** Shared tail of the text and token entry points: MinHash+LSH candidate
    * generation over per-doc sorted distinct shingle sets, then exact
    * Jaccard verification on the candidates.
    */
  private def nearDupPairsFromShingles(
      df: DataFrame,
      idCol: String,
      shCol: String,
      threshold: Double,
      bands: Int,
      rowsPerBand: Int,
      maxBucketSize: Int
  ): DataFrame = {
    // Callers arrive spread across the session width already — the text
    // wrapper repartitions raw text before the kernel, and q31 feeds its
    // cached 32-partition token frame — so no repartition here (the
    // round-12 profile showed the old one re-shuffling the cached frame on
    // the same key for nothing).
    // Persisted lazily, but since round 13 the first action (the eager
    // candidates materialize below) references it exactly ONCE, so the
    // tokenize→shingle→minhash producer runs once and the verify joins
    // read cache hits — the round-12 profiles showed the old count-window
    // + bucket self-join racing 2–3 duplicate producer stages (~10 s
    // executor time each at sf0.1) because a lazily persisted frame with
    // several consumers in one job is computed per consumer until some
    // task finishes writing each cached partition.
    val docs = (df
      .select(col(idCol).as("__id"), col(shCol).as("__sh"))
      .withColumn("__bands", minhashBands(col("__sh"), bands, rowsPerBand)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Bucket-collision candidates via per-bucket id-list aggregation + pair
    // expansion (round 13) — replaces the count-over-window hot-bucket cap
    // and the bucket self-join. Same pair set: ids within a (band, bucket)
    // group are distinct (a doc lands in one bucket per band), the double
    // explode with id_a < id_b emits exactly the old join's per-bucket
    // pairs, and size(__ids) IS the old count-over-window, so the cap
    // filters identically (a bucket of k docs yields k² candidate pairs;
    // buckets above `maxBucketSize` are dropped — the standard
    // MinHash-at-scale trade: a doc colliding with thousands of others
    // still collides with its true near-dups in other, smaller bands).
    // Plan shape: ONE corpus-sized exchange on (band, bucket) where the
    // window+join paid two map passes over `docs`, and the per-group array
    // is O(bucket size) ≤ maxBucketSize — the quadratic pair volume streams
    // through the Generate, exactly as it streamed through the old join.
    // Eagerly materialized: the pair frame is output-sized (tiny next to
    // the corpus), and the count barrier is what guarantees the producer
    // pipeline runs once. Persisted for the verify join below; swept by
    // Bench's per-query unpersist like every other intra-query cache.
    val candidates = graft.core.Frames.materialize(docs
      .select(col("__id"), posexplode(col("__bands")).as(Seq("__band", "__bucket")))
      .groupBy(col("__band"), col("__bucket"))
      .agg(collect_list(col("__id")).as("__ids"))
      .where(size(col("__ids")).between(2, maxBucketSize))
      .select(col("__ids"), explode(col("__ids")).as("id_a"))
      .select(col("id_a"), explode(col("__ids")).as("id_b"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct())

    // Exact verify with a compiled merge-intersect over the sorted distinct
    // shingle sets (interpreted array_intersect was the dominant cost at
    // scale). Same set semantics as the oracle's list_intersect/union.
    val shA = docs.select(col("__id").as("id_a"), col("__sh").as("__sh_a"))
    val shB = docs.select(col("__id").as("id_b"), col("__sh").as("__sh_b"))
    candidates
      .join(shA, "id_a")
      .join(shB, "id_b")
      .withColumn("jaccard", jaccardSortedF(col("__sh_a"), col("__sh_b")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Compiled chunk kernel (round 12): consecutive non-overlapping
    * `chunkTokens`-token units joined by spaces — identical output to
    * `transform(sequence(0, (size-1)/chunkTokens), i => array_join(slice(
    * toks, i*chunkTokens+1, chunkTokens), " "))` (the paragraph-dedup /
    * boilerplate chunker), but one compiled pass per document instead of
    * the CodegenFallback higher-order chain whose interpreted lambdas
    * re-evaluate per unit.
    */
  def chunkUnits(toks: Column, chunkTokens: Int): Column = {
    val f = udf { (ts: Array[String]) =>
      if (ts == null) null else chunkUnitsJ(ts, chunkTokens)
    }
    f(toks)
  }

  private def chunkUnitsJ(ts: Array[String], chunkTokens: Int): Array[String] = {
    val nChunks = if (ts.length == 0) 1 else (ts.length - 1) / chunkTokens + 1
    val out = new Array[String](nChunks)
    val sb = new java.lang.StringBuilder
    var ci = 0
    while (ci < nChunks) {
      sb.setLength(0)
      var j = ci * chunkTokens
      val end = math.min(j + chunkTokens, ts.length)
      while (j < end) {
        if (j > ci * chunkTokens) sb.append(' ')
        sb.append(ts(j))
        j += 1
      }
      out(ci) = sb.toString
      ci += 1
    }
    out
  }

  /** Fused tokenize + chunk kernel over pre-lowercased text (round 13):
    * one compiled pass replaces the tokens→chunkUnits chain. NULL for
    * NULL text and zero-token documents — the callers' `where(size(tokens)
    * > 0)` gate becomes `isNotNull`; non-empty outputs are identical to
    * `chunkUnits(tokens(text), chunkTokens)`.
    */
  def chunksFromLowered(lowered: Column, chunkTokens: Int): Column = {
    val f = udf { (s: String) =>
      if (s == null) null
      else {
        val ts = graft.functions.Text.tokenizeLowered(s)
        if (ts.length == 0) null else chunkUnitsJ(ts, chunkTokens)
      }
    }
    f(lowered)
  }

  /** Exact Jaccard of two sorted distinct string arrays (compiled merge). */
  private val jaccardSortedF = udf { (a: Array[String], b: Array[String]) =>
    var i = 0
    var j = 0
    var inter = 0
    while (i < a.length && j < b.length) {
      val c = a(i).compareTo(b(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** SimHash bit width: 60 bits = 15 hex chars of md5, so the per-shingle
    * hash is computable identically in any engine with md5 and hex→int
    * casting (DuckDB oracle included) and always fits a signed 64-bit int.
    */
  val SimhashBits = 60

  /** Portable per-shingle hash: the first 15 hex chars of md5 as a 60-bit
    * integer. md5 is engine-agnostic where xxhash64 is Spark-specific —
    * this is what makes the simhash oracle-checkable bit for bit.
    */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 60-bit SimHash over token shingles, as a DataFrame operator: one
    * compiled kernel per document (shingle → md5 → ±1 per bit → sign).
    *
    * Map-only — no explode, no shuffle beyond the partition spread, and no
    * 60-column aggregate. The earlier explode + 60-conditional-sum
    * formulation was algebraically identical but generated a janino source
    * large enough that its compile time dominated the query, and its
    * exploded shuffle was pure overhead for a per-document reduction. The
    * kernel computes exactly the oracle's number: per distinct shingle,
    * h = first 15 hex chars of md5 as a 60-bit int; bit b of the result =
    * sign of Σ±1 over shingles at bit b.
    *
    * @return (idCol, simhash LONG)
    */
  def simhashDf(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3
  ): DataFrame = {
    val n = shingleLen
    // Fused kernel (round 13): tokenize (Text.tokenizeLowered over the
    // Spark-lowered text — provably the regex tokenizer's output) +
    // distinct shingles + md5 sign sums in ONE compiled pass; one string
    // crosses the UDF boundary instead of the token array the old
    // tokens→kernel chain materialized and converted per document. None
    // for NULL text / zero tokens ≡ the old `where(size(tokens) > 0)`
    // gate (no content to hash; the oracle's empty-list md5 is NULL).
    val kernel = udf { (s: String) =>
      if (s == null) None
      else {
        val ts = graft.functions.Text.tokenizeLowered(s)
        if (ts.length == 0) None
        else {
          val set = new java.util.HashSet[String]()
          if (ts.length >= n) {
            var i = 0
            val sb = new java.lang.StringBuilder
            while (i <= ts.length - n) {
              sb.setLength(0)
              var j = 0
              while (j < n) {
                if (j > 0) sb.append(' ')
                sb.append(ts(i + j))
                j += 1
              }
              set.add(sb.toString)
              i += 1
            }
          } else set.add(ts.mkString(" "))
          val md = java.security.MessageDigest.getInstance("MD5")
          val sums = new Array[Int](SimhashBits)
          val it = set.iterator()
          while (it.hasNext) {
            val d = md.digest(it.next().getBytes(java.nio.charset.StandardCharsets.UTF_8))
            // first 15 hex chars as a 60-bit int == unsigned big-endian of
            // the first 8 bytes >>> 4 (drops the 16th nibble)
            var v = 0L
            var k = 0
            while (k < 8) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
            val h = v >>> 4
            var b = 0
            while (b < SimhashBits) {
              if (((h >>> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
              b += 1
            }
          }
          var sig = 0L
          var b = 0
          while (b < SimhashBits) {
            if (sums(b) > 0) sig |= (1L << b)
            b += 1
          }
          Some(sig)
        }
      }
    }
    val width = df.sparkSession.sparkContext.defaultParallelism
    // spread raw text BEFORE the kernel (single-row-group scans are one
    // task; per-doc work before the exchange ran serially)
    df.select(col(idCol), col(textCol))
      .repartition(width, col(idCol))
      .select(col(idCol), kernel(lower(col(textCol))).as("simhash"))
      .where(col("simhash").isNotNull)
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicate pairs via band-bucketed candidate generation
    * (Charikar'02 / Manku et al. WWW'07 table-split scheme): every document
    * pair whose 60-bit simhash signatures differ in at most `maxHamming`
    * bits, found WITHOUT the O(n²) cross join.
    *
    * Exactness: with `bands` equal splits of the signature and
    * `maxHamming < bands`, a qualifying pair's differing bits can touch at
    * most `maxHamming` splits, so at least one split matches exactly
    * (pigeonhole) — banding recalls every qualifying pair; the Hamming
    * filter then discards false candidates. The result is identical to the
    * brute-force O(n²) scan the DuckDB oracle runs.
    *
    * Scale shape (the 100 TB path, two-level): (1) collapse documents to
    * DISTINCT signatures first — web-corpus exact-duplicate swarms hit one
    * signature row each instead of quadratic fanout inside the candidate
    * join; (2) the banded self-join runs over distinct signatures
    * (one shuffle on the (band,split-value) key, AQE for hot splits);
    * (3) same-signature doc pairs come from a separate equi self-join on
    * the full signature, and candidate signature pairs expand back to doc
    * pairs through two output-sized joins. Nothing is ever quadratic in
    * documents — only in the (inherently pairwise) output.
    *
    * @return (id_a, id_b, hamming) with id_a < id_b, one row per
    *   qualifying pair
    */
  def simhashNearDupDf(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      bands: Int = 4
  ): DataFrame = {
    require(SimhashBits % bands == 0, s"bands must divide $SimhashBits")
    require(maxHamming < bands,
      "banded candidate generation is exact only when maxHamming < bands")
    val bandBits = SimhashBits / bands
    // persisted + eagerly materialized: the signature frame feeds FIVE
    // consumers (the distinct, both sides of the same-signature self-join,
    // and both doc-expansion joins in nearDupAssemble) — without the cache
    // the tokenize→shingle→md5 kernel, the dominant cost of the whole
    // query, re-runs per consumer (measured 5× at sf0.1)
    val sigDocs = graft.core.Frames.materialize(simhashDf(df, idCol, textCol))

    val sigs = sigDocs.select(col("simhash")).distinct()
    val banded = sigs.select(col("simhash"),
      explode(array((0 until bands).map { bi =>
        shiftrightunsigned(col("simhash"), bi * bandBits)
          .bitwiseAND(lit((1L << bandBits) - 1))
          .bitwiseOR(lit(bi.toLong << 32)) // tag with band index
      }: _*)).as("__bk"))
    val candSigs = bucketPairs(banded, maxHamming)

    nearDupAssemble(sigDocs, candSigs, idCol)
  }

  /** Qualifying distinct-signature pairs from a (simhash, __bk) bucket
    * frame — per-bucket signature-list aggregation + double-explode pair
    * expansion (round 13), replacing the bucket self-join. Same pair set:
    * signatures within a bucket are distinct, `__sa < __sb` emits exactly
    * the old join's per-bucket pairs, the Hamming filter and the distinct
    * (pairs may collide in several buckets) are unchanged. One exchange on
    * `__bk` where the self-join computed its (identical, unreused) bucket
    * subtree once per side; the per-group array is O(bucket occupancy) —
    * tiny under the blocked scheme's corpus-scaled key space, and bounded
    * by the band key space in the 4-band scheme — while the quadratic pair
    * volume streams through the Generate exactly as it streamed through
    * the join. */
  private def bucketPairs(banded: DataFrame, maxHamming: Int): DataFrame =
    banded
      .groupBy(col("__bk"))
      .agg(collect_list(col("simhash")).as("__sigs"))
      .where(size(col("__sigs")) >= 2)
      .select(col("__sigs"), explode(col("__sigs")).as("__sa"))
      .select(col("__sa"), explode(col("__sigs")).as("__sb"))
      .where(col("__sa") < col("__sb") &&
        hamming64(col("__sa"), col("__sb")) <= maxHamming)
      .select(col("__sa"), col("__sb"))
      .distinct()

  /** Expand qualifying DISTINCT-signature pairs back to document pairs and
    * add the same-signature (hamming 0) doc pairs — the shared tail of the
    * banded and blocked simhash near-dup paths. */
  private def nearDupAssemble(
      sigDocs: DataFrame, candSigs: DataFrame, idCol: String): DataFrame = {
    val same = sigDocs.alias("p")
      .join(sigDocs.alias("q"),
        col("p.simhash") === col("q.simhash") &&
          col(s"p.$idCol") < col(s"q.$idCol"))
      .select(col(s"p.$idCol").as("id_a"), col(s"q.$idCol").as("id_b"),
        lit(0L).as("hamming"))
    val cross = candSigs
      .join(sigDocs.select(col(idCol).as("__ida"), col("simhash").as("__sa")), "__sa")
      .join(sigDocs.select(col(idCol).as("__idb"), col("simhash").as("__sb")), "__sb")
      .select(least(col("__ida"), col("__idb")).as("id_a"),
        greatest(col("__ida"), col("__idb")).as("id_b"),
        hamming64(col("__sa"), col("__sb")).cast("long").as("hamming"))
    same.unionByName(cross)
  }

  /** The blocks values usable by [[simhashNearDupBlocked]] for a given
    * `maxHamming`: divisors of [[SimhashBits]] exceeding maxHamming whose
    * combination key fits the packing (≤48 bits below the table tag) and
    * whose table count C(blocks, maxHamming) stays ≤128 — past that the
    * per-signature explode factor (and the single projection's expression
    * count) costs more than the key-space growth buys. */
  def validSimhashBlocks(maxHamming: Int): Seq[Int] = {
    def choose(n: Int, k: Int): Long =
      (1 to k).foldLeft(1L)((a, i) => a * (n - i + 1) / i)
    (maxHamming + 1 to SimhashBits).filter { b =>
      SimhashBits % b == 0 &&
        (b - maxHamming) * (SimhashBits / b) <= 48 &&
        choose(b, maxHamming) <= 128
    }
  }

  /** Corpus-scaled block count for [[simhashNearDupBlocked]]: the smallest
    * valid blocks value whose combination-key space keeps expected bucket
    * occupancy at or under `targetBucketRows`. The candidate volume of the
    * blocked scheme is Θ(tables · n²/2^keyBits); a fixed key space is the
    * q43 second-decade super-linearity — n²/2^keyBits doubles every time
    * the corpus does. Growing keyBits with log2(n) (pay: more tables —
    * C(blocks, maxHamming) of them) holds it flat. EXACTNESS is invariant
    * under the knob: every valid blocks value recalls all qualifying pairs
    * (pigeonhole), so unlike the RHP-LSH knob this one trades only
    * constant-factor table count, never recall.
    *
    * The default target of 8 is deliberately tight: between switch points
    * occupancy — and with it per-table candidate work n·occupancy/2 —
    * still grows with n (quadratic within the plateau), so a small target
    * bounds how far that plateau runs before the next key-space jump.
    */
  def autoSimhashBlocks(
      corpusRows: Long,
      maxHamming: Int = 3,
      targetBucketRows: Long = 8
  ): Int = {
    val candidates = validSimhashBlocks(maxHamming)
    val neededBits = math.ceil(
      math.log(math.max(1.0, corpusRows.toDouble / targetBucketRows)) /
        math.log(2.0)).toInt
    candidates
      .find(b => (b - maxHamming) * (SimhashBits / b) >= neededBits)
      .getOrElse(candidates.last)
  }

  /** SimHash near-dup pairs via Manku et al. WWW'07 §3 BLOCK COMBINATIONS
    * — the corpus-scaled generalization of [[simhashNearDupDf]]'s 1-block
    * bands. The signature splits into `blocks` equal blocks; a pair within
    * `maxHamming` differs in at most maxHamming blocks, so it agrees
    * exactly on SOME (blocks − maxHamming)-subset of blocks (pigeonhole).
    * One table per subset, keyed on the concatenation of that subset's
    * block values: C(blocks, maxHamming) tables whose key space is
    * 2^((blocks−maxHamming)·width) — e.g. maxHamming=3 goes from 4 tables
    * × 2^15 keys (blocks=4, ≡ the banded scheme) to 20 tables × 2^30 keys
    * (blocks=6): ~32000× fewer expected candidates per corpus-size-squared
    * for 5× the explode. Same exact result set as brute force, same
    * DISTINCT-signature-first swarm collapse as the banded path.
    */
  def simhashNearDupBlocked(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      blocks: Int = 6
  ): DataFrame = {
    require(validSimhashBlocks(maxHamming).contains(blocks),
      s"blocks=$blocks invalid for maxHamming=$maxHamming " +
        s"(valid: ${validSimhashBlocks(maxHamming).mkString(",")})")
    val w = SimhashBits / blocks
    val keep = blocks - maxHamming
    val mask = (1L << w) - 1
    val combos = (0 until blocks).combinations(keep).toArray
    // same five-consumer signature reuse as simhashNearDupDf
    val sigDocs = graft.core.Frames.materialize(simhashDf(df, idCol, textCol))
    val sigs = sigDocs.select(col("simhash")).distinct()
    val keyed = sigs.select(col("simhash"),
      explode(array(combos.zipWithIndex.map { case (combo, ci) =>
        // pack the selected blocks' values below the table tag: keep·w ≤ 48
        combo.zipWithIndex.foldLeft(lit(ci.toLong << 48)) {
          case (acc, (bi, pos)) =>
            acc.bitwiseOR(shiftleft(
              shiftrightunsigned(col("simhash"), bi * w).bitwiseAND(lit(mask)),
              pos * w))
        }
      }: _*)).as("__bk"))
    val candSigs = bucketPairs(keyed, maxHamming)
    nearDupAssemble(sigDocs, candSigs, idCol)
  }

  /** Paragraph/chunk-level dedup: split each document into consecutive
    * `chunkTokens`-token units, keep only the globally FIRST occurrence of
    * each distinct unit (ordered by document id, then position), and
    * reassemble the surviving units in order — the standard unit-level
    * dedup pass (boilerplate headers, repeated paragraphs) that document-
    * level dedup cannot catch.
    *
    * Scale shape: explode → arg-min per unit (`min(struct(doc, idx))` — a
    * plain hash aggregate, so map-side partial aggregation absorbs hot
    * boilerplate units) → shuffle join back → per-doc rollup. Deliberately
    * NOT a `row_number() OVER (PARTITION BY unit)` window: a unit repeated
    * millions of times would pin one sort partition; the aggregate form
    * combines before the shuffle.
    *
    * @return (idCol, n_total, n_kept, cleaned_text); documents with zero
    *   tokens produce no output row (no units).
    */
  def paragraphDedupDf(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int = 8
  ): DataFrame = {
    val width = df.sparkSession.sparkContext.defaultParallelism
    // explicit-width spread of the RAW TEXT: single-row-group inputs scan
    // as one task, and kernel-before-exchange would run it — and write the
    // cache — serially. Persisted lazily: the racing duplicate producer
    // overlaps on idle cores; an eager barrier measured slower. Fused
    // tokenize+chunk kernel (round 13); NULL ≡ the old zero-token filter.
    val units = df
      .select(col(idCol), col(textCol))
      .repartition(width, col(idCol))
      .select(col(idCol),
        chunksFromLowered(lower(col(textCol)), chunkTokens).as("__chunks"))
      .where(col("__chunks").isNotNull)
      .select(col(idCol),
        posexplode(col("__chunks")).as(Seq("idx", "chunk")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val firsts = units
      .groupBy(col("chunk"))
      .agg(min(struct(col(idCol), col("idx"))).as("__first"))
    units.join(firsts, "chunk")
      .withColumn("__kept",
        col(idCol) === col(s"__first.$idCol") && col("idx") === col("__first.idx"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("__kept"), 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("__kept"),
              struct(col("idx"), col("chunk"))))),
            s => s.getField("chunk")),
          " ").as("cleaned_text"))
  }

  /** Frequency-based boilerplate removal (CCNet-style): split each document
    * into consecutive `chunkTokens`-token units, drop EVERY copy of any unit
    * whose corpus-wide occurrence count is ≥ `minFreq`, and reassemble the
    * survivors in order. Differs from [[paragraphDedupDf]] in the removal
    * rule — positional dedup keeps the first copy of a repeated unit, while
    * boilerplate removal treats high-frequency units (navigation chrome,
    * license headers, cookie banners) as noise and removes all of them.
    *
    * Scale shape: explode → unit-count hash aggregate (map-side combinable —
    * a unit repeated millions of times partial-aggregates before the
    * shuffle) → shuffle join back on the unit → per-doc rollup. The
    * frequency table is NOT broadcast: at corpus scale the distinct-unit
    * set is data-sized, so the join shuffles both sides on the unit hash.
    *
    * @return (idCol, n_total, n_kept, cleaned_text); zero-token documents
    *   produce no output row.
    */
  def boilerplateRemoveDf(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int = 8,
      minFreq: Long = 3L
  ): DataFrame = {
    val width = df.sparkSession.sparkContext.defaultParallelism
    // explicit-width spread of the RAW TEXT: single-row-group inputs scan
    // as one task, and kernel-before-exchange would run it — and write the
    // cache — serially. Persisted lazily: the racing duplicate producer
    // overlaps on idle cores; an eager barrier measured slower. Fused
    // tokenize+chunk kernel (round 13); NULL ≡ the old zero-token filter.
    val units = df
      .select(col(idCol), col(textCol))
      .repartition(width, col(idCol))
      .select(col(idCol),
        chunksFromLowered(lower(col(textCol)), chunkTokens).as("__chunks"))
      .where(col("__chunks").isNotNull)
      .select(col(idCol),
        posexplode(col("__chunks")).as(Seq("idx", "chunk")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val freqs = units
      .groupBy(col("chunk"))
      .agg(count(lit(1)).as("__freq"))
    units.join(freqs, "chunk")
      .withColumn("__kept", col("__freq") < minFreq)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("__kept"), 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("__kept"),
              struct(col("idx"), col("chunk"))))),
            s => s.getField("chunk")),
          " ").as("cleaned_text"))
  }
}
