package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Text
import graft.operators.{Dedup, Similarity}

class DedupSimilaritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val base = "the quick brown fox jumps over the lazy dog and runs far away home"

  test("nearDupPairs finds planted near-duplicates, not unrelated docs") {
    import spark.implicits._
    val docs = Seq(
      (0L, base),
      (1L, base + " tonight"),                       // near-dup of 0
      (2L, "completely different content about spark sql engines and catalyst"),
      (3L, base.replace("quick", "swift")),          // near-dup of 0
      (4L, "another unrelated document mentioning parquet files and shuffles")
    ).toDF("doc_id", "text")
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 2L || b == 2L || a == 4L || b == 4L })
  }

  test("nearDupPairs on testdata matches the exact 25 planted pairs") {
    val docs = graft.core.Tables.t(spark, "/root/testdata/sf0.01", "documents")
    val n = Dedup.nearDupPairs(docs, "doc_id", "text", 0.8).count()
    assert(n == 25)
  }

  test("nearDupPairs hot-bucket cap bounds candidates, inert at default") {
    import spark.implicits._
    val docs = Seq(
      (0L, base),
      (1L, base + " tonight"),
      (2L, base.replace("quick", "swift"))
    ).toDF("doc_id", "text")
    // near-identical docs share every band bucket: a cap of 1 drops all
    // buckets, so no candidates survive — the guard actually gates
    val capped = Dedup.nearDupPairs(docs, "doc_id", "text", 0.5, maxBucketSize = 1)
    assert(capped.count() == 0)
    // default cap is far above any test corpus: identical result set
    val dflt = Dedup.nearDupPairs(docs, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dflt.contains((0L, 1L)) && dflt.contains((0L, 2L)))
  }

  test("simhash: near-dups have small hamming distance, unrelated large") {
    import spark.implicits._
    val docs = Seq(
      (0L, base),
      (1L, base + " tonight"),
      (2L, "completely different content about spark sql engines and catalyst")
    ).toDF("doc_id", "text")
    val h = Dedup.simhashDf(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(0L), h(1L)) < 12)
    assert(ham(h(0L), h(2L)) > 16)
  }

  test("lshTopK recall vs brute force on testdata embeddings") {
    val e = graft.core.Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.where(col("vec_id") < 20)
    val bf = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = Similarity.lshTopK(q, e, "vec_id", "embedding", 5, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (bf & lsh).size.toDouble / bf.size
    assert(recall >= 0.3, s"LSH recall too low: $recall") // approximate by design
  }

  test("ivf k-means index: build once, probe many, recall vs brute force") {
    val e = graft.core.Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.where(col("vec_id") < 20)
    val bf = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // the fit happens exactly here — probes below never re-fit
    val index = Similarity.ivfBuildKMeans(e, "vec_id", "embedding", nCells = 8)
    val ivf = Similarity.ivfProbe(q, index, "vec_id", "embedding", 5, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (bf & ivf).size.toDouble / bf.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
    // second probe against the SAME index: no KMeans in its plan, and the
    // persisted assignments answer both probes identically
    val again = Similarity.ivfProbe(q, index, "vec_id", "embedding", 5, nProbe = 4)
    assert(!again.queryExecution.executedPlan.toString.contains("KMeans"))
    val ivf2 = again.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(ivf2 == ivf)
    index.unpersist()
  }

  test("ivf sampled index assigns every corpus vector to a cell") {
    val e = graft.core.Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val index = Similarity.ivfBuildSampled(e, "vec_id", "embedding", stride = 29)
    assert(index.centroids.nonEmpty)
    assert(index.assignments.count() == e.count())
    val cells = index.assignments.select("__cell").distinct().count()
    assert(cells > 1 && cells <= index.centroids.length)
    index.unpersist()
  }

  test("embedding nearDupPairs: broadcast-join plan, no driver collect, exact result") {
    val e = graft.core.Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val pairs = Similarity.nearDupPairs(e, "vec_id", "embedding", 0.45)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), s"expected BNLJ plan:\n$plan")
    // exact reference computed with the independent per-column kernels
    val exact = Similarity.bruteForceTopK(e, e, "vec_id", "embedding", k = 200)
      .where(col("cosine") >= 0.45).where(col("query_id") < col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exact)
  }

  test("embedding nearDupPairsLSH finds high-similarity pairs via banded candidates") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val bases = Array.fill(20)(Array.fill(64)(rnd.nextFloat() * 2 - 1))
    // plant 5 genuinely-near duplicates (cosine ≈ 0.99)
    val rows = bases.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      (0 until 5).map { i =>
        (100L + i, bases(i).map(x => x + rnd.nextFloat() * 0.05f))
      }
    val df = rows.toSeq.toDF("vec_id", "embedding")
    val got = Similarity.nearDupPairsLSH(df, "vec_id", "embedding",
        threshold = 0.9, dim = 64, nBits = 64, bandBits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 5).map(i => (i.toLong, 100L + i)).toSet
    assert(got == expected, s"got $got")
  }

  test("winnowing fingerprint overlaps heavily for near-dups") {
    import spark.implicits._
    val docs = Seq((0L, base), (1L, base + " tonight")).toDF("doc_id", "text")
    val fps = Text.winnowFingerprintDf(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(_.getSeq[Long](1).toSet)
    val overlap = (fps(0) & fps(1)).size.toDouble / (fps(0) | fps(1)).size
    assert(overlap > 0.5)
  }

  test("exact dedup groups identical content") {
    import spark.implicits._
    val docs = Seq((0L, "same text"), (1L, "same text"), (2L, "other"))
      .toDF("doc_id", "text")
    val groups = Dedup.exactGroups(docs, col("text"))
      .collect().map(r => r.getLong(1)).sorted.toSeq
    assert(groups == Seq(1L, 2L))
  }

  test("decontaminate flags only docs sharing eval n-grams, via broadcast join") {
    import spark.implicits._
    val eval = Seq((100L, "the capital of france is paris as everyone knows"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (0L, "we all know the capital of france is paris indeed"), // shares 4-grams
      (1L, "entirely unrelated words about shuffle partitions and codegen"),
      (2L, "the capital of spain is madrid as everyone knows too") // overlaps ≤3 tokens, never a full 4-gram
    ).toDF("doc_id", "text")
    val out = graft.operators.Decontaminate.overlap(corpus, eval, "doc_id", "text", n = 4)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"eval n-grams must broadcast:\n$plan")
    val rows = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.contains(0L) && rows(0L) >= 2)
    assert(!rows.contains(1L))
    assert(!rows.contains(2L))
  }

  test("repetition metrics: exact fractions on planted docs") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b a b a"),                 // 2-grams: ab ba ab ba → dup 0.5, top 0.5
      (1L, "one two three four five"),   // all distinct → dup 0.0
      (2L, "x")                          // short doc → single whole-text gram
    ).toDF("doc_id", "text")
    val m = Text.repetitionDf(docs, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(m(0L) == ((4L, 0.5, 0.5)))
    assert(m(1L) == ((4L, 0.0, 0.25)))
    assert(m(2L) == ((1L, 0.0, 1.0)))
  }

  test("repetition kernel ≡ explode/aggregate formulation on random docs") {
    // Pins the round-12 per-document kernel against the original
    // explode → (doc, gram) count → per-doc rollup shape it replaced,
    // including short/empty/punctuation-only documents.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "cat", "dog", "run", "the", "x1", "??", "")
    val docs = ((0 until 200).map { i =>
      val len = rnd.nextInt(30)
      (i.toLong, (0 until len).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    } ++ Seq((200L, ""), (201L, "..!"), (202L, "one"), (203L, "a a a a a")))
      .toDF("doc_id", "text")
    val kernel = Text.repetitionDf(docs, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val legacy = docs
      .select(col("doc_id"), explode(Text.shinglesK(Text.tokens(col("text")), 2)).as("__gram"))
      .groupBy(col("doc_id"), col("__gram"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("__n")).as("n_grams"),
        ((sum(col("__n")) - count(lit(1))).cast("double") / sum(col("__n")))
          .as("dup_gram_frac"),
        (max(col("__n")).cast("double") / sum(col("__n"))).as("top_gram_frac"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(kernel.keySet == legacy.keySet)
    kernel.foreach { case (id, v) => assert(v == legacy(id), s"doc $id") }
  }

  test("PII redaction: counts and rewrites emails, phones, IPv4s") {
    import spark.implicits._
    val docs = Seq(
      (0L, "mail a.b-c@sub.example.io or +44-020-7946 from 192.168.0.1 done"),
      (1L, "no pii here, just version 1.2 and a plus + sign"),
      (2L, "two mails x@y.org z@w.net one ip 10.0.0.255")
    ).toDF("doc_id", "text")
    val m = Text.piiDf(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    assert(m(0L) == ((1L, 1L, 1L,
      "mail <EMAIL> or <PHONE> from <IP> done")))
    // "1.2" must not match the 4-octet IPv4 pattern
    assert(m(1L) == ((0L, 0L, 0L, "no pii here, just version 1.2 and a plus + sign")))
    assert(m(2L) == ((2L, 0L, 1L, "two mails <EMAIL> <EMAIL> one ip <IP>")))
  }

  test("paragraph dedup keeps the globally first occurrence of each chunk") {
    import spark.implicits._
    val boiler = "all rights reserved"   // 3-token chunk shared by docs
    val docs = Seq(
      (0L, s"alpha beta gamma $boiler"), // chunks: "alpha beta gamma", boiler
      (1L, s"$boiler delta echo"),       // boiler (dup) + "delta echo"
      (2L, "unique words only here")
    ).toDF("doc_id", "text")
    val m = Dedup.paragraphDedupDf(docs, "doc_id", "text", chunkTokens = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(m(0L) == ((2L, 2L, s"alpha beta gamma $boiler")))
    // doc 1 loses its leading boilerplate chunk (doc 0 owns it)
    assert(m(1L) == ((2L, 1L, "delta echo")))
    assert(m(2L) == ((2L, 2L, "unique words only here")))
  }

  test("boilerplate removal drops EVERY copy of an over-frequent chunk") {
    import spark.implicits._
    val boiler = "all rights reserved"   // 3-token chunk in three docs
    val docs = Seq(
      (0L, s"alpha beta gamma $boiler"),
      (1L, s"$boiler delta echo"),
      (2L, s"unique words only $boiler"),
      (3L, "twice seen chunk stays put")  // freq < minFreq chunks survive
    ).toDF("doc_id", "text")
    val m = Dedup.boilerplateRemoveDf(docs, "doc_id", "text",
        chunkTokens = 3, minFreq = 3L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    // unlike keep-first dedup, doc 0's copy goes too
    assert(m(0L) == ((2L, 1L, "alpha beta gamma")))
    assert(m(1L) == ((2L, 1L, "delta echo")))
    assert(m(2L) == ((2L, 1L, "unique words only")))
    assert(m(3L) == ((2L, 2L, "twice seen chunk stays put")))
  }

  test("null and token-less docs pass through dedup kernels without NPE") {
    import spark.implicits._
    val docs = Seq(
      (0L, base),
      (1L, base + " tonight"),
      (2L, null.asInstanceOf[String]), // null text → null token array in UDFs
      (3L, "!!! ???")                  // tokens exist in neither engine
    ).toDF("doc_id", "text")
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L))) // content-less docs excluded, no crash
    val sims = Dedup.simhashDf(docs, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(sims == Set(0L, 1L))
  }

  test("top terms rank by tf desc, then corpus rarity, then term") {
    import spark.implicits._
    val docs = Seq(
      (0L, "spark spark rare common"),  // tf: spark 2; rare/common 1 each
      (1L, "common words common here")  // common appears in both docs (df 2)
    ).toDF("doc_id", "text")
    val rows = Text.topTermsDf(docs, "doc_id", "text", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(4)) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows((0L, 1L)) == (("spark", 2L, 1L)))
    // tf tie between rare (df 1) and common (df 2) → rarity wins
    assert(rows((0L, 2L)) == (("rare", 1L, 1L)))
    assert(rows((1L, 1L)) == (("common", 2L, 2L)))
    // tf tie between here and words (both df 1) → term text breaks it
    assert(rows((1L, 2L)) == (("here", 1L, 1L)))
  }

  test("embedding quantization stats: scale, saturation, reconstruction error") {
    import spark.implicits._
    val df = Seq(
      (0L, Seq(0.5f, -1.0f)),
      (1L, Seq(0.0f, 0.0f)) // zero vector: scale 0, no NaN/Inf leakage
    ).toDF("vec_id", "embedding")
    val rows = graft.functions.Embeddings.quantStatsDf(df, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    val r0 = rows(0)
    assert(r0.getLong(1) == 2L)
    assert(math.abs(r0.getDouble(2) - math.sqrt(1.25)) < 1e-12)
    assert(r0.getDouble(3) == 127.0)
    // q(0.5) = floor(63.5 + 0.5) = 64 (not saturated); q(-1.0) = -127 (saturated)
    assert(r0.getLong(4) == 1L)
    val d = 0.5 - 64.0 / 127.0
    assert(math.abs(r0.getDouble(5) - d * d) < 1e-15)
    val r1 = rows(1)
    assert(r1.getDouble(3) == 0.0 && r1.getDouble(5) == 0.0 && r1.getLong(4) == 0L)
  }

  test("domain stats: per-domain url and distinct-doc counts") {
    import spark.implicits._
    val docs = Seq(
      (0L, "see https://a.example.org/x and https://a.example.org/y plus http://b.io/z"),
      (1L, "only https://a.example.org/x again"),
      (2L, "nothing linked")
    ).toDF("doc_id", "text")
    val rows = Text.domainStatsDf(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows == Map("a.example.org" -> ((3L, 2L)), "b.io" -> ((1L, 1L))))
  }

  test("simhashNearDup: banded pairs equal the brute-force hamming scan") {
    val docs = graft.core.Tables.t(spark, "/root/testdata/sf0.01", "documents")
    val banded = Dedup.simhashNearDupDf(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sig = Dedup.simhashDf(docs, "doc_id", "text")
    val a = sig.select(col("doc_id").as("id_a"), col("simhash").as("sa"))
    val b = sig.select(col("doc_id").as("id_b"), col("simhash").as("sb"))
    val brute = a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Dedup.hamming64(col("sa"), col("sb")).cast("long").as("h"))
      .where(col("h") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == brute)
    assert(banded.nonEmpty) // testdata plants near-dups; a vacuous pass hides breakage
  }

  test("simhashNearDupBlocked: every valid blocks value equals the banded result") {
    // The block-combination scheme is EXACT for every valid blocks value —
    // the corpus-scaled knob trades table count, never recall. Pin the
    // full result set against the banded path (itself pinned to brute
    // force above) for the default scale-up value and the largest one.
    val docs = graft.core.Tables.t(spark, "/root/testdata/sf0.01", "documents")
    val banded = Dedup.simhashNearDupDf(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded.nonEmpty)
    for (blocks <- Seq(4, 6, 10)) {
      val blocked =
        Dedup.simhashNearDupBlocked(docs, "doc_id", "text", 3, blocks)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(blocked == banded, s"blocks=$blocks diverged")
    }
  }

  test("auto knobs: corpus-scaled geometry, pinned small-corpus configs") {
    // RHP-LSH: the auto config must REPRODUCE the oracled q56 geometry at
    // the oracled corpus sizes, then grow the band space with log2(n).
    assert(Similarity.autoLshConfig(500) == ((16, 4)))
    assert(Similarity.autoLshConfig(2000) == ((16, 4)))
    assert(Similarity.autoLshConfig(20000) == ((28, 7)))   // sf1
    assert(Similarity.autoLshConfig(200000) == ((40, 10))) // 10× sf1
    assert(Similarity.autoLshConfig(1L << 40) == ((64, 16))) // long-packed cap
    // SimHash blocks: valid set for maxHamming=3, then occupancy-driven
    assert(Dedup.validSimhashBlocks(3) == Seq(4, 5, 6, 10))
    assert(Dedup.autoSimhashBlocks(500) == 4)
    assert(Dedup.autoSimhashBlocks(50000) == 4)       // sf1: 2^15 keys hold
    assert(Dedup.autoSimhashBlocks(500000) == 5)      // x100: needs 2^16+
    assert(Dedup.autoSimhashBlocks(500000000L) == 6)  // needs 2^26+
    assert(Dedup.autoSimhashBlocks(Long.MaxValue) == 10) // saturates at max
  }

  test("nearDupPairsLSHAuto at the pinned point equals the fixed-config path") {
    val emb = graft.core.Tables.t(spark, "/root/testdata/sf0.01", "embeddings")
    val auto = Similarity.nearDupPairsLSHAuto(emb, "vec_id", "embedding",
        threshold = 0.45, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fixed = Similarity.nearDupPairsLSH(emb, "vec_id", "embedding",
        threshold = 0.45, dim = 64, nBits = 16, bandBits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto == fixed)
    assert(auto.nonEmpty)
  }

  test("simhashNearDup: exact-duplicate swarm emits each pair exactly once") {
    import spark.implicits._
    val docs = Seq(
      (0L, base), (1L, base), (2L, base),       // identical: one signature
      (3L, "completely unrelated words about archery and winter stars")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDupDf(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(pairs.size == pairs.toSet.size) // no duplicate rows
    assert(pairs.map(p => (p._1, p._2)).toSet ==
      Set((0L, 1L), (0L, 2L), (1L, 2L)))
    assert(pairs.forall(_._3 == 0L))
  }

  test("semanticDedup drops exactly the lower-id-dominated same-cell vectors") {
    val e = graft.core.Tables.t(spark, "/root/testdata/sf0.01", "embeddings")
    val out = Similarity.semanticDedup(e, "vec_id", "embedding", 0.4, 23)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // brute-force replay on the driver (500 vectors): same fold order as
    // the codegen'd dot product — sequential double accumulation
    val vecs = e.collect()
      .map(r => r.getLong(r.fieldIndex("vec_id")) ->
        r.getSeq[Float](r.fieldIndex("embedding")).toArray).toMap
    def dot(x: Array[Float], y: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < x.length) { s += x(i).toDouble * y(i).toDouble; i += 1 }
      s
    }
    def cos(x: Array[Float], y: Array[Float]): Double =
      dot(x, y) / (math.sqrt(dot(x, x)) * math.sqrt(dot(y, y)))
    val centroids = vecs.filter(_._1 % 23 == 0).toSeq.sortBy(_._1)
    def cell(v: Array[Float]): Long = {
      var bestId = -1L; var bestSim = Double.NegativeInfinity
      for ((cid, cv) <- centroids) {
        val s = cos(v, cv)
        if (s > bestSim) { bestSim = s; bestId = cid }
      }
      bestId
    }
    val cells = vecs.map { case (id, v) => id -> cell(v) }
    assert(out.size == vecs.size)
    for ((id, (cellId, kept)) <- out) {
      assert(cellId == cells(id), s"cell mismatch for $id")
      val dominated = cells.exists { case (oid, oc) =>
        oid < id && oc == cellId && cos(vecs(oid), vecs(id)) >= 0.4
      }
      assert(kept == !dominated, s"kept mismatch for $id")
    }
    assert(out.exists(!_._2._2)) // threshold chosen so drops actually occur
  }

  test("fused lowered-text shingle kernel ≡ tokens→shingleSortedSet chain") {
    // Pins the round-13 fused kernel (linear-scan tokenizer over lower())
    // against the original regex-split chain it replaced, across random
    // docs with unicode separators, apostrophes, digits, and short/empty/
    // null documents. NULL from the fused kernel must coincide exactly
    // with the old `where(size(tokens) > 0)` gate.
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val pieces = Vector("cat", "dog's", "x1", "42", "ÉTÉ", "straße", "中文",
      "😀", "?!", "--", "'", "a'b", "THE", "MiXeD", "Σισ", "")
    val docs = ((0 until 300).map { i =>
      val len = rnd.nextInt(12)
      val sep = if (rnd.nextBoolean()) " " else Vector(",", "、", "\n", "\t")(rnd.nextInt(4))
      (i.toLong, (0 until len).map(_ => pieces(rnd.nextInt(pieces.size))).mkString(sep))
    } ++ Seq((300L, null.asInstanceOf[String]), (301L, ""), (302L, "!!!"),
      (303L, "one two"), (304L, "''" + "'")))
      .toDF("doc_id", "text")
    for (n <- Seq(1, 3, 5)) {
      val fused = docs
        .select(col("doc_id"), Dedup.shingleSetFromLowered(lower(col("text")), n).as("s"))
        .where(col("s").isNotNull)
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
      val chain = docs
        .select(col("doc_id"), Text.tokens(col("text")).as("t"))
        .where(size(col("t")) > 0)
        .select(col("doc_id"), Dedup.shingleSortedSet(col("t"), n).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
      assert(fused.keySet == chain.keySet, s"doc coverage for n=$n")
      fused.foreach { case (id, v) => assert(v == chain(id), s"doc $id, n=$n") }
    }
  }

  test("language id counts ONLY marker words (non-markers are not 'en' votes)") {
    // Regression for the round-12 kernel: HashMap[String, Int].get unboxes
    // a missing key's null to 0, so every non-marker token counted toward
    // language 0 ("en") and es/fr/de/zh could never win. Pins the kernel
    // against the original expression form (five filter(isin) passes with
    // the strictly-greater tie cascade) on docs where the correct argmax
    // is each non-en language, plus tie and NULL cases.
    import spark.implicits._
    val docs = Seq(
      (0L, Seq("el", "los", "de", "que", "filler", "words", "here")),   // es
      (1L, Seq("le", "les", "et", "des", "une", "junk", "junk")),       // fr
      (2L, Seq("der", "die", "und", "das", "ein", "mit", "noise")),     // de
      (3L, Seq("的", "是", "了", "x", "y")),                 // zh
      (4L, Seq("the", "and", "of", "to", "plain", "english")),          // en
      (5L, Seq("el", "the", "filler")),               // 1:1 tie → en (strict >)
      (6L, Seq("nothing", "matches", "at", "all")),   // "at" is no marker → en
      (7L, null.asInstanceOf[Seq[String]]),           // NULL tokens → en
      (8L, Seq.empty[String])                          // zero tokens → en
    ).toDF("doc_id", "toks")
    val kernel = docs.select(col("doc_id"),
        Text.langIdFromTokens(col("toks")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kernel == Map(0L -> "es", 1L -> "fr", 2L -> "de", 3L -> "zh",
      4L -> "en", 5L -> "en", 6L -> "en", 7L -> "en", 8L -> "en"))
    // and the original expression form agrees everywhere (the kernel's
    // contract: argmax of marker counts, strictly-greater tie cascade)
    def score(lang: String) =
      Text.langScore(col("toks"), Text.LangMarkers.find(_._1 == lang).get._2).as(lang)
    val legacy = docs.select(col("doc_id"),
        score("en"), score("es"), score("fr"), score("de"), score("zh"))
      .select(col("doc_id"),
        when(col("zh") > greatest(col("en"), col("es"), col("fr"), col("de")), "zh")
          .when(col("de") > greatest(col("en"), col("es"), col("fr")), "de")
          .when(col("fr") > greatest(col("en"), col("es")), "fr")
          .when(col("es") > col("en"), "es")
          .otherwise("en").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(legacy == kernel)
  }
}
