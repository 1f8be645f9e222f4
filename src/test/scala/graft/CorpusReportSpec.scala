package graft

import java.nio.file.Files
import java.security.MessageDigest
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The corpus-reporting queries (q46–q53) against independent in-memory
  * oracles on crafted tables — the driver's DuckDB gate checks them on the
  * real testdata; these specs pin the arithmetic (percentile indexing,
  * basis points, bit-length buckets, md5 gates) on inputs small enough to
  * verify by hand-written scalar code.
  */
object CorpusReportSpec {
  case class Doc(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)
}

class CorpusReportSpec extends AnyFunSuite {
  import CorpusReportSpec.Doc

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ── crafted corpus ──────────────────────────────────────────────────
  // Deterministic docs over three sources/languages with planted exact
  // duplicates; n_chars is the true text length (as in the testdata).
  private val enP = "the quick brown fox jumps over the lazy dog and it is good to see in all of that"
  private val esP = "el gato y los perros de que las casas son grandes para todos"
  private val frP = "le chat et les chiens des une maison est grande pour tous"

  private val docs: Seq[Doc] = {
    val rnd = new scala.util.Random(4607)
    val phrases = Map("en" -> enP, "es" -> esP, "fr" -> frP)
    val base = (0 until 36).map { i =>
      val lang = Seq("en", "es", "fr")(i % 3)
      val source = Seq("web", "book", "wiki")(i / 12)
      val k = 1 + rnd.nextInt(6)
      val text = (Seq.fill(k)(phrases(lang)) :+ s"doc$i").mkString(" ")
      Doc(i.toLong, text, lang, source, text.length.toLong)
    }
    // planted exact duplicates (same text, different ids/sources) and one
    // deliberately mislabeled language (fr text tagged en → fails funnel s4)
    val dupText = Seq.fill(4)(enP).mkString(" ")
    val frText = (Seq.fill(5)(frP) :+ "mislabeled").mkString(" ")
    base ++ Seq(
      Doc(100L, dupText, "en", "web", dupText.length.toLong),
      Doc(101L, dupText, "en", "book", dupText.length.toLong),
      Doc(102L, dupText, "en", "book", dupText.length.toLong),
      Doc(103L, frText, "en", "wiki", frText.length.toLong))
  }

  lazy val dir: String = {
    val d = Files.createTempDirectory("graft-corpus-report").toFile
    d.deleteOnExit()
    val s = spark
    import s.implicits._
    docs.toDF().write.mode("overwrite").parquet(s"${d.getPath}/documents.parquet")
    d.getPath
  }

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  // scalar mirrors of the engine's text kernels (Text.scala)
  private def toks(t: String): Seq[String] =
    t.toLowerCase.split("[^a-z0-9']+").filter(_.nonEmpty).toSeq
  private def shingle3(ts: Seq[String]): Seq[String] =
    if (ts.size >= 3) ts.sliding(3).map(_.mkString(" ")).toSeq else Seq(ts.mkString(" "))
  private def md5hex(t: String): String =
    MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private val stop = Set("the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "as", "with", "at", "by", "from")
  private val markers = Map(
    "en" -> Set("the", "and", "of", "to", "in", "is"),
    "es" -> Set("el", "los", "de", "que", "y", "las"),
    "fr" -> Set("le", "les", "et", "des", "une", "est"),
    "de" -> Set("der", "die", "und", "das", "ein", "mit"),
    "zh" -> Set("的", "是", "了", "在", "有", "我"))
  private def langId(ts: Seq[String]): String = {
    val s = markers.map { case (l, m) => l -> ts.count(m) }
    if (s("zh") > Seq("en", "es", "fr", "de").map(s).max) "zh"
    else if (s("de") > Seq("en", "es", "fr").map(s).max) "de"
    else if (s("fr") > Seq("en", "es").map(s).max) "fr"
    else if (s("es") > s("en")) "es"
    else "en"
  }

  test("q54 novelty credits a gram only to its minimum doc_id") {
    def sh5(ts: Seq[String]): Seq[String] =
      if (ts.size >= 5) ts.sliding(5).map(_.mkString(" ")).toSeq.distinct
      else Seq(ts.mkString(" "))
    val grams = docs.filter(d => toks(d.text).nonEmpty)
      .map(d => d.doc_id -> sh5(toks(d.text)))
    val firstDoc = grams.flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).min }
    val expected = grams.map { case (id, gs) =>
      val novel = gs.count(g => firstDoc(g) == id).toLong
      (id, gs.size.toLong, novel, novel * 10000 / gs.size)
    }.toSet
    val got = run("q54_ngram_novelty").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
    // doc 0 introduces its grams; the later duplicate-swarm copies (101,
    // 102) replay doc 100's grams and score zero
    val byId = got.map(t => t._1 -> t._4).toMap
    assert(byId(0L) > 0 && byId(101L) == 0L && byId(102L) == 0L)
  }

  test("q55 drops every duplicate except the longest (then lowest-id) copy") {
    // scalar mirror of SparkEntry.withDupSwarms: seeds doc_id % 100 < 3
    // each spawn two mirror copies (even seed: both n_chars+1 — an exact
    // tie exercising the lowest-id tiebreak; odd seed: n_chars+1, +2 — the
    // longest copy wins outright)
    val planted = docs.filter(_.doc_id % 100 < 3).flatMap { d =>
      Seq(1L, 2L).map { c =>
        val n = if (d.doc_id % 2 == 0) d.n_chars + 1 else d.n_chars + c
        Doc(1000000L + d.doc_id * 10 + c, d.text, d.lang, "mirror", n)
      }
    }
    val corpus = docs ++ planted
    val expected = corpus.groupBy(d => md5hex(d.text)).toSeq.flatMap { case (_, ds) =>
      val keep = ds.minBy(d => (-d.n_chars, d.doc_id))
      ds.filter(_.doc_id != keep.doc_id).map(d => (d.doc_id, keep.doc_id, d.source))
    }.toSet
    val got = run("q55_canonical_keep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == expected)
    // even seed 0: tied planted copies — lowest planted id wins, natural drops
    assert(got.contains((0L, 1000001L, "web")) && got.contains((1000002L, 1000001L, "mirror")))
    // odd seed 1: the n+2 copy is the unique longest
    assert(got.contains((1L, 1000012L, "web")) && got.contains((1000011L, 1000012L, "mirror")))
    // the natural swarm (100,101,102 same text) merges with its seeds'
    // planted copies: seed 101's n+2 copy is the cluster's unique longest
    assert(got.contains((100L, 1001012L, "web")) &&
      got.contains((101L, 1001012L, "book")) &&
      got.contains((102L, 1001012L, "book")))
    assert(!got.exists(_._1 == 1001012L))
  }

  test("q51 buckets are exact bit lengths with exact counts/sums") {
    val expected = docs.groupBy(d => (d.source, d.n_chars.toBinaryString.length.toLong))
      .map { case ((src, b), ds) => (src, b, ds.size.toLong, ds.map(_.n_chars).sum) }.toSet
    val got = run("q51_length_histogram").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
  }

  test("q52 percentiles are the value at row ceil(p*n) of the per-language sort") {
    val expected = docs.groupBy(_.lang).map { case (lang, ds) =>
      val sorted = ds.sortBy(d => (d.n_chars, d.doc_id)).map(_.n_chars)
      val n = sorted.size.toLong
      def at(p: Long) = sorted(((n * p + 99) / 100 - 1).toInt)
      (lang, n, at(50), at(90), at(99))
    }.toSet
    val got = run("q52_length_percentiles").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expected)
  }

  test("q53 dup-rate counts every copy of a corpus-wide repeated text") {
    val dupHashes = docs.groupBy(d => md5hex(d.text)).filter(_._2.size > 1).keySet
    val expected = docs.groupBy(_.source).map { case (src, ds) =>
      val nd = ds.count(d => dupHashes(md5hex(d.text))).toLong
      (src, ds.size.toLong, nd, nd * 10000L / ds.size)
    }.toSet
    val got = run("q53_dup_rate_by_source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
    // the planted 3-copy swarm is all counted (every copy, not copies-1)
    assert(expected.exists { case (s, _, nd, _) => s == "book" && nd >= 2 })
  }

  test("q49 keeps exactly the docs whose md5 gate clears the length-proportional rate") {
    val mx = docs.map(_.n_chars).max
    val expected = docs.flatMap { d =>
      val gate = BigInt(md5hex(s"wsmp:${d.doc_id}").take(15), 16) % 10000
      val rate = d.n_chars * 10000L / mx
      if (gate < rate) Some((d.doc_id, d.n_chars, rate)) else None
    }.toSet
    val got = run("q49_weighted_sample").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    // longest doc has rate 10000 — always kept; sample is non-trivial
    val longest = docs.maxBy(d => (d.n_chars, d.doc_id))
    assert(got.exists(_._1 == longest.doc_id))
    assert(got.nonEmpty && got.size < docs.size)
  }

  test("q47 pairwise Jaccard matches set arithmetic over distinct source shingles") {
    val bySource = docs.groupBy(_.source).map { case (s, ds) =>
      s -> ds.flatMap(d => shingle3(toks(d.text))).toSet
    }
    val expected = (for {
      (a, sa) <- bySource; (b, sb) <- bySource if a < b
      common = (sa & sb).size.toLong if common > 0
    } yield (a, b, common, common * 10000L / (sa.size + sb.size - common))).toSet
    val got = run("q47_source_jaccard").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
    assert(expected.exists(_._3 > 0)) // shared phrases across sources really overlap
  }

  test("q48 document frequencies over distinct per-doc tokens, df>=5 floor") {
    val n = docs.size.toLong
    val expected = docs.flatMap(d => toks(d.text).distinct).groupBy(identity)
      .map { case (t, xs) => (t, xs.size.toLong, n, xs.size * 10000L / n) }
      .filter(_._2 >= 5).toSet
    val got = run("q48_idf_table").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
    assert(expected.exists(_._1 == "the")) // high-df stopword present
  }

  test("q50 funnel stages equal a scalar replay of the cascade and are monotone") {
    val stages = docs.map { d =>
      val ts = toks(d.text)
      val s1 = d.n_chars >= 200
      val s2 = s1 && ts.size >= 40
      val s3 = s2 && ts.count(stop) * 20 >= ts.size
      val s4 = s3 && langId(ts) == d.lang
      (s1, s2, s3, s4)
    }
    val expected = Set(
      (0L, docs.size.toLong),
      (1L, stages.count(_._1).toLong), (2L, stages.count(_._2).toLong),
      (3L, stages.count(_._3).toLong), (4L, stages.count(_._4).toLong))
    val got = run("q50_quality_funnel").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    val byStage = got.toSeq.sortBy(_._1).map(_._2)
    assert(byStage == byStage.sorted.reverse) // monotone non-increasing
    assert(byStage.last > 0 && byStage.last < byStage.head) // cascade really filters
  }

  test("q46 star join revenue matches a nested-loop replay in integer cents") {
    val s = spark
    import s.implicits._
    val d = dir
    val region = Seq((0, "AMERICA"), (1, "ASIA"))
    val nation = Seq((0, "BRAZIL", 0), (1, "JAPAN", 1), (2, "PERU", 0))
    val customer = Seq((1L, "c1", 0), (2L, "c2", 1), (3L, "c3", 2))
    val supplier = Seq((10L, "s1", 0), (11L, "s2", 1), (12L, "s3", 2))
    val orders = Seq(
      (1000L, 1L, Timestamp.valueOf("1995-03-15 00:00:00")),
      (1001L, 2L, Timestamp.valueOf("1996-07-01 00:00:00")),
      (1002L, 3L, Timestamp.valueOf("1995-11-30 00:00:00")))
    val lineitem = Seq(
      (1000L, 10L, 901.11, 0.05), // cust nation 0 = supp nation 0 → counts
      (1000L, 11L, 400.25, 0.00), // cust 0 vs supp 1 → excluded
      (1001L, 11L, 1200.50, 0.10), // 1 = 1 → counts
      (1001L, 12L, 77.77, 0.02), // 1 vs 2 → excluded
      (1002L, 12L, 300.00, 0.07), // 2 = 2 → counts
      (1002L, 10L, 55.55, 0.01)) // 2 vs 0 → excluded
    region.toDF("r_regionkey", "r_name").write.mode("overwrite")
      .parquet(s"$d/region.parquet")
    nation.toDF("n_nationkey", "n_name", "n_regionkey").write.mode("overwrite")
      .parquet(s"$d/nation.parquet")
    customer.toDF("c_custkey", "c_name", "c_nationkey").write.mode("overwrite")
      .parquet(s"$d/customer.parquet")
    supplier.toDF("s_suppkey", "s_name", "s_nationkey").write.mode("overwrite")
      .parquet(s"$d/supplier.parquet")
    orders.toDF("o_orderkey", "o_custkey", "o_orderdate").write.mode("overwrite")
      .parquet(s"$d/orders.parquet")
    lineitem.toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")

    val nationR = nation.map(n => n._1 -> region.toMap.apply(n._3)).toMap
    val custN = customer.map(c => c._1 -> c._3).toMap
    val suppN = supplier.map(su => su._1 -> su._3).toMap
    val orderByKey = orders.map(o => o._1 -> o).toMap
    val expected = lineitem.flatMap { case (ok, sk, price, disc) =>
      val o = orderByKey(ok)
      if (custN(o._2) == suppN(sk)) {
        val cents = math.round(price * 100) * (100L - math.round(disc * 100))
        Some(((nationR(suppN(sk)), o._3.toLocalDateTime.getYear.toLong), cents))
      } else None
    }.groupBy(_._1).map { case ((r, y), xs) =>
      (r, y, xs.map(_._2).sum / 1e6, xs.size.toLong)
    }.toSet
    val got = run("q46_star_join").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got == expected)
    assert(expected.size >= 2) // multiple (region, year) groups really exercised
    assert(expected.exists(_._4 == 2L)) // and one group aggregates across orders
  }
}
