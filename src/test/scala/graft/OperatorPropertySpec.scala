package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOfJoin, Clusters, Pack}

/** Seeded randomized cross-checks: each distributed operator against a
  * trivially-correct in-memory oracle, over inputs a hand-written case
  * would not think of (random graphs, random partitionings, random
  * version/probe interleavings). Seeds are fixed — failures reproduce.
  */
class OperatorPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("connectedComponents matches reference union-find on random graphs, both paths") {
    import spark.implicits._
    val rnd = new scala.util.Random(421)
    for (round <- 0 until 6) {
      val n = 5 + rnd.nextInt(40)
      val nEdges = rnd.nextInt(60)
      val edges = Seq.fill(nEdges)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        // reference: textbook union-find
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          var r = parent.getOrElseUpdate(x, x)
          while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
          r
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        val expected = parent.keys.map(k => k -> find(k)).toMap

        val df = edges.toDF("a", "b")
        for (threshold <- Seq(Long.MaxValue, 0L)) {
          val got = Clusters.connectedComponents(df, "a", "b",
              unionFindMaxEdges = threshold)
            .as[(Long, Long)].collect().toMap
          assert(got == expected, s"round=$round threshold=$threshold")
        }
      }
    }
  }

  test("tokenBatches matches the sequential prefix sum on random inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(422)
    for (round <- 0 until 5) {
      val n = 1 + rnd.nextInt(300)
      val budget = 1L + rnd.nextInt(500)
      val rows = (0 until n).map(i => (i.toLong, rnd.nextInt(100).toLong))
      val parts = 1 + rnd.nextInt(9)
      val df = spark.createDataFrame(spark.sparkContext.parallelize(
        rnd.shuffle(rows), parts)).toDF("doc_id", "n_tokens")
      val got = Pack.tokenBatches(df, "doc_id", "n_tokens", budget)
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      var acc = 0L
      rows.zip(got).foreach { case ((id, tok), (gid, gtok, batch)) =>
        assert(gid == id && gtok == tok, s"round=$round doc=$id")
        assert(batch == acc / budget, s"round=$round doc=$id budget=$budget")
        acc += tok
      }
    }
  }

  test("leftAsOf matches a nested-loop scan on random interleavings") {
    import spark.implicits._
    val rnd = new scala.util.Random(423)
    def ts(m: Int): Timestamp = new Timestamp(946684800000L + m * 60000L)
    for (round <- 0 until 5) {
      val keys = Seq("a", "b", "c")
      val builds = Seq.fill(3 + rnd.nextInt(25))(
        (keys(rnd.nextInt(3)), ts(rnd.nextInt(100)), rnd.nextInt(1000)))
      val probes = Seq.fill(3 + rnd.nextInt(25))(
        (keys(rnd.nextInt(3)), ts(rnd.nextInt(100)), rnd.nextInt(1000)))
      val got = AsOfJoin.leftAsOf(
          probes.toDF("k", "pt", "pv"), builds.toDF("k", "bt", "bv"),
          keys = Seq("k"), probeTime = "pt", buildTime = "bt",
          buildCols = Seq("bv" -> "bv"))
        .select("k", "pt", "pv", "bv")
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getInt(2),
          if (r.isNullAt(3)) None else Some(r.getInt(3))))
        .sortBy(t => (t._1, t._2.getTime, t._3))

      // oracle: per probe, the latest build at-or-before; ties on build
      // time resolve to the max value the window's last() would pick —
      // make build times unique per key to keep the oracle unambiguous
      val uniq = builds.groupBy(b => (b._1, b._2)).map(_._2.head).toSeq
      val gotU = AsOfJoin.leftAsOf(
          probes.toDF("k", "pt", "pv"), uniq.toDF("k", "bt", "bv"),
          keys = Seq("k"), probeTime = "pt", buildTime = "bt",
          buildCols = Seq("bv" -> "bv"))
        .select("k", "pt", "pv", "bv")
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getInt(2),
          if (r.isNullAt(3)) None else Some(r.getInt(3))))
        .sortBy(t => (t._1, t._2.getTime, t._3))
      val expected = probes.map { case (k, pt, pv) =>
        val candidates = uniq.filter(b => b._1 == k && !b._2.after(pt))
        val bv = if (candidates.isEmpty) None
          else Some(candidates.maxBy(_._2.getTime)._3)
        (k, pt, pv, bv)
      }.sortBy(t => (t._1, t._2.getTime, t._3))
      assert(gotU.toSeq == expected, s"round=$round")
      assert(got.length == probes.length, "probe rows kept 1:1")
    }
  }
}
