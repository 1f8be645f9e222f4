package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Clusters, Pack}

class ClustersPackSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("connectedComponents labels every node with the component minimum") {
    import spark.implicits._
    // components: {1,2,3}, {5,6}, and a 9-node path 20..12 given in
    // max-unfriendly order (propagation must travel the full chain —
    // exercises the pointer-jumping rounds, not just one hop)
    val chain = (13L to 20L).map(i => (i, i - 1))
    val edges = (Seq((1L, 2L), (2L, 3L), (5L, 6L)) ++ chain).toDF("a", "b")
    // both execution paths must agree: driver union-find (small-graph
    // fast path) and the distributed iterative loop (forced via threshold)
    for (threshold <- Seq(Long.MaxValue, 0L)) {
      val got = Clusters
        .connectedComponents(edges, "a", "b", unionFindMaxEdges = threshold)
        .as[(Long, Long)].collect().toMap
      assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L, s"t=$threshold")
      assert(got(5L) == 5L && got(6L) == 5L, s"t=$threshold")
      (12L to 20L).foreach(i => assert(got(i) == 12L, s"node $i t=$threshold"))
    }
  }

  test("dupClusters groups planted near-duplicates, singletons self-labeled") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away home"
    val docs = Seq(
      (10L, base),
      (11L, base + " tonight"),
      (12L, "completely different content about spark sql engines and catalyst"),
      (13L, base.replace("quick", "swift"))
    ).toDF("doc_id", "text")
    val got = Clusters.dupClusters(docs, "doc_id", "text", 0.5)
      .as[(Long, Long)].collect().toMap
    assert(got(10L) == 10L && got(11L) == 10L && got(13L) == 10L)
    assert(got(12L) == 12L)
  }

  test("tokenBatches matches the global-window formulation across partitions") {
    import spark.implicits._
    val rows = (0L until 500L).map(i => (i, 1L + (i * 7) % 50))
    // deliberately unordered, many input partitions
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(scala.util.Random.shuffle(rows), 7))
      .toDF("doc_id", "n_tokens")
    val got = Pack.tokenBatches(df, "doc_id", "n_tokens", budget = 97L)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // oracle: sequential exclusive prefix sum in id order
    var acc = 0L
    rows.sortBy(_._1).zip(got).foreach { case ((id, n), (gid, gn, batch)) =>
      assert(gid == id && gn == n)
      assert(batch == acc / 97L, s"doc $id: got $batch expected ${acc / 97L}")
      acc += n
    }
    // batches are dense from 0 and non-decreasing in id order
    assert(got.head._3 == 0L)
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 == a._3 || b._3 == a._3 + 1 || b._3 > a._3)
    }
  }

  test("tokenBatches respects the budget boundary exactly") {
    import spark.implicits._
    val df = Seq((1L, 5L), (2L, 5L), (3L, 1L), (4L, 10L)).toDF("doc_id", "n_tokens")
    val got = Pack.tokenBatches(df, "doc_id", "n_tokens", budget = 10L)
      .as[(Long, Long, Long)].collect().sortBy(_._1).map(r => r._1 -> r._3).toMap
    // exclusive prefix sums: 0, 5, 10, 11 → batches 0, 0, 1, 1
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
  }
}
