package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Duplicate clustering: connected components over a near-duplicate pair
  * list, entirely as DataFrame joins/aggregations (no driver-side graph, no
  * RDD collect) so it scales with the cluster like the dedup operators that
  * feed it.
  *
  * Algorithm: min-label propagation with pointer jumping — each round a
  * node's label folds in (a) the minimum label among its neighbors and
  * (b) the label of its current label (label(label(v))). (b) halves the
  * remaining propagation depth, giving O(log diameter) rounds like the
  * large-star/small-star formulation of Kiveris et al., "Connected
  * Components in MapReduce and Beyond" (SoCC'14), with simpler invariants:
  * labels only ever decrease, so convergence is detected by one cheap
  * `sum(comp)` action per round instead of a change-count join.
  *
  * Scale shape per round: two shuffle hash joins on node id + one hash
  * aggregate — all AQE-plannable, skew-join eligible. Near-dup graphs are
  * overwhelmingly tiny components (pairs/triples), so real-world round
  * counts are 2–3; `maxRounds` only bounds adversarial chains.
  */
object Clusters {

  /** Edge count at or below which [[connectedComponents]] solves the graph
    * with a single-pass driver union-find instead of the iterative join
    * loop — the same size-adaptive trade AQE makes when it broadcasts a
    * small join side. A million (src, dst) longs is ~16 MB; the iterative
    * loop costs several Spark jobs of fixed overhead per round, which
    * dwarfs that for small graphs. Near-dup edge lists are already the
    * *output* of LSH candidate pruning, so in practice they are a vanishing
    * fraction of corpus size; graphs above the threshold take the
    * distributed loop.
    */
  val UnionFindMaxEdges: Long = 1L << 20

  /** Connected components of the undirected graph given by `(aCol, bCol)`
    * edge endpoints (long ids). Returns ("id", "comp") where `comp` is the
    * minimum node id in the component — one row per distinct endpoint.
    */
  def connectedComponents(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      maxRounds: Int = 25,
      unionFindMaxEdges: Long = UnionFindMaxEdges
  ): DataFrame = {
    // Fail loudly on non-integral id columns: cast("long") on a string/UUID
    // id yields NULLs, which would silently dissolve every component (the
    // join back in dupClusters would match nothing and report singletons).
    Seq(aCol, bCol).foreach { c =>
      import org.apache.spark.sql.types._
      val ok = edges.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _                                             => false
      }
      require(ok, s"connectedComponents needs integral node ids; " +
        s"column '$c' is ${edges.schema(c).dataType.sql}")
    }
    val fwd = edges.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = fwd.count()
    if (nEdges <= unionFindMaxEdges) {
      val spark = edges.sparkSession
      import spark.implicits._
      // small-graph fast path: classic union-find with path halving over
      // the collected edge list, result re-distributed as a DataFrame
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = parent.getOrElseUpdate(x, x)
        while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
        r
      }
      fwd.as[(Long, Long)].collect().foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val out = parent.keys.toSeq.map(k => (k, find(k)))
      fwd.unpersist()
      return out.toDF("id", "comp")
    }

    val sym = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // comp is non-increasing per node, so the label sum strictly decreases
    // until the fixpoint: one scalar action per round decides convergence.
    var prevSum = labels.agg(sum("comp")).head.getLong(0)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("comp").as("__nc")), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min("__nc").as("__nbrComp"))
      val stepped = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("__nbrComp"), col("comp"))).as("comp"))
      val jumped = stepped
        .join(
          stepped.select(col("id").as("comp"), col("comp").as("__cc")),
          Seq("comp"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("__cc"), col("comp"))).as("comp"))
        // lineage grows per round; localCheckpoint truncates it so late
        // rounds don't replan/replay the whole chain. Lazy: the sum below
        // materializes it — one Spark action per round, not two.
        .localCheckpoint(false)
      val newSum = jumped.agg(sum("comp")).head.getLong(0)
      labels.unpersist()
      labels = jumped
      converged = newSum == prevSum
      prevSum = newSum
      round += 1
    }
    sym.unpersist()
    fwd.unpersist()
    labels
  }

  /** Near-duplicate document clusters: MinHash+LSH candidate pairs at
    * `threshold` Jaccard (exactly `Dedup.nearDupPairs`), connected
    * components over those pairs, then every document labeled with its
    * cluster representative (minimum doc id in the component; singletons
    * are their own representative).
    *
    * Output: (idCol, "cluster_id") — one row per input document.
    */
  def dupClusters(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double
  ): DataFrame =
    clustersFromPairs(df, idCol, Dedup.nearDupPairs(df, idCol, textCol, threshold))

  /** [[dupClusters]] over an already-tokenized frame (see
    * [[Dedup.nearDupPairsFromTokens]]) — q31 tokenizes once and shares. */
  def dupClustersFromTokens(
      df: DataFrame,
      idCol: String,
      toksCol: String,
      threshold: Double
  ): DataFrame =
    clustersFromPairs(df, idCol,
      Dedup.nearDupPairsFromTokens(df, idCol, toksCol, threshold))

  private def clustersFromPairs(
      df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val cc = connectedComponents(pairs, "id_a", "id_b")
    df.select(col(idCol))
      .join(cc.select(col("id").as(idCol), col("comp")), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("comp"), col(idCol)).as("cluster_id"))
  }
}
