package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables.{t, cents, tenK}
import graft.functions.Text
import graft.operators.{AsOfJoin, Clusters, Decontaminate, Dedup, Pack, Similarity}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query aggregates doubles via exact integer scaling (see
  * [[graft.core.Tables]]) so results hash-match the DuckDB oracle bit-for-bit.
  * Model-sized outputs carry an ORDER BY for readable determinism;
  * corpus-sized outputs deliberately do NOT (round 12): the correctness gate
  * compares row-sorted, and a trailing global sort of a data-sized result is
  * a full range-partition shuffle that buys nothing at 100 TB (guide §2.4 —
  * "an orderBy used only to make output deterministic").
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** The synthetic corpus has (almost) no natural exact duplicates — sf0.01
    * has zero — so the exact-dedup keep/drop queries (q8/q55) would pass
    * vacuously on an all-singleton input. Like q34's planted PII, each doc
    * with doc_id % 100 < 3 gets two deterministically planted mirror copies
    * (same text ⇒ same md5 cluster; ids offset above the natural range; for
    * even seeds both copies share n_chars+1 to exercise the lowest-id
    * tiebreak, for odd seeds n_chars+c so the longest copy wins). The same
    * construction runs in the DuckDB oracle.
    */
  private def withDupSwarms(docs: DataFrame): DataFrame = {
    val copies = docs
      .where(col("doc_id") % 100 < 3)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .withColumn("c", explode(array(lit(1L), lit(2L))))
      .select(
        (lit(1000000L) + col("doc_id") * 10 + col("c")).as("doc_id"),
        col("text"),
        when(col("doc_id") % 2 === 0, col("n_chars") + 1)
          .otherwise(col("n_chars") + col("c")).as("n_chars"),
        lit("mirror").as("source"))
    docs.select("doc_id", "text", "n_chars", "source").unionByName(copies)
  }

  /** q47 pair expander: the sorted (a < b) source pairs of one shingle's
    * source set, plus one (source, NULL) singleton marker per member — so a
    * single count aggregate yields both pair-intersection counts and
    * per-source distinct-shingle sizes. Compiled kernel; |set| is bounded
    * by |sources| (model-sized), so the expansion is ≤ |sources|²/2 rows
    * per shingle and never corpus-quadratic.
    */
  private val sourcePairMarks = udf { (srcsIn: Seq[String]) =>
    val a = srcsIn.toArray.sorted
    val out = Array.newBuilder[(String, String)]
    out.sizeHint(a.length * (a.length + 1) / 2)
    var i = 0
    while (i < a.length) {
      out += ((a(i), null))
      var j = i + 1
      while (j < a.length) {
        out += ((a(i), a(j)))
        j += 1
      }
      i += 1
    }
    out.result()
  }

  /** DuckDB spelling of [[withDupSwarms]] as a WITH-clause body producing a
    * `corpus` relation — prepended to q8/q55's oracle SQL. */
  private val dupSwarmCte: String =
    """WITH copies AS (
      |  SELECT 1000000 + s.doc_id * 10 + c.c AS doc_id, s.text,
      |    CASE WHEN s.doc_id % 2 = 0 THEN s.n_chars + 1
      |         ELSE s.n_chars + c.c END AS n_chars,
      |    'mirror' AS source
      |  FROM documents s CROSS JOIN (VALUES (1), (2)) AS c(c)
      |  WHERE s.doc_id % 100 < 3),
      |corpus AS (
      |  SELECT doc_id, text, n_chars, source FROM documents
      |  UNION ALL SELECT doc_id, text, n_chars, source FROM copies)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── Projection + filter + grouped aggregation (TPC-H Q1 shape).
    // Reference surface: EngineMapTest/EngineAggregationTest map+agg queries.
    "q1_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          (sum(cents(col("l_extendedprice"))) / lit(100.0)).as("sum_base_price"),
          (sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
            / lit(1e6)).as("sum_disc_price"),
          (sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount")))
            * (lit(100) + cents(col("l_tax")))) / lit(1e8)).as("sum_charge"),
          count(lit(1)).as("count_order")
        )
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // ── Tumbling 1-day window aggregation over the event stream.
    // Reference surface: GROUP BY TUMBLE(event_time, INTERVAL '1' DAY)
    // (README.md:8-18, EngineAggregationTest) — batch-incremental form.
    "q2_daily_events" -> ((s, dir) => {
      // timestamp_ntz: DuckDB's date_trunc yields a naive timestamp; writing
      // a UTC-adjusted one would hash-mismatch on tz-awareness alone.
      t(s, dir, "events")
        .groupBy(
          date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"),
          col("event_type")
        )
        .agg(
          count(lit(1)).as("n_events"),
          (sum(tenK(col("value"))) / lit(1e4)).as("sum_value"),
          countDistinct(col("user_id")).as("n_users")
        )
        .orderBy(col("day"), col("event_type"))
    }),

    // ── Top-N per group with deterministic tiebreak.
    // Reference surface: row_number() OVER (...) + place <= N (EngineTopNTest).
    "q3_topn_orders" -> ((s, dir) => {
      val w = Window
        .partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("place", row_number().over(w).cast("long"))
        .where(col("place") <= 3)
        .select("o_orderpriority", "place", "o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_orderpriority"), col("place"))
    }),

    // ── Stream-to-stream interval join (batch-incremental form).
    // Reference surface: LEFT JOIN ... ON key AND t BETWEEN t2 AND t2 + INTERVAL
    // (README.md:20-35, EngineJoinStreamToStreamTest).
    "q4_interval_join" -> ((s, dir) => {
      // Join strategy picked deliberately (round 12, guide §3.1): the
      // planner broadcast the FULL lineitem side (estimated under the
      // 10 MB threshold), so the dominant cost was building a 600k-row
      // hash relation — and at any real scale a fact-table broadcast is
      // impossible anyway. The merge hint plans the sort-merge join the
      // scale plan uses; A/B at sf0.1: 1.35 → 0.99. (Probe-side spread
      // alone was tried first and REVERTED: 1.35 → 1.39 — the broadcast
      // build, not the serial probe, was the cost.)
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      o.join(
          l.hint("merge"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") >= col("o_orderdate") &&
            col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 30 DAYS"),
          "left_outer"
        )
        .groupBy(col("o_orderkey"))
        .agg(
          count(col("l_partkey")).as("n_shipped_30d"),
          coalesce(sum(col("l_quantity").cast("long")), lit(0L)).as("qty_shipped_30d")
        )
        // Orders-sized output: the groupBy's hash exchange is the only
        // shuffle; no trailing range-partition sort of the full result.
    }),

    // ── Multi-join aggregate with broadcastable dimensions.
    "q6_revenue_by_nation" -> ((s, dir) => {
      // Fact-side spread on the JOIN key (round 12): the single-row-group
      // lineitem scan is one task, so with every dimension broadcast the
      // probe + partial aggregate ran serially. l_orderkey is the key this
      // join shuffles on at any scale where orders stops broadcasting, so
      // the exchange is the scale plan's own, not a local-only trick.
      val l = t(s, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .repartition(s.sparkContext.defaultParallelism, col("l_orderkey"))
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          (sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
            / lit(1e6)).as("revenue"),
          count(lit(1)).as("n_items")
        )
        .orderBy(col("r_name"), col("n_name"))
    }),

    // ── Changelog compaction / temporal-table snapshot: latest row per key.
    // Reference surface: temporal table registration (TransformEngine.scala:164-200).
    "q7_latest_by_key" -> ((s, dir) => {
      val w = Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select("user_id", "event_id", "event_type")
        .orderBy(col("user_id"))
    }),

    // ── Exact deduplication by content hash over the documents table
    // (+ planted duplicate swarms so the drop path is non-vacuous).
    "q8_dedup_exact" -> ((s, dir) => {
      withDupSwarms(t(s, dir, "documents"))
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(
          min(col("doc_id")).as("keep_id"),
          count(lit(1)).as("n_copies")
        )
        // corpus-sized output: no trailing global sort (order is carried
        // by the output columns; the correctness gate compares row-sorted)
    }),

    // ── AS-OF join: each purchase event gets the user's latest prior 'view'.
    // Reference surface: FOR SYSTEM_TIME AS OF / LATERAL TABLE temporal join
    // (EngineJoinStreamToTemporalTableTest) — via graft.operators.AsOfJoin.
    "q5_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val probe = ev
        .where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val build = ev
        .where(col("event_type") === "view")
        .select(
          col("user_id"),
          col("ts").as("view_ts"),
          col("event_id").as("view_event_id")
        )
      AsOfJoin
        .leftAsOf(
          probe,
          build,
          keys = Seq("user_id"),
          probeTime = "ts",
          buildTime = "view_ts",
          buildCols = Seq("view_event_id" -> "last_view_event_id")
        )
        .select(
          col("event_id"),
          col("user_id"),
          (tenK(col("value")) / lit(1e4)).as("value"),
          col("last_view_event_id")
        )
        // corpus-sized output: no trailing global sort (order is carried
        // by the output columns; the correctness gate compares row-sorted)
    }),

    // ── Near-dup detection: MinHash+LSH candidates + exact Jaccard verify.
    // Matches the exact O(n²) oracle because band/row sizing makes the LSH
    // miss probability negligible at threshold 0.8 (see operators.Dedup).
    "q9_ngram_neardup" -> ((s, dir) => {
      Dedup.nearDupPairs(t(s, dir, "documents"), "doc_id", "text", 0.8)
        // corpus-sized output: no trailing global sort (order is carried
        // by the output columns; the correctness gate compares row-sorted)
    }),

    // ── Similarity search: brute-force cosine top-5 for probe vectors.
    "q10_ann_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(
          e.where(col("vec_id") < 10), e, "vec_id", "embedding", k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // ── Language identification (stopword-marker heuristic).
    "q11_langid" -> ((s, dir) => {
      // tokens materialized once behind a shuffle barrier: the score cascade
      // references them ~20×, which interpreted eval would recompute.
      // Explicit width: AQE's byte-based coalescing must not collapse a
      // CPU-bound stage over small document bytes to one task.
      t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"),
          // fused kernel (round 13): tokenize + marker counting in one pass
          Text.langIdFromLowered(lower(col("text"))).as("lang_pred"))
        // corpus-sized output: no trailing global sort (order is carried
        // by the output columns; the correctness gate compares row-sorted)
    }),

    // ── Document quality scoring (length/punctuation/stopword ratios).
    "q12_quality" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        // fused tokenizer (round 13): regex-free; the array is consumed
        // by three downstream expressions, so it stays materialized
        .select(col("doc_id"), col("text"),
          Text.tokensFromLowered(lower(col("text"))).as("__toks"))
        .select(
          col("doc_id"),
          size(col("__toks")).cast("long").as("n_tokens"),
          Text.punctCount(col("text")).as("n_punct"),
          Text.stopwordCount(col("__toks")).as("n_stopwords"),
          Text.qualityScoreFrom(col("__toks"), col("text")).as("quality_score"))
        // corpus-sized output: no trailing global sort (order is carried
        // by the output columns; the correctness gate compares row-sorted)
    }),

    // ── Token counting: whitespace + BPE-ish subword proxy.
    "q13_token_stats" -> ((s, dir) => {
      // repartition: single-file doc tables otherwise run the three regex
      // passes serially in one task
      t(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(
          col("doc_id"),
          Text.wsTokenCount(col("text")).as("n_ws_tokens"),
          Text.tokenCount(col("text")).as("n_word_tokens"),
          Text.bpeTokenCount(col("text")).as("n_bpe_tokens"))
        // corpus-sized output: no trailing global sort (order is carried
        // by the output columns; the correctness gate compares row-sorted)
    }),

    // ── Content fingerprint (bag-of-words md5) + duplicate grouping.
    "q14_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        // explicit-width spread: the single-row-group scan is one task;
        // without it the per-document kernel work runs serially
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), Text.fingerprint(col("text")).as("fingerprint"))
        // corpus-sized output: no trailing global sort (order is carried
        // by the output columns; the correctness gate compares row-sorted)
    }),

    // ── SimHash: 60-bit md5-derived signature, oracle-checked bit for bit
    // (the hash family is md5 hex→int so DuckDB computes it identically).
    "q15_simhash" -> ((s, dir) => {
      Dedup.simhashDf(t(s, dir, "documents"), "doc_id", "text")
        // corpus-sized output: no trailing global sort (order is carried
        // by the output columns; the correctness gate compares row-sorted)
    }),

    // ── LSH-bucketed approximate ANN (scale path). Oracle-exact: the
    // md5-derived Rademacher hyperplanes and ordered-double projections are
    // recomputed identically by the DuckDB oracle, so the banded candidate
    // set — not just the re-ranked scores — is verified.
    "q16_lsh_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.lshTopK(
          e.where(col("vec_id") < 10), e, "vec_id", "embedding",
          k = 5, dim = 64)
        .orderBy(col("query_id"), col("rank"))
    }),

    // ── JSON column extraction over the event props payload: one from_json
    // parse per row with an explicit schema (two get_json_object calls would
    // parse the payload twice).
    "q24_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("props"))
        // explicit-width spread: the single-row-group scan is one task;
        // without it the per-document kernel work runs serially
        .repartition(s.sparkContext.defaultParallelism, col("event_id"))
        .select(col("event_type"), from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "k BIGINT, missing STRING")).as("__j"))
        .groupBy(col("event_type"))
        .agg(
          sum(col("__j.k")).as("sum_k"),
          count(col("__j.missing")).as("n_missing"))
        .orderBy(col("event_type"))
    }),

    // ── Window functions: running per-user aggregates + lag.
    "q25_window_functions" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(
          col("event_id"),
          col("user_id"),
          (sum(tenK(col("value"))).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            / lit(1e4)).as("running_value"),
          lag(col("event_id"), 1).over(w).as("prev_event_id"),
          row_number().over(w).cast("long").as("event_seq"))
        // No trailing global sort: the window's user_id hash shuffle is the
        // only exchange; per-user order is the event_seq column. A second
        // range-partition pass over the full event table to order a
        // corpus-sized result buys nothing at scale.
    }),

    // ── Semi/anti joins: customer order-activity per nation.
    "q26_semi_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val active = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_active"))
      val inactive = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_inactive"))
      active.join(inactive, Seq("c_nationkey"), "full_outer")
        .select(
          col("c_nationkey").cast("long").as("nationkey"),
          coalesce(col("n_active"), lit(0L)).as("n_active"),
          coalesce(col("n_inactive"), lit(0L)).as("n_inactive"))
        .orderBy(col("nationkey"))
    }),

    // ── ROLLUP subtotals (grouping-sets surface; absent in the reference).
    "q21_rollup_revenue" -> ((s, dir) => {
      // fact-side spread on the join key — see q6; the rollup's ×3 expand
      // ran serially in the single scan task otherwise
      val l = t(s, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .repartition(s.sparkContext.defaultParallelism, col("l_orderkey"))
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(
          (sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
            / lit(1e6)).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    }),

    // ── Set operations (INTERSECT/EXCEPT surface; absent in the reference).
    "q22_set_ops" -> ((s, dir) => {
      val supplierNations = t(s, dir, "supplier")
        .select(col("s_nationkey").as("nationkey")).distinct()
      val customerNations = t(s, dir, "customer")
        .select(col("c_nationkey").as("nationkey")).distinct()
      val both = supplierNations.intersect(customerNations)
        .withColumn("membership", lit("both"))
      val customerOnly = customerNations.except(supplierNations)
        .withColumn("membership", lit("customer_only"))
      both.unionByName(customerOnly)
        .select(col("nationkey").cast("long").as("nationkey"), col("membership"))
        .orderBy(col("membership"), col("nationkey"))
    }),

    // ── Exact order statistics via integer cents (median interpolation is
    // deterministic on exact halves).
    "q23_price_stats" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          (min(cents(col("o_totalprice"))) / lit(100.0)).as("min_price"),
          (max(cents(col("o_totalprice"))) / lit(100.0)).as("max_price"),
          (expr("percentile(cast(round(o_totalprice*100) as bigint), 0.5)")
            / lit(100.0)).as("median_price"))
        .orderBy(col("o_orderpriority"))
    }),

    // ── Sliding (HOP) window over the event stream — superset of the
    // reference's TUMBLE-only surface.
    "q19_sliding_window" -> ((s, dir) => {
      // Two-level HOP aggregation (round 12; guide §2.3 "aggregate before
      // you shuffle"): the naive form explodes 7 window copies of EVERY
      // event row before aggregating. The slide (1 day) aligns to day
      // boundaries, so all events of one calendar day belong to the same 7
      // windows — aggregate per (day, type) first (map-side combinable;
      // corpus-sized input collapses to days×types) and explode the 7
      // window starts over the DAY aggregates only. Counts and integer
      // sums are associative, so the result is bit-identical.
      t(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).as("__day"), col("event_type"))
        .agg(count(lit(1)).as("__n"), sum(tenK(col("value"))).as("__sv"))
        .select(col("event_type"), col("__n"), col("__sv"),
          explode(sequence(col("__day") - expr("INTERVAL 6 DAYS"),
            col("__day"), expr("INTERVAL 1 DAY"))).as("__ws"))
        .groupBy(col("__ws").cast("timestamp_ntz").as("window_start"),
          col("event_type"))
        .agg(
          sum(col("__n")).as("n_events"),
          (sum(col("__sv")) / lit(1e4)).as("sum_value"))
        .orderBy(col("window_start"), col("event_type"))
    }),

    // ── Session windows (30-minute gap) per user — superset feature.
    "q20_session_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(
          col("user_id"),
          col("session_window.start").cast("timestamp_ntz").as("session_start"),
          col("n_events"))
        // Sessions-sized output (∝ events): session ordering is the
        // (user_id, session_start) columns; no trailing global sort.
    }),

    // ── IVF approximate ANN — second scale path, as an explicit
    // build-once/probe-many index. The deterministic sampled-centroid build
    // (ids ≡ 0 mod 29) is exactly reproducible by the DuckDB oracle, which
    // verifies cell assignment, probing, and re-ranking end to end; the
    // k-means build shares the same assign/probe code (recall + no-refit
    // reuse asserted in DedupSimilaritySpec).
    "q18_ivf_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val index = Similarity.ivfBuildSampled(e, "vec_id", "embedding", stride = 29)
      Similarity.ivfProbe(
          e.where(col("vec_id") < 10), index, "vec_id", "embedding",
          k = 5, nProbe = 4)
        .orderBy(col("query_id"), col("rank"))
    }),

    // ── Embedding near-dup pairs above a cosine threshold.
    "q17_embedding_neardup" -> ((s, dir) => {
      Similarity.nearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding", 0.45)
        // corpus-sized output: no trailing global sort (order is carried
        // by the output columns; the correctness gate compares row-sorted)
    }),

    // ── Duplicate clustering: connected components over the q9 near-dup
    // pairs, every document labeled with its cluster representative.
    "q27_dup_clusters" -> ((s, dir) => {
      Clusters.dupClusters(t(s, dir, "documents"), "doc_id", "text", 0.8)
        // corpus-sized output: no trailing global sort (order is carried
        // by the output columns; the correctness gate compares row-sorted)
    }),

    // ── Deterministic stratified sampling: md5-hash gate per document with
    // a per-language rate (downsample dominant languages, keep the rest) —
    // reproducible across runs/engines, no RNG state.
    "q28_stratified_sample" -> ((s, dir) => {
      val gate = pmod(
        conv(substring(md5(concat(lit("smp:"),
          col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long"),
        lit(100L))
      t(s, dir, "documents")
        .where(gate < when(col("lang") === "en", lit(20L)).otherwise(lit(60L)))
        .select(col("doc_id"), col("lang"))
        // corpus-sized output: no trailing global sort (order is carried
        // by the output columns; the correctness gate compares row-sorted)
    }),

    // ── Corpus n-gram statistics: top-50 token trigrams by occurrence.
    // Partial aggregation map-side, TakeOrdered for the limit — no global
    // sort of the full n-gram table.
    "q29_ngram_freq" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("text"))
        .repartition(s.sparkContext.defaultParallelism)
        // fused kernel (round 13): tokenize + shingle in one pass
        .select(explode(Text.shinglesFromLowered(lower(col("text")), 3)).as("ngram"))
        .groupBy(col("ngram"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("ngram"))
        .limit(50)
    }),

    // ── Token-budget batching via two-phase distributed prefix sum.
    "q30_token_batches" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        // fused count kernel (round 13): counts token runs with no regex
        // and no array; NULL text → NULL count (Pack weighs NULL as 0)
        .select(col("doc_id"), Text.tokenCountFromLowered(lower(col("text"))).as("n_tokens"))
      Pack.tokenBatches(docs, "doc_id", "n_tokens", budget = 8192L)
        // corpus-sized output: no trailing global sort (order is carried
        // by the output columns; the correctness gate compares row-sorted)
    }),

    // ── End-to-end corpus cleaning, the operators composed as one
    // pipeline: exact dedup (bag-of-words fingerprint, keep lowest id) →
    // near-dup clustering on the survivors (keep representatives) →
    // quality + language annotation with a quality gate. The shape every
    // training-data pipeline runs; each stage is the already-oracled
    // operator, composed.
    "q31_clean_corpus" -> ((s, dir) => {
      // Tokenize ONCE; the persisted token frame feeds the fingerprint,
      // near-dup (via dupClustersFromTokens), and quality stages — round-3
      // VERDICT flagged the duplicate tokenize passes as q31's main cost.
      // Materialized eagerly (round 12): the exact-dedup join references it
      // on both sides in one job, so a lazy cache had the tokenize+
      // fingerprint pipeline racing to fill itself twice.
      val docs = graft.core.Frames.materialize(t(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        // fused kernel (round 13): tokens + fingerprint in one pass
        .select(col("doc_id"), col("text"),
          Text.tokensAndFingerprintFromLowered(lower(col("text"))).as("__tf"))
        .select(col("doc_id"), col("text"),
          col("__tf._1").as("__toks"), col("__tf._2").as("__fp")))
      // keeper materialized too (round 13): it is referenced by `exact` in
      // BOTH the candidates job and the output job, and each reference
      // re-aggregated it from the docs cache — whose row-serialized token
      // arrays make every full cache scan cost seconds of executor time.
      // The keeper cache is |distinct fingerprints| rows of (hash, id).
      val keeper = graft.core.Frames.materialize(docs.groupBy(col("__fp"))
        .agg(min(col("doc_id")).as("doc_id")))
      val exact = docs.join(keeper, Seq("__fp", "doc_id"))
      // Anti-join against the NON-representatives (round 13): the generic
      // (doc_id, cluster_id) mapping join re-ran the whole keeper/exact
      // subtree on the reps side of the output job and planned a
      // sort-merge join. Only cluster members with a smaller-id neighbor
      // are dropped — a cluster-member-sized set (tiny: it is near-dup
      // OUTPUT) that broadcast-anti-joins with no second exact subtree.
      // Identical rows: old form kept ids with coalesce(comp, id) == id,
      // i.e. dropped exactly {id in cc | comp != id}.
      val nonReps = Clusters.connectedComponents(
          Dedup.nearDupPairsFromTokens(
            exact.select(col("doc_id"), col("__toks")), "doc_id", "__toks", 0.8),
          "id_a", "id_b")
        .where(col("id") =!= col("comp"))
        .select(col("id").as("doc_id"))
      exact.join(nonReps, Seq("doc_id"), "left_anti")
        .select(col("doc_id"),
          Text.langIdFromTokens(col("__toks")).as("lang_pred"),
          // the Once variant: a deterministic score is substituted into the
          // pushed-down filter and the whole expression (stopword kernel +
          // regexp over full text) evaluates twice per row (guide §4.4)
          Text.qualityScoreFromOnce(col("__toks"), col("text")).as("quality_score"))
        .where(col("quality_score") >= 0.4)
        // corpus-sized output: no trailing global sort (order is carried
        // by the output columns; the correctness gate compares row-sorted)
    }),

    // ── Benchmark decontamination: corpus docs sharing token 4-grams with
    // a held-out eval split (doc_id % 20 = 0 stands in for the benchmark).
    // Eval n-grams broadcast — the corpus side never shuffles on the gram.
    "q32_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Decontaminate.overlap(
          docs.where(col("doc_id") % 20 =!= 0),
          docs.where(col("doc_id") % 20 === 0),
          "doc_id", "text", n = 4)
        // corpus-sized output: no trailing global sort (order is carried
        // by the output columns; the correctness gate compares row-sorted)
    }),

    // ── Gopher-style within-doc repetition metrics over token 2-grams:
    // duplicate-gram fraction and top-gram fraction, the standard
    // boilerplate/degenerate-text filters.
    "q33_repetition" -> ((s, dir) => {
      Text.repetitionDf(
          t(s, dir, "documents")
            .repartition(s.sparkContext.defaultParallelism, col("doc_id")),
          "doc_id", "text", n = 2)
        .where(col("dup_gram_frac") >= 0.1)
        // corpus-sized output: no trailing global sort (order is carried
        // by the output columns; the correctness gate compares row-sorted)
    }),

    // ── PII inventory + redaction (emails, phones, IPv4) — pure codegen'd
    // regex rewriting, linear scan, no shuffle. The synthetic corpus has no
    // natural PII, so each doc gets deterministically planted PII (same
    // construction in the oracle) and the redaction is verified exactly.
    "q34_pii_redact" -> ((s, dir) => {
      val planted = t(s, dir, "documents").select(
        col("doc_id"),
        concat(
          col("text"),
          lit(" contact u"), col("doc_id").cast("string"),
          lit("@example.com or +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" host 10."), (col("doc_id") % 256).cast("string"), lit(".0.1")
        ).as("text"))
        // explicit-width spread: the single-row-group scan is one task;
        // without it the per-document kernel work runs serially
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      Text.piiDf(planted, "doc_id", "text")
        // corpus-sized output: no trailing global sort (order is carried
        // by the output columns; the correctness gate compares row-sorted)
    }),

    // ── Per-domain link stats (source-mix / link-spam audit): extract-all →
    // explode → single hash aggregate. URLs planted deterministically: one
    // per-doc bucket domain (50 of them) + one shared mirror domain.
    "q35_domain_stats" -> ((s, dir) => {
      val planted = t(s, dir, "documents").select(
        col("doc_id"),
        concat(
          col("text"),
          lit(" see https://s"), (col("doc_id") % 50).cast("string"),
          lit(".example.org/p/"), col("doc_id").cast("string"),
          lit(" and http://mirror.example.com/x_"),
          (col("doc_id") % 7).cast("string")
        ).as("text"))
      Text.domainStatsDf(planted, "doc_id", "text")
        .orderBy(desc("n_urls"), col("domain"))
    }),

    // ── Paragraph/chunk-level dedup: remove later occurrences of any
    // repeated 8-token unit corpus-wide, reassemble surviving units —
    // catches boilerplate that document-level dedup cannot. Aggregate
    // arg-min (map-side combinable), not a window over unit partitions.
    "q37_paragraph_dedup" -> ((s, dir) => {
      graft.operators.Dedup.paragraphDedupDf(
          t(s, dir, "documents"), "doc_id", "text", chunkTokens = 8)
        .where(col("n_kept") < col("n_total"))
        // corpus-sized output: no trailing global sort (order is carried
        // by the output columns; the correctness gate compares row-sorted)
    }),

    // ── Distinguishing terms per document: tf-idf-style ranking made
    // integer-exact (tf desc, corpus df asc, term) — no floating log, so
    // the oracle is deterministic. Two hash aggs + a term join + top-k.
    "q38_top_terms" -> ((s, dir) => {
      Text.topTermsDf(t(s, dir, "documents"), "doc_id", "text", k = 3)
        // corpus-sized output: no trailing global sort (order is carried
        // by the output columns; the correctness gate compares row-sorted)
    }),

    // ── Embedding preprocessing: L2 norms + symmetric int8 quantization
    // stats (scale, saturated lanes, squared reconstruction error) — the
    // standard audit before shipping vectors to an ANN index or a quantized
    // store. Pure per-row map, no shuffle.
    "q36_embed_quant" -> ((s, dir) => {
      graft.functions.Embeddings.quantStatsDf(
          t(s, dir, "embeddings"), "vec_id", "embedding")
        .where(col("quant_err") > 0)
        // corpus-sized output: no trailing global sort (order is carried
        // by the output columns; the correctness gate compares row-sorted)
    }),

    // ── Deterministic corpus shuffle: seeded global training order without
    // a single-partition global window. Rows order by a seeded md5 key;
    // positions are assigned two-level — a hex-prefix bucket (the numeric
    // prefix of the key, so (bucket, key) order ≡ key order), local ranks
    // per bucket, plus broadcast per-bucket base offsets from a running sum
    // over the ≤65536-row bucket-count frame (model-sized by construction —
    // the only single-partition step touches bucket counts, never rows).
    // At 100 TB this is the standard sort-position assignment: one shuffle
    // by bucket, O(rows) work, O(buckets) driver-side state.
    "q39_corpus_shuffle" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents").select(col("doc_id"),
        md5(concat(lit("shuf:42:"), col("doc_id").cast("string"))).as("shuffle_key"))
      val withB = d.withColumn("b",
        conv(substring(col("shuffle_key"), 1, 4), 16, 10).cast("long"))
      // Bucket bases from ONE bounded collect (round 12 tranche 2): the
      // bucket-count frame is ≤65536 rows BY CONSTRUCTION (the 4-hex-digit
      // key space), i.e. ~1 MB of longs independent of corpus size — the
      // same bounded-model-collect class as the IVF centroid build. The
      // previous two-phase form (256-bucket group window + ≤256-row group
      // collect + an extra broadcast join) kept the collect smaller but
      // cost four more stages and a join; at 100 TB both are driver-trivial
      // and the row work is identical, so the flatter plan wins outright.
      var acc = 0L
      val bases = withB.groupBy("b").agg(count(lit(1)).as("c"))
        .orderBy("b").collect() // ≤65536 rows by construction
        .map { r => val p = (r.getAs[Long]("b"), acc); acc += r.getAs[Long]("c"); p }
        .toSeq.toDF("b", "base")
      withB
        .withColumn("lr", row_number().over(
          Window.partitionBy("b").orderBy(col("shuffle_key"), col("doc_id"))).cast("long"))
        .join(broadcast(bases), "b")
        .select(col("doc_id"), col("shuffle_key"),
          (col("base") + col("lr")).as("position"))
        // corpus-sized output: no trailing global sort (order is carried
        // by the output columns; the correctness gate compares row-sorted)
    }),

    // ── Context-window chunking: overlapping 16-token windows at stride 8
    // per document — the standard pretraining/RAG chunker. Pure map +
    // explode (≈2× row blowup at this window/stride), no shuffle; chunk
    // text is reassembled from the token slice so downstream operators
    // (dedup, quality) can run per-chunk. Deliberately NO global sort:
    // chunk order is carried by (doc_id, chunk_idx) and explode leaves a
    // document's chunks adjacent in their scan partition, so a range-
    // partitioning sort of the 2×-exploded corpus would be the single
    // largest shuffle in the query for zero semantic gain at 100 TB.
    "q40_chunk_windows" -> ((s, dir) => {
      val win = 16; val stride = 8
      t(s, dir, "documents")
        // fused tokenizer (round 13): regex-free; the array itself feeds
        // the slice windows so it stays materialized
        .select(col("doc_id"), Text.tokensFromLowered(lower(col("text"))).as("toks"))
        .where(size(col("toks")) > 0)
        .select(col("doc_id"), col("toks"),
          explode(sequence(lit(0),
            floor((size(col("toks")) - 1) / stride).cast("int"))).as("i"))
        .select(col("doc_id"),
          col("i").cast("long").as("chunk_idx"),
          (col("i") * stride).cast("long").as("start_tok"),
          least(lit(win), size(col("toks")) - col("i") * stride)
            .cast("long").as("n_tokens"),
          concat_ws(" ", slice(col("toks"), col("i") * stride + 1, lit(win)))
            .as("chunk"))
    }),

    // ── Frequency-based boilerplate removal (CCNet-style): drop EVERY copy
    // of any 8-token unit whose corpus-wide count is ≥ 3 and reassemble —
    // the complement of q37's keep-first positional dedup. Explode →
    // map-side-combinable count agg → shuffle join back → per-doc rollup.
    "q41_boilerplate" -> ((s, dir) => {
      graft.operators.Dedup.boilerplateRemoveDf(
          t(s, dir, "documents"), "doc_id", "text", chunkTokens = 8, minFreq = 3L)
        .where(col("n_kept") < col("n_total"))
        // corpus-sized output: no trailing global sort (order is carried
        // by the output columns; the correctness gate compares row-sorted)
    }),

    // ── Weighted source-mixture sampling: keep the LARGEST corpus whose
    // source proportions match target mixture weights (upweight the first
    // five sources 3:1) — the binding source (scarcest relative to its
    // target share) keeps 100%, every other source downsamples to match,
    // via a deterministic md5 gate in exact basis-point integer
    // arithmetic. out_total = min_s ⌊cnt_s·Σw/w_s⌋;
    // rate_bp(s) = out_total·w_s·10000 / (Σw·cnt_s). At 100 TB the rate
    // table is one model-sized (|sources|-row) aggregate broadcast back
    // over the scan — a pure filter, no data-sized shuffle.
    "q42_source_mixture" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val w = when(col("source").isin("src0", "src1", "src2", "src3", "src4"),
        lit(3L)).otherwise(lit(1L))
      // Round 12: rate table via two chained windows over the model-sized
      // source frame instead of the old base×agg crossJoin cascade — the
      // old plan referenced `base` four ways and re-ran the full-corpus
      // source-count scan per reference. One corpus scan builds `base`;
      // sumw/out_total are unpartitioned aggregates over |sources| rows
      // (constant non-foldable partition key, the q44 trick, so the
      // single-partition window warning stays meaningful elsewhere).
      val base = docs.groupBy(col("source")).agg(count(lit(1)).as("cnt"))
        .withColumn("w", w)
      val wspec = Window.partitionBy(substring(col("source"), 0, 0))
      val rates = base
        .withColumn("sumw", sum(col("w")).over(wspec))
        .withColumn("out_total", min(expr("cnt * sumw DIV w")).over(wspec))
        .select(col("source"),
          least(lit(10000L), expr("out_total * w * 10000 DIV (sumw * cnt)"))
            .as("rate_bp"))
      val gate = pmod(
        conv(substring(md5(concat(lit("mix:"),
          col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long"),
        lit(10000L))
      docs.join(broadcast(rates), "source")
        .where(gate < col("rate_bp"))
        .select(col("doc_id"), col("source"), col("rate_bp"))
        // corpus-sized output: no trailing global sort (order is carried
        // by the output columns; the correctness gate compares row-sorted)
    }),

    // ── SimHash near-dup pairs (Manku et al. WWW'07 split scheme): all
    // pairs within Hamming distance 3 of the 60-bit simhash, via 4-band
    // bucketing over DISTINCT signatures — exact (pigeonhole: ≤3 differing
    // bits can touch ≤3 of 4 bands), never the O(n²) scan the oracle runs.
    "q43_simhash_neardup" -> ((s, dir) => {
      Dedup.simhashNearDupDf(t(s, dir, "documents"), "doc_id", "text",
          maxHamming = 3, bands = 4)
        // corpus-sized output: no trailing global sort (order is carried
        // by the output columns; the correctness gate compares row-sorted)
    }),

    // ── Tokenizer vocabulary coverage: top-200 tokens by frequency with
    // integer-exact cumulative corpus coverage in basis points — the
    // vocab-construction / coverage-curve report. Corpus-sized work is one
    // map-side-combinable count aggregate + TakeOrdered(200); the rank and
    // running-sum windows see only the 200 survivors (bounded at any
    // corpus scale), never a data-sized single-partition sort.
    "q44_vocab_coverage" -> ((s, dir) => {
      // NOT eagerly cached (round 12, measured): the top-200 TakeOrdered and
      // the corpus-total aggregate each run the tokenize+explode+count
      // pipeline, but the duplicates overlap on idle cores and the eager
      // cache cost +0.3 s wall at sf0.1. The spread keeps tokenize parallel.
      val docs = t(s, dir, "documents")
      val counts = docs
        .select(col("doc_id"), col("text"))
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        // fused tokenizer (round 13): regex-free
        .select(explode(Text.tokensFromLowered(lower(col("text")))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      // Corpus token total from a separate cheap map pass (round 12
      // tranche 2): Σ_token cnt ≡ Σ_doc |tokens(doc)|, so the scalar no
      // longer re-runs the explode+count pipeline (whose duplicate racing
      // producer was this query's second corpus pass — an eager cache had
      // measured +0.3 s; this removes the second consumer instead).
      // NULL-text rows dropped first: equivalence with the explode form
      // must not depend on session config — with legacy sizeOfNull,
      // size(tokens(NULL)) is -1 and each NULL-text document would
      // silently subtract 1 from the total (the explode form simply emits
      // no rows for NULL). With the filter, size never sees NULL.
      val tot = docs.where(col("text").isNotNull)
        // fused count kernel (round 13): no regex, no array; NULL-safe by
        // the filter regardless of session config
        .select(Text.tokenCountFromLowered(lower(col("text"))).as("__n"))
        .agg(sum(col("__n")).as("__tot"))
      // constant partition column: the 200-survivor frame is model-sized
      // by construction, and a non-empty partition spec keeps WindowExec's
      // single-partition warning out of the bench tail (so the warning
      // stays a real signal for genuinely unbounded windows). The column
      // must be non-foldable (a zero-length substring of the token, not
      // lit(0) or cnt*0, both of which constant-fold away) or the
      // optimizer prunes it from the partition spec and the warning
      // returns.
      val surv = Window.partitionBy(col("__g"))
        .orderBy(col("cnt").desc, col("token"))
      counts.orderBy(col("cnt").desc, col("token")).limit(200)
        .withColumn("__g", substring(col("token"), 0, 0))
        .withColumn("rank", row_number().over(surv).cast("long"))
        .withColumn("__cum", sum(col("cnt")).over(
          surv.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(tot))
        .select(col("rank"), col("token"), col("cnt"),
          expr("__cum * 10000 DIV __tot").as("cum_bp"))
        .orderBy(col("rank"))
    }),

    // ── Semantic dedup (SemDeDup): cluster embeddings to IVF cells, drop
    // any vector with a lower-id same-cell neighbor at cosine ≥ 0.4 —
    // O(Σ cell²) intra-cell pairs, never corpus-wide O(n²). The sampled
    // centroid build is replayed bit-exactly by the oracle.
    "q45_semantic_dedup" -> ((s, dir) => {
      Similarity.semanticDedup(t(s, dir, "embeddings"), "vec_id", "embedding",
          threshold = 0.4, stride = 23)
        // corpus-sized output: no trailing global sort (order is carried
        // by the output columns; the correctness gate compares row-sorted)
    }),

    // ── Six-table star join (TPC-H Q5 shape): local-supplier revenue by
    // region and order year. The fact table joins orders on its shuffle key;
    // nation/region are broadcast (model-sized dims — never shuffled); the
    // customer-nation = supplier-nation predicate rides the supplier join.
    // At 100 TB this is the canonical star shape: one fact-sized shuffle per
    // non-broadcastable edge, dims resolved map-side.
    "q46_star_join" -> ((s, dir) => {
      // Fact-side spread tried and REVERTED (round 12 A/B: ctrl 1.10 /
      // 1.17, spread 1.16 — flat within noise; all five dims broadcast
      // here like q6, but the five broadcast builds dominate this query's
      // wall, so parallelizing the probe side bought nothing).
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val c = t(s, dir, "customer"); val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey")
          && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), year(col("o_orderdate")).cast("long").as("order_year"))
        .agg(
          (sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
            / lit(1e6)).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("order_year"))
    }),

    // ── Source-pair corpus overlap: 3-gram-shingle Jaccard between every
    // source pair, in exact basis points. The corpus-sized work is ONE
    // aggregation pass (round 12 tranche 2): shingle → per-shingle source
    // SET (collect_set dedups map-side, so the shuffle carries distinct
    // (shingle, partial-set) rows — the same volume the old DISTINCT
    // shuffled) → explode each set into its sorted source pairs plus one
    // singleton marker per member → one model-sized count aggregate that
    // yields BOTH the pair-intersection counts and the per-source distinct-
    // shingle sizes. Replaces the old shape (DISTINCT + cached frame +
    // shingle-keyed self-join + two aggregates): 6 corpus-sized exchanges
    // → 3, no corpus-sized cache, no self-join. Per-shingle fan-out stays
    // bounded by |sources| (the set), so nothing is ever quadratic.
    "q47_source_jaccard" -> ((s, dir) => {
      val counts = graft.core.Frames.materialize(t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
        // spread the raw text: the §1 profile showed a 1.0 s SERIAL stage
        // (tokenize+shingle+partial-agg in the single scan task)
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        // fused tokenize+shingle kernel (round 13): one compiled pass per
        // doc, NULL ≡ the old zero-token filter; the per-shingle aggregate
        // only ever sees each (source, shingle) once per doc
        .select(col("source"),
          Dedup.shingleSetFromLowered(lower(col("text")), 3).as("__shs"))
        .where(col("__shs").isNotNull)
        .select(col("source"), explode(col("__shs")).as("sh"))
        .groupBy(col("sh")).agg(collect_set(col("source")).as("__srcs"))
        .select(explode(sourcePairMarks(col("__srcs"))).as("__p"))
        .groupBy(col("__p._1").as("src_a"), col("__p._2").as("src_b"))
        .agg(count(lit(1)).as("n_common")))
      // `counts` is model-sized (≤ |sources|² + |sources| rows) — the eager
      // materialize costs one tiny job and lets sizes + pairs read it
      // without re-running the corpus pass.
      val sizes = counts.where(col("src_b").isNull)
        .select(col("src_a").as("source"), col("n_common").as("sz"))
      counts.where(col("src_b").isNotNull)
        .join(broadcast(sizes.withColumnRenamed("source", "src_a")
          .withColumnRenamed("sz", "sz_a")), "src_a")
        .join(broadcast(sizes.withColumnRenamed("source", "src_b")
          .withColumnRenamed("sz", "sz_b")), "src_b")
        .select(col("src_a"), col("src_b"), col("n_common"),
          expr("n_common * 10000 DIV (sz_a + sz_b - n_common)").as("jaccard_bp"))
        .orderBy(col("src_a"), col("src_b"))
    }),

    // ── Document-frequency table (the IDF build): per-token df over
    // DISTINCT (doc, token) plus integer-exact corpus share. One explode +
    // two map-side-combinable aggregates; the doc-count scalar is broadcast.
    // Floating-point log() is deliberately absent — libm last-ulp behavior
    // differs across engines, so the table carries exact (df, df_bp) and
    // leaves the log to the consumer.
    "q48_idf_table" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      docs.select(col("doc_id"), col("text"))
        // explicit-width spread: the single-row-group scan is one task;
        // without it the per-document kernel work runs serially
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        // fused distinct-token kernel (round 13): tokenize + first-
        // occurrence dedup in one pass, ≡ array_distinct(tokens(text))
        .select(col("doc_id"),
          explode(Text.distinctTokensFromLowered(lower(col("text")))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("df"))
        .where(col("df") >= 5)
        .crossJoin(broadcast(nDocs))
        .select(col("token"), col("df"), col("n_docs"),
          expr("df * 10000 DIV n_docs").as("df_bp"))
        // corpus-sized output: no trailing global sort (order is carried
        // by the output columns; the correctness gate compares row-sorted)
    }),

    // ── Length-weighted sampling: keep probability proportional to doc
    // length (the token-budget-proportional sampler — long docs carry more
    // training tokens per row). Deterministic md5 gate against an integer
    // rate; the corpus max is one broadcast scalar; the pass is a pure
    // filter — no data-sized shuffle at any scale.
    "q49_weighted_sample" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val mx = docs.agg(max(col("n_chars")).as("max_chars"))
      val gate = pmod(
        conv(substring(md5(concat(lit("wsmp:"),
          col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long"),
        lit(10000L))
      docs.crossJoin(broadcast(mx))
        .withColumn("rate_bp", expr("n_chars * 10000 DIV max_chars"))
        .where(gate < col("rate_bp"))
        .select(col("doc_id"), col("n_chars"), col("rate_bp"))
        // corpus-sized output: no trailing global sort (order is carried
        // by the output columns; the correctness gate compares row-sorted)
    }),

    // ── Quality-filter funnel: survivor counts through the staged cleaning
    // cascade (length → token count → stopword density → language-metadata
    // agreement) — the standard corpus-curation report. One scan, five
    // conditional sums, a 5-row stack; integer thresholds only.
    "q50_quality_funnel" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
        // explicit-width spread: the single-row-group scan is one task;
        // without it the per-document kernel work runs serially
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        // fused tokenizer (round 13): regex-free; three consumers share
        // the materialized array
        .select(col("lang"), col("n_chars"),
          Text.tokensFromLowered(lower(col("text"))).as("toks"))
        .select(col("lang"), col("n_chars"),
          size(col("toks")).cast("long").as("n_tok"),
          Text.stopwordCount(col("toks")).as("n_stop"),
          Text.langIdFromTokens(col("toks")).as("lang_pred"))
      val f = d.select(
        (col("n_chars") >= 200).as("s1"),
        col("n_tok").geq(40).as("p2"),
        (col("n_stop") * 20 >= col("n_tok")).as("p3"),
        (col("lang_pred") === col("lang")).as("p4"))
        .select(col("s1"), (col("s1") && col("p2")).as("s2"),
          (col("s1") && col("p2") && col("p3")).as("s3"),
          (col("s1") && col("p2") && col("p3") && col("p4")).as("s4"))
        .agg(count(lit(1)).as("c0"),
          sum(when(col("s1"), 1L).otherwise(0L)).as("c1"),
          sum(when(col("s2"), 1L).otherwise(0L)).as("c2"),
          sum(when(col("s3"), 1L).otherwise(0L)).as("c3"),
          sum(when(col("s4"), 1L).otherwise(0L)).as("c4"))
      f.select(expr(
          "stack(5, 0L, c0, 1L, c1, 2L, c2, 3L, c3, 4L, c4) AS (stage, n_docs)"))
        .orderBy(col("stage"))
    }),

    // ── Power-of-two length histogram per source (the corpus length-
    // distribution report). The bucket is the bit length of n_chars —
    // exact integer arithmetic via bin(), no float log2 whose boundary
    // rounding could differ across engines. One map-side-combinable
    // aggregate; output is O(sources × 64).
    "q51_length_histogram" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("source"),
          length(bin(col("n_chars"))).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("source"), col("bucket"))
    }),

    // ── Exact per-language length percentiles (p50/p90/p99, discrete):
    // value at row ⌈p·n⌉ of the per-language sort — row_number arithmetic
    // written identically on both sides, so no reliance on any engine's
    // quantile interpolation. The sort is partitioned by language; at
    // 100 TB the skew ceiling is the largest single language, the standard
    // bound for exact (non-sketch) percentiles.
    "q52_length_percentiles" -> ((s, dir) => {
      val w = Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
      t(s, dir, "documents")
        .select(col("lang"), col("n_chars"), col("doc_id"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("lang"))))
        .groupBy(col("lang"))
        .agg(
          max(col("n")).as("n_docs"),
          max(when(col("rn") === expr("(n * 50 + 99) DIV 100"), col("n_chars"))).as("p50"),
          max(when(col("rn") === expr("(n * 90 + 99) DIV 100"), col("n_chars"))).as("p90"),
          max(when(col("rn") === expr("(n * 99 + 99) DIV 100"), col("n_chars"))).as("p99"))
        .orderBy(col("lang"))
    }),

    // ── Exact-duplicate rate by source: share of docs whose full text
    // appears more than once corpus-wide, in basis points — the per-source
    // quality signal that decides re-crawl priorities. Two hash aggregates
    // over md5(text) (never the text itself on the wire twice).
    "q53_dup_rate_by_source" -> ((s, dir) => {
      // Deliberately NOT cached (round 12, measured): the two consumers
      // (duplicate-hash aggregate, join probe) each md5-scan the corpus,
      // but the duplicated map stages overlap on idle cores and the eager
      // cache cost wall time (+0.6 s at sf0.1); the md5 pass is light
      // enough that the exchange+cache machinery dominates it.
      val h = t(s, dir, "documents").select(col("source"), md5(col("text")).as("h"))
      val dupHashes = h.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
        .where(col("cnt") > 1).select(col("h"))
      h.join(dupHashes.withColumn("is_dup", lit(1L)), Seq("h"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("is_dup"), lit(0L))).as("n_dup"))
        .select(col("source"), col("n_docs"), col("n_dup"),
          expr("n_dup * 10000 DIV n_docs").as("dup_bp"))
        .orderBy(col("source"))
    }),

    // ── Per-document n-gram novelty: the share of a doc's DISTINCT 5-gram
    // shingles whose FIRST corpus occurrence (min doc_id) is this doc —
    // the "new information" score that decides crawl/retention priority.
    // Shape: explode → per-gram min-doc hash aggregate (map-side
    // combinable) → re-join keyed on the gram → per-doc aggregate. All
    // integer arithmetic; output is basis points.
    "q54_ngram_novelty" -> ((s, dir) => {
      // Round 12 tranche 2: cache the per-doc DISTINCT shingle ARRAY (one
      // row per doc), not the exploded gram table. n_grams is then just
      // size(array) — a pure map — so the old per-doc count aggregate over
      // the full gram table (a second corpus-sized scan + hash agg)
      // disappears; only the novelty side explodes. n_novel(doc) = |{grams
      // whose min doc is doc}| comes from re-grouping the PER-GRAM
      // aggregate — both joined frames are doc-cardinality, so the final
      // join never touches the gram-sized frame again.
      val docsSh = graft.core.Frames.materialize(t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        // explicit-width spread of the raw text (BEFORE tokenize): the
        // single-row-group scan is one task; without it the tokenize and
        // shingle kernels run serially
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        // fused tokenize+shingle kernel (round 13): same distinct 5-gram
        // set per doc as shingleSortedSet(tokens(text), 5) in one compiled
        // pass; NULL ≡ the old zero-token filter
        .select(col("doc_id"),
          Dedup.shingleSetFromLowered(lower(col("text")), 5).as("__shs"))
        .where(col("__shs").isNotNull))
      val perDoc = docsSh.select(col("doc_id"),
        size(col("__shs")).cast("long").as("n_grams"))
      val novel = docsSh
        .select(col("doc_id"), explode(col("__shs")).as("g"))
        .groupBy(col("g")).agg(min(col("doc_id")).as("first_doc"))
        .groupBy(col("first_doc").as("doc_id"))
        .agg(count(lit(1)).as("n_novel"))
      perDoc.join(novel, Seq("doc_id"), "left")
        .withColumn("n_novel", coalesce(col("n_novel"), lit(0L)))
        .select(col("doc_id"), col("n_grams"), col("n_novel"),
          expr("n_novel * 10000 DIV n_grams").as("novelty_bp"))
        // corpus-sized output: no trailing global sort (order is carried
        // by the output columns; the correctness gate compares row-sorted)
    }),

    // ── Quality-ranked canonical selection: within each exact-duplicate
    // cluster (md5 of text) keep the highest-quality copy (longest, then
    // lowest doc_id) and emit the DROP set with its kept replacement — the
    // dedup keep-decision that preserves the best copy's metadata rather
    // than an arbitrary row (q8 keeps min doc_id). One window over the
    // hash partition; skew ceiling is the largest duplicate swarm.
    "q55_canonical_keep" -> ((s, dir) => {
      val w = Window.partitionBy(col("h"))
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      withDupSwarms(t(s, dir, "documents"))
        .select(md5(col("text")).as("h"), col("doc_id"), col("n_chars"),
          col("source"))
        .withColumn("keep_id", first(col("doc_id")).over(w))
        .where(col("doc_id") =!= col("keep_id"))
        .select(col("doc_id").as("drop_id"), col("keep_id"), col("source"))
        // corpus-sized output: no trailing global sort (order is carried
        // by the output columns; the correctness gate compares row-sorted)
    }),

    // ── Composed near-dup pipeline: LSH-banded candidate generation (the
    // q16 bucketing) feeding the exact cosine verifier (the q17 kernel) —
    // the scale path for q17's by-design O(n²) demo. One shuffle buckets
    // the corpus by (band, signature) key; only bucket-sharing pairs are
    // scored, so cost follows bucket occupancy, not n². At 100 TB this is
    // the shape that runs: candidates ∝ near-dup density, verify exact.
    "q56_neardup_verified" -> ((s, dir) => {
      Similarity.nearDupPairsLSH(t(s, dir, "embeddings"), "vec_id", "embedding",
          threshold = 0.45, dim = 64, nBits = 16, bandBits = 4)
        // corpus-sized output: no trailing global sort (order is carried
        // by the output columns; the correctness gate compares row-sorted)
    }),

    // ── Repeated-window detection (exact-substring dedup signal, the Lee
    // et al. "Deduplicating Training Data" shape): slide full 30-token
    // windows at stride 15, hash each, and report every window text that
    // occurs more than once in the corpus. 100 TB shape: explode is
    // linear in token count / stride and carries only (doc_id, 32-char
    // hash); the groupBy shuffles the window table on the hash — uniform
    // by construction, no skew mitigation needed — and the HAVING filter
    // prunes the (vast) singleton tail before the emit.
    "q57_repeated_windows" -> ((s, dir) => {
      val win = 30; val stride = 15
      t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        // spread the raw text BEFORE tokenizing (round 12: spreading the
        // token arrays after a serial tokenize measured as pure overhead;
        // spreading the text moves the regex off the single scan task)
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        // fused tokenizer (round 13): regex-free
        .select(col("doc_id"), Text.tokensFromLowered(lower(col("text"))).as("toks"))
        .where(size(col("toks")) >= win)
        .select(col("doc_id"),
          explode(sequence(lit(0),
            floor((size(col("toks")) - win) / stride).cast("int"))).as("i"),
          col("toks"))
        .select(col("doc_id"),
          md5(concat_ws(" ",
            slice(col("toks"), col("i") * stride + 1, lit(win))))
            .as("window_hash"))
        // Two-level aggregation instead of countDistinct (round 12
        // tranche 2): a mixed distinct/non-distinct aggregate plans an
        // Expand that doubles every shuffled row; grouping by (hash, doc)
        // first then rolling up to the hash computes identical values —
        // n_docs = COUNT(DISTINCT doc_id), n_occ = Σ per-doc counts — with
        // the window table shuffled once at 1×.
        .groupBy(col("window_hash"), col("doc_id"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col("window_hash"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("__c")).as("n_occ"),
          min(col("doc_id")).as("first_doc"))
        .where(col("n_occ") > 1)
        // corpus-sized output: no trailing global sort (order is carried
        // by the output columns; the correctness gate compares row-sorted)
    }),

    // ── Corpus-scaled LSH geometry (round 12): the q56 pipeline with the
    // signature geometry auto-sized from the corpus count (expected
    // bucket occupancy ≤ 2048). At every oracled corpus size (500 / 2000
    // / 20000 embeddings) the knob resolves to the pinned q56 geometry
    // (16, 4), so q56's oracle pins the WIRING exactly; past ~32k rows
    // the geometry grows with log2(n) — the scale behavior EngineBench
    // lshauto prices (decade ratio 1.32x auto vs 3.8x fixed).
    "q58_neardup_auto" -> ((s, dir) => {
      Similarity.nearDupPairsLSHAuto(t(s, dir, "embeddings"), "vec_id",
          "embedding", threshold = 0.45, dim = 64, targetBucketRows = 2048)
        // corpus-sized output: no trailing global sort (order is carried
        // by the output columns; the correctness gate compares row-sorted)
    }),

    // ── Blocked simhash near-dup (round 12): q43 through the Manku
    // WWW'07 block-combination tables with the block count auto-sized
    // from the corpus (Dedup.autoSimhashBlocks). EXACT at every valid
    // block count (pigeonhole recall + Hamming verify), so q43's
    // brute-force oracle pins it at EVERY scale, not only the
    // small-corpus point — the knob trades table count, never recall.
    "q59_simhash_blocked" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.simhashNearDupBlocked(docs, "doc_id", "text", maxHamming = 3,
          blocks = Dedup.autoSimhashBlocks(docs.count()))
        // corpus-sized output: no trailing global sort (order is carried
        // by the output columns; the correctness gate compares row-sorted)
    })
  )

  /** DuckDB-runnable oracle per query (same column names & order-by).
    * q58/q59 reuse q56's/q43's oracles verbatim: q58's auto geometry
    * resolves to q56's pinned (16, 4) at every oracled corpus size, and
    * q59's blocked candidate generation is exact, so the brute-force
    * Hamming oracle holds at any block count. */
  def oracleSql: Map[String, String] = oracleBase ++ Map(
    "q58_neardup_auto" -> oracleBase("q56_neardup_verified"),
    "q59_simhash_blocked" -> oracleBase("q43_simhash_neardup"))

  private def oracleBase: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_base_price,
        |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) / 1e6 AS sum_disc_price,
        |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT)) * (100 + CAST(round(l_tax*100) AS BIGINT))) AS BIGINT) / 1e8 AS sum_charge,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_daily_events" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(round(value*10000) AS BIGINT)) AS BIGINT) / 1e4 AS sum_value,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q3_topn_orders" ->
      """SELECT o_orderpriority, place, o_orderkey, o_custkey, o_totalprice
        |FROM (
        |  SELECT o_orderpriority, o_orderkey, o_custkey, o_totalprice,
        |         CAST(row_number() OVER (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS place
        |  FROM orders)
        |WHERE place <= 3
        |ORDER BY o_orderpriority, place""".stripMargin,

    "q4_interval_join" ->
      """SELECT o_orderkey,
        |  COUNT(l_partkey) AS n_shipped_30d,
        |  CAST(COALESCE(SUM(CAST(l_quantity AS BIGINT)), 0) AS BIGINT) AS qty_shipped_30d
        |FROM orders LEFT JOIN lineitem
        |  ON l_orderkey = o_orderkey
        | AND l_shipdate >= o_orderdate
        | AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
        |GROUP BY o_orderkey""".stripMargin,

    "q6_revenue_by_nation" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) / 1e6 AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q7_latest_by_key" ->
      """SELECT user_id, event_id, event_type
        |FROM (
        |  SELECT user_id, event_id, event_type,
        |         row_number() OVER (PARTITION BY user_id
        |             ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1
        |ORDER BY user_id""".stripMargin,

    "q8_dedup_exact" ->
      (dupSwarmCte + "\n" +
        """SELECT md5(text) AS content_hash,
          |  MIN(doc_id) AS keep_id,
          |  COUNT(*) AS n_copies
          |FROM corpus
          |GROUP BY 1""".stripMargin),

    "q5_asof_join" ->
      """SELECT p.event_id,
        |  p.user_id,
        |  CAST(round(p.value*10000) AS BIGINT) / 1e4 AS value,
        |  b.event_id AS last_view_event_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') b
        |  ON p.user_id = b.user_id AND p.ts >= b.ts""".stripMargin,

    "q9_ngram_neardup" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> x <> '') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, CASE WHEN len(toks) >= 3
        |    THEN list_distinct([list_aggregate(toks[i:i+2], 'string_agg', ' ')
        |                        for i in generate_series(1, len(toks)-2)])
        |    ELSE [list_aggregate(toks, 'string_agg', ' ')] END AS sh
        |  FROM d)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
        |FROM s a JOIN s b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8""".stripMargin,

    "q10_ann_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT * FROM e WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_inner_product(q.v, c.v)
        |      / (sqrt(list_inner_product(q.v, q.v)) * sqrt(list_inner_product(c.v, c.v))) AS cosine
        |  FROM q JOIN e c ON q.vec_id <> c.vec_id)
        |SELECT query_id, rank, neighbor_id, cosine FROM (
        |  SELECT query_id, neighbor_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |        ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM scored)
        |WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "q11_langid" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> x <> '') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    len(list_filter(toks, t -> t IN ('the','and','of','to','in','is'))) AS s_en,
        |    len(list_filter(toks, t -> t IN ('el','los','de','que','y','las'))) AS s_es,
        |    len(list_filter(toks, t -> t IN ('le','les','et','des','une','est'))) AS s_fr,
        |    len(list_filter(toks, t -> t IN ('der','die','und','das','ein','mit'))) AS s_de,
        |    len(list_filter(toks, t -> t IN ('的','是','了','在','有','我'))) AS s_zh
        |  FROM d)
        |SELECT doc_id,
        |  CASE WHEN s_zh > greatest(s_en, s_es, s_fr, s_de) THEN 'zh'
        |       WHEN s_de > greatest(s_en, s_es, s_fr) THEN 'de'
        |       WHEN s_fr > greatest(s_en, s_es) THEN 'fr'
        |       WHEN s_es > s_en THEN 'es'
        |       ELSE 'en' END AS lang_pred
        |FROM s""".stripMargin,

    "q12_quality" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> x <> '') AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_tokens,
        |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS BIGINT) AS n_punct,
        |    CAST(len(list_filter(toks, t -> t IN ('the','a','an','and','or','of','to','in','is','it','that','for','on','as','with','at','by','from'))) AS BIGINT) AS n_stopwords,
        |    CAST(length(text) AS BIGINT) AS n_chars
        |  FROM d)
        |SELECT doc_id, n_tokens, n_punct, n_stopwords,
        |  least(1.0, CAST(n_tokens AS DOUBLE) / 200.0) * 0.5
        |    + coalesce(n_stopwords / nullif(n_tokens, 0), 0.0) * 0.25
        |    + (1.0 - least(1.0, coalesce(n_punct / nullif(n_chars, 0), 0.0) * 5.0)) * 0.25
        |    AS quality_score
        |FROM c""".stripMargin,

    "q13_token_stats" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS n_ws_tokens,
        |  CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> x <> '')) AS BIGINT) AS n_word_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens
        |FROM documents""".stripMargin,

    "q14_fingerprint" ->
      """SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> x <> ''))), ' ')) AS fingerprint
        |FROM documents""".stripMargin,

    "q24_json_extract" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  COUNT(props->>'$.missing') AS n_missing
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q25_window_functions" ->
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(round(value*10000) AS BIGINT)) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) / 1e4 AS running_value,
        |  lag(event_id, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_event_id,
        |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS event_seq
        |FROM events""".stripMargin,

    "q26_semi_anti" ->
      """WITH active AS (
        |  SELECT c_nationkey, COUNT(*) AS n_active FROM customer
        |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |  GROUP BY c_nationkey),
        |inactive AS (
        |  SELECT c_nationkey, COUNT(*) AS n_inactive FROM customer
        |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |  GROUP BY c_nationkey)
        |SELECT CAST(COALESCE(a.c_nationkey, i.c_nationkey) AS BIGINT) AS nationkey,
        |  COALESCE(a.n_active, 0) AS n_active,
        |  COALESCE(i.n_inactive, 0) AS n_inactive
        |FROM active a FULL OUTER JOIN inactive i ON a.c_nationkey = i.c_nationkey
        |ORDER BY nationkey""".stripMargin,

    "q21_rollup_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) / 1e6 AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q22_set_ops" ->
      """WITH s AS (SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier),
        |c AS (SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer)
        |SELECT nationkey, 'both' AS membership FROM (SELECT nationkey FROM s INTERSECT SELECT nationkey FROM c)
        |UNION ALL
        |SELECT nationkey, 'customer_only' AS membership FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
        |ORDER BY membership, nationkey""".stripMargin,

    "q23_price_stats" ->
      """SELECT o_orderpriority,
        |  CAST(MIN(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) / 100.0 AS min_price,
        |  CAST(MAX(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) / 100.0 AS max_price,
        |  quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.5) / 100.0 AS median_price
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q19_sliding_window" ->
      """SELECT CAST(date_trunc('day', ts) - k * INTERVAL 1 DAY AS TIMESTAMP) AS window_start,
        |  event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(round(value*10000) AS BIGINT)) AS BIGINT) / 1e4 AS sum_value
        |FROM events, unnest(generate_series(0, 6)) AS t(k)
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q20_session_window" ->
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              >= INTERVAL 30 MINUTE
        |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |sessions AS (
        |  SELECT user_id, ts,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |        ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM marked)
        |SELECT user_id,
        |  CAST(MIN(ts) AS TIMESTAMP) AS session_start,
        |  COUNT(*) AS n_events
        |FROM sessions
        |GROUP BY user_id, session_id""".stripMargin,

    "q17_embedding_neardup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  list_inner_product(a.v, b.v)
        |    / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))) AS cosine
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_inner_product(a.v, b.v)
        |    / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))) >= 0.45""".stripMargin,

    "q15_simhash" -> {
      // 60 per-bit conditional sums over the md5-derived shingle hashes —
      // the exact computation simhashDf runs, expressed in DuckDB.
      val bitSums = (0 until graft.operators.Dedup.SimhashBits)
        .map(b => s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS b$b")
        .mkString(", ")
      val assemble = (0 until graft.operators.Dedup.SimhashBits)
        .map(b => s"(CASE WHEN b$b > 0 THEN ${1L << b} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH d AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> x <> '') AS toks
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, CASE WHEN len(toks) >= 3
         |    THEN list_distinct([list_aggregate(toks[i:i+2], 'string_agg', ' ')
         |                        for i in generate_series(1, len(toks)-2)])
         |    ELSE [list_aggregate(toks, 'string_agg', ' ')] END AS sh
         |  FROM d WHERE len(toks) > 0),
         |h AS (
         |  SELECT doc_id,
         |    CAST(concat('0x', substr(md5(unnest(sh)), 1, 15)) AS BIGINT) AS h
         |  FROM s),
         |b AS (SELECT doc_id, $bitSums FROM h GROUP BY doc_id)
         |SELECT doc_id, CAST($assemble AS BIGINT) AS simhash
         |FROM b""".stripMargin
    },

    "q16_lsh_topk" -> {
      // Recompute the RHP signatures exactly as Similarity.rhpSignature:
      // sign(b,j) = parity of the first md5 hex digit of "rhp:b:j";
      // projection folds the DOUBLE products in index order (list_sum is a
      // sequential fold — bitwise-identical to the Spark UDF's loop).
      val nBits = 16
      val bandBits = 4
      val dim = 64
      def signCase(b: Int) =
        s"(CASE WHEN CAST(concat('0x', substr(md5(concat('rhp:$b:', j-1)), 1, 1)) " +
          s"AS BIGINT) % 2 = 0 THEN 1.0 ELSE -1.0 END)"
      val projs = (0 until nBits).map(b =>
        s"list_sum([v[j] * ${signCase(b)} for j in generate_series(1, $dim)]) AS p$b")
        .mkString(",\n        ")
      val sigExpr = (0 until nBits)
        .map(b => s"(CASE WHEN p$b > 0 THEN ${1L << b} ELSE 0 END)")
        .mkString(" + ")
      val bandExprs = (0 until nBits / bandBits)
        .map(t => s"((sig >> ${t * bandBits}) & ${(1L << bandBits) - 1}) + ${t.toLong << 32}")
        .mkString(", ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |p AS (SELECT vec_id, v,
         |        $projs
         |      FROM e),
         |sg AS (SELECT vec_id, v, CAST($sigExpr AS BIGINT) AS sig FROM p),
         |bd AS (SELECT vec_id, v, unnest([$bandExprs]) AS bucket FROM sg),
         |cand AS (
         |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |         q.v AS qv, c.v AS cv
         |  FROM bd q JOIN bd c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 10),
         |scored AS (
         |  SELECT query_id, neighbor_id,
         |    list_inner_product(qv, cv)
         |      / (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))) AS cosine
         |  FROM cand)
         |SELECT query_id, rank, neighbor_id, cosine FROM (
         |  SELECT query_id, neighbor_id, cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |        ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM scored)
         |WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin
    },

    "q18_ivf_topk" ->
      // Mirrors ivfBuildSampled(stride=29) + ivfProbe(nProbe=4, k=5):
      // cell = argmax cosine(v, centroid) with ties to the smallest cell id,
      // probe the 4 most-similar cells, exact re-rank on the candidates.
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |ctr AS (SELECT vec_id AS cell_id, v AS cv FROM e WHERE vec_id % 29 = 0),
        |asg AS (
        |  SELECT vec_id, v, cell_id FROM (
        |    SELECT e.vec_id, e.v, ctr.cell_id,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_inner_product(e.v, ctr.cv)
        |          / (sqrt(list_inner_product(e.v, e.v)) * sqrt(list_inner_product(ctr.cv, ctr.cv))) DESC,
        |        ctr.cell_id) AS rn
        |    FROM e CROSS JOIN ctr)
        |  WHERE rn = 1),
        |pq AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
        |pcells AS (
        |  SELECT query_id, qv, cell_id FROM (
        |    SELECT pq.query_id, pq.qv, ctr.cell_id,
        |      row_number() OVER (PARTITION BY pq.query_id ORDER BY
        |        list_inner_product(pq.qv, ctr.cv)
        |          / (sqrt(list_inner_product(pq.qv, pq.qv)) * sqrt(list_inner_product(ctr.cv, ctr.cv))) DESC,
        |        ctr.cell_id) AS rn
        |    FROM pq CROSS JOIN ctr)
        |  WHERE rn <= 4),
        |scored AS (
        |  SELECT p.query_id, a.vec_id AS neighbor_id,
        |    list_inner_product(p.qv, a.v)
        |      / (sqrt(list_inner_product(p.qv, p.qv)) * sqrt(list_inner_product(a.v, a.v))) AS cosine
        |  FROM pcells p JOIN asg a ON p.cell_id = a.cell_id AND a.vec_id <> p.query_id)
        |SELECT query_id, rank, neighbor_id, cosine FROM (
        |  SELECT query_id, neighbor_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |        ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM scored)
        |WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    // Connected components as a recursive CTE: comps propagate along edges
    // (both directions), min over every reachable id = the cluster
    // representative the Spark operator converges to.
    "q27_dup_clusters" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> x <> '') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, CASE WHEN len(toks) >= 3
        |    THEN list_distinct([list_aggregate(toks[i:i+2], 'string_agg', ' ')
        |                        for i in generate_series(1, len(toks)-2)])
        |    ELSE [list_aggregate(toks, 'string_agg', ' ')] END AS sh
        |  FROM d),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
        |e AS (SELECT id_a AS a, id_b AS b FROM p
        |      UNION ALL SELECT id_b, id_a FROM p),
        |reach(id, comp) AS (
        |  SELECT a, a FROM e
        |  UNION
        |  SELECT e.a, r.comp FROM e JOIN reach r ON e.b = r.id),
        |cc AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id)
        |SELECT documents.doc_id,
        |  CAST(coalesce(cc.comp, documents.doc_id) AS BIGINT) AS cluster_id
        |FROM documents LEFT JOIN cc ON documents.doc_id = cc.id""".stripMargin,

    "q28_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE CAST(concat('0x', substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100
        |      < CASE WHEN lang = 'en' THEN 20 ELSE 60 END""".stripMargin,

    "q29_ngram_freq" ->
      """WITH d AS (
        |  SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> x <> '') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT unnest(CASE WHEN len(toks) >= 3
        |    THEN [list_aggregate(toks[i:i+2], 'string_agg', ' ')
        |          for i in generate_series(1, len(toks)-2)]
        |    ELSE [coalesce(list_aggregate(toks, 'string_agg', ' '), '')] END) AS ngram
        |  FROM d)
        |SELECT ngram, CAST(count(*) AS BIGINT) AS n FROM g
        |GROUP BY ngram
        |ORDER BY n DESC, ngram LIMIT 50""".stripMargin,

    "q30_token_batches" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> x <> '')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT doc_id, n_tokens,
        |  CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 8192
        |    AS BIGINT) AS batch_id
        |FROM tok""".stripMargin,

    // The cleaning pipeline is the composition of the q14 fingerprint, q9
    // near-dup pairs, q27 connected components, q11 langid, and q12
    // quality formulations, staged identically.
    "q31_clean_corpus" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> x <> '') AS toks
        |  FROM documents),
        |fp AS (
        |  SELECT doc_id, text, toks,
        |    md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS f
        |  FROM d),
        |keep AS (SELECT f, min(doc_id) AS doc_id FROM fp GROUP BY f),
        |ex AS (SELECT fp.* FROM fp JOIN keep USING (f, doc_id)),
        |s AS (
        |  SELECT doc_id, CASE WHEN len(toks) >= 3
        |    THEN list_distinct([list_aggregate(toks[i:i+2], 'string_agg', ' ')
        |                        for i in generate_series(1, len(toks)-2)])
        |    ELSE [list_aggregate(toks, 'string_agg', ' ')] END AS sh
        |  FROM ex),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
        |e AS (SELECT id_a AS a, id_b AS b FROM p
        |      UNION ALL SELECT id_b, id_a FROM p),
        |reach(id, comp) AS (
        |  SELECT a, a FROM e
        |  UNION
        |  SELECT e.a, r.comp FROM e JOIN reach r ON e.b = r.id),
        |cc AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id),
        |reps AS (
        |  SELECT ex.doc_id FROM ex LEFT JOIN cc ON ex.doc_id = cc.id
        |  WHERE coalesce(cc.comp, ex.doc_id) = ex.doc_id),
        |scored AS (
        |  SELECT ex.doc_id,
        |    len(list_filter(toks, t -> t IN ('the','and','of','to','in','is'))) AS s_en,
        |    len(list_filter(toks, t -> t IN ('el','los','de','que','y','las'))) AS s_es,
        |    len(list_filter(toks, t -> t IN ('le','les','et','des','une','est'))) AS s_fr,
        |    len(list_filter(toks, t -> t IN ('der','die','und','das','ein','mit'))) AS s_de,
        |    len(list_filter(toks, t -> t IN ('的','是','了','在','有','我'))) AS s_zh,
        |    CAST(len(toks) AS BIGINT) AS n_tokens,
        |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS BIGINT) AS n_punct,
        |    CAST(len(list_filter(toks, t -> t IN ('the','a','an','and','or','of','to','in','is','it','that','for','on','as','with','at','by','from'))) AS BIGINT) AS n_stopwords,
        |    CAST(length(text) AS BIGINT) AS n_chars
        |  FROM ex JOIN reps ON ex.doc_id = reps.doc_id),
        |out AS (
        |  SELECT doc_id,
        |    CASE WHEN s_zh > greatest(s_en, s_es, s_fr, s_de) THEN 'zh'
        |         WHEN s_de > greatest(s_en, s_es, s_fr) THEN 'de'
        |         WHEN s_fr > greatest(s_en, s_es) THEN 'fr'
        |         WHEN s_es > s_en THEN 'es'
        |         ELSE 'en' END AS lang_pred,
        |    least(1.0, CAST(n_tokens AS DOUBLE) / 200.0) * 0.5
        |      + coalesce(n_stopwords / nullif(n_tokens, 0), 0.0) * 0.25
        |      + (1.0 - least(1.0, coalesce(n_punct / nullif(n_chars, 0), 0.0) * 5.0)) * 0.25
        |      AS quality_score
        |  FROM scored)
        |SELECT doc_id, lang_pred, quality_score FROM out
        |WHERE quality_score >= 0.4""".stripMargin,

    "q32_decontaminate" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> x <> '') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, CASE WHEN len(toks) >= 4
        |    THEN list_distinct([list_aggregate(toks[i:i+3], 'string_agg', ' ')
        |                        for i in generate_series(1, len(toks)-3)])
        |    ELSE [list_aggregate(toks, 'string_agg', ' ')] END AS sh
        |  FROM d),
        |ev AS (SELECT DISTINCT unnest(sh) AS g FROM s WHERE doc_id % 20 = 0),
        |co AS (SELECT doc_id, unnest(sh) AS g FROM s WHERE doc_id % 20 <> 0)
        |SELECT co.doc_id, count(*) AS n_overlap
        |FROM co JOIN ev USING (g)
        |GROUP BY co.doc_id""".stripMargin,

    "q33_repetition" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> x <> '') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, CASE WHEN len(toks) >= 2
        |    THEN [list_aggregate(toks[i:i+1], 'string_agg', ' ')
        |          for i in generate_series(1, len(toks)-1)]
        |    ELSE [list_aggregate(toks, 'string_agg', ' ')] END AS sh
        |  FROM d),
        |c AS (
        |  SELECT doc_id, unnest(sh) AS gram FROM s),
        |cnt AS (
        |  SELECT doc_id, gram, count(*) AS n FROM c GROUP BY 1, 2),
        |m AS (
        |  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_grams,
        |    CAST(sum(n) - count(*) AS DOUBLE) / sum(n) AS dup_gram_frac,
        |    CAST(max(n) AS DOUBLE) / sum(n) AS top_gram_frac
        |  FROM cnt GROUP BY doc_id)
        |SELECT doc_id, n_grams, dup_gram_frac, top_gram_frac FROM m
        |WHERE dup_gram_frac >= 0.1""".stripMargin,

    "q34_pii_redact" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    text || ' contact u' || CAST(doc_id AS VARCHAR) ||
        |      '@example.com or +1-555-' ||
        |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
        |      ' host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1' AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '\+\d{1,3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+\d{1,3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS redacted
        |FROM p""".stripMargin,

    "q35_domain_stats" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    text || ' see https://s' || CAST(doc_id % 50 AS VARCHAR) ||
        |      '.example.org/p/' || CAST(doc_id AS VARCHAR) ||
        |      ' and http://mirror.example.com/x_' ||
        |      CAST(doc_id % 7 AS VARCHAR) AS text
        |  FROM documents),
        |u AS (
        |  SELECT doc_id,
        |    unnest(regexp_extract_all(text, 'https?://[A-Za-z0-9.-]+[A-Za-z0-9./_-]*')) AS url
        |  FROM p)
        |SELECT regexp_extract(url, 'https?://([A-Za-z0-9.-]+)', 1) AS domain,
        |  COUNT(*) AS n_urls,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM u GROUP BY domain
        |ORDER BY n_urls DESC, domain""".stripMargin,

    "q38_top_terms" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> x <> '') AS toks
        |  FROM documents),
        |t AS (SELECT doc_id, unnest(toks) AS term FROM d),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |       FROM t GROUP BY doc_id, term),
        |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
        |       FROM tf GROUP BY term),
        |r AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    CAST(row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS BIGINT) AS term_rank
        |  FROM tf JOIN df USING (term))
        |SELECT doc_id, term, tf, df, term_rank FROM r
        |WHERE term_rank <= 3""".stripMargin,

    "q37_paragraph_dedup" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> x <> '') AS toks
        |  FROM documents),
        |u AS (
        |  SELECT doc_id, toks,
        |    unnest(generate_series(0, CAST((len(toks)-1)//8 AS BIGINT))) AS i
        |  FROM d WHERE len(toks) > 0),
        |c AS (
        |  SELECT doc_id, i AS idx,
        |    list_aggregate(toks[(i*8+1):(i*8+8)], 'string_agg', ' ') AS chunk
        |  FROM u),
        |r AS (
        |  SELECT doc_id, idx, chunk,
        |    row_number() OVER (PARTITION BY chunk ORDER BY doc_id, idx) AS rn
        |  FROM c),
        |o AS (
        |  SELECT doc_id,
        |    CAST(count(*) AS BIGINT) AS n_total,
        |    CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
        |    coalesce(string_agg(chunk, ' ' ORDER BY idx)
        |      FILTER (WHERE rn = 1), '') AS cleaned_text
        |  FROM r GROUP BY doc_id)
        |SELECT * FROM o WHERE n_kept < n_total""".stripMargin,

    "q36_embed_quant" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |m AS (
        |  SELECT vec_id, v,
        |    list_max(list_transform(v, x -> abs(x))) AS maxabs
        |  FROM e),
        |s AS (
        |  SELECT vec_id, v, maxabs,
        |    CASE WHEN maxabs = 0 THEN 0 ELSE 127.0 / maxabs END AS scale
        |  FROM m),
        |o AS (
        |  SELECT vec_id,
        |    CAST(len(v) AS BIGINT) AS dim,
        |    sqrt(list_inner_product(v, v)) AS l2_norm,
        |    scale,
        |    CAST(len(list_filter(v, x ->
        |      abs(floor(x * scale + 0.5)) = 127)) AS BIGINT) AS n_saturated,
        |    CASE WHEN maxabs = 0 THEN 0 ELSE
        |      list_inner_product(
        |        list_transform(v, x -> x - floor(x * scale + 0.5) / scale),
        |        list_transform(v, x -> x - floor(x * scale + 0.5) / scale))
        |    END AS quant_err
        |  FROM s)
        |SELECT * FROM o WHERE quant_err > 0""".stripMargin,

    "q39_corpus_shuffle" ->
      """SELECT doc_id,
        |  md5('shuf:42:' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
        |  CAST(row_number() OVER (
        |    ORDER BY md5('shuf:42:' || CAST(doc_id AS VARCHAR)), doc_id)
        |    AS BIGINT) AS position
        |FROM documents""".stripMargin,

    "q40_chunk_windows" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> x <> '') AS toks
        |  FROM documents),
        |u AS (
        |  SELECT doc_id, toks,
        |    unnest(generate_series(0, CAST((len(toks)-1)//8 AS BIGINT))) AS i
        |  FROM d WHERE len(toks) > 0)
        |SELECT doc_id,
        |  CAST(i AS BIGINT) AS chunk_idx,
        |  CAST(i*8 AS BIGINT) AS start_tok,
        |  CAST(least(16, len(toks) - i*8) AS BIGINT) AS n_tokens,
        |  list_aggregate(toks[(i*8+1):(i*8+16)], 'string_agg', ' ') AS chunk
        |FROM u""".stripMargin,

    "q41_boilerplate" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> x <> '') AS toks
        |  FROM documents),
        |u AS (
        |  SELECT doc_id, toks,
        |    unnest(generate_series(0, CAST((len(toks)-1)//8 AS BIGINT))) AS i
        |  FROM d WHERE len(toks) > 0),
        |c AS (
        |  SELECT doc_id, i AS idx,
        |    list_aggregate(toks[(i*8+1):(i*8+8)], 'string_agg', ' ') AS chunk
        |  FROM u),
        |f AS (
        |  SELECT chunk, count(*) AS freq FROM c GROUP BY chunk),
        |o AS (
        |  SELECT doc_id,
        |    CAST(count(*) AS BIGINT) AS n_total,
        |    CAST(count(*) FILTER (WHERE freq < 3) AS BIGINT) AS n_kept,
        |    coalesce(string_agg(chunk, ' ' ORDER BY idx)
        |      FILTER (WHERE freq < 3), '') AS cleaned_text
        |  FROM c JOIN f USING (chunk) GROUP BY doc_id)
        |SELECT * FROM o WHERE n_kept < n_total""".stripMargin,

    "q42_source_mixture" ->
      """WITH base AS (
        |  SELECT source, count(*) AS cnt,
        |    CASE WHEN source IN ('src0','src1','src2','src3','src4')
        |      THEN 3 ELSE 1 END AS w
        |  FROM documents GROUP BY source),
        |counts AS (
        |  SELECT * FROM base, (SELECT sum(w) AS sumw FROM base)),
        |o AS (
        |  SELECT min((cnt * sumw) // w) AS out_total FROM counts),
        |r AS (
        |  SELECT source,
        |    least(10000, (out_total * w * 10000) // (sumw * cnt)) AS rate_bp
        |  FROM counts, o)
        |SELECT doc_id, source, CAST(rate_bp AS BIGINT) AS rate_bp
        |FROM documents JOIN r USING (source)
        |WHERE CAST(concat('0x', substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 < rate_bp""".stripMargin,

    "q43_simhash_neardup" -> {
      // The q15 simhash replay, then the brute-force O(n²) Hamming scan the
      // banded Spark operator must match exactly.
      val bitSums = (0 until graft.operators.Dedup.SimhashBits)
        .map(b => s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS b$b")
        .mkString(", ")
      val assemble = (0 until graft.operators.Dedup.SimhashBits)
        .map(b => s"(CASE WHEN b$b > 0 THEN ${1L << b} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH d AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> x <> '') AS toks
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, CASE WHEN len(toks) >= 3
         |    THEN list_distinct([list_aggregate(toks[i:i+2], 'string_agg', ' ')
         |                        for i in generate_series(1, len(toks)-2)])
         |    ELSE [list_aggregate(toks, 'string_agg', ' ')] END AS sh
         |  FROM d WHERE len(toks) > 0),
         |h AS (
         |  SELECT doc_id,
         |    CAST(concat('0x', substr(md5(unnest(sh)), 1, 15)) AS BIGINT) AS h
         |  FROM s),
         |b AS (SELECT doc_id, $bitSums FROM h GROUP BY doc_id),
         |sig AS (SELECT doc_id, CAST($assemble AS BIGINT) AS simhash FROM b)
         |SELECT a.doc_id AS id_a, c.doc_id AS id_b,
         |  CAST(bit_count(xor(a.simhash, c.simhash)) AS BIGINT) AS hamming
         |FROM sig a JOIN sig c ON a.doc_id < c.doc_id
         |WHERE bit_count(xor(a.simhash, c.simhash)) <= 3""".stripMargin
    },

    "q44_vocab_coverage" ->
      """WITH tk AS (
        |  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> x <> '')) AS token
        |  FROM documents),
        |c AS (SELECT token, COUNT(*) AS cnt FROM tk GROUP BY token),
        |tot AS (SELECT SUM(cnt) AS t FROM c),
        |top AS (
        |  SELECT token, cnt,
        |    CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS rank
        |  FROM c ORDER BY cnt DESC, token LIMIT 200)
        |SELECT rank, token, cnt,
        |  CAST((SUM(cnt) OVER (ORDER BY rank) * 10000) // (SELECT t FROM tot) AS BIGINT) AS cum_bp
        |FROM top ORDER BY rank""".stripMargin,

    "q45_semantic_dedup" ->
      // Mirrors ivfBuildSampled(stride=23) + the intra-cell SemDeDup scan:
      // same assignment tie-break and division shape as the q18 oracle.
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |ctr AS (SELECT vec_id AS cell_id, v AS cv FROM e WHERE vec_id % 23 = 0),
        |asg AS (
        |  SELECT vec_id, v, cell_id FROM (
        |    SELECT e.vec_id, e.v, ctr.cell_id,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_inner_product(e.v, ctr.cv)
        |          / (sqrt(list_inner_product(e.v, e.v)) * sqrt(list_inner_product(ctr.cv, ctr.cv))) DESC,
        |        ctr.cell_id) AS rn
        |    FROM e CROSS JOIN ctr)
        |  WHERE rn = 1),
        |drp AS (
        |  SELECT DISTINCT b.vec_id FROM asg a JOIN asg b
        |    ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
        |  WHERE list_inner_product(a.v, b.v)
        |      / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))) >= 0.4)
        |SELECT asg.vec_id, asg.cell_id, (d.vec_id IS NULL) AS kept
        |FROM asg LEFT JOIN drp d ON asg.vec_id = d.vec_id""".stripMargin,

    "q46_star_join" ->
      """SELECT r_name, CAST(year(o_orderdate) AS BIGINT) AS order_year,
        |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) / 1e6 AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q47_source_jaccard" ->
      """WITH d AS (
        |  SELECT source,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> x <> '') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT source, CASE WHEN len(toks) >= 3
        |    THEN list_distinct([list_aggregate(toks[i:i+2], 'string_agg', ' ')
        |                        for i in generate_series(1, len(toks)-2)])
        |    ELSE [list_aggregate(toks, 'string_agg', ' ')] END AS sh
        |  FROM d WHERE len(toks) > 0),
        |u AS (SELECT DISTINCT source, unnest(sh) AS sh FROM s),
        |z AS (SELECT source, COUNT(*) AS sz FROM u GROUP BY source),
        |i AS (
        |  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_common
        |  FROM u a JOIN u b ON a.sh = b.sh AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, n_common,
        |  CAST(n_common * 10000 // (za.sz + zb.sz - n_common) AS BIGINT) AS jaccard_bp
        |FROM i JOIN z za ON src_a = za.source JOIN z zb ON src_b = zb.source
        |ORDER BY 1, 2""".stripMargin,

    "q48_idf_table" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_distinct(list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> x <> '')) AS toks
        |  FROM documents),
        |e AS (SELECT unnest(toks) AS token FROM d),
        |c AS (SELECT token, COUNT(*) AS df FROM e GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents)
        |SELECT token, df, n_docs, CAST(df * 10000 // n_docs AS BIGINT) AS df_bp
        |FROM c CROSS JOIN n
        |WHERE df >= 5""".stripMargin,

    "q49_weighted_sample" ->
      """WITH m AS (SELECT MAX(n_chars) AS max_chars FROM documents)
        |SELECT doc_id, n_chars, CAST(n_chars * 10000 // max_chars AS BIGINT) AS rate_bp
        |FROM documents CROSS JOIN m
        |WHERE CAST(concat('0x', substr(md5('wsmp:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000
        |      < n_chars * 10000 // max_chars""".stripMargin,

    "q50_quality_funnel" ->
      """WITH d AS (
        |  SELECT lang, n_chars,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> x <> '') AS toks
        |  FROM documents),
        |sc AS (
        |  SELECT lang, n_chars, len(toks) AS n_tok,
        |    len(list_filter(toks, t -> t IN ('the','a','an','and','or','of','to','in','is','it','that','for','on','as','with','at','by','from'))) AS n_stop,
        |    len(list_filter(toks, t -> t IN ('the','and','of','to','in','is'))) AS s_en,
        |    len(list_filter(toks, t -> t IN ('el','los','de','que','y','las'))) AS s_es,
        |    len(list_filter(toks, t -> t IN ('le','les','et','des','une','est'))) AS s_fr,
        |    len(list_filter(toks, t -> t IN ('der','die','und','das','ein','mit'))) AS s_de,
        |    len(list_filter(toks, t -> t IN ('的','是','了','在','有','我'))) AS s_zh
        |  FROM d),
        |f AS (
        |  SELECT lang, n_chars, n_tok, n_stop,
        |    CASE WHEN s_zh > greatest(s_en, s_es, s_fr, s_de) THEN 'zh'
        |         WHEN s_de > greatest(s_en, s_es, s_fr) THEN 'de'
        |         WHEN s_fr > greatest(s_en, s_es) THEN 'fr'
        |         WHEN s_es > s_en THEN 'es'
        |         ELSE 'en' END AS lang_pred
        |  FROM sc),
        |g AS (
        |  SELECT (n_chars >= 200) AS s1,
        |    (n_chars >= 200 AND n_tok >= 40) AS s2,
        |    (n_chars >= 200 AND n_tok >= 40 AND n_stop * 20 >= n_tok) AS s3,
        |    (n_chars >= 200 AND n_tok >= 40 AND n_stop * 20 >= n_tok AND lang_pred = lang) AS s4
        |  FROM f),
        |a AS (
        |  SELECT COUNT(*) AS c0,
        |    SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS c2,
        |    SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS c3,
        |    SUM(CASE WHEN s4 THEN 1 ELSE 0 END) AS c4
        |  FROM g)
        |SELECT CAST(0 AS BIGINT) AS stage, CAST(c0 AS BIGINT) AS n_docs FROM a
        |UNION ALL SELECT 1, CAST(c1 AS BIGINT) FROM a
        |UNION ALL SELECT 2, CAST(c2 AS BIGINT) FROM a
        |UNION ALL SELECT 3, CAST(c3 AS BIGINT) FROM a
        |UNION ALL SELECT 4, CAST(c4 AS BIGINT) FROM a
        |ORDER BY stage""".stripMargin,

    "q51_length_histogram" ->
      """SELECT source, CAST(length(bin(n_chars)) AS BIGINT) AS bucket,
        |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q52_length_percentiles" ->
      """WITH r AS (
        |  SELECT lang, n_chars,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS n
        |  FROM documents)
        |SELECT lang, MAX(n) AS n_docs,
        |  MAX(CASE WHEN rn = (n * 50 + 99) // 100 THEN n_chars END) AS p50,
        |  MAX(CASE WHEN rn = (n * 90 + 99) // 100 THEN n_chars END) AS p90,
        |  MAX(CASE WHEN rn = (n * 99 + 99) // 100 THEN n_chars END) AS p99
        |FROM r
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,

    "q53_dup_rate_by_source" ->
      """WITH h AS (SELECT source, md5(text) AS h FROM documents),
        |dup AS (SELECT h FROM h GROUP BY h HAVING COUNT(*) > 1)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN dup.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        |  CAST(SUM(CASE WHEN dup.h IS NOT NULL THEN 1 ELSE 0 END) * 10000 // COUNT(*) AS BIGINT) AS dup_bp
        |FROM h LEFT JOIN dup ON h.h = dup.h
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    "q54_ngram_novelty" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> x <> '') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, CASE WHEN len(toks) >= 5
        |    THEN list_distinct([list_aggregate(toks[i:i+4], 'string_agg', ' ')
        |                        for i in generate_series(1, len(toks)-4)])
        |    ELSE [list_aggregate(toks, 'string_agg', ' ')] END AS sh
        |  FROM d WHERE len(toks) > 0),
        |u AS (SELECT doc_id, unnest(sh) AS g FROM s),
        |f AS (SELECT g, MIN(doc_id) AS first_doc FROM u GROUP BY g)
        |SELECT u.doc_id AS doc_id, COUNT(*) AS n_grams,
        |  CAST(SUM(CASE WHEN u.doc_id = f.first_doc THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |  CAST(SUM(CASE WHEN u.doc_id = f.first_doc THEN 1 ELSE 0 END) * 10000 // COUNT(*) AS BIGINT) AS novelty_bp
        |FROM u JOIN f ON u.g = f.g
        |GROUP BY u.doc_id""".stripMargin,

    "q55_canonical_keep" ->
      (dupSwarmCte + ",\n" +
        """h AS (SELECT md5(text) AS h, doc_id, n_chars, source FROM corpus),
          |k AS (SELECT doc_id, source,
          |        first_value(doc_id) OVER (
          |          PARTITION BY h ORDER BY n_chars DESC, doc_id ASC) AS keep_id
          |      FROM h)
          |SELECT doc_id AS drop_id, keep_id, source
          |FROM k WHERE doc_id <> keep_id""".stripMargin),

    "q56_neardup_verified" -> {
      // Replicates nearDupPairsLSH(nBits=16, bandBits=4) exactly: the q16
      // RHP signature construction (md5-parity signs, index-order DOUBLE
      // folds), banded bucket self-join on vec_id order, then the exact
      // q17 cosine filter on the candidate pairs.
      val nBits = 16
      val bandBits = 4
      val dim = 64
      def signCase(b: Int) =
        s"(CASE WHEN CAST(concat('0x', substr(md5(concat('rhp:$b:', j-1)), 1, 1)) " +
          s"AS BIGINT) % 2 = 0 THEN 1.0 ELSE -1.0 END)"
      val projs = (0 until nBits).map(b =>
        s"list_sum([v[j] * ${signCase(b)} for j in generate_series(1, $dim)]) AS p$b")
        .mkString(",\n        ")
      val sigExpr = (0 until nBits)
        .map(b => s"(CASE WHEN p$b > 0 THEN ${1L << b} ELSE 0 END)")
        .mkString(" + ")
      val bandExprs = (0 until nBits / bandBits)
        .map(t => s"((sig >> ${t * bandBits}) & ${(1L << bandBits) - 1}) + ${t.toLong << 32}")
        .mkString(", ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |p AS (SELECT vec_id, v,
         |        $projs
         |      FROM e),
         |sg AS (SELECT vec_id, v, CAST($sigExpr AS BIGINT) AS sig FROM p),
         |bd AS (SELECT vec_id, v, unnest([$bandExprs]) AS bucket FROM sg),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
         |         a.v AS va, b.v AS vb
         |  FROM bd a JOIN bd b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |SELECT id_a, id_b,
         |  list_inner_product(va, vb)
         |    / (sqrt(list_inner_product(va, va)) * sqrt(list_inner_product(vb, vb))) AS cosine
         |FROM cand
         |WHERE list_inner_product(va, vb)
         |    / (sqrt(list_inner_product(va, va)) * sqrt(list_inner_product(vb, vb))) >= 0.45""".stripMargin
    },

    "q57_repeated_windows" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> x <> '') AS toks
        |  FROM documents),
        |u AS (
        |  SELECT doc_id, toks,
        |    unnest(generate_series(0, CAST((len(toks)-30)//15 AS BIGINT))) AS i
        |  FROM d WHERE len(toks) >= 30),
        |w AS (
        |  SELECT doc_id,
        |    md5(list_aggregate(toks[(i*15+1):(i*15+30)], 'string_agg', ' ')) AS window_hash
        |  FROM u)
        |SELECT window_hash,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_occ,
        |  CAST(min(doc_id) AS BIGINT) AS first_doc
        |FROM w GROUP BY window_hash HAVING count(*) > 1""".stripMargin
  )
}
