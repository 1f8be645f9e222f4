package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Benchmark decontamination: flag corpus documents that share token n-grams
  * with an evaluation/benchmark set — the standard contamination check run
  * before training on web-scale corpora (13-gram overlap in GPT-3/Llama
  * data papers; n is a parameter here).
  *
  * Scale shape: the eval set is small by construction (benchmarks are MBs,
  * the corpus is TBs), so its distinct n-grams are broadcast and the corpus
  * side never shuffles on the n-gram key — one broadcast hash join on the
  * exploded corpus shingles, then a map-side-combinable count per doc. No
  * all-pairs work, no corpus-keyed shuffle besides the final doc_id
  * aggregation.
  */
object Decontaminate {

  /** Per-document overlap counts against the eval set's n-gram inventory.
    *
    * @return (idCol, n_overlap) for documents sharing ≥1 distinct n-gram,
    *         where n_overlap counts DISTINCT shared n-grams.
    */
  def overlap(
      corpus: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5
  ): DataFrame = {
    // Stage the token arrays before shingling: a higher-order lambda that
    // references a derived expression re-evaluates it per array element in
    // interpreted eval — O(len²) tokenization without this select.
    // Zero-token docs are skipped on both sides: they have no n-grams, and
    // their whole-text "" shingle would diverge from the DuckDB oracle
    // (empty-list aggregate is NULL there and never joins).
    // Dedup.shingleSortedSet = compiled per-doc distinct-shingle kernel:
    // same shingle SET per document as array_distinct(Text.shingles(...)),
    // one compiled pass instead of the interpreted higher-order chain;
    // per-row order differs (sorted) but both sides only consume the set.
    val evalGrams = eval
      .select(Dedup.shingleSetFromLowered(lower(col(textCol)), n).as("__shs"))
      .where(col("__shs").isNotNull)
      .select(explode(col("__shs")).as("__ngram"))
      .distinct()
    corpus
      .select(col(idCol), col(textCol))
      // explicit-width spread of the raw text: single-row-group inputs scan
      // as one task, which would run the fused tokenize+shingle kernel over
      // the whole corpus serially
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol),
        Dedup.shingleSetFromLowered(lower(col(textCol)), n).as("__shs"))
      .where(col("__shs").isNotNull)
      .select(col(idCol), explode(col("__shs")).as("__ngram"))
      .join(broadcast(evalGrams), "__ngram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"))
  }
}
