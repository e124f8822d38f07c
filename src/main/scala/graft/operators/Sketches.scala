package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.native

/** Mergeable-summary operators beyond the CMS/HLL aggregates in
  * `graft.plans`: sketches whose state is k values per slice, built
  * relationally so the estimates stay oracle-checkable.
  */
object Sketches {

  /** Pairwise source-overlap estimates from KMV (bottom-k distinct hash)
    * sketches — the Beyer et al. 2007 distinct-value synopsis. Per corpus
    * source, the sketch is the k SMALLEST distinct word-n-gram shingle
    * hashes (the transparent poly_hash ids double as the hash; shingles
    * rather than unigrams so the universe has combinatorial diversity —
    * text overlap, not vocabulary overlap). For a pair
    * (A, B), the bottom-L of the sketch UNION (L = min(k, |union|)) is a
    * uniform sample of the union's hash space, so
    *
    *   jaccard ≈ |{v in bottom-L : v in A and v in B}| / L
    *   |A ∪ B| ≈ (L-1) · P / v_L        (v_L = the L-th smallest hash)
    *
    * — both derived from 2·k longs per pair, never from the corpora. That
    * is the 100 TB point: estimating all S² source overlaps exactly would
    * be S² corpus-scale set intersections; the sketches make it ONE
    * distinct-shuffle + a sketch-sized (S rows of ≤ k longs) pair join.
    * The per-source bottom-k itself cuts BELOW the shuffle via the native
    * two-phase top-k plan ([[TopK.perGroup]]) — partitions ship at most k
    * candidate rows each, not their whole distinct token sets.
    *
    * Everything is integer arithmetic (ppm ratios, floor divisions), so
    * the DuckDB oracle matches hash-exactly.
    */
  def kmvSourceOverlap(docs: DataFrame, k: Int = 128, n: Int = 3): DataFrame = {
    val tok = docs
      .select(col("source"), explode(native.shingle_ids(col("text"), n)).as("id"))
      .distinct()
    val sk = TopK.perGroup(tok, Seq("source"), Seq(("id", false)), k, rankName = "rn")
    // materialize the S-row sketch relation ONCE: both sides of the pair
    // join consume it, and without the boundary each side would re-run the
    // corpus-scale distinct + top-k stage (visible as two full subtrees in
    // the physical plan)
    val arr = sk.groupBy("source").agg(array_sort(collect_list(col("id"))).as("ids"))
      .localCheckpoint(eager = true)
    val a = arr.select(col("source").as("src_a"), col("ids").as("ia"))
    val b = arr.select(col("source").as("src_b"), col("ids").as("ib"))
    // sketch-sized sides by contract (S sources × ≤k longs): the inequality
    // pair join is a nested loop over S rows, declared tiny like km_validity
    a.join(b, col("src_a") < col("src_b"))
      .withColumn("uu", array_sort(array_union(col("ia"), col("ib"))))
      .withColumn("l", least(lit(k.toLong), size(col("uu")).cast("long")))
      .withColumn("bl", slice(col("uu"), lit(1), col("l").cast("int")))
      .withColumn("inter",
        size(array_intersect(array_intersect(col("bl"), col("ia")), col("ib")))
          .cast("long"))
      .withColumn("vl", expr("element_at(uu, CAST(l AS INT))").cast("long"))
      .select(col("src_a"), col("src_b"), col("l"), col("inter"),
        expr("(inter * 1000000) div l").as("jaccard_ppm"),
        // saturated sketch (|union| < k) saw EVERY value — report it
        // exactly; otherwise the k-th-min extrapolation (L-1)·P/v_L
        when(size(col("uu")) < k || col("vl") <= 0, size(col("uu")).cast("long"))
          .otherwise(expr("((l - 1) * 1000003) div vl"))
          .as("union_est"))
  }
}
