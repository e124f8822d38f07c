package graft.operators

import org.apache.spark.sql.DataFrame

/** Width adapter for COMPUTE-DENSE stages (optimization guide §2.2/§2.5,
  * round-18 optimization).
  *
  * Spark sizes stages by BYTES twice: scan splits pack
  * `maxPartitionBytes` of input per task, and AQE coalesces shuffle
  * partitions up to a byte target. Both rules under-parallelize stages
  * whose per-byte compute is high (edit-distance DP, JSON parsing,
  * trigram kernels, pair re-ranks): a corpus slice that is "one task" by
  * bytes can be minutes of CPU. The symptom at bench scale is a 32-core
  * box running a 6 s query at 1.0 effective cores; the same mis-sizing
  * at 100 TB shows up as the tail of a stage whose partition count was
  * derived from compressed input bytes rather than work.
  *
  * [[widen]] inserts a round-robin repartition to the SESSION'S
  * CONFIGURED shuffle width — never a constant — and only when the
  * relation's input files cannot fill that width at the configured scan
  * split size (`spark.sql.files.maxPartitionBytes`). At real scale the
  * gate is inert: the input already arrives wider than the configured
  * width and `widen` is the identity, so no extra exchange is ever paid
  * where the scan parallelism suffices. When the gate fires, the
  * repartitioned bytes are bounded by `width × maxPartitionBytes` by
  * construction — the exchange moves at most one task-sized unit per
  * slot, which is the cheapest insurance a starved stage can buy.
  *
  * The explicit partition count (vs a bare `repartition()`) also keeps
  * AQE from byte-coalescing the exchange back to one partition, which is
  * exactly the pathology being corrected. Round-robin (vs keyed) spreads
  * any hot key uniformly, and Spark's sort-before-repartition keeps the
  * assignment deterministic under retries (SPARK-23207).
  *
  * Results are unchanged by construction: every caller is a relation
  * whose downstream computation is partitioning-invariant (the engine's
  * standing discipline, pinned by the oracle hash gate at every sf).
  */
object Par {
  /** The session's configured shuffle width when `df`'s input files
    * cannot fill it at the configured split size; 0 ("already wide
    * enough — leave the scan alone") otherwise, or when input sizes are
    * unknowable (non-file sources).
    */
  def starvedWidth(df: DataFrame): Int = {
    val conf = df.sparkSession.sessionState.conf
    val width = conf.numShufflePartitions
    val split = conf.filesMaxPartitionBytes
    // r19 (advice): no non-local return inside the closure (the old form
    // compiled to a NonLocalReturnControl that this method's own blanket
    // catch swallowed), and NonFatal only — a fatal error (OOM) must
    // propagate, never read as "not starved".
    try {
      val files = df.inputFiles
      val remote = files.exists { f =>
        val sch = new java.net.URI(f).getScheme
        sch != null && sch != "file"
      }
      if (remote || files.isEmpty) 0 // remote/fileless: no extra exchange
      else {
        val bytes = files.map(f =>
          new java.io.File(new java.net.URI(f).getPath).length).sum
        if (bytes <= 0) 0
        else if (bytes < width.toLong * split) width
        else {
          // r19 (VERDICT #8): leaf-file bytes OVER-estimate a relation
          // sitting above a selective filter/projection — exactly where a
          // compute-dense stage can still be byte-starved at real scale.
          // When the files alone say "wide enough", consult the optimized
          // plan's own size estimate (column pruning + any CBO filter
          // stats) and widen if THAT is small. Only reached on large
          // inputs, so the extra optimizer pass is never paid at bench
          // scale; estimate failures just keep the files verdict.
          val planBytes =
            try df.queryExecution.optimizedPlan.stats.sizeInBytes
            catch { case scala.util.control.NonFatal(_) => BigInt(bytes) }
          if (planBytes > 0 && planBytes < BigInt(width.toLong * split)) width
          else 0
        }
      }
    } catch { case scala.util.control.NonFatal(_) => 0 }
  }

  /** `df` spread to the configured shuffle width when its scan is
    * byte-starved (see [[starvedWidth]]); `df` unchanged otherwise.
    *
    * Round-robin spread: pays the deterministic-retry pre-sort
    * (SPARK-23207 `sortBeforeRepartition`) of the input rows — fine for
    * narrow rows, measurably wrong for full-text rows (the serial sort of
    * the heavy column lands on the one starved task this call exists to
    * relieve). Prefer [[widenBy]] when a well-spread key is at hand.
    */
  def widen(df: DataFrame): DataFrame = {
    val w = starvedWidth(df)
    if (w > 1) df.repartition(w) else df
  }

  /** Keyed variant of [[widen]]: hash-repartition on `key` — already
    * deterministic under retries, so NO pre-sort of the (possibly heavy)
    * rows. `key` must spread well (a unique id column qualifies).
    */
  def widenBy(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    val w = starvedWidth(df)
    if (w > 1) df.repartition(w, key) else df
  }
}
