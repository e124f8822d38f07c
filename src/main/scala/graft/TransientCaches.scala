package graft

import org.apache.spark.sql.DataFrame

/** Release registry for persisted intermediates inside LAZY operators.
  *
  * Operators like `Retrieval.prfBm25` or `Similarity.ivfRecallCurve` persist
  * an intermediate that feeds SEVERAL subtrees of the DataFrame they return.
  * The `try/finally unpersist` convention (TextAnalysis/Quality) only works
  * for operators that run their actions EAGERLY — for a lazily-returned plan,
  * unpersisting in a finally would drop the cache before the caller's action
  * runs and silently disable the very reuse the persist bought. So lazy
  * operators instead `register` their persisted intermediates here, and the
  * session's natural cache-hygiene points release them:
  *  - `graft.Bench` isolates every timed query with `catalog.clearCache()`
  *    (which already drops all cached plans — bench loops never accumulated);
  *  - `SparkEntry.clearMemos()` calls [[releaseAll]] so the memo-reset seam
  *    also resets operator caches;
  *  - library users composing many queries in one JVM call [[releaseAll]]
  *    between logical batches.
  * Unpersisting an already-unpersisted (or clearCache'd) DataFrame is a
  * no-op, so double release is safe.
  */
object TransientCaches {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Register `df` (already persisted by the caller) for later release. */
  def register(df: DataFrame): DataFrame = { live.add(df); df }

  /** Unpersist every registered intermediate (non-blocking) and clear the
    * registry.
    */
  def releaseAll(): Unit = {
    var d = live.poll()
    while (d != null) { d.unpersist(false); d = live.poll() }
  }
}
