package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join strategies beyond what a hint can say — the skew toolbox.
  *
  * Spark's AQE handles moderate skew by splitting oversized partitions
  * (`spark.sql.adaptive.skewJoin`), but a HOT KEY joined against a
  * non-broadcastable side still concentrates one key's rows in one task.
  * The classic fix is SALTING: spread the big side's hot keys over `salts`
  * synthetic sub-keys and replicate the small-but-not-broadcastable side
  * once per salt — the join becomes an equi-join on (key, salt) whose
  * per-task load is bounded by (hot-key rows / salts), at the cost of
  * `salts`× the replicated side. Values are identical to the plain join by
  * construction (every (big row, match) pair meets exactly once —
  * `q_salted_join` hash-matches the PLAIN-join DuckDB oracle).
  */
object Joins {

  /** Skew-safe inner equi-join on `key`.
    *
    * `saltBy` must be a deterministic per-row expression of the BIG side
    * (any column(s) — uniqueness not required; it only spreads rows), so
    * the salt — and therefore every intermediate — is a pure function of
    * the data under any partitioning. `small` is replicated `salts`× via
    * one `explode` (NOT broadcast: this operator exists precisely for the
    * too-big-to-broadcast side; the replication rides the shuffle).
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
      saltBy: Column, salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val bigS = big.withColumn("_salt",
      pmod(xxhash64(saltBy), lit(salts.toLong)).cast("int"))
    val smallS = small.withColumn("_salt",
      explode(typedlit((0 until salts).toVector)))
    bigS.join(smallS, Seq(key, "_salt")).drop("_salt")
  }

  /** Bucketized range join — point-in-interval (`lo <= v < hi`), the second
    * classic join Spark lacks natively (a plain non-equi condition plans as
    * a nested loop: O(|points|·|intervals|) comparisons). Decomposition:
    * each interval explodes to the coarse buckets it covers
    * ((hi−lo)/width + 1 rows), each point lands in exactly ONE bucket, the
    * join becomes a shuffled equi-join on bucket id refined by the exact
    * range predicate — and every qualifying (point, interval) pair meets
    * exactly once, so no dedup stage is needed. `width` trades interval
    * replication (≈ span/width rows) against candidate precision; both
    * sides truncate with the same `div`, so bucket assignment is consistent
    * for any sign.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, width: Long,
      vCol: String = "v", loCol: String = "lo", hiCol: String = "hi"): DataFrame = {
    require(width > 0, s"bucket width must be > 0, got $width")
    val iv = intervals.filter(col(hiCol) > col(loCol))
      .withColumn("_bkt", explode(sequence(
        expr(s"$loCol div $width"), expr(s"($hiCol - 1) div $width"))))
    points.withColumn("_bkt", expr(s"$vCol div $width"))
      .join(iv, Seq("_bkt"))
      .filter(col(vCol) >= col(loCol) && col(vCol) < col(hiCol))
      .drop("_bkt")
  }

  /** Snapshot-as-of read over an append-only generation log with tombstones
    * — the time-travel read a reproducible training pipeline needs (train
    * against "the corpus as of gen G" while ingestion keeps appending).
    * The log carries (keys…, gen, op) where op 'U' upserts the row and 'D'
    * tombstones the key; the state as of `gen` is, per key, the row of the
    * highest generation ≤ G — dropped entirely when that winner is a
    * delete. One filter + the latest-wins key window (`q_upsert`'s shape);
    * with the log bucketed by key even that shuffle disappears, and the
    * `gen <= G` filter pushes to the scan so old snapshots read only their
    * prefix of a generation-partitioned log.
    */
  def snapshotAsOf(log: DataFrame, keys: Seq[String], gen: Long,
      opCol: String = "op"): DataFrame = {
    // ties inside one generation resolve DELETE-wins ('D' < 'U' ascending):
    // a key upserted and tombstoned in the same generation is deterministic-
    // ally gone, never shuffle-order-dependent
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(desc("gen"), asc(opCol))
    log.filter(col("gen") <= gen)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col(opCol) =!= "D")
      .drop("_rn", opCol)
  }

  /** Generation-log compaction — the maintenance op every tombstone log
    * needs once history outgrows its value (Delta/Iceberg checkpoint of the
    * delta log, physical-rewrite flavor): keep, from the generations ≤
    * `upTo`, only each key's as-of-`upTo` SURVIVING row — verbatim, original
    * `gen` stamp and all — and the later generations untouched. Tombstoned
    * keys and overwritten history vanish, so the compacted log is bounded by
    * |live keys at upTo| + |tail|, and every later snapshot reads a short
    * log prefix instead of the full history.
    *
    * Keeping the winner's own `gen` (rather than re-stamping at `upTo`)
    * makes the invariant EXACT including provenance, pinned in PropertySpec
    * and by the q_log_compact oracle: for ANY g ≥ upTo,
    * `snapshotAsOf(logCompact(log, upTo), g) ≡ snapshotAsOf(log, g)` row
    * for row. (Snapshots at g < upTo are the history the compaction
    * deliberately discards.)
    *
    * Scale shape: one latest-wins key window over the ≤ upTo prefix (the
    * `gen` filter pushes to the scan of a generation-partitioned log) + a
    * union with the untouched tail — no join, one shuffle on the key.
    */
  def logCompact(log: DataFrame, keys: Seq[String], upTo: Long,
      opCol: String = "op"): DataFrame = {
    val base = snapshotAsOf(log, keys, upTo, opCol)
      .withColumn(opCol, lit("U"))
    base.select(log.columns.map(col): _*)
      .unionByName(log.filter(col("gen") > upTo))
  }

  /** SCD Type-2 history — the warehouse-standard versioned read of a
    * generation log: every upsert opens a version valid from its own
    * generation until the key's next change (the following upsert OR the
    * tombstone); the latest open version carries `valid_to` null. Delete
    * rows close the prior version and emit nothing themselves, so the
    * output is exactly the key's value timeline. One lead() window per key
    * — the same single shuffle on the key as [[snapshotAsOf]], and the two
    * agree by construction: filtering `valid_from <= G < coalesce(valid_to,
    * ∞)` reproduces the as-of-G snapshot (PropertySpec pins it).
    */
  def scd2(log: DataFrame, keys: Seq[String], opCol: String = "op"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(asc("gen"), desc(opCol))
    log
      .withColumn("_next", lead("gen", 1).over(w))
      .filter(col(opCol) =!= "D")
      .drop(opCol)
      .withColumnRenamed("gen", "valid_from")
      .withColumnRenamed("_next", "valid_to")
  }

  /** MERGE INTO — the canonical lake write statement (Delta/Iceberg MERGE):
    * apply a CHANGE SET to a target in one relational pass. Per change row:
    * op 'U' updates the matched target row (or inserts when unmatched);
    * op 'D' deletes the matched key (a delete of an absent key is a no-op).
    * Target rows without a change pass through verbatim.
    *
    * Caller contract: `changes` carries at most one row per key (CDC compact
    * first — [[snapshotAsOf]]'s latest-wins window is exactly that op), and
    * has the target's schema plus `opCol`.
    *
    * Shape: ONE full-outer equi-join on the key (hash/SMJ — the change set
    * shuffles, the target shuffles once; with a bucketed target even that
    * disappears) + a projection. No window, no second pass. Values are
    * engine-exact by construction — the q_merge oracle replays the same
    * join + CASE.
    */
  def mergeInto(target: DataFrame, changes: DataFrame, keys: Seq[String],
      opCol: String = "op"): DataFrame = {
    val dataCols = target.columns.filterNot(keys.contains).toSeq
    val c = changes.select(
      keys.map(col) ++ dataCols.map(n => col(n).as(s"_c_$n"))
        :+ col(opCol).as("_op"): _*)
    target.join(c, keys, "full_outer")
      .filter(coalesce(col("_op"), lit("")) =!= "D")
      .select(keys.map(col) ++ dataCols.map(n =>
        when(col("_op") === "U", col(s"_c_$n")).otherwise(col(n)).as(n)): _*)
  }

  /** CHANGEFEED derivation — the inverse of [[mergeInto]]: given two
    * snapshots of the same keyed relation, emit the CDC row set (`I`/`U`/`D`
    * plus old/new values) that turns `before` into `after`. One full-outer
    * equi-join on the key, null-safe value compare (`<=>`) per data column;
    * unchanged keys produce no row, so the feed is minimal. This is how a
    * lake table publishes a change stream to downstream consumers when the
    * writer didn't record one — at 100 TB both sides shuffle once on the
    * key (or not at all if both snapshots are bucketed by it).
    */
  def changefeed(before: DataFrame, after: DataFrame,
      keys: Seq[String]): DataFrame = {
    val dataCols = before.columns.filterNot(keys.contains).toSeq
    val b = before.select(
      keys.map(col) ++ dataCols.map(n => col(n).as(s"_b_$n"))
        :+ lit(1).as("_in_b"): _*)
    val a = after.select(
      keys.map(col) ++ dataCols.map(n => col(n).as(s"_a_$n"))
        :+ lit(1).as("_in_a"): _*)
    val j = b.join(a, keys, "full_outer")
    // a key-only relation still diffs (I/D rows); U is impossible then
    val changed = dataCols.map(n => !(col(s"_b_$n") <=> col(s"_a_$n")))
      .reduceOption(_ || _).getOrElse(lit(false))
    j.withColumn("op",
        when(col("_in_b").isNull, "I")
          .when(col("_in_a").isNull, "D")
          .when(changed, "U"))
      .filter(col("op").isNotNull)
      .select(keys.map(col) ++ Seq(col("op")) ++
        dataCols.map(n => col(s"_b_$n").as(s"old_$n")) ++
        dataCols.map(n => col(s"_a_$n").as(s"new_$n")): _*)
  }
}
