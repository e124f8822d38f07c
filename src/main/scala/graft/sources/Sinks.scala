package graft.sources

import org.apache.spark.sql.DataFrame

/** Output sinks mirroring the reference's data-interface contract. */
object Sinks {

  /** The reference's TSV export (k-means.sh:4,45): `TSVWithNames` with
    * `--format_tsv_null_representation ' '` — tab-separated, header row,
    * nulls rendered as a single space (so sparse pivot columns plot cleanly
    * in a spreadsheet). `coalesce(1)` mirrors the reference's single output
    * stream; drop it for sharded exports at scale.
    */
  def writeTsv(df: DataFrame, path: String, single: Boolean = true): Unit = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    // render nulls ourselves: the CSV writer's nullValue option is not
    // reliably applied on write, and the reference contract needs ' '
    val rendered = df.select(df.columns.toIndexedSeq.map(c =>
      coalesce(col(c).cast("string"), lit(" ")).as(c)): _*)
    val out = if (single) rendered.coalesce(1) else rendered
    out.write
      .option("sep", "\t")
      .option("header", "true")
      .option("ignoreLeadingWhiteSpace", "false")  // keep the ' ' null marker
      .option("ignoreTrailingWhiteSpace", "false")
      .mode("overwrite")
      .csv(path)
  }

  /** Parquet append — the `INSERT INTO … SELECT` / MergeTree-log analog
    * (reference S2/S5): an append-only materialization of e.g. the WCR
    * centroid log.
    */
  def appendParquet(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** Bucketed catalog table: pre-shuffle the data ONCE at write time so
    * every later equi-join or aggregation on `keys` is co-located and plans
    * with NO Exchange on this side — the lever that turns a repeated
    * fact-to-fact shuffle (the dominant cost of a 100 TB join) into a local
    * zip of bucket files. Sort-within-bucket keeps merge-join ready order.
    * SinksSpec asserts the shuffle-free plan property on a real join.
    */
  /** Small-files compaction: rewrite a parquet directory into
    * ceil(bytes/target) files. Millions of tiny files are the silent killer
    * of a 100 TB table scan (per-file open + footer decode dominates) and
    * the inevitable residue of streaming/incremental writers; compaction is
    * the maintenance pass that restores scan efficiency. `coalesce` (not
    * `repartition`) keeps it shuffle-free — each output file is a
    * concatenation of input splits. Returns the output file count.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    // Size via Hadoop FS (recursive): works on partitioned layouts and on
    // HDFS/S3, where java.io.File silently reports nothing — and a 0-byte
    // estimate would coalesce the whole table into one file.
    val bytes = {
      val path = new org.apache.hadoop.fs.Path(inPath)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      require(fs.exists(path), s"compact: input path does not exist: $inPath")
      var total = 0L
      val it = fs.listFiles(path, true)
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) total += f.getLen
      }
      total
    }
    require(bytes > 0, s"compact: no parquet files found under $inPath")
    val n = math.max(1, ((bytes + targetBytes - 1) / targetBytes).toInt)
    spark.read.parquet(inPath).coalesce(n)
      .write.mode("overwrite").parquet(outPath)
    n
  }

  /** Morton z-value: interleave the low `bits` bits of two non-negative
    * keys (x takes the even bit positions, y the odd). Pure integer
    * arithmetic — the oracle replays it exactly — and the layout key for
    * [[writeZOrdered]].
    */
  def zValue(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
      bits: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { b =>
      shiftleft(shiftrightunsigned(x, b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftrightunsigned(y, b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _)
  }

  /** Z-ordered layout: range-partition on the interleaved key and sort
    * within partitions, so every output file covers a compact z-range —
    * which makes the per-file min/max column statistics tight in BOTH
    * interleaved dimensions at once. A single-column sort gives tight stats
    * only for its own column; z-ordering is what lets stats-based file
    * skipping prune 2-D box predicates at 100 TB (SinksSpec asserts the
    * file-count win against a linear layout). The range partitioner
    * samples the z-key distribution, so skewed key densities still land in
    * balanced files.
    */
  def writeZOrdered(df: DataFrame, path: String,
      x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
      bits: Int, files: Int): Unit = {
    import org.apache.spark.sql.functions.col
    df.withColumn("_z", zValue(x, y, bits))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String], path: Option[String] = None): Unit = {
    import org.apache.spark.sql.functions.col
    // ONE FILE PER BUCKET for small relations (r19): a bucketed write emits
    // one file per (writer task × bucket present in it), so a WIDE input
    // relation — e.g. the r18 Par.widenBy'd TF/MinHash kernels at 32
    // shuffle partitions — fragments each 8-bucket index into 32×8 = 256
    // tiny files, and every PROBE of the index pays 32× the file
    // opens/footers (measured r18→r19: the tf index landed at 256 files and
    // the indexed retrieval probes regressed 20-30% in the driver's leg).
    // Repartitioning by the bucket keys to exactly `buckets` partitions
    // uses the same Murmur3 hash the bucket assignment uses, so each writer
    // task holds exactly one bucket: `buckets` files, whatever the upstream
    // width. SCALE GATE (same posture as Par.starvedWidth): only collapse
    // when the source bytes fit `buckets` scan splits — at 100 TB the
    // un-collapsed many-tasks-×-buckets layout is the right one (bounded
    // file sizes, parallel write), and this is the identity. Guide §6:
    // output file sizing is the writer's job, never an accident of
    // upstream parallelism.
    val conf = df.sparkSession.sessionState.conf
    val smallSource =
      try {
        val bytes = df.inputFiles.map { f =>
          val uri = new java.net.URI(f)
          if (uri.getScheme == null || uri.getScheme == "file")
            new java.io.File(uri.getPath).length
          else -1L // remote store: unknowable — keep the parallel write
        }
        bytes.nonEmpty && bytes.forall(_ >= 0) &&
          bytes.sum < buckets.toLong * conf.filesMaxPartitionBytes
      } catch { case scala.util.control.NonFatal(_) => false }
    val src = if (smallSource) df.repartition(buckets, keys.map(col): _*) else df
    val w = src.write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .format("parquet")
    // explicit location -> external table: callers that run from arbitrary
    // working directories (Verify/Bench) keep the data out of ./spark-warehouse
    path.fold(w.saveAsTable(table)) { p =>
      df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
      w.option("path", p).saveAsTable(table)
    }
  }
}
