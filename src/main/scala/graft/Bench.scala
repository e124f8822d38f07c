package graft

import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Per-round benchmark: runs every SparkEntry query on
  * `SPARK_GRAFT_SF_DIR`, forcing full materialization through the `noop`
  * sink (a bare `count()` would let Catalyst prune the computed columns and
  * under-measure row-level queries). Prints ONE JSON line.
  *
  * Defensive against a contended/starved harness environment (a recorded
  * round-1 run came in 5× over the reproducible time):
  *  - a WARM-UP query runs untimed first, absorbing JVM/codegen/parquet
  *    footer warm-up so the first timed query isn't charged for it;
  *  - per-query GC time is recorded (`"gc"` map) — a contended run
  *    self-diagnoses as gc ≈ elapsed;
  *  - failed queries are listed in `"errors"` (their elapsed time still
  *    appears in `"queries"`, so a fast failure is distinguishable from a
  *    fast success).
  *
  * Optional args: query names to run (default all) — for standalone timing
  * of a single query without the rest of the suite.
  */
object Bench {
  private def gcMillis(): Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(b.getCollectionTime, 0L)).sum

  /** Total JVM CPU seconds — a starved run self-diagnoses as
    * elapsed ≫ cpu (the work wasn't done here) or gc ≈ elapsed (heap).
    */
  private def cpuSec(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime / 1e9
      case _ => -1.0
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = SparkEntry.queries.toSeq.sortBy(_._1)
    val unknown = args.filterNot(a => all.exists(_._1 == a))
    if (unknown.nonEmpty)
      System.err.println(s"[bench] WARNING: unknown query name(s) ignored: ${unknown.mkString(", ")}")
    val selected = if (args.isEmpty) all else all.filter(q => args.contains(q._1))

    // warm-up (untimed): JIT, codegen, shuffle/broadcast infrastructure,
    // parquet footers — one scan-agg query plus a tiny iterative fit so the
    // first timed query isn't charged for session warm-up
    try {
      SparkEntry.queries("q1_agg")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      // smallest sibling sf dir next to the bench target (falls back to the
      // target itself), so the warm-up fit isn't pinned to one absolute path
      val parent = new java.io.File(sfDir).getAbsoluteFile.getParentFile
      val tinyDir = Option(parent.listFiles((f: java.io.File) => f.isDirectory && f.getName.startsWith("sf")))
        .map(_.sortBy(f => f.getName.stripPrefix("sf").toDoubleOption.getOrElse(Double.MaxValue)))
        .flatMap(_.headOption).map(_.getPath).getOrElse(sfDir)
      val tiny = Tables.yhEmbeddings(spark, tinyDir).cache()
      operators.KMeans.fit(tiny, k = 4, dim = 64, maxIter = 3, plusPlus = true, seed = 1L)
      tiny.unpersist()
    } catch { case e: Throwable => System.err.println(s"[bench] warm-up failed: ${e.getMessage}") }
    spark.catalog.clearCache()

    var errors = List.empty[String]
    val results = selected.map { case (name, fn) =>
      spark.catalog.clearCache() // isolate: no memory pressure bleed-over
      val gc0 = gcMillis()
      val cpu0 = cpuSec()
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        errors ::= name
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      (name, (System.nanoTime() - t0) / 1e9, (gcMillis() - gc0) / 1e3, cpuSec() - cpu0)
    }
    def jnum(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def jmap(kv: Seq[(String, Double)]): String =
      kv.map { case (k, v) => "\"" + k + "\":" + jnum(v) }.mkString("{", ",", "}")
    val qs = jmap(results.map(r => r._1 -> r._2))
    val gc = jmap(results.map(r => r._1 -> r._3))
    val cpu = jmap(results.map(r => r._1 -> r._4))
    val errs = errors.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // The contract line stays COMPACT (the harness captures a bounded output
    // tail and json-parses this one line); gc/cpu diagnostics go to stderr.
    System.err.println(s"""{"diag":"bench","gc":$gc,"cpu":$cpu,"errors":$errs}""")
    println(s"""{"metric":"total","value":${jnum(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
