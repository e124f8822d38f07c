package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query structural profiler (optimization guide §1: measure first,
  * and decide WHERE the time goes before touching anything).
  *
  * `tools/run.sh graft.Profile [sfDir] [query...]` runs each named query
  * (default: all) exactly as the bench does (noop sink, cache cleared
  * per query) and reports, per query:
  *   - wall      total seconds, bench-equivalent
  *   - plan      seconds to produce the executed plan (analyzer+optimizer+
  *               physical planning on the DRIVER — pure serial time)
  *   - jobs/stages/tasks  how many scheduling units the action spawned —
  *               a query of 15 sequential 1-task jobs is latency-bound,
  *               not compute-bound
  *   - taskSum   total executor task time (seconds) — the real compute
  *   - critPath  Σ per-stage max task time — the best wall any scheduler
  *               could reach with infinite cores given this stage graph
  *   - par       taskSum / wall — effective cores used
  *
  * Diagnosis cheat-sheet: par ≈ 1 with taskSum ≈ wall → stages run with
  * one real task (tiny-input scan or AQE-coalesced shuffle); wall ≫
  * taskSum + plan → scheduling/latency overhead of many small jobs;
  * plan ≈ wall → Catalyst planning dominates (huge expression tree).
  */
object Profile {
  private class Acc extends SparkListener {
    var jobs = 0
    var stages = 0
    var tasks = 0L
    var taskTimeMs = 0L
    var critPathMs = 0L
    private var curStageMax = 0L
    private val stageMax = scala.collection.mutable.Map.empty[Int, Long]
    override def onJobStart(j: SparkListenerJobStart): Unit = synchronized { jobs += 1 }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      tasks += 1
      val rt = Option(t.taskMetrics).map(_.executorRunTime).getOrElse(0L)
      taskTimeMs += rt
      val cur = stageMax.getOrElse(t.stageId, 0L)
      if (rt > cur) stageMax(t.stageId) = rt
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = synchronized {
      stages += 1
    }
    def crit: Long = synchronized { stageMax.values.sum }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.filter(a => new java.io.File(a).isDirectory)
      .getOrElse("/root/testdata/sf0.1")
    val names = args.dropWhile(a => new java.io.File(a).isDirectory)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warm-up discipline as Bench: JIT/codegen/parquet footers + the
    // persisted ensure* indexes, so profiles measure the query, not session
    // warm-up
    try {
      SparkEntry.queries("q1_agg")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      SparkEntry.prewarmIndexes(spark, sfDir)
      SparkEntry.prewarmComponents(spark, sfDir)
    } catch { case e: Throwable => System.err.println(s"[profile] warm-up failed: ${e.getMessage}") }
    spark.catalog.clearCache()

    val all = SparkEntry.queries.toSeq.sortBy(_._1)
    val selected = if (names.isEmpty) all else all.filter(q => names.contains(q._1))
    println(f"${"query"}%-34s ${"wall"}%7s ${"plan"}%6s ${"jobs"}%5s ${"stg"}%4s ${"tasks"}%6s ${"taskSum"}%8s ${"crit"}%6s ${"par"}%5s")
    selected.foreach { case (name, fn) =>
      spark.catalog.clearCache()
      val acc = new Acc
      spark.sparkContext.addSparkListener(acc)
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, sfDir)
        // force analysis+optimization+physical planning (AQE re-planning
        // during execution is charged to wall, not here)
        df.queryExecution.executedPlan
        val tPlan = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t1 = System.nanoTime()
        // listener bus is async (and private) — give it a beat to drain;
        // counts are diagnostics, not records, so approximate is fine
        Thread.sleep(300)
        val wall = (t1 - t0) / 1e9
        val plan = (tPlan - t0) / 1e9
        val taskSum = acc.taskTimeMs / 1e3
        val par = if (wall > 0) taskSum / wall else 0.0
        println(f"$name%-34s $wall%7.2f $plan%6.2f ${acc.jobs}%5d ${acc.stages}%4d ${acc.tasks}%6d $taskSum%8.2f ${acc.crit / 1e3}%6.2f $par%5.1f")
      } catch { case e: Throwable =>
        println(f"$name%-34s FAILED: ${e.getMessage}")
      } finally spark.sparkContext.removeSparkListener(acc)
    }
    spark.stop()
  }
}
