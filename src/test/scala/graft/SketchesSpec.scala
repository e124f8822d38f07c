package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** KMV source-overlap sketches: estimator accuracy on constructed overlap,
  * saturated-sketch exactness, and the below-shuffle top-k plan shape.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // Token streams with a KNOWN shingle overlap: A = t1..t1500, B = t750..
  // t2250 — the shared 3-gram shingles are exactly those fully inside the
  // 750..1500 overlap window, so J ≈ 1/3 and |A ∪ B| ≈ 2248.
  private def tokenText(from: Int, to: Int): String =
    (from to to).map(i => s"t$i").mkString(" ")

  test("kmvSourceOverlap estimates a constructed 1/3 Jaccard within 4 sigma") {
    val docs = Seq(
      ("A", tokenText(1, 1500)),
      ("B", tokenText(750, 2250))).toDF("source", "text")
    val row = Sketches.kmvSourceOverlap(docs, k = 128).head()
    val (l, inter) = (row.getAs[Long]("l"), row.getAs[Long]("inter"))
    assert(l == 128L, s"sketch must be unsaturated here, got l=$l")
    val j = row.getAs[Long]("jaccard_ppm") / 1e6
    // std err ~ sqrt(J(1-J)/k) = 0.042; accept 4 sigma around 1/3
    assert(j > 0.333 - 0.167 && j < 0.333 + 0.167, s"jaccard $j (inter=$inter)")
    val u = row.getAs[Long]("union_est")
    // (L-1)/L bias + sqrt(k) noise: accept 25% around the true 2248
    assert(u > 2248 * 0.75 && u < 2248 * 1.25, s"union_est $u")
  }

  test("saturated sketches (|union| < k) report the union EXACTLY") {
    val docs = Seq(
      ("C", "a b c d e"), // shingles {abc, bcd, cde}
      ("D", "b c d e f")) // shingles {bcd, cde, def}
      .toDF("source", "text")
    val row = Sketches.kmvSourceOverlap(docs, k = 128).head()
    assert(row.getAs[Long]("l") == 4L)
    assert(row.getAs[Long]("inter") == 2L)
    assert(row.getAs[Long]("jaccard_ppm") == 500000L)
    assert(row.getAs[Long]("union_est") == 4L, "saturated KMV is exact")
  }

  test("the per-source bottom-k runs through the native two-phase top-k " +
      "(partials cut to k BELOW the shuffle)") {
    // the operator checkpoints the S-row sketch relation (its pair join
    // consumes it twice), which truncates the visible lineage — so assert
    // the plan shape on the same sketch stage the operator builds
    val docs = Seq(("A", tokenText(1, 200)), ("B", tokenText(100, 300)))
      .toDF("source", "text")
    val tok = docs.select(col("source"),
      explode(graft.plans.native.shingle_ids(col("text"), 3)).as("id")).distinct()
    val plan = graft.operators.TopK
      .perGroup(tok, Seq("source"), Seq(("id", false)), 16, rankName = "rn")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartialTopKPerGroup") && plan.contains("FinalTopKPerGroup"),
      s"expected the native two-phase top-k in:\n$plan")
  }

  test("bloom_sketch: no false negatives, measured FP near the design rate, " +
      "partitioning-invariant OR-merge, probe inlines in codegen") {
    import spark.implicits._
    import graft.plans.native
    val members = (1L to 600L).toDF("id")
    val bf = members.repartition(7)
      .agg(native.bloom_sketch(col("id"), mBits = 8192, k = 3).as("bf"))
    val bf2 = members.repartition(2)
      .agg(native.bloom_sketch(col("id"), mBits = 8192, k = 3).as("bf"))
    assert(bf.head().getSeq[Long](0) == bf2.head().getSeq[Long](0),
      "OR-merge must be partitioning-invariant")
    // every word is a 32-bit value (the portable-layout contract)
    assert(bf.head().getSeq[Long](0).forall(w => w >= 0 && w < (1L << 32)))
    // no false negatives: every member must probe true
    val probed = members.crossJoin(broadcast(bf))
      .select(native.bloom_might_contain(col("bf"), col("id"),
        mBits = 8192, k = 3).as("hit"))
    assert(probed.filter(!col("hit")).count() == 0, "bloom lost a member")
    // measured FP on 10k non-members vs design rate (1-e^{-kn/m})^k ≈ 0.85%
    val non = (100001L to 110000L).toDF("id")
    val fp = non.crossJoin(broadcast(bf))
      .select(native.bloom_might_contain(col("bf"), col("id"),
        mBits = 8192, k = 3).as("hit"))
      .filter(col("hit")).count()
    assert(fp < 10000 * 0.03, s"FP rate ${fp / 10000.0} way above design 0.0085")
    // interpreted eval == codegen'd eval on the same rows
    val words = bf.head().getSeq[Long](0).toArray
    val expected = (99990L to 100010L).map { x =>
      val probe = graft.plans.BloomMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          words, org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType, containsNull = false)),
        org.apache.spark.sql.catalyst.expressions.Literal(x), 8192, 3)
      probe.eval(null).asInstanceOf[Boolean]
    }
    val viaPlan = (99990L to 100010L).toDF("id").crossJoin(broadcast(bf))
      .select(col("id"), native.bloom_might_contain(col("bf"), col("id"),
        mBits = 8192, k = 3).as("hit"))
      .orderBy("id").as[(Long, Boolean)].collect().map(_._2).toSeq
    assert(viaPlan == expected)
  }

  test("per-file bloom index: point lookups read a strict subset of files, " +
      "results equal the unpruned scan") {
    import spark.implicits._
    import graft.plans.native
    val out = java.nio.file.Files.createTempDirectory("bloomidx").toString
    (1L to 4000L).map(i => (i, i % 7)).toDF("doc_id", "tag")
      .repartition(16, col("doc_id"))
      .write.mode("overwrite").parquet(out)
    val keys = Seq(42L, 777L, 3999L)
    val idx = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(native.bloom_sketch(col("doc_id"), 1024, 3).as("bf"))
    val cand = idx.filter(keys
        .map(k => native.bloom_might_contain(col("bf"), lit(k), 1024, 3))
        .reduce(_ || _))
      .select("f").as[String].collect()
    val total = idx.count()
    assert(total == 16L, s"expected 16 files, got $total")
    // a 1024-bit filter holding ~250 keys has high fill (~52%), so a few
    // FP files are expected — but nothing close to all of them
    assert(cand.length < 16, s"bloom index pruned nothing: ${cand.length}")
    val pruned = spark.read.parquet(cand.toIndexedSeq: _*)
      .filter(col("doc_id").isin(keys: _*))
      .as[(Long, Long)].collect().toSet
    val full = spark.read.parquet(out)
      .filter(col("doc_id").isin(keys: _*))
      .as[(Long, Long)].collect().toSet
    assert(pruned == full && full.size == 3, "pruned lookup must be exact")
  }

  test("bloom SQL surface: bloom_sketch / bloom_might_contain by name " +
      "match the Column API") {
    import spark.implicits._
    import graft.plans.native
    graft.plans.GraftExtensions.register(spark)
    (1L to 50L).toDF("id").createOrReplaceTempView("bloom_ids")
    val viaSql = spark.sql(
      "SELECT bloom_sketch(id, 256, 3) AS bf FROM bloom_ids")
      .head().getSeq[Long](0)
    val viaCol = (1L to 50L).toDF("id")
      .agg(native.bloom_sketch(col("id"), 256, 3)).head().getSeq[Long](0)
    assert(viaSql == viaCol)
    val hits = spark.sql(
      """SELECT count(*) FROM bloom_ids b,
        |  (SELECT bloom_sketch(id, 256, 3) AS bf FROM bloom_ids) s
        |WHERE bloom_might_contain(s.bf, b.id, 256, 3)""".stripMargin)
      .head().getLong(0)
    assert(hits == 50L, "every member must probe true through the SQL name")
  }

  test("sketch pair stats are deterministic across partitionings") {
    val docs = Seq(
      ("A", tokenText(1, 800)), ("B", tokenText(400, 1200)),
      ("E", tokenText(600, 1400))).toDF("source", "text")
    val r1 = Sketches.kmvSourceOverlap(docs.repartition(7), k = 64)
      .orderBy("src_a", "src_b").collect().toSeq
    val r2 = Sketches.kmvSourceOverlap(docs.repartition(2), k = 64)
      .orderBy("src_a", "src_b").collect().toSeq
    assert(r1 == r2)
  }
}
