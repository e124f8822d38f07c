package graft

import org.apache.spark.sql.functions._

/** The graft-tsv DataSource V2 sink: TSVWithNames content contract, the
  * two-phase commit protocol (atomic publish, nothing on abort), and
  * append-twice isolation.
  */
class TsvSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_tsv_sink").toString + "/out"

  test("writes TSVWithNames with space-rendered nulls; roundtrips through the csv reader") {
    val out = tmp()
    val df = Seq(
      (1L, Some("alpha"), Some(10L)),
      (2L, None, Some(20L)),
      (3L, Some("gamma"), None)
    ).toDF("id", "name", "v")
    df.repartition(2).write.format("graft-tsv")
      .option("path", out).mode("append").save()

    assert(new java.io.File(out, "_SUCCESS").exists())
    assert(!new java.io.File(out + "_staging").exists()) // staging cleaned

    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".tsv"))
    assert(files.length == 2) // one published file per partition
    files.foreach { f =>
      val first = scala.io.Source.fromFile(f).getLines().toSeq.headOption
      assert(first.contains("id\tname\tv")) // every file carries the header
    }

    val back = spark.read
      .option("sep", "\t").option("header", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(out)
    val rows = back.select("id", "name", "v").as[(String, String, String)]
      .collect().toSet
    assert(rows == Set(
      ("1", "alpha", "10"),
      ("2", " ", "20"), // null rendered as the reference's single space
      ("3", "gamma", " ")))
  }

  test("a failed job publishes nothing: no _SUCCESS, no data files, staging gone") {
    val out = tmp()
    val poisoned = spark.range(0, 100, 1, 4).map { i =>
      if (i == 97L) throw new RuntimeException("poison")
      i
    }.toDF("i")
    intercept[Exception] {
      poisoned.write.format("graft-tsv").option("path", out).mode("append").save()
    }
    val dest = new java.io.File(out)
    assert(!dest.exists() ||
      dest.listFiles().forall(f => !f.getName.endsWith(".tsv") && f.getName != "_SUCCESS"),
      s"destination not clean: ${Option(dest.listFiles()).map(_.mkString(", "))}")
    assert(!new java.io.File(out + "_staging").exists() ||
      new java.io.File(out + "_staging").listFiles().isEmpty)
  }

  test("two appends into one destination coexist without name collisions") {
    val out = tmp()
    def one(tag: String) = Seq((tag, 1L)).toDF("tag", "v")
      .coalesce(1).write.format("graft-tsv").option("path", out)
      .mode("append").save()
    one("a"); one("b")
    val back = spark.read.option("sep", "\t").option("header", "true").csv(out)
    assert(back.select("tag").as[String].collect().toSet == Set("a", "b"))
  }
}
