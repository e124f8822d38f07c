package graft

import graft.sources.Sinks
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("TSV sink: header row, tab separation, nulls rendered as a space") {
    val df = Seq((1L, Some(2.5), None: Option[Double]))
      .toDF("i", "c1", "c2")
    val dir = Files.createTempDirectory("graft_tsv").toString
    Sinks.writeTsv(df, dir)
    val part = Files.list(Paths.get(dir)).iterator().asScala
      .find(_.toString.endsWith(".csv")).get
    val lines = Files.readAllLines(part).asScala
    assert(lines.head == "i\tc1\tc2")
    assert(lines(1) == "1\t2.5\t ")
  }

  test("parquet append accumulates the WCR-style log across writes") {
    val dir = Files.createTempDirectory("graft_wcr").toString + "/wcr"
    Sinks.appendParquet(Seq((0L, 1L, 0.5)).toDF("step", "j", "c0"), dir)
    Sinks.appendParquet(Seq((1L, 1L, 0.7)).toDF("step", "j", "c0"), dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 2)
    assert(back.orderBy("step").select("c0").as[Double].collect().toSeq == Seq(0.5, 0.7))
  }
}
