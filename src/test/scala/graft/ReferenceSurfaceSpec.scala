package graft

import graft.operators.{KMeans, ReferenceSurface}
import org.apache.spark.sql.functions._

/** The SQL-surface facade: a reference user's session, driven exactly like
  * k-means.sh but through spark.sql against the registered view names.
  */
class ReferenceSurfaceSpec extends SparkSpec {
  import spark.implicits._

  private def planted = {
    val seeds = Seq((10.0, 15.0), (70.0, 10.0), (15.0, 80.0), (75.0, 70.0))
    seeds.zipWithIndex.map { case ((x, y), ix) => (ix.toLong, x, y) }
      .toDF("s", "sx", "sy")
      .crossJoin(spark.range(200).toDF("id"))
      .select((col("s") * 200 + col("id") + 1).as("i"),
        array(col("sx") + rand(42) * 12.0, col("sy") + rand(43) * 12.0).as("Y"))
      .cache()
  }

  test("the five reference view names run as plain spark.sql") {
    val surf = new ReferenceSurface(spark, planted, dim = 2, seed = 11)
    surf.insertFirstCentroid()
    surf.insertCentroidsInit()
    assert(spark.sql("SELECT i, Y FROM YH").count() == 800)
    assert(spark.sql("SELECT step, j, C FROM WCR").count() == 2)
    assert(spark.sql("SELECT max(j) FROM WCR").head().getLong(0) == 2L)
    // nearestCentroid: untupled coords + next step + assignment
    val nc = spark.sql("SELECT i, y1, y2, step, j FROM nearestCentroid")
    assert(nc.count() == 800 && nc.select("step").distinct().head().getLong(0) == 1L)
    assert(spark.sql("SELECT j FROM centroidsInit").count() == 1)
    assert(spark.sql("SELECT d FROM deltaFinish").count() == 1)
  }

  test("the k-means.sh loop, replayed through the SQL surface, converges") {
    val surf = new ReferenceSurface(spark, planted, dim = 2, seed = 7)
    val steps = surf.run(k = 4)
    assert(surf.delta() == 0L, "loop must end with the deltaFinish view at 0")
    assert(steps >= 1)
    // WCR holds the full log: k seed rows at step 0 plus <= k rows per step
    val perStep = spark.sql("SELECT step, count(*) AS n FROM WCR GROUP BY step")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perStep(0L) == 4L && perStep.keys.max == steps)
    // recovered centroids sit near the plant sites (mean jitter +6)
    val expected = Seq((16.0, 21.0), (76.0, 16.0), (21.0, 86.0), (81.0, 76.0))
    val got = surf.log.filter(_.step == steps).map(_.c)
    val matched = expected.map { case (ex, ey) =>
      got.minBy(c => math.pow(c(0) - ex, 2) + math.pow(c(1) - ey, 2))
    }
    assert(matched.toSet.size == 4, s"centroids $got must match plants 1:1")
    matched.zip(expected).foreach { case (c, (ex, ey)) =>
      val d = math.sqrt(math.pow(c(0) - ex, 2) + math.pow(c(1) - ey, 2))
      assert(d < 4.0, s"centroid $c too far from ($ex,$ey): $d")
    }
    // and the loop's final state equals the engine-API assignment counts
    val cs = surf.log.filter(_.step == steps).map(e => KMeans.Centroid(e.j, e.c))
    val sizes = KMeans.assign(planted, cs).groupBy("j").count()
      .select("count").as[Long].collect()
    assert(sizes.sum == 800 && sizes.forall(s => s > 100 && s < 300), s"sizes ${sizes.toSeq}")
  }

  test("the surface is dimension-generic (README.md:36): 3-D YH binding") {
    // the reference's contract: redefine YH with any arity and the views
    // follow — here the 3-D events binding, driven through the same SQL
    val surf = new ReferenceSurface(spark, Tables.yhEvents(spark, sf("0.001")),
      dim = 3, seed = 5)
    surf.insertFirstCentroid()
    surf.insertCentroidsInit()
    surf.insertCentroidsInit()
    val nc = spark.sql("SELECT i, y1, y2, y3, step, j FROM nearestCentroid")
    assert(nc.columns.length == 6 && nc.count() > 0)
    surf.insertLloydStep()
    assert(spark.sql("SELECT count(*) FROM WCR WHERE step = 1").head().getLong(0) <= 3)
    assert(spark.sql("SELECT size(C) FROM WCR LIMIT 1").head().getInt(0) == 3)
  }

  test("pivotTsv exports the reference's sparse scatter shape") {
    val surf = new ReferenceSurface(spark, planted, dim = 2, seed = 7)
    surf.run(k = 4)
    val out = s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_ref_pivot"
    surf.pivotTsv(out)
    val back = spark.read.option("sep", "\t").option("header", "true").csv(out)
    assert(back.columns.toSeq == Seq("x", "p1", "p2", "p3", "p4"))
    assert(back.count() == 800)
  }
}
