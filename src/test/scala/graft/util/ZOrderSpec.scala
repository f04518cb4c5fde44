package graft.util

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Z-order curve: interleave parity between the driver-side and column
  * forms, the box-superset law on random data, and pushdown of the
  * z-range onto a z-sorted parquet layout. */
class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  test("column zValue equals the driver-side zOf on random pairs") {
    val rnd = new Random(71)
    val rows = (1 to 500).map(_ => (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == ZOrder.zOf(x, y), s"($x, $y)") }
    // bit-interleave sanity: x=all-ones fills the even bit positions
    assert(ZOrder.zOf(0xFFFFL, 0L) == 0x55555555L)
    assert(ZOrder.zOf(0L, 0xFFFFL) == 0xAAAAAAAAL)
  }

  test("boxFilter equals the direct box scan for random boxes") {
    val rnd = new Random(73)
    val df = (1 to 2000).map(i =>
      (i.toLong, rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
      .toDF("id", "x", "y")
    for (_ <- 1 to 5) {
      val (x0, y0) = (rnd.nextInt(800).toLong, rnd.nextInt(800).toLong)
      val (x1, y1) = (x0 + rnd.nextInt(200), y0 + rnd.nextInt(200))
      val got = ZOrder.boxFilter(df, col("x"), col("y"), x0, x1, y0, y1)
        .select("id").as[Long].collect().toSet
      val want = df.where(col("x").between(x0, x1) && col("y").between(y0, y1))
        .select("id").as[Long].collect().toSet
      assert(got == want, s"box [$x0,$x1]x[$y0,$y1]")
    }
  }

  test("n-dim: column zValueN equals driver-side zOfN under heterogeneous budgets") {
    val rnd = new Random(83)
    val budgets = Seq(16, 12, 8)
    val rows = (1 to 500).map(_ =>
      (rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 12).toLong, rnd.nextInt(1 << 8).toLong))
    val got = rows.toDF("x", "y", "w")
      .select(col("x"), col("y"), col("w"),
        ZOrder.zValueN(Seq(col("x"), col("y"), col("w")), budgets).as("z"))
      .as[(Long, Long, Long, Long)].collect()
    got.foreach { case (x, y, w, z) =>
      assert(z == ZOrder.zOfN(Seq(x, y, w), budgets), s"($x, $y, $w)")
    }
    // compact codegen expression == composed shift/mask specification
    // (and null passthrough: any null dim nulls z, same as the + tree)
    val spec = rows.toDF("x", "y", "w")
      .select(
        ZOrder.zValueN(Seq(col("x"), col("y"), col("w")), budgets).as("fast"),
        ZOrder.zValueSpecN(Seq(col("x"), col("y"), col("w")), budgets).as("spec"))
      .as[(Long, Long)].collect()
    spec.foreach { case (fast, s) => assert(fast == s) }
    val withNull = Seq((Some(3L), 5L), (None, 7L))
      .toDF("x", "y")
      .select(ZOrder.zValueN(Seq(col("x"), col("y")), Seq(8, 8)).as("z"))
      .as[Option[Long]].collect()
    assert(withNull(0).isDefined && withNull(1).isEmpty)
    // level-order layout sanity: equal budgets reproduce 2-d Morton
    assert(ZOrder.zOfN(Seq(0xFFFFL, 0L), Seq(16, 16)) == 0x55555555L)
    // all-ones in every dim fills all budgeted positions contiguously
    assert(ZOrder.zOfN(Seq(0xFFFFL, 0xFFFL, 0xFFL), budgets) == (1L << 36) - 1)
  }

  test("3-d boxFilterN equals the direct box scan for random boxes") {
    val rnd = new Random(89)
    val budgets = Seq(10, 10, 6)
    val df = (1 to 3000).map(i =>
      (i.toLong, rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(64).toLong))
      .toDF("id", "x", "y", "w")
    for (_ <- 1 to 5) {
      val (x0, y0, w0) = (rnd.nextInt(800).toLong, rnd.nextInt(800).toLong, rnd.nextInt(40).toLong)
      val (x1, y1, w1) = (x0 + rnd.nextInt(200), y0 + rnd.nextInt(200), w0 + rnd.nextInt(24))
      val got = ZOrder.boxFilterN(df,
          Seq((col("x"), x0, x1), (col("y"), y0, y1), (col("w"), w0, w1)), budgets)
        .select("id").as[Long].collect().toSet
      val want = df.where(col("x").between(x0, x1) && col("y").between(y0, y1)
          && col("w").between(w0, w1))
        .select("id").as[Long].collect().toSet
      assert(got == want, s"box [$x0,$x1]x[$y0,$y1]x[$w0,$w1]")
    }
  }

  test("boxFilter rejects bounds that overflow the bit budget (silent row loss otherwise)") {
    val df = Seq((1L, 2L)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      ZOrder.boxFilter(df, col("x"), col("y"), 0L, 70000L, 0L, 10L)
    }
    intercept[IllegalArgumentException] {
      ZOrder.boxFilterN(df, Seq((col("x"), -1L, 5L)), Seq(8))
    }
  }

  test("3-d z-sorted layout: the z-range prunes and the box result matches the direct scan") {
    val rnd = new Random(97)
    val budgets = Seq(10, 10, 6)
    val df = (1 to 5000).map(i =>
      (i.toLong, rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong, rnd.nextInt(64).toLong))
      .toDF("id", "x", "y", "w")
    val path = java.nio.file.Files.createTempDirectory("zorder3").toString + "/t"
    ZOrder.writeZOrderedN(df, Seq(col("x"), col("y"), col("w")), budgets, path)
    val reread = spark.read.parquet(path)
    val (lo, hi) = (Seq(100L, 100L, 8L), Seq(500L, 500L, 40L))
    val q = reread.where(col("z").between(
        ZOrder.zOfN(lo, budgets), ZOrder.zOfN(hi, budgets)))
      .where(col("x").between(lo(0), hi(0)) && col("y").between(lo(1), hi(1))
        && col("w").between(lo(2), hi(2)))
    val plan = q.queryExecution.executedPlan.toString
    // PushedFilters renders truncated with this many predicates, so
    // assert the lower bound there and both bounds on the Filter node
    assert(plan.contains("GreaterThanOrEqual(z,"),
      s"z-range must push to the scan for row-group pruning:\n$plan")
    assert("z#\\d+L <= ".r.findFirstIn(plan).isDefined, plan)
    val want = df.where(col("x").between(lo(0), hi(0)) && col("y").between(lo(1), hi(1))
      && col("w").between(lo(2), hi(2))).count()
    assert(q.count() == want)
  }

  test("z-sorted layout: the z-range reaches the parquet scan as pushed filters") {
    val rnd = new Random(79)
    val df = (1 to 5000).map(i =>
      (i.toLong, rnd.nextInt(4096).toLong, rnd.nextInt(4096).toLong))
      .toDF("id", "x", "y")
    val path = java.nio.file.Files.createTempDirectory("zorder").toString + "/t"
    ZOrder.writeZOrdered(df, col("x"), col("y"), path)
    val reread = spark.read.parquet(path)
    val q = reread.where(col("z").between(
        ZOrder.zOf(100, 100), ZOrder.zOf(400, 400)))
      .where(col("x").between(100, 400) && col("y").between(100, 400))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(z,") && plan.contains("LessThanOrEqual(z,"),
      s"z-range must push to the scan for row-group pruning:\n$plan")
    val want = df.where(col("x").between(100, 400) && col("y").between(100, 400)).count()
    assert(q.count() == want)
  }

  test("layout writer file count responds to the files / maxRecordsPerFile knobs") {
    def parquetFiles(dir: String): Int =
      new java.io.File(dir).listFiles().count(f =>
        f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    val rnd = new Random(80)
    val df = (1 to 1000).map(i =>
      (i.toLong, rnd.nextInt(4096).toLong, rnd.nextInt(4096).toLong))
      .toDF("id", "x", "y")
    val base = java.nio.file.Files.createTempDirectory("zorder_files").toString
    // consolidate: exactly 2 range partitions → 2 files
    ZOrder.writeZOrdered(df, col("x"), col("y"), s"$base/two", files = 2)
    assert(parquetFiles(s"$base/two") == 2)
    // cap: 2 partitions × ≤100 records/file → ≥10 files, rows intact
    ZOrder.writeZOrdered(df, col("x"), col("y"), s"$base/cap",
      files = 2, maxRecordsPerFile = 100)
    assert(parquetFiles(s"$base/cap") >= 10)
    assert(spark.read.parquet(s"$base/cap").count() == 1000)
  }
}
