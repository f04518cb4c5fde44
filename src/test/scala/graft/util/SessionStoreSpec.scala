package graft.util

// SparkSuite (not bare AnyFunSuite): hadoopDirFingerprint needs the
// session's hadoopConfiguration
class SessionStoreSpec extends graft.SparkSuite {

  test("getOrBuild builds once per key and returns the same artifact") {
    val before = SessionStore.buildCount.get()
    var builds = 0
    def build(p: String): Unit = { builds += 1; assert(new java.io.File(p).mkdirs()) }
    val p1 = SessionStore.getOrBuild("spec|once", "t")(build)
    val p2 = SessionStore.getOrBuild("spec|once", "t")(build)
    assert(p1 == p2)
    assert(builds == 1)
    assert(SessionStore.buildCount.get() == before + 1)
  }

  test("a failed build is not cached — the key rebuilds on retry") {
    val e = intercept[RuntimeException] {
      SessionStore.getOrBuild("spec|bad", "t")(_ => throw new RuntimeException("boom"))
    }
    assert(e.getMessage == "boom")
    val p = SessionStore.getOrBuild("spec|bad", "t") { p =>
      assert(new java.io.File(p).mkdirs())
    }
    assert(new java.io.File(p).exists())
  }

  test("dirFingerprint moves when a file's content length changes") {
    val d = java.nio.file.Files.createTempDirectory("fp_spec").toFile
    val f = new java.io.File(d, "part-0.parquet")
    java.nio.file.Files.write(f.toPath, "one".getBytes("UTF-8"))
    val fp1 = SessionStore.dirFingerprint(d.toString)
    java.nio.file.Files.write(f.toPath, "longer".getBytes("UTF-8"))
    val fp2 = SessionStore.dirFingerprint(d.toString)
    assert(fp1 != fp2)
    // and it is stable when nothing changed
    assert(SessionStore.dirFingerprint(d.toString) == fp2)
  }

  test("hadoopDirFingerprint moves on append, is stable otherwise, and handles absent dirs") {
    // the store-fold cache keys on this (maintained store paths may be
    // remote — the java.io.File walk degenerates to a constant there)
    val d = java.nio.file.Files.createTempDirectory("hfp_spec").toFile
    val f = new java.io.File(d, "part-0.parquet")
    java.nio.file.Files.write(f.toPath, "one".getBytes("UTF-8"))
    val fp1 = SessionStore.hadoopDirFingerprint(spark, d.toString)
    assert(SessionStore.hadoopDirFingerprint(spark, d.toString) == fp1)
    java.nio.file.Files.write(new java.io.File(d, "part-1.parquet").toPath,
      "two".getBytes("UTF-8"))
    val fp2 = SessionStore.hadoopDirFingerprint(spark, d.toString)
    assert(fp1 != fp2)
    // absent dir: a well-defined constant, no throw
    val absent = SessionStore.hadoopDirFingerprint(spark,
      d.toString + "/nope")
    assert(absent.nonEmpty)
  }
}
