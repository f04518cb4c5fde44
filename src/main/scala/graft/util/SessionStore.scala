package graft.util

import java.util.concurrent.{CompletableFuture, ConcurrentHashMap}
import java.util.concurrent.atomic.AtomicLong

/** Session-scoped build-once parquet artifacts — the amortized-offline-
  * job discipline behind the incremental graph-maintenance queries
  * (q191/q192) and cousins of [[graft.ext.Similarity]]'s session
  * indexes: a production deployment pays the settled-store build once
  * (a scheduled job, or the previous batch's output) and each batch
  * pays ONLY the maintenance cost against the persisted relation.
  * Registering the maintenance query over this store prices exactly
  * that operating cost; the build runs in-query on first touch so the
  * driver's correctness gate still verifies the whole derivation.
  *
  * Cache-safety (the KMeans.sessionCluster discipline): callers fold
  * [[dirFingerprint]] into the key so a changed fixture can never
  * serve a stale artifact, and the expensive build runs OUTSIDE any
  * map lock (`putIfAbsent` of a future; losers block on the future,
  * not a hash-bin lock).
  */
object SessionStore {

  private lazy val root: String = {
    val p = java.nio.file.Files.createTempDirectory("graft_store")
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(p.toFile)
    }
    p.toString
  }
  private val seq = new AtomicLong(0)
  private val built = new ConcurrentHashMap[String, CompletableFuture[String]]()

  /** Number of builds actually paid this session — exposed so the
    * memoization specs can pin build-once. */
  private[graft] val buildCount = new AtomicLong(0)

  /** Cheap content fingerprint of an on-disk table directory: file
    * names, lengths, and mtimes (no Spark job). Parquet fixtures are
    * write-once, so any regeneration moves at least one (length,
    * mtime) pair and invalidates every key built over the old data. */
  def dirFingerprint(dir: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles).toSeq.flatten.sortBy(_.getName).flatMap(walk)
      else Seq(f)
    val h = java.security.MessageDigest.getInstance("MD5")
    walk(new java.io.File(dir)).foreach { f =>
      h.update(s"${f.getPath}|${f.length}|${f.lastModified}\n".getBytes("UTF-8"))
    }
    h.digest().map("%02x".format(_)).mkString.take(16)
  }

  /** [[dirFingerprint]] through the Hadoop FileSystem API — correct on
    * ANY filesystem (HDFS/S3/local), where the java.io.File walk
    * silently degenerates to a constant on non-local paths and a cache
    * keyed on it would never invalidate. Use this for MAINTAINED store
    * paths (caller-provided, possibly remote); the plain
    * [[dirFingerprint]] stays for the driver-local fixture dirs. */
  def hadoopDirFingerprint(spark: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val h = java.security.MessageDigest.getInstance("MD5")
    def walk(st: org.apache.hadoop.fs.FileStatus): Unit =
      if (st.isDirectory)
        fs.listStatus(st.getPath).sortBy(_.getPath.getName).foreach(walk)
      else h.update(
        s"${st.getPath}|${st.getLen}|${st.getModificationTime}\n"
          .getBytes("UTF-8"))
    if (fs.exists(p)) walk(fs.getFileStatus(p))
    h.digest().map("%02x".format(_)).mkString.take(16)
  }

  /** Returns the artifact directory for `key`, running `build` into a
    * fresh scratch path the first time this session sees the key. */
  def getOrBuild(key: String, prefix: String)(build: String => Unit): String = {
    val holder = new CompletableFuture[String]
    Option(built.putIfAbsent(key, holder)).getOrElse {
      try {
        buildCount.incrementAndGet()
        val p = s"$root/$prefix-${seq.incrementAndGet()}"
        build(p)
        holder.complete(p)
      } catch {
        case e: Throwable =>
          built.remove(key, holder)
          holder.completeExceptionally(e)
          throw e
      }
      holder
    }.join()
  }
}
