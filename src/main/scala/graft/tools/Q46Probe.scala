package graft.tools

import org.apache.spark.sql.SparkSession

/** Temporary q46 cost breakdown probe. */
object Q46Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.util.Tables.table(spark, sfDir, "embeddings")
    emb.count() // warm
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[q46probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    for (i <- 1 to 3) {
      time(s"prepared #$i")(graft.ext.Similarity.prepared(emb).count())
      time(s"candidates #$i")(graft.ext.Similarity.cosineLshCandidates(emb, 64).count())
      time(s"full q46 #$i")(graft.ext.Similarity.cosineDupPairs(emb, 0.4, 64).count())
    }
    spark.stop()
  }
}
