package graft

import org.apache.spark.sql.SparkSession
import pipeline.Sessions

/** Prints a declared query's full result rows (sorted textually) — used to
  * prove output identity across an optimization without the full Verify
  * parquet round trip. runMain graft.ShowQuery <query> [query...]
  */
object ShowQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.tune(spark)
    val (flags, names) = args.partition(_.startsWith("--"))
    val stream = flags.contains("--stream")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (stream) {
        // order-sensitive incremental hash over toLocalIterator (for
        // results too large to collect; requires the query itself to have
        // a deterministic total order)
        val md = java.security.MessageDigest.getInstance("MD5")
        var n = 0L
        df.toLocalIterator().forEachRemaining { r =>
          md.update(r.toString.getBytes("UTF-8")); md.update('\n'.toByte)
          n += 1
        }
        println(s"SQ $name rows=$n md5=" +
          md.digest().map("%02x".format(_)).mkString)
      } else {
        val rows = df.collect().map(_.toString).sorted
        println(s"SQ $name rows=${rows.length} md5=" +
          java.security.MessageDigest.getInstance("MD5")
            .digest(rows.mkString("\n").getBytes("UTF-8"))
            .map("%02x".format(_)).mkString)
        rows.take(5).foreach(r => println(s"SQ   $r"))
      }
    }
    spark.stop()
  }
}
