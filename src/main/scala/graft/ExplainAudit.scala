package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: print formatted physical plans for named driver-contract
  * queries (scale audit — exchanges, pushed filters, codegen spans).
  * runMain graft.ExplainAudit <query> [query...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ExplainAudit <query name>...")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { q =>
      println(s"===== $q =====")
      SparkEntry.queries(q)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
