package graft.tools

import graft.SparkEntry
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Optimization-round artifact dumper: writes
  * plans/r21/<query>_<suffix>.txt with the full
  * `.explain("formatted")` output for each named query.
  * Usage: runMain graft.tools.DumpPlansR21 <before|after> q1 q2 ...
  */
object DumpPlansR21 {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DumpPlansR21 <suffix> <query>...")
    val suffix = args.head
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("plans/r21"))
    for (q <- args.tail) {
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/r21/${q}_$suffix.txt"), txt)
      println(s"wrote plans/r21/${q}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
