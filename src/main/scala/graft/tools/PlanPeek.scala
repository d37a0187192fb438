package graft.tools
import graft.SparkEntry
import org.apache.spark.sql.SparkSession
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      println(s"===== $q")
      println(SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Join") ||
          l.contains("Aggregate") || l.contains("Window") || l.contains("Scan") ||
          l.contains("Sort") || l.contains("Generate") || l.contains("Expand"))
        .map(_.take(140)).mkString("\n"))
    }
    spark.stop()
  }
}
