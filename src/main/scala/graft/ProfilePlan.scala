package graft
import org.apache.spark.sql.SparkSession
object ProfilePlan {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.operators.Dedup.multiSketchPairs(
      Tables.t(spark, sfDir, "documents"), "doc_id", "text", 0.8)
    println("=== FORMATTED ===")
    println(q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")).take(12000))
    spark.stop()
  }
}
