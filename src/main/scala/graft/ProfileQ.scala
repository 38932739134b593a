package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable
/** Dev-only: task-metric profile of one query's WARM run (3rd of 3). */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val q = args(0)
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]"), 32).getOrCreate()
    GraftSession.requireSqlSurface(spark)
    spark.sparkContext.setLogLevel("WARN")
    val runTime = mutable.Map[Int, Long]().withDefaultValue(0L)
    val maxTask = mutable.Map[Int, Long]().withDefaultValue(0L)
    val nTasks = mutable.Map[Int, Int]().withDefaultValue(0)
    val names = mutable.Map[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        runTime(te.stageId) += te.taskMetrics.executorRunTime
        maxTask(te.stageId) = math.max(maxTask(te.stageId), te.taskMetrics.executorRunTime)
        nTasks(te.stageId) += 1
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        names(sc.stageInfo.stageId) = sc.stageInfo.details.split("\n")
          .find(l => l.contains("graft") && !l.contains("ProfileQ")).getOrElse("").trim.take(70)
    })
    for (r <- 1 to 3) {
      Thread.sleep(300); runTime.clear(); maxTask.clear(); nTasks.clear(); names.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      Thread.sleep(500)
      println(f"[prof] $q run$r wall=$wall%6.2f s cpu=${runTime.values.sum / 1000.0}%7.2f s")
      if (r == 3) runTime.toSeq.sortBy(-_._2).take(10).foreach { case (id, ms) =>
        println(f"[prof]   stage $id%3d cpu=${ms / 1000.0}%6.2f s maxTask=${maxTask(id) / 1000.0}%5.2f tasks=${nTasks(id)}%3d ${names.getOrElse(id, "")}")
      }
    }
    spark.stop()
  }
}
