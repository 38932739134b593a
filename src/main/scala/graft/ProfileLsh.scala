package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-20s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    time("shingles")(sh.write.format("noop").mode("overwrite").save().asInstanceOf[Unit] match { case _ => docs.count() })
    val sig = sh.select(col("doc_id"), Dedup.minhashSignature(col("sh"), 32).as("sig"))
    time("signatures")(sig.write.format("noop").mode("overwrite").save().asInstanceOf[Unit] match { case _ => 0L })
    val banded = sh.select(col("doc_id"),
      explode(Dedup.bandKeys(Dedup.minhashSignature(col("sh"), 32), 32, 4)).as("band"))
    time("banded")(banded.write.format("noop").mode("overwrite").save().asInstanceOf[Unit] match { case _ => 0L })
    val bandedCols = banded.select(col("doc_id"), col("band.band_id").as("band_id"), col("band.band_hash").as("band_hash"))
    val pairs = bandedCols.select(col("band_id"), col("band_hash"), col("doc_id").as("doc_a"))
      .join(bandedCols.select(col("band_id"), col("band_hash"), col("doc_id").as("doc_b")), Seq("band_id","band_hash"))
      .filter(col("doc_a") < col("doc_b")).select("doc_a","doc_b").distinct()
    time("pairs")(pairs.count())
    spark.stop()
  }
}
