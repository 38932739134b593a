package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.{Dedup, IvfAnn, Similarity, SimhashPairs}

/** Dev-only: empirical recall probes for the sketch-family queries, to
  * decide whether their decisions can be locked by exact oracles. */
object ProbeOracles {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = t(spark, d, "documents")

    // exact all-pairs ground truth at J>=0.8 (Spark-side; small sf only)
    val sh = docs.select($"doc_id".as("doc"), Dedup.shingles($"text").as("sh")).persist()
    val truth = sh.as("a").join(sh.as("b"), $"a.doc" < $"b.doc")
      .withColumn("j", Dedup.jaccard($"a.sh", $"b.sh"))
      .filter($"j" >= 0.8)
      .select($"a.doc".as("doc_a"), $"b.doc".as("doc_b")).persist()
    val nTruth = truth.count()

    // minhash LSH pairs, bands=4 and bands=8
    for (bands <- Seq(4, 8)) {
      val got = Dedup.minhashLshPairs(docs, "doc_id", "text", 32, bands, 0.8)
        .select($"doc_a", $"doc_b")
      val missed = truth.except(got).count()
      val extra = got.except(truth).count()
      println(s"[probe] minhash bands=$bands truth=$nTruth missed=$missed extra=$extra")
    }

    // simhash chunk candidates verified by jaccard
    val simGot = {
      val cands = SimhashPairs.pairs(docs, "doc_id", "text", maxHamming = 63, chunks = 4)
        .select($"doc_a", $"doc_b")
      cands.join(sh.select($"doc".as("doc_a"), $"sh".as("sh_a")), Seq("doc_a"))
        .join(sh.select($"doc".as("doc_b"), $"sh".as("sh_b")), Seq("doc_b"))
        .withColumn("j", Dedup.jaccard($"sh_a", $"sh_b"))
        .filter($"j" >= 0.8).select($"doc_a", $"doc_b")
    }
    println(s"[probe] simhash-chunk truth=$nTruth missed=${truth.except(simGot).count()}")
    // hamming distribution of true pairs
    val simh = docs.select($"doc_id", Dedup.simhash($"text").as("s"))
    truth.join(simh.select($"doc_id".as("doc_a"), $"s".as("sa")), Seq("doc_a"))
      .join(simh.select($"doc_id".as("doc_b"), $"s".as("sb")), Seq("doc_b"))
      .select(Dedup.hamming($"sa", $"sb").as("h"))
      .groupBy("h").count().orderBy("h").show(30)

    // ANN exactness vs brute force (same tie-breaks)
    val emb = t(spark, d, "embeddings")
    val qs = emb.filter($"vec_id" < 20)
    val brute = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"qid").orderBy($"cos".desc, $"nid".asc)
      emb.select($"vec_id".as("nid"), $"embedding".as("nv"))
        .crossJoin(broadcast(qs.select($"vec_id".as("qid"), $"embedding".as("qv"))))
        .filter($"nid" =!= $"qid")
        .withColumn("cos", Similarity.cosine($"qv", $"nv"))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= 3)
        .select($"qid", $"rank".cast("long").as("rank"), $"nid")
    }.persist()
    for (nPlanes <- Seq(4, 6, 8)) {
      val got = Similarity.annLsh(emb, "vec_id", "embedding", qs, k = 3, nPlanes = nPlanes)
        .select($"qid", $"rank", $"nid")
      println(s"[probe] annLsh planes=$nPlanes diff=${brute.except(got).count()} rows=${got.count()}")
    }
    for (nprobe <- Seq(2, 4, 8, 16)) {
      val cents = IvfAnn.centroids(emb, "vec_id", "embedding", c = 16)
      val assigned = IvfAnn.assign(emb, "vec_id", "embedding", cents)
      val got = IvfAnn.search(assigned, "vec_id", "embedding", cents, qs, k = 3, nprobe = nprobe)
        .select($"qid", $"rank", $"nid")
      println(s"[probe] ivf nprobe=$nprobe diff=${brute.except(got).count()} rows=${got.count()}")
    }
    spark.stop()
  }
}
