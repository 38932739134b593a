package graft.storage

import org.apache.spark.sql.SparkSession

/** Schema bootstrap — the parquet-world analog of running
  * faexport_db/schema/faexport_db.sql: seeds the dimension tables the
  * ingests reference (websites fa_indexer/main.py:27, e621 main.py:24,
  * fuzzysearch main.py:26–29; hash algos e621:27, fuzzysearch:29–30,
  * findfurrypicbot:22–25) and the settings version row
  * (faexport_db.sql:116–124). Idempotent via dimension upserts.
  *
  * Hash-algo id assignments (stable across every converter):
  * 1 any/md5, 2 rust/dhash, 3 python/phash, 4 any/sha256,
  * 5 python/ahash, 6 python/dhash, 7 python/whash.
  */
object Bootstrap {

  def init(storage: Storage, spark: SparkSession): Unit = {
    import spark.implicits._
    storage.upsertDimension("websites", Seq(
      ("fa", "Fur Affinity", "https://furaffinity.net"),
      ("e621", "e621", "https://e621.net"),
      ("weasyl", "Weasyl", "https://weasyl.com"))
      .toDF("website_id", "full_name", "link"), Seq("website_id"))
    storage.upsertDimension("hash_algos", Seq(
      (1L, "any", "md5"),
      (2L, "rust", "dhash"),
      (3L, "python", "phash"),
      (4L, "any", "sha256"),
      (5L, "python", "ahash"),
      (6L, "python", "dhash"),
      (7L, "python", "whash"))
      .toDF("algo_id", "language", "algorithm_name"), Seq("algo_id"))
    storage.initSettings()
  }
}
