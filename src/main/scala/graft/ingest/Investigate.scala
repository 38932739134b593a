package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** --investigate mode (A5/F18; scripts/ingest/e621_db_export/
  * main.py:132–186): profile the `source` column of an e621 dump —
  * protocol counts, source-domain counts, raw-domain counts, twitter
  * usernames, and the count of posts with ", "-joined (probably
  * mis-formatted) sources. The reference's four driver-side Counters
  * become one grouped aggregation per kind, unioned into a tidy
  * (kind, value, n) report.
  */
object Investigate {

  def e621Sources(csv: DataFrame): DataFrame = {
    val s = csv.sparkSession
    import s.implicits._
    val lines = csv
      .filter(length(trim(col("source"))) > 0)
      .select(col("id"),
        explode(transform(split(col("source"), "\n"), l => trim(l))).as("link"))
    val parsed = lines
      .withColumn("has_proto", col("link").contains("://"))
      .withColumn("protocol",
        when(col("has_proto"), substring_index(col("link"), "://", 1)))
      // Python splits at the FIRST "://" (main.py:146); substring_index
      // with -1 would split at the last, so use locate.
      .withColumn("rest0",
        when(col("has_proto"), expr("substring(link, locate('://', link) + 3)"))
          .otherwise(col("link")))
      .withColumn("rest",
        when(col("rest0").startsWith("www."), expr("substring(rest0, 5)"))
          .otherwise(col("rest0")))
      .withColumn("is_raw", !col("rest").contains("/"))
      .withColumn("domain",
        when(!col("is_raw"), substring_index(col("rest"), "/", 1)))
      .withColumn("path",
        when(!col("is_raw"), expr("substring(rest, length(domain) + 2)")))
      .withColumn("twitter_username",
        when(col("domain") === "twitter.com",
          substring_index(substring_index(col("path"), "/", 1), "?", 1)))
    def counted(kind: String, c: String) = parsed
      .filter(col(c).isNotNull)
      .groupBy(col(c).as("value")).agg(count(lit(1)).as("n"))
      .select(lit(kind).as("kind"), col("value"), col("n"))
    counted("protocol", "protocol")
      .unionByName(counted("domain", "domain"))
      .unionByName(parsed.filter(col("is_raw"))
        .groupBy(col("rest").as("value")).agg(count(lit(1)).as("n"))
        .select(lit("raw_domain").as("kind"), col("value"), col("n")))
      .unionByName(counted("twitter", "twitter_username"))
      .unionByName(lines.filter(col("link").contains(", "))
        .select(col("id")).distinct()
        .agg(count(lit(1)).as("n"))
        .select(lit("probably_wrong").as("kind"), lit("posts").as("value"), col("n")))
  }
}
