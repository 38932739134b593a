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

  /** fuzzysearch --investigate (fuzzysearch/main.py:153–186): profile
    * the dump — row count, earliest updated_at, per-site counts,
    * unique weasyl usernames, and usernames with characters outside
    * each site's allowed set (weasyl: printable ASCII, main.py:41; FA:
    * letters+digits+"-_.~[]^`" on the lowercased name, main.py:40,178).
    * The reference's driver-side sets/Counters become grouped
    * aggregations unioned into the same tidy (kind, value, n) report
    * shape as [[e621Sources]]. e621 rows skip username checks
    * (main.py:170–171). */
  def fuzzysearchDump(csv: DataFrame): DataFrame = {
    val weasylPrintable = "^[\\x20-\\x7E\\t\\n\\r\\x0B\\x0C]*$"
    val faCharset = "^[a-z0-9\\-_.~\\[\\]^`]*$"
    val total = csv.agg(count(lit(1)).as("n"))
      .select(lit("rows").as("kind"), lit("csv").as("value"), col("n"))
    val earliest = csv.filter(length(col("updated_at")) > 0)
      .agg(min(col("updated_at")).as("value"))
      .select(lit("earliest").as("kind"), col("value"), lit(1L).as("n"))
    val sites = csv.groupBy(col("site").as("value"))
      .agg(count(lit(1)).as("n"))
      .select(lit("site").as("kind"), col("value"), col("n"))
    val weasyl = csv.filter(col("site") === "weasyl")
    val uniqueWeasyl = weasyl.select("artists").distinct()
      .agg(count(lit(1)).as("n"))
      .select(lit("weasyl_usernames").as("kind"), lit("unique").as("value"), col("n"))
    val oddWeasyl = weasyl
      .filter(!coalesce(col("artists"), lit("")).rlike(weasylPrintable))
      .groupBy(col("artists").as("value")).agg(count(lit(1)).as("n"))
      .select(lit("odd_weasyl").as("kind"), col("value"), col("n"))
    val oddFa = csv.filter(col("site") === "furaffinity" &&
        !coalesce(lower(col("artists")), lit("")).rlike(faCharset))
      .groupBy(col("artists").as("value")).agg(count(lit(1)).as("n"))
      .select(lit("odd_fa").as("kind"), col("value"), col("n"))
    total.unionByName(earliest).unionByName(sites).unionByName(uniqueWeasyl)
      .unionByName(oddWeasyl).unionByName(oddFa)
  }
}
