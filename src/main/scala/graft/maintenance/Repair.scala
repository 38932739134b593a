package graft.maintenance

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Q12 — offline dedup/orphan repair (SURVEY §2.5 A6 + §2.4 J4;
  * scripts/cron/remove_duplicates.py). In the reference this is four
  * window-dedup DELETEs plus three orphan anti-join DELETEs against
  * Postgres; here each pass returns the *surviving* rows so the caller
  * rewrites the parquet table (delete = rewrite in immutable storage).
  *
  * Window orders replicate the reference exactly: duplicate hashes and
  * files keep the HIGHEST id (remove_duplicates.py:113, 167), duplicate
  * snapshots and users keep the LOWEST (259–260, 296).
  *
  * Pass order diverges deliberately (SURVEY Appendix A7): the reference
  * runs `remove_orphaned_keywords` BEFORE submission dedup
  * (remove_duplicates.py:310–328), so each run leaves fresh orphans for
  * the next; we run all dedup passes first, then orphan passes, so one
  * run converges.
  *
  * Scale: each dedup is one shuffle on its entity key; orphan checks
  * are left_semi joins on ids (broadcast when the parent side is small
  * after AQE).
  */
object Repair {

  private def keepFirst(df: DataFrame, partition: Seq[String], orderCol: String,
      desc: Boolean): DataFrame = {
    val w = Window.partitionBy(partition.map(col): _*)
      .orderBy(if (desc) col(orderCol).desc else col(orderCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** remove_duplicates.py:296 (keep lowest id). */
  def dedupUserSnapshots(users: DataFrame): DataFrame =
    keepFirst(users,
      Seq("website_id", "site_user_id", "scan_datetime", "archive_contributor_id"),
      "user_snapshot_id", desc = false)

  /** remove_duplicates.py:259–260 (keep lowest id). */
  def dedupSubmissionSnapshots(snaps: DataFrame): DataFrame =
    keepFirst(snaps,
      Seq("website_id", "site_submission_id", "scan_datetime", "archive_contributor_id"),
      "submission_snapshot_id", desc = false)

  /** remove_duplicates.py:167 (keep highest id). */
  def dedupFiles(files: DataFrame): DataFrame =
    keepFirst(files, Seq("submission_snapshot_id", "site_file_id"),
      "file_id", desc = true)

  /** remove_duplicates.py:113 (keep highest id). */
  def dedupFileHashes(hashes: DataFrame): DataFrame =
    keepFirst(hashes, Seq("file_id", "algo_id"), "hash_id", desc = true)

  /** J4 orphan removal: children whose parent id no longer exists
    * (remove_duplicates.py:87–104, 141–158, 197–214) — survivors via
    * left_semi instead of the reference's LEFT JOIN…IS NULL delete. */
  def removeOrphans(child: DataFrame, parent: DataFrame, key: String): DataFrame =
    child.join(parent.select(key).distinct(), Seq(key), "left_semi")

  case class RepairResult(
      users: DataFrame, snapshots: DataFrame, keywords: DataFrame,
      files: DataFrame, hashes: DataFrame)

  /** Full repair run — dedup everything, then drop orphans (A7-fixed
    * order). */
  def repairAll(users: DataFrame, snaps: DataFrame, keywords: DataFrame,
      files: DataFrame, hashes: DataFrame): RepairResult = {
    val dUsers = dedupUserSnapshots(users)
    val dSnaps = dedupSubmissionSnapshots(snaps)
    val dFiles0 = dedupFiles(files)
    val dHashes0 = dedupFileHashes(hashes)
    val dKeywords = removeOrphans(keywords, dSnaps, "submission_snapshot_id")
    val dFiles = removeOrphans(dFiles0, dSnaps, "submission_snapshot_id")
    val dHashes = removeOrphans(dHashes0, dFiles, "file_id")
    RepairResult(dUsers, dSnaps, dKeywords, dFiles, dHashes)
  }
}
