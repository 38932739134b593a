package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Fixtures
import graft.engine.Model._
import graft.maintenance.Repair

/** Q12 — the dedup/orphan repair pipeline over the fixture corpus with
  * deterministically injected duplicates and orphans; the oracle is the
  * hand-computed survivor count per table (remove_duplicates.py window
  * and anti-join semantics, A7-fixed pass order). */
object MaintenanceQ {

  type Q = (SparkSession, String) => DataFrame

  private def ts(s: String) = Timestamp.valueOf(s)

  private val q41Repair: Q = (s, _) => {
    import s.implicits._
    // inject: 1 dup user, 1 dup submission snapshot, 1 dup file (same
    // (snapshot, site_file_id), higher id wins), 1 dup hash (same
    // (file, algo), higher id wins), 1 orphan keyword/file/hash
    val users = Fixtures.userSnapshots(s).union(Seq(
      UserSnapshotRow(299L, "fa", "u9", ts("2022-01-05 10:00:00"), 1L,
        ts("2022-06-09 00:00:00"), is_deleted = false, Some("Dup"), None)).toDF())
    val snaps = Fixtures.submissionSnapshots(s).union(Seq(
      SubmissionSnapshotRow(199L, "fa", "s1", ts("2022-01-01 10:00:00"), 1L,
        ts("2022-06-09 00:00:00"), None, is_deleted = false, Some("Dup"),
        None, None, keywords_recorded = false, None)).toDF())
    val keywords = Fixtures.keywords(s).union(Seq(
      KeywordRow(999L, 888L, "orphan", None)).toDF())
    val files = Fixtures.files(s).union(Seq(
      FileRow(99L, 101L, Some("f-main"), Some("https://cdn.fa/1.png"), Some(1000L), None),
      FileRow(98L, 777L, Some("orphan"), None, None, None)).toDF())
    val hashes = Fixtures.fileHashes(s).union(Seq(
      FileHashRow(9L, 5L, 3L, Array[Byte](9)),
      FileHashRow(98L, 404L, 1L, Array[Byte](8))).toDF())

    val r = Repair.repairAll(users, snaps, keywords, files, hashes)
    // ONE aggregation for all ten counts: every table contributes
    // (name, kind) marker rows into a single union, and one groupBy
    // produces the report — one shuffle and one job instead of ten
    // global aggregates (job-launch overhead dominated at fixture
    // scale even when the eager count() actions became lazy ones)
    def tagged(name: String, df: DataFrame, kind: String) =
      df.select(lit(name).as("table_name"), lit(kind).as("kind"))
    val tables = Seq(
      ("user_snapshots", users, r.users),
      ("submission_snapshots", snaps, r.snapshots),
      ("keywords", keywords, r.keywords),
      ("files", files, r.files),
      ("hashes", hashes, r.hashes))
    val counts = tables
      .map { case (name, in, out) =>
        tagged(name, in, "in").union(tagged(name, out, "out"))
      }
      .reduce(_ union _)
      .groupBy("table_name")
      .agg(count(when($"kind" === "in", 1)).as("n_input"),
        count(when($"kind" === "out", 1)).as("n_survivors"))
    // keep the one-row-per-table invariant: an EMPTY input table must
    // still report (0, 0), not vanish from the union
    tables.map(_._1).toDF("table_name")
      .join(counts, Seq("table_name"), "left")
      .select($"table_name",
        coalesce($"n_input", lit(0L)).as("n_input"),
        coalesce($"n_survivors", lit(0L)).as("n_survivors"))
  }

  val queries: Map[String, Q] = Map("q41_repair" -> q41Repair)

  val oracles: Map[String, String] = Map(
    "q41_repair" ->
      """SELECT table_name, CAST(n_input AS BIGINT) AS n_input,
        | CAST(n_survivors AS BIGINT) AS n_survivors
        |FROM (VALUES
        | ('user_snapshots', 4, 3),
        | ('submission_snapshots', 5, 4),
        | ('keywords', 6, 5),
        | ('files', 7, 5),
        | ('hashes', 7, 4)
        |) t(table_name, n_input, n_survivors)""".stripMargin)
}
