package graft.engine

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

import Model._

/** Deterministic in-memory fixture dataset per FIXTURES.md §1 — the
  * minimal merge-exercising corpus: 1 website with 2 submissions (one
  * with 3 snapshots covering coalesce/JSON-merge/file-clash/keyword
  * resolution, one trivial), 2 users, 2 contributors, 3 hash algos.
  * Used by the faexport entity queries (oracle = literal VALUES, hand
  * computed from the reference semantics) and by the ScalaTest specs.
  */
object Fixtures {

  private def ts(s: String) = Timestamp.valueOf(s)
  private def bytes(hex: String): Array[Byte] =
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  def websites(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      WebsiteRow("fa", "Fur Affinity", "https://furaffinity.net"),
      WebsiteRow("ws", "Weasyl", "https://weasyl.com")).toDF()
  }

  def contributors(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      ContributorRow(1L, "alice", "key-a"),
      ContributorRow(2L, "bob", "key-b")).toDF()
  }

  def hashAlgos(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      HashAlgoRow(1L, "any", "md5"),
      HashAlgoRow(2L, "rust", "dhash"),
      HashAlgoRow(3L, "python", "phash")).toDF()
  }

  def submissionSnapshots(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      // s1: three snapshots — latest is_deleted, coalesce chains, JSON
      // overlay, keyword re-record, file clash (FIXTURES.md §1)
      SubmissionSnapshotRow(101L, "fa", "s1", ts("2022-01-01 10:00:00"), 1L,
        ts("2022-06-01 00:00:00"), Some("u9"), is_deleted = false,
        Some("First Title"), None, Some(ts("2021-12-25 00:00:00")),
        keywords_recorded = true, Some("""{"rating":"general","views":10}""")),
      SubmissionSnapshotRow(102L, "fa", "s1", ts("2022-02-01 10:00:00"), 2L,
        ts("2022-06-02 00:00:00"), None, is_deleted = false,
        None, Some("A description"), None,
        keywords_recorded = false, Some("""{"views":25,"fav_count":3}""")),
      SubmissionSnapshotRow(103L, "fa", "s1", ts("2022-03-01 10:00:00"), 1L,
        ts("2022-06-03 00:00:00"), None, is_deleted = true,
        Some("Final Title"), None, None,
        keywords_recorded = true, None),
      // s2: single snapshot
      SubmissionSnapshotRow(104L, "fa", "s2", ts("2022-01-15 10:00:00"), 1L,
        ts("2022-06-01 00:00:00"), Some("u1"), is_deleted = false,
        Some("Solo"), Some("d"), None,
        keywords_recorded = false, Some("""{"x":1}"""))).toDF()
  }

  def keywords(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      KeywordRow(1L, 101L, "dragon", Some(0)),
      KeywordRow(2L, 101L, "art", Some(1)),
      // 103 re-records unordered keywords → wins wholesale, sorted by
      // (ordinal nulls-last, keyword) → art, beta, wolf
      KeywordRow(3L, 103L, "wolf", None),
      KeywordRow(4L, 103L, "art", None),
      KeywordRow(5L, 103L, "beta", None)).toDF()
  }

  def files(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      FileRow(1L, 101L, Some("f-main"), Some("https://cdn.fa/1.png"), Some(1000L),
        Some("""{"width":800}""")),
      // non-clashing update (url null): extra merged, dhash appended
      FileRow(2L, 102L, Some("f-main"), None, Some(1000L),
        Some("""{"height":600}""")),
      // clashing update (url differs): replaces f-main wholesale
      FileRow(3L, 103L, Some("f-main"), Some("https://cdn.fa/1-new.png"), Some(2000L),
        None),
      FileRow(4L, 103L, Some("f-thumb"), Some("https://cdn.fa/1-thumb.jpg"), Some(500L),
        None),
      // s2: null site_file_id is a valid key (submission.py:95)
      FileRow(5L, 104L, None, Some("https://cdn.fa/2.png"), Some(42L), None)).toDF()
  }

  def fileHashes(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      FileHashRow(1L, 1L, 1L, bytes("AABB01")),
      FileHashRow(2L, 2L, 1L, bytes("AABB01")), // same algo+value: no clash
      FileHashRow(3L, 2L, 2L, bytes("CCDD02")), // new algo: appended
      FileHashRow(4L, 3L, 1L, bytes("EEFF03")), // f3's md5 (post-replacement)
      FileHashRow(5L, 5L, 3L, bytes("1234"))).toDF()
  }

  def userSnapshots(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      UserSnapshotRow(201L, "fa", "u9", ts("2022-01-05 10:00:00"), 1L,
        ts("2022-06-01 00:00:00"), is_deleted = false, Some("Niner"),
        Some("""{"country":"US"}""")),
      UserSnapshotRow(202L, "fa", "u9", ts("2022-02-05 10:00:00"), 2L,
        ts("2022-06-02 00:00:00"), is_deleted = true, None,
        Some("""{"age":5}""")),
      UserSnapshotRow(203L, "fa", "u1", ts("2022-01-20 10:00:00"), 2L,
        ts("2022-06-01 00:00:00"), is_deleted = false, Some("Uno"), None)).toDF()
  }
}
