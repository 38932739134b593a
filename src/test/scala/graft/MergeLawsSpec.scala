package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Fixtures, Merge}
import graft.engine.Model._

/** Property-based merge laws (SURVEY §5 plan): idempotence of
  * re-ingesting identical snapshots, arrival-order insensitivity,
  * newest-wins monotonicity — over generated snapshot sets. */
class MergeLawsSpec extends AnyFunSuite {

  /** Raw-ScalaCheck property driver: fixed seeds, deterministic runs
    * (no scalatestplus bridge in the dependency set). */
  private def forAllSeeded[T](gen: Gen[T], n: Int)(body: T => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val genSnapshot: Gen[SubmissionSnapshotRow] = for {
    id <- Gen.choose(1L, 500L)
    entity <- Gen.oneOf("e1", "e2", "e3")
    dayOffset <- Gen.choose(0, 50)
    contributor <- Gen.oneOf(1L, 2L)
    uploader <- Gen.option(Gen.oneOf("u1", "u2"))
    deleted <- Gen.oneOf(true, false)
    title <- Gen.option(Gen.oneOf("t1", "t2", "t3"))
    kwRec <- Gen.oneOf(true, false)
    extra <- Gen.option(Gen.oneOf("""{"a":1}""", """{"a":2,"b":"x"}""", """{"b":"y"}"""))
  } yield SubmissionSnapshotRow(
    id, "fa", entity,
    Timestamp.valueOf(f"2022-01-${dayOffset % 28 + 1}%02d 10:00:00"), contributor,
    Timestamp.valueOf("2022-06-01 00:00:00"), uploader, deleted,
    title, None, None, kwRec, extra)

  private val genSnapshots: Gen[List[SubmissionSnapshotRow]] = for {
    n <- Gen.choose(1, 12)
    snaps <- Gen.listOfN(n, genSnapshot)
  } yield
    // unique snapshot ids (serial pk), and unique dedup keys
    // (website, entity, scan, contributor) — the reference's dedup
    // assumes rows sharing that key are identical content, so the
    // generator must not produce same-key-different-payload rows
    snaps.groupBy(_.submission_snapshot_id).map(_._2.head)
      .groupBy(r => (r.website_id, r.site_submission_id,
        r.scan_datetime, r.archive_contributor_id))
      .map(_._2.head).toList

  private def mergeOf(rows: Seq[SubmissionSnapshotRow]): Seq[String] = {
    val s = spark
    import s.implicits._
    Merge.mergeSubmissions(Merge.nestedSubmissionSnapshots(
      rows.toDF(), Fixtures.keywords(s).limit(0), Fixtures.files(s).limit(0),
      Fixtures.fileHashes(s).limit(0), Fixtures.contributors(s)))
      .orderBy("site_submission_id").toJSON.collect().toSeq
  }

  test("merge is arrival-order insensitive and duplicate-dedup idempotent (property)") {
    forAllSeeded(genSnapshots, 8) { rows =>
      if (rows.nonEmpty) {
        val base = mergeOf(rows)
        assert(mergeOf(rows.reverse) === base)
        // re-ingesting the same logical snapshots under fresh ids, then
        // repairing duplicates, yields the same merge
        val dup = rows ++ rows.map(r => r.copy(
          submission_snapshot_id = r.submission_snapshot_id + 10000L))
        val s = spark
        import s.implicits._
        val repaired = graft.maintenance.Repair
          .dedupSubmissionSnapshots(dup.toDF())
          .as[SubmissionSnapshotRow].collect().toSeq
        assert(mergeOf(repaired) === base)
      }
    }
  }

  test("incremental merge equals full merge for ANY batch split (property)") {
    val s = spark
    import s.implicits._
    forAllSeeded(genSnapshots, 6) { rows =>
      if (rows.size >= 2) {
        def nestedOf(rs: Seq[SubmissionSnapshotRow]) =
          Merge.nestedSubmissionSnapshots(
            rs.toDF(), Fixtures.keywords(s).limit(0), Fixtures.files(s).limit(0),
            Fixtures.fileHashes(s).limit(0), Fixtures.contributors(s))
        val full = mergeOf(rows)
        // split at an arbitrary point: head part is "already merged",
        // tail part is "the new batch" (entities may span both)
        val (prev, batch) = rows.splitAt(rows.size / 2)
        val incremental = Merge.incrementalMergeSubmissions(
          Merge.mergeSubmissions(nestedOf(prev)),
          nestedOf(rows),
          nestedOf(batch))
          .orderBy("site_submission_id").toJSON.collect().toSeq
        assert(incremental === full)
      }
    }
  }

  test("a strictly newer snapshot always wins the latest-pick (property)") {
    forAllSeeded(genSnapshots, 8) { rows =>
      if (rows.nonEmpty) {
        val newest = rows.head.copy(
          submission_snapshot_id = 99999L,
          scan_datetime = Timestamp.valueOf("2023-01-01 00:00:00"),
          is_deleted = true,
          title = Some("NEWEST"))
        val merged = mergeOf(rows :+ newest)
        val entityRow = merged.find(_.contains(
          s""""site_submission_id":"${newest.site_submission_id}"""")).get
        assert(entityRow.contains(""""title":"NEWEST""""))
        assert(entityRow.contains(""""is_deleted":true"""))
        assert(entityRow.contains(""""latest_update":"2023-01-01T00:00:00.000Z""""))
      }
    }
  }
}
