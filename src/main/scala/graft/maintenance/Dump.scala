package graft.maintenance

import org.apache.spark.sql.DataFrame

/** S8/S9 — JSONL export (scripts/cron/dump_db.py:13–55). The reference
  * iterates per-row with a "very slow" TODO (dump_db.py:21) and dev
  * caps of 10/100 rows (17, 34 — SURVEY Appendix A8); here a dump is a
  * distributed `toJSON` write: uncapped, parallel, one file per
  * partition.
  */
object Dump {

  /** Per-snapshot dump (dump_db.py:13–25). */
  def snapshotsJsonl(snapshots: DataFrame, outPath: String): Unit =
    snapshots.toJSON.write.mode("overwrite").text(outPath)

  /** Merged-submission dump (dump_db.py:28–42): callers pass
    * engine.Merge output. */
  def mergedJsonl(merged: DataFrame, outPath: String): Unit =
    merged.toJSON.write.mode("overwrite").text(outPath)
}
