package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** M7 — clash-aware file merge (SURVEY §2.1), the reference's file-fold
  * semantics (faexport_db/models/submission.py:89–104 driving
  * file.py:50–63 `is_clashing` / 65–72 `add_update`):
  *
  * Fold files oldest→newest keyed by `site_file_id` (nullable key — a
  * None key is a valid dict key in the reference, so null here):
  *  - first sighting of a key: insert;
  *  - clashing update (url differs with both non-null, or size differs
  *    with both non-null, or any shared hash algo has a different
  *    value): the newer file REPLACES the old wholesale — invalidation
  *    semantics per README.md:22;
  *  - non-clashing update: `extra_data` is dict-merged (db.py:10–17,
  *    newer keys win), and hashes for algos not yet present are
  *    appended; url/size are immutable (file.py:66).
  *
  * Output preserves first-insertion order like a Python dict
  * (submission.py:90–104 builds `files = {}` and `.values()` is
  * iterated for the web shape, submission.py:121).
  *
  * Input/output type: `array<struct<site_file_id string, file_url
  * string, file_size bigint, extra_data string, hashes
  * array<struct<algo_id bigint, hash_value binary>>>>`, input already
  * flattened across snapshots in (scan_datetime, snapshot_id) ascending
  * order — per-file processing is order-independent across files within
  * one snapshot, so a flat fold is equivalent to the reference's nested
  * loop.
  *
  * CodegenFallback: runs once per entity in the merge aggregate, not in
  * a per-row hot path.
  */
case class MergeFiles(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = child.dataType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(s: StructType, _) if s.size == 5 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"merge_files needs array<struct<(5 file fields)>>, got ${other.catalogString}")
    }

  private case class FileState(
      var siteFileId: Option[String],
      var fileUrl: Option[String],
      var fileSize: Option[Long],
      var extraData: Option[String],
      var hashes: mutable.LinkedHashMap[Long, Array[Byte]])

  private def readFile(row: InternalRow): FileState = {
    val hashes = mutable.LinkedHashMap.empty[Long, Array[Byte]]
    if (!row.isNullAt(4)) {
      val ha = row.getArray(4)
      var j = 0
      while (j < ha.numElements()) {
        val hr = ha.getStruct(j, 2)
        // later duplicate algo within one snapshot-file: first wins,
        // matching dict-comprehension-last… NB hash_map_by_algo keeps
        // the LAST per algo (file.py:29–30) but add_update appends in
        // list order; within a single snapshot file duplicates don't
        // occur in practice — we keep first occurrence per algo.
        if (!hashes.contains(hr.getLong(0)))
          hashes.put(hr.getLong(0), hr.getBinary(1))
        j += 1
      }
    }
    FileState(
      if (row.isNullAt(0)) None else Some(row.getUTF8String(0).toString),
      if (row.isNullAt(1)) None else Some(row.getUTF8String(1).toString),
      if (row.isNullAt(2)) None else Some(row.getLong(2)),
      if (row.isNullAt(3)) None else Some(row.getUTF8String(3).toString),
      hashes)
  }

  /** file.py:50–63 */
  private def isClashing(cur: FileState, upd: FileState): Boolean = {
    val urlClash = cur.fileUrl.isDefined && upd.fileUrl.isDefined &&
      cur.fileUrl != upd.fileUrl
    val sizeClash = cur.fileSize.isDefined && upd.fileSize.isDefined &&
      cur.fileSize != upd.fileSize
    urlClash || sizeClash || upd.hashes.exists { case (algo, value) =>
      cur.hashes.get(algo).exists(!java.util.Arrays.equals(_, value))
    }
  }

  /** file.py:65–72 */
  private def addUpdate(cur: FileState, upd: FileState): Unit = {
    cur.extraData = (cur.extraData, upd.extraData) match {
      case (None, o) => o.map(JsonMergeObjects.canonicalJson)
      case (b, None) => b.map(JsonMergeObjects.canonicalJson)
      case (Some(b), Some(o)) => Some(JsonMergeObjects.mergePair(b, o))
    }
    upd.hashes.foreach { case (algo, value) =>
      if (!cur.hashes.contains(algo)) cur.hashes.put(algo, value)
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val files = mutable.LinkedHashMap.empty[Option[String], FileState]
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val upd = readFile(arr.getStruct(i, 5))
        files.get(upd.siteFileId) match {
          case None => files.put(upd.siteFileId, upd)
          case Some(cur) if isClashing(cur, upd) =>
            files.put(upd.siteFileId, upd) // replace, keep position
          case Some(cur) => addUpdate(cur, upd)
        }
      }
      i += 1
    }
    def utf8(o: Option[String]) = o.map(UTF8String.fromString).orNull
    new GenericArrayData(files.values.map { f =>
      InternalRow(
        utf8(f.siteFileId), utf8(f.fileUrl),
        f.fileSize.map(java.lang.Long.valueOf).orNull,
        utf8(f.extraData),
        new GenericArrayData(f.hashes.map { case (a, v) =>
          InternalRow(a, v)
        }.toSeq))
    }.toSeq)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "merge_files"
}

object MergeFiles {
  def mergeFiles(c: Column): Column = {
    import org.apache.spark.sql.GraftSqlShim._
    toColumn(MergeFiles(toExpression(c)))
  }
}
