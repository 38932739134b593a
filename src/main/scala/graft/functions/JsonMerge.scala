package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** Shallow, ordered JSON-object merge — the reference's one genuinely
  * custom semantic (SURVEY §4.3).
  *
  * Semantics replicate reference `merge_dicts` (faexport_db/db.py:10–17)
  * folded oldest→newest over an entity's snapshots
  * (faexport_db/models/submission.py:71–77, user.py:42–48): for each
  * top-level key, the value from the *latest* JSON object that contains
  * the key wins, wholesale (values are NOT merged recursively — a newer
  * nested object replaces the older one, exactly like Python's
  * `{**base, **overlay}`).
  *
  * Output is canonical JSON: keys sorted recursively, no extra
  * whitespace — so golden/oracle comparisons are byte-stable regardless
  * of input key order (SURVEY §7.3d).
  *
  * Input: `array<string>` of JSON object texts, already ordered
  * oldest→newest (callers sort with `sort_array(collect_list(struct(
  * scan_datetime, id, extra_data)))` — tie-break pinned by id per
  * SURVEY §7.3a). Null elements and null/blank strings are skipped, as
  * the reference skips snapshots with no extra_data (db.py:12–15).
  *
  * CodegenFallback: this runs once per *entity* (not per snapshot) in
  * the final merge aggregate, far off the per-row hot path; Jackson
  * parse cost dominates either way.
  */
case class JsonMergeObjects(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  // Returns null when no object survives the fold (e.g. every snapshot
  // had null extra_data → empty input array) even if the child is a
  // non-nullable collect_list result.
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"json_merge_objects needs array<string>, got ${other.catalogString}")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val merged = JsonMergeObjects.mapper.createObjectNode()
    var i = 0
    var any = false
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i).toString
        if (s.trim.nonEmpty) {
          JsonMergeObjects.mapper.readTree(s) match {
            case o: ObjectNode =>
              any = true
              o.fields().asScala.foreach(e => merged.set[JsonNode](e.getKey, e.getValue))
            case _ => // non-object JSON: ignored, as dict-merge requires dicts
          }
        }
      }
      i += 1
    }
    if (!any) null
    else UTF8String.fromString(
      JsonMergeObjects.mapper.writeValueAsString(JsonMergeObjects.canonical(merged)))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "json_merge_objects"
}

object JsonMergeObjects {
  private[functions] val mapper = new ObjectMapper()

  /** Two-object shallow merge, overlay keys win — exact semantics of
    * reference `merge_dicts` (db.py:10–17) on non-null inputs; output
    * canonicalized. */
  def mergePair(base: String, overlay: String): String = {
    val merged = mapper.createObjectNode()
    Seq(base, overlay).foreach { s =>
      mapper.readTree(s) match {
        case o: ObjectNode =>
          o.fields().asScala.foreach(e => merged.set[JsonNode](e.getKey, e.getValue))
        case _ =>
      }
    }
    mapper.writeValueAsString(canonical(merged))
  }

  /** Re-serialize a JSON text with recursively sorted keys. */
  def canonicalJson(s: String): String =
    mapper.writeValueAsString(canonical(mapper.readTree(s)))

  /** Recursively sort object keys for byte-stable canonical output. */
  private[functions] def canonical(n: JsonNode): JsonNode = n match {
    case o: ObjectNode =>
      val out = mapper.createObjectNode()
      o.fieldNames().asScala.toSeq.sorted.foreach { k =>
        out.set[JsonNode](k, canonical(o.get(k)))
      }
      out
    case a: ArrayNode =>
      val out = mapper.createArrayNode()
      a.elements().asScala.foreach(e => out.add(canonical(e)))
      out
    case other => other
  }

  /** Column API: merge an ordered array of JSON-object strings. */
  def jsonMergeObjects(arr: Column): Column = {
    import org.apache.spark.sql.GraftSqlShim._
    toColumn(JsonMergeObjects(toExpression(arr)))
  }
}
