package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.functions.JsonMergeObjects.jsonMergeObjects

/** The merge-on-read operator family M1–M8 (SURVEY §2.1) exercised over
  * the driver `events` table: entity key = `user_id`, event time = `ts`
  * (standing in for `scan_datetime`), snapshot payload = `props` JSON
  * (standing in for `extra_data`). The faexport-shaped pipeline itself
  * lives in [[graft.engine.Merge]]; these queries put the same operators
  * under the DuckDB oracle at testdata scale.
  *
  * Determinism: the reference orders snapshots by scan_datetime only and
  * relies on Python sort stability (models/submission.py:27–29); we pin
  * the total order (ts, event_id) per SURVEY §7.3a.
  *
  * Timestamps from `events` have changed parquet encoding across
  * driver testdata generations — INT64 TIMESTAMP(NANOS) (readable
  * only as a raw nanos long, Tables.t) through round 9, plain
  * TIMESTAMP(MICROS) (arriving as TIMESTAMP_NTZ) since round 10 —
  * so every query reads through [[eventsTsMicros]], which
  * canonicalizes `ts` to a MICROSECOND epoch long for either
  * encoding. All ordering, gap arithmetic, and as-of comparisons
  * then run on exact integer micros (matching DuckDB's native
  * micros timestamps bit for bit), and every emitted time value is
  * second-truncated via date_format so both engines agree on the
  * rendered form.
  */
object EventsMerge {

  type Q = (SparkSession, String) => DataFrame

  /** The events table with `ts` canonicalized to MICROSECOND epoch
    * longs, whichever parquet encoding the data dir carries: a
    * LongType ts is the legacy nanos-as-long read (integral `div` —
    * `/` on longs is double division, lossy at epoch-nanos ~1.7e18);
    * anything else is a timestamp column (NTZ or LTZ — cast through
    * TIMESTAMP in the fixed-UTC session, then exact unix_micros). */
  private def eventsTsMicros(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
    ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        ev.withColumn("ts", call_function("div", col("ts"), lit(1000L)))
      case _ =>
        ev.withColumn("ts", unix_micros(col("ts").cast("timestamp")))
    }
  }

  /** ts micros-long → 'yyyy-MM-dd HH:mm:ss' (UTC, floor to second). */
  private def tsStr(c: org.apache.spark.sql.Column) =
    date_format(
      timestamp_seconds(call_function("div", c, lit(1000000L))),
      "yyyy-MM-dd HH:mm:ss")

  /** M1+M2 — newest-first ordering and latest-value pick
    * (submission.py:27–33, user.py:19–25). */
  private val q15Latest: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    eventsTsMicros(s, d)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type".as("last_type"),
        $"value".as("last_value"), tsStr($"ts").as("last_ts"))
  }

  /** M2+M3+M8 — first_scanned / latest_update / snapshot_count in one
    * grouped pass (submission.py:35–41, 111). */
  private val q16EntitySummary: Q = (s, d) => {
    import s.implicits._
    eventsTsMicros(s, d)
      .groupBy($"user_id")
      .agg(
        tsStr(min($"ts")).as("first_seen"),
        tsStr(max($"ts")).as("last_seen"),
        count(lit(1)).as("n_events"),
        count(when($"event_type" === "purchase", 1)).as("n_purchases"))
  }

  /** M4 — latest-non-null coalesce (submission.py:43–69): scan
    * newest→oldest, first non-null wins. `value` is nulled for clicks to
    * manufacture the nulls the operator must skip. */
  private val q17CoalesceNonNull: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    eventsTsMicros(s, d)
      .withColumn("v", when($"event_type" =!= "click", $"value"))
      .withColumn("latest_value", first($"v", ignoreNulls = true).over(w))
      .groupBy($"user_id")
      .agg(round(max($"latest_value"), 6).as("latest_nonclick_value"))
  }

  /** M5 — ordered JSON-object merge (db.py:10–17 folded per
    * submission.py:71–77) via the custom [[JsonMergeObjects]]
    * expression. Each event type writes a DIFFERENT key (click → c,
    * purchase → p, else → k), so the merged object is a true
    * union-of-keys with per-key latest-wins — the full canonical JSON
    * string is emitted and byte-compared, which a "latest snapshot
    * wholesale" shortcut (plain row_number=1) cannot satisfy. */
  private val q18JsonMerge: Q = (s, d) => {
    import s.implicits._
    val kVal = get_json_object($"props", "$.k").cast("long")
    eventsTsMicros(s, d)
      .withColumn("props2",
        when($"event_type" === "click", to_json(struct(kVal.as("c"))))
          .when($"event_type" === "purchase", to_json(struct(kVal.as("p"))))
          .otherwise(to_json(struct(kVal.as("k")))))
      .groupBy($"user_id")
      .agg(sort_array(collect_list(struct($"ts", $"event_id", $"props2")))
        .as("ordered"))
      .select($"user_id", jsonMergeObjects($"ordered.props2").as("merged_props"))
      .withColumn("k_final",
        get_json_object($"merged_props", "$.k").cast("long"))
  }

  /** A7 — in-stream distinct: one row per (entity, type) regardless of
    * how many snapshots carried it (fa_indexer/main.py:85–93). */
  private val q19EventDedup: Q = (s, d) => {
    import s.implicits._
    t(s, d, "events").select($"user_id", $"event_type").distinct()
  }

  /** Gap-based sessionization (classic event analytics): a new session
    * starts after >1 h of inactivity; session ids are per-user ordinal
    * via a cumulative sum over gap flags. */
  private val q58Sessionize: Q = (s, d) => {
    import s.implicits._
    val wOrd = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val gapUs = 3600L * 1000000L
    eventsTsMicros(s, d)
      .withColumn("prev_ts", lag($"ts", 1).over(wOrd))
      .withColumn("new_session",
        when($"prev_ts".isNull || $"ts" - $"prev_ts" > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum($"new_session")
        .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_id")
      .agg(
        count(lit(1)).as("n_events"),
        tsStr(min($"ts")).as("session_start"),
        tsStr(max($"ts")).as("session_end"))
  }

  /** Exact interpolated percentiles per group (A-family breadth). */
  private val q59Percentiles: Q = (s, d) => {
    import s.implicits._
    t(s, d, "events")
      .groupBy($"event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        round(min($"value"), 6).as("vmin"),
        round(max($"value"), 6).as("vmax"))
  }

  /** As-of join under the hard gate: every click joined to the user's
    * latest purchase at-or-before the click (ties on ts broken by max
    * event_id). The operator is one shuffle + one window — the DuckDB
    * oracle replays the same pick with a correlated argmax. */
  private val q73AsofJoin: Q = (s, d) => {
    import s.implicits._
    val ev = eventsTsMicros(s, d)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id", $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts", $"value")
    graft.operators.AsofJoin.asofJoin(
      clicks, purchases, Seq("user_id"), "ts", "ts", "event_id")
      .select($"user_id", $"event_id".as("click_id"),
        $"asof".getField("event_id").as("purchase_id"),
        $"asof".getField("value").as("purchase_value"))
  }

  /** q73's lookup through the skew-split path ([[graft.operators
    * .AsofJoin.asofJoinSplit]]): the (key, time-bucket) pre-split with
    * carried per-bucket last rows must produce the IDENTICAL answer —
    * same oracle as q73, so "splitting changes the plan, never the
    * answer" sits under the hard gate like q64 (salting) and q83
    * (bucketed merge). */
  private val q84AsofJoinSplit: Q = (s, d) => {
    import s.implicits._
    val ev = eventsTsMicros(s, d)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id", $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts", $"value")
    graft.operators.AsofJoin.asofJoinSplit(
      clicks, purchases, Seq("user_id"), "ts", "ts", "event_id",
      numSplits = 8)
      .select($"user_id", $"event_id".as("click_id"),
        $"asof".getField("event_id").as("purchase_id"),
        $"asof".getField("value").as("purchase_value"))
  }

  /** q73's lookup through the NATIVE Catalyst operator
    * ([[graft.plans.AsofJoinPlan]] / [[graft.plans.AsofJoinExec]] via
    * [[graft.operators.AsofJoin.asofJoinNative]]): a custom logical
    * node + planner strategy + streaming merge exec instead of the
    * union+window composition. Same oracle as q73/q84 — the operator
    * swap must never change the answer; what changes is the plan
    * (each side shuffled once at its own width, O(1) merge state, no
    * WindowExec partition buffering — AsofJoinSpec pins the shape). */
  private val q126AsofJoinNative: Q = (s, d) => {
    import s.implicits._
    val ev = eventsTsMicros(s, d)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id", $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts", $"value")
    // broadcast = Some(false): this gate pins the shuffle streaming-
    // merge exec — at gate scale the auto path would pick broadcast
    // (q127 gates that) and the merge exec would go oracle-unchecked
    graft.operators.AsofJoin.asofJoinNative(
      clicks, purchases, Seq("user_id"), "ts", "ts", "event_id",
      broadcast = Some(false))
      .select($"user_id", $"event_id".as("click_id"),
        $"asof".getField("event_id").as("purchase_id"),
        $"asof".getField("value").as("purchase_value"))
  }

  /** q73's lookup through the NATIVE SKEW-SPLIT path
    * ([[graft.operators.AsofJoin.asofJoinNativeSplit]]): the custom
    * merge exec planned over (key, coarse time bucket) with carried
    * per-bucket last rows — the plan that spreads a hot entity over
    * numSplits tasks instead of serializing it. Same oracle as
    * q73/q84/q126–q128: six plans, one contract. */
  private val q130AsofJoinNativeSplit: Q = (s, d) => {
    import s.implicits._
    val ev = eventsTsMicros(s, d)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id", $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts", $"value")
    graft.operators.AsofJoin.asofJoinNativeSplit(
      clicks, purchases, Seq("user_id"), "ts", "ts", "event_id",
      numSplits = 8)
      .select($"user_id", $"event_id".as("click_id"),
        $"asof".getField("event_id").as("purchase_id"),
        $"asof".getField("value").as("purchase_value"))
  }

  /** q73's lookup with a STALENESS BOUND
    * ([[graft.operators.AsofJoin.asofJoinTolerance]]): the latest
    * prior purchase counts only if it happened within ONE DAY of the
    * click — the feature-store tolerance contract (`r.ts <= l.ts AND
    * r.ts >= l.ts - 1d` argmax). Runs through the native merge exec;
    * the DuckDB oracle replays the bounded correlated argmax. */
  private val q131AsofJoinStale: Q = (s, d) => {
    import s.implicits._
    val ev = eventsTsMicros(s, d)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id", $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts", $"value")
    graft.operators.AsofJoin.asofJoinTolerance(
      clicks, purchases, Seq("user_id"), "ts", "ts", "event_id",
      maxStale = lit(86400L * 1000000L), impl = "native")
      .select($"user_id", $"event_id".as("click_id"),
        $"asof".getField("event_id").as("purchase_id"),
        $"asof".getField("value").as("purchase_value"))
  }

  /** q73's lookup through the BROADCAST native exec
    * ([[graft.plans.BroadcastAsofJoinExec]]): the dimension-sized-right
    * physical path — the fact (left) side is never shuffled or sorted,
    * the right side broadcasts once and answers per-row with a hash
    * probe + binary search. Same oracle as q73/q84/q126: four plans,
    * one contract. */
  private val q127AsofJoinBroadcast: Q = (s, d) => {
    import s.implicits._
    val ev = eventsTsMicros(s, d)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id", $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts", $"value")
    graft.operators.AsofJoin.asofJoinNative(
      clicks, purchases, Seq("user_id"), "ts", "ts", "event_id",
      broadcast = Some(true))
      .select($"user_id", $"event_id".as("click_id"),
        $"asof".getField("event_id").as("purchase_id"),
        $"asof".getField("value").as("purchase_value"))
  }

  /** q128's backing store: the purchase history AT REST, bucketed by
    * the entity key and SORTED by (user_id, ts, event_id) — the merge
    * order [[graft.plans.AsofJoinExec]] requires. Built once per data
    * dir (one file per bucket — the condition under which the scan
    * reports its sort order), durable via
    * [[graft.storage.DurableStores]] (the re-registration DDL carries
    * the finer SORTED BY). Every as-of lookup against this layout pays
    * NO exchange and NO sort on the dimension side: the write-once
    * layout bought them, the q83/q117 pattern carried to the as-of
    * family. At 100 TB this is the feature-store state table kept
    * merge-ready at rest: each query shuffles only its (usually much
    * smaller or already co-located) probe side. */
  private[graft] def asofDimStore(s: SparkSession, d: String): DataFrame = {
    import graft.storage.DurableStores
    val tbl = graft.storage.Storage.tableNameFor("graft_asof_dim", d)
    DurableStores.openOrBuild(s, d, "asof_dim", Seq(tbl),
        params = asofDimParams, migrate = asofDimMigration(s, d),
        foldGuards = Seq("asof_accept")) { st =>
      buildAsofDimBase(s, d, st, tbl,
        eventsTsMicros(s, d).filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"), col("value")))
    }
    s.table(tbl)
  }

  /** One base build for the asof_dim family (shared by the source
    * build and the compact fold so the recorded facts can never
    * drift): bucketed time-sorted layout, then the dimension's time
    * axis recorded TWICE — as the manifest-sidecar note (the q136
    * manifest-bounds workflow) and as a catalog TABLE PROPERTY
    * (`graft.asof.bounds.ts`), which the SQL split lowering
    * ([[graft.plans.ResolveAsofJoin]]) reads so a conf-routed skew
    * split over the stored dimension skips its bounds subquery without
    * any analyzer → store coupling. The property rides the manifest's
    * TableMeta props, so a cold catalog re-registers it. */
  private def buildAsofDimBase(s: SparkSession, d: String,
      st: graft.storage.Storage, tbl: String,
      src: DataFrame): Seq[graft.storage.DurableStores.TableMeta] = {
    import graft.storage.DurableStores
    st.appendBucketedSorted(tbl, src,
      Seq("user_id"), Seq("user_id", "ts", "event_id"), numBuckets = 16)
    val b = s.table(tbl)
      .agg(min(col("ts").cast("double")), max(col("ts").cast("double")))
      .head()
    val boundProps =
      if (b.isNullAt(0) || b.isNullAt(1)) Nil
      else {
        val v = s"${b.getDouble(0)},${b.getDouble(1)}"
        DurableStores.writeNote(s, d, "asof_dim", "ts_bounds", v)
        s.sql(s"ALTER TABLE `$tbl` SET TBLPROPERTIES " +
          s"('graft.asof.bounds.ts'='$v')")
        Seq("graft.asof.bounds.ts" -> v)
      }
    Seq(DurableStores.TableMeta.bucketedSorted(s, tbl, Seq("user_id"),
      Seq("user_id", "ts", "event_id"), 16, props = boundProps))
  }

  /** The stored dimension's time-axis bounds from its build-time
    * manifest note, or None (pre-note store, empty dim) — callers fall
    * back to the split's own min/max job. Accept deltas can extend the
    * real axis past the note; that only CLAMPS late rows into the last
    * bucket (bucketOf is a clamped floor), never changes answers. */
  private[graft] def asofDimTimeBounds(
      s: SparkSession, d: String): Option[(Double, Double)] =
    graft.storage.DurableStores.readNote(s, d, "asof_dim", "ts_bounds")
      .flatMap { v =>
        v.split(",") match {
          case Array(lo, hi) =>
            try Some((lo.toDouble, hi.toDouble))
            catch { case _: NumberFormatException => None }
          case _ => None
        }
      }

  /** q73's lookup with the DIMENSION AT REST ([[asofDimStore]]): the
    * native merge exec's right-side requirements (clustered on the
    * key, sorted by (key, time, tieBreak)) are satisfied by the
    * bucketed sorted layout, so the plan carries exactly ONE exchange
    * and ONE sort — both on the probe side (AsofJoinSpec pins it).
    * Same oracle as q73/q84/q126/q127: five plans, one contract. */
  private val q128AsofJoinStored: Q = (s, d) => {
    import s.implicits._
    val clicks = eventsTsMicros(s, d).filter($"event_type" === "click")
      .select($"user_id", $"event_id", $"ts")
    val dim = asofDimStore(s, d)
    graft.operators.AsofJoin.asofJoinNative(
      clicks, dim, Seq("user_id"), "ts", "ts", "event_id",
      broadcast = Some(false),
      // manifest-carried time axis: if a deployment routes this probe
      // through the skew split (spark.graft.asof.skewSplits), the
      // split reuses the bounds the store recorded at build instead of
      // re-scanning both time columns (StoreSpec pins note + parity)
      splitBounds = asofDimTimeBounds(s, d))
      .select($"user_id", $"event_id".as("click_id"),
        $"asof".getField("event_id").as("purchase_id"),
        $"asof".getField("value").as("purchase_value"))
  }

  // build-params shared by the base accessor, the accept companion,
  // and the compact fold — the two writers MUST stamp identical params
  // or a reopened store would see a mismatch and rebuild from source,
  // dropping folds (the same contract as LlmOps.sketchParams).
  // "bounds=prop" (round 16) marks stores that carry the time axis as
  // a catalog table property; a store built under the bare layout
  // params (round 15) has the SAME at-rest files, so reopening one is
  // a params-only code upgrade — handled by [[asofDimMigration]]
  // below, never by a rebuild (ADVICE r16: the r16 params bump made
  // pre-r16 stores rebuild from source, silently discarding every
  // accept batch a compact had folded into the base).
  private val asofDimLayoutParams = "buckets=16,sort=user_id.ts.event_id"
  private val asofDimParams = asofDimLayoutParams + ",bounds=prop"

  /** In-place upgrade for asof stores built under the round-15 params
    * (identical at-rest layout, no recorded bounds): derive the time
    * axis from the EXISTING base — folds included, which is the whole
    * point — record it as note + table property exactly like a fresh
    * build, and re-stamp the manifest under the new params. The accept
    * companion's layout never depended on the bounds param, so its
    * migration is a pure re-stamp. Unknown old params fall through to
    * the rebuild contract (which the fold guard vetoes while folds
    * exist). NOTE: the min/max aggregate below runs INSIDE
    * openOrBuild's synchronized block — the DurableStores monitor is
    * held across a (small, pruned, single-column) Spark job for the
    * one open that migrates a pre-r16 store; acceptable because it is
    * a once-per-store upgrade, but anything heavier belongs in a
    * post-open step, not a migration hook. */
  private def asofDimMigration(s: SparkSession, d: String)
      : graft.storage.DurableStores.Migration = (oldParams, _, tables) =>
    if (oldParams != asofDimLayoutParams) None
    else Some(tables.map { t =>
      if (t.layout != "bucketed") t
      else {
        val b = s.table(t.name)
          .agg(min(col("ts").cast("double")), max(col("ts").cast("double")))
          .head()
        if (b.isNullAt(0) || b.isNullAt(1)) t
        else {
          val v = s"${b.getDouble(0)},${b.getDouble(1)}"
          graft.storage.DurableStores.writeNote(s, d, "asof_dim",
            "ts_bounds", v)
          s.sql(s"ALTER TABLE `${t.name}` SET TBLPROPERTIES " +
            s"('graft.asof.bounds.ts'='$v')")
          t.copy(props =
            (t.props.toMap + ("graft.asof.bounds.ts" -> v)).toSeq)
        }
      }
    })

  /** The asof_dim family's mutable ACCEPT companion: new state rows
    * (purchases) land as batch_id partitions, commit-marked last —
    * the same delta lifecycle as the sketch/cosine/merge families.
    * The base stays write-once and time-sorted at rest; deltas stay
    * batch-sized. */
  private[graft] def asofAcceptStore(s: SparkSession, d: String): DataFrame = {
    import graft.storage.{DurableStores, Storage}
    val tbl = Storage.tableNameFor("graft_asofacc", d)
    DurableStores.openOrBuild(s, d, "asof_accept", Seq(tbl),
        params = asofDimParams,
        migrate = asofDimMigration(s, d)) { st =>
      st.appendPartitioned(tbl,
        eventsTsMicros(s, d).filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"), col("value"))
          .limit(0).withColumn("batch_id", lit("")),
        Seq("batch_id"))
      Seq(DurableStores.TableMeta.partitioned(s, tbl, Seq("batch_id")))
    }
    s.table(tbl)
  }

  /** ACCEPT a batch of new dimension rows (user_id, event_id, ts,
    * value): id-guard against the base and every other committed
    * batch (a doubled event_id would double-count in any downstream
    * read and silently skew tie resolution), write the batch's
    * partition with dynamic overwrite (idempotent re-accept), marker
    * last. A batch a compact already folded into the base replays as
    * a no-op. Accept cost is batch-proportional — the base is only
    * touched by the pruned single-column id-guard scan. */
  private[graft] def acceptAsofDimBatch(s: SparkSession, d: String,
      batchId: String, rows: DataFrame,
      lineage: Option[Set[String]] = None): Unit =
    graft.storage.DurableStores.withWriterLease(s, d, "asof_accept") {
    import graft.storage.{DurableStores, Storage}
    val delta0 = asofAcceptStore(s, d)
    // committed-or-folded replays are no-ops (LlmOps.alreadyAccepted
    // rationale: the marker certifies the partition, ids identify
    // immutable content — only a crashed partial accept re-runs)
    if (LlmOps.alreadyAccepted(s, d, "asof_accept", batchId))
      return
    LlmOps.requireMonotoneBatchId(s, d, "asof_accept", batchId, lineage)
    val others = LlmOps.committedDelta(s, d, "asof_accept", delta0)
      .filter(col("batch_id") =!= batchId).select(col("event_id"))
    LlmOps.requireFreshBatchIds(
      asofDimStore(s, d).select(col("event_id")).unionByName(others),
      "event_id", rows.select(col("event_id").as("id")).distinct(),
      "asof_dim")
    DurableStores.withDynamicPartitionOverwrite(s) {
      rows.select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .insertInto(Storage.tableNameFor("graft_asofacc", d))
    }
    DurableStores.markBatchCommitted(s, d, "asof_accept", batchId)
    refreshAsofBounds(s, d, rows)
  }

  /** Widen the recorded time axis (manifest note + catalog table
    * property) to cover an accepted batch — round 17 (r16 verdict item
    * 2): the bounds were written at build/compact only, so under the
    * typical append-only pattern every accepted row lands PAST `hi`
    * and the conf-routed skew split clamps the entire new range into
    * the last time bucket — answer-safe (the bucket floor clamps) but
    * the hot-key spread the split exists for erodes until compaction.
    * One tiny agg over the batch the accept already materialized.
    * Runs AFTER the commit marker, still under the writer lease:
    * idempotent (pure widening), and a crash between marker and
    * refresh only leaves the old conservative bounds — healed by the
    * next accept or compact. */
  private def refreshAsofBounds(s: SparkSession, d: String,
      rows: DataFrame): Unit = {
    import graft.storage.DurableStores
    val b = rows.agg(min(col("ts").cast("double")),
      max(col("ts").cast("double"))).head()
    if (b.isNullAt(0) || b.isNullAt(1)) return
    val (bLo, bHi) = (b.getDouble(0), b.getDouble(1))
    val widened = asofDimTimeBounds(s, d) match {
      case Some((lo, hi)) =>
        if (bLo >= lo && bHi <= hi) None
        else Some((math.min(lo, bLo), math.max(hi, bHi)))
      // no recorded axis (pre-note store, empty-dim build, or a
      // deleted/corrupted sidecar): record NOTHING. Widening is only
      // safe relative to an existing axis — stamping the BATCH's
      // min/max as the store's whole axis would clamp the entire base
      // into edge buckets (answer-safe but the spread collapses
      // store-wide, worse than the subquery fallback callers use when
      // no bounds exist). The next build/compact re-derives the full
      // axis through buildAsofDimBase.
      case None => None
    }
    widened.foreach { case (lo, hi) =>
      val v = s"$lo,$hi"
      DurableStores.writeNote(s, d, "asof_dim", "ts_bounds", v)
      DurableStores.updateTableProps(s, d, "asof_dim",
        graft.storage.Storage.tableNameFor("graft_asof_dim", d),
        Seq("graft.asof.bounds.ts" -> v))
    }
  }

  /** As-of lookup against the EFFECTIVE dimension (base ⊕ committed
    * accept deltas) — without ever re-sorting the base or unioning it
    * with the deltas. As-of distributes over a union of the right
    * side: latest-at-or-before over (base ∪ delta) = the later of
    * (latest from base, latest from delta), compared by (ts,
    * tieBreak). So the probe runs TWO native as-of joins — the sorted
    * store leg (one exchange + one sort, probe side only, q128's
    * plan) and the delta leg THROUGH THE BROADCAST EXEC over the
    * batch-sized committed deltas, which asks nothing of its left
    * child and therefore rides the first leg's output with zero
    * additional exchange or sort — and a per-row struct max picks the
    * winner. At 100 TB: the fact side is shuffled once (for the base
    * merge), the at-rest base is never re-sorted, and accepted state
    * is visible to probes immediately without compaction. */
  private[graft] def asofJoinEffective(s: SparkSession, d: String,
      probe: DataFrame, lineage: Option[Set[String]] = None): DataFrame = {
    import s.implicits._
    val committed = LlmOps.committedDelta(s, d, "asof_accept",
      asofAcceptStore(s, d))
    val scopedIds = lineage
      .map(_.intersect(
        graft.storage.DurableStores.committedBatches(s, d, "asof_accept")))
    val scoped = scopedIds
      .map(ls => committed.filter(col("batch_id").isin(ls.toSeq: _*)))
      .getOrElse(committed)
    val baseLeg = graft.operators.AsofJoin.asofJoinNative(
        probe, asofDimStore(s, d), Seq("user_id"), "ts", "ts", "event_id",
        broadcast = Some(false))
      .withColumnRenamed("asof", "asof_base")
    // the delta leg is FORCED through the broadcast exec only while
    // the committed unfolded deltas stay dimension-sized: a
    // long-running accept stream that is never compacted would
    // otherwise grow the broadcast without bound until executors die.
    // Above the bound, fall back to the stats-driven planner choice
    // (which at that size plans the shuffle merge — one extra
    // own-width exchange, no driver-killing broadcast) — the right
    // operational answer is `StoreAdmin compact`, and probes must
    // stay alive until it runs. One FS listing, no Spark job.
    val maxBytes = s.conf.getOption("spark.graft.asof.deltaBroadcastMaxBytes")
      .map(_.toLong).getOrElse(256L << 20)
    val deltaBytes = committedDeltaBytes(s, d, scopedIds)
    val deltaBcast: Option[Boolean] =
      if (deltaBytes <= maxBytes) Some(true) else None
    val both = graft.operators.AsofJoin.asofJoinNative(
      baseLeg, scoped.drop("batch_id"), Seq("user_id"), "ts", "ts",
      "event_id", broadcast = deltaBcast)
    // the winner: whichever leg's candidate is later by (ts, tieBreak)
    val winner = when($"asof".isNull, $"asof_base")
      .when($"asof_base".isNull, $"asof")
      .when(struct($"asof.ts", $"asof.event_id") >
        struct($"asof_base.ts", $"asof_base.event_id"), $"asof")
      .otherwise($"asof_base")
    both.withColumn("asof_eff", winner).drop("asof", "asof_base")
  }

  /** On-disk bytes of the committed (optionally lineage-scoped)
    * asof-accept delta partitions — the size [[asofJoinEffective]]'s
    * broadcast bound checks. Marker listing + one du per batch dir. */
  private def committedDeltaBytes(s: SparkSession, d: String,
      scopedIds: Option[Set[String]]): Long = {
    import graft.storage.{DurableStores, Storage}
    import org.apache.hadoop.fs.Path
    val ids = scopedIds.getOrElse(
      DurableStores.committedBatches(s, d, "asof_accept"))
    if (ids.isEmpty) return 0L
    val st = new Storage(s, DurableStores.root(s))
    val tableDir = new Path(st.path(Storage.tableNameFor("graft_asofacc", d)))
    val f = tableDir.getFileSystem(s.sparkContext.hadoopConfiguration)
    ids.toSeq.map { id =>
      val p = new Path(tableDir, s"batch_id=$id")
      try f.getContentSummary(p).getLength
      catch { case _: java.io.FileNotFoundException => 0L }
    }.sum
  }

  /** q129 — the asof_dim WRITE-BACK lifecycle under the hard gate: two
    * batches of NEW dimension rows are ACCEPTED into the delta store,
    * then clicks probe the effective dimension (base ⊕ both deltas) —
    * the answer must equal DuckDB's as-of over purchases ∪ batch1 ∪
    * batch2. The batches are deterministic transforms of the source
    * purchases (so the oracle reproduces them from events.parquet
    * alone) keyed to SENTINEL users — user_id + 10,000,000, a key
    * space disjoint from every real event — and the probe adds the
    * matching sentinel clicks. Why sentinels: a StoreAdmin/StoreChain
    * compact permanently folds accepted batches into the asof_dim
    * base, and gate rows carrying REAL user keys would then silently
    * shift q128's source-purchases-only oracle; sentinel rows can
    * never match a real probe, so compaction is invisible to every
    * other gate by construction (the StoreChain pattern). The
    * both-legs-populated winner comparison this shape no longer
    * reaches is pinned in AsofJoinSpec with its own batches.
    * Lineage-scoped so foreign accepts (StoreSpec, streams) can't
    * leak into the oracle compare. */
  /** q129/q139's deterministic sentinel batches (transforms of the
    * source purchases keyed to the disjoint user_id + 10M space — the
    * scaladoc on [[q129AsofAcceptProbe]] has the full rationale),
    * accepted idempotently under the a1/a2 lineage. */
  private def acceptSentinelBatches(s: SparkSession, d: String): Unit = {
    import s.implicits._
    val purchases = eventsTsMicros(s, d)
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts", $"value")
    val b1 = purchases.filter($"event_id" % 10 === 3)
      .select(($"user_id" + 10000000L).as("user_id"),
        ($"event_id" + 100000000L).as("event_id"),
        ($"ts" + 1000000L).as("ts"), ($"value" * 2).as("value"))
    val b2 = purchases.filter($"event_id" % 10 === 7)
      .select(($"user_id" + 10000000L).as("user_id"),
        ($"event_id" + 200000000L).as("event_id"),
        ($"ts" + 2000000L).as("ts"), ($"value" * 3).as("value"))
    acceptAsofDimBatch(s, d, "a1", b1, lineage = Some(Set("a1", "a2")))
    acceptAsofDimBatch(s, d, "a2", b2, lineage = Some(Set("a1", "a2")))
  }

  private val q129AsofAcceptProbe: Q = (s, d) => {
    import s.implicits._
    val ev = eventsTsMicros(s, d)
    acceptSentinelBatches(s, d)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id", $"ts")
    val probe = clicks.unionByName(clicks.select(
      ($"user_id" + 10000000L).as("user_id"),
      ($"event_id" + 300000000L).as("event_id"), $"ts"))
    asofJoinEffective(s, d, probe, lineage = Some(Set("a1", "a2")))
      .select($"user_id", $"event_id".as("click_id"),
        $"asof_eff".getField("event_id").as("purchase_id"),
        $"asof_eff".getField("value").as("purchase_value"))
  }

  /** Fold committed asof-accept batches into the time-sorted base
    * (rebuild base ∪ deltas under the same params, markers retire into
    * the folded ledger, exactly the folded partitions drop) — probe
    * answers unchanged, plans return to the single sorted-scan leg.
    * Same retention caveat as the sketch family: a later base refresh
    * rebuilds from source and discards folds. */
  private[graft] def compactAsofDimStore(s: SparkSession, d: String): Boolean =
    graft.storage.DurableStores.withWriterLease(s, d, "asof_accept") {
    import graft.storage.{DurableStores, Storage}
    val accT = Seq(Storage.tableNameFor("graft_asofacc", d))
    val delta = asofAcceptStore(s, d)
    val foldIds = DurableStores.committedBatches(s, d, "asof_accept")
    if (foldIds.isEmpty) {
      DurableStores.dropFoldedPartitions(s, d, "asof_accept", accT)
      return false
    }
    val tmp = DurableStores.compactTmp(s, "asofdim")
    asofDimStore(s, d)
      .unionByName(delta.filter(col("batch_id").isin(foldIds.toSeq: _*))
        .drop("batch_id"))
      .dropDuplicates(Seq("event_id"))
      .write.mode("overwrite").parquet(s"$tmp/dim")
    val tbl = Storage.tableNameFor("graft_asof_dim", d)
    DurableStores.drop(s, d, "asof_dim")
    DurableStores.openOrBuild(s, d, "asof_dim", Seq(tbl),
        params = asofDimParams) { st =>
      // the folded base's axis may have EXTENDED past the old note —
      // the shared builder re-derives and re-records note + property
      buildAsofDimBase(s, d, st, tbl, s.read.parquet(s"$tmp/dim"))
    }
    DurableStores.retireFoldedBatches(s, d, "asof_accept", foldIds)
    DurableStores.dropFoldedPartitions(s, d, "asof_accept", accT)
    DurableStores.deleteDir(s, tmp)
    true
  }

  /** q73's lookup issued from PURE SQL through the `asof_join`
    * table-valued function ([[graft.plans.AsofSqlJoin]], injected by
    * [[graft.GraftExtensions]]): the SQL front door must reach the
    * same native operator ([[graft.plans.AsofJoinExec]], forced via
    * the 'merge' path argument) and reproduce the same correlated
    * argmax — seven plans, one contract (q73/q84/q126–q128/q130/q132).
    * ExtensionsSpec pins the SQL path's plan shape, pushdown, and
    * payload pruning; this gate pins the answers under q73's oracle. */
  private val q132AsofJoinSql: Q = (s, d) => {
    import s.implicits._
    val ev = eventsTsMicros(s, d)
    ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id", $"ts")
      .createOrReplaceTempView("graft_asof_clicks")
    ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts", $"value")
      .createOrReplaceTempView("graft_asof_purchases")
    s.sql(
      """SELECT user_id, event_id AS click_id,
        |  asof.event_id AS purchase_id, asof.value AS purchase_value
        |FROM asof_join('graft_asof_clicks', 'graft_asof_purchases',
        |               'user_id', 'ts', 'ts', 'event_id', 'merge')""".stripMargin)
  }

  /** q131's STALENESS-BOUNDED lookup issued from PURE SQL — the
    * `asof_join` TVF's 8th argument ('86400000000' = one day of epoch
    * micros, the axis's own arithmetic) must thread the bound into the
    * SAME kernel the DataFrame path uses ([[graft.plans.AsofMerger]]'s
    * row-local comparison, pruning-transparent). Same DuckDB
    * bounded-argmax oracle as q131: SQL and DataFrame tolerance cannot
    * drift. */
  private val q133AsofJoinSqlStale: Q = (s, d) => {
    import s.implicits._
    val ev = eventsTsMicros(s, d)
    ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id", $"ts")
      .createOrReplaceTempView("graft_asof_clicks")
    ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts", $"value")
      .createOrReplaceTempView("graft_asof_purchases")
    s.sql(
      """SELECT user_id, event_id AS click_id,
        |  asof.event_id AS purchase_id, asof.value AS purchase_value
        |FROM asof_join('graft_asof_clicks', 'graft_asof_purchases',
        |               'user_id', 'ts', 'ts', 'event_id', 'merge',
        |               '86400000000')""".stripMargin)
  }

  /** q73's lookup from SQL through the TVF's 'auto' path: the
    * STRATEGY's stats-driven selection — at gate scale the purchases
    * view fits autoBroadcastJoinThreshold, so [[graft.plans
    * .AsofJoinStrategy]] must plan [[graft.plans.BroadcastAsofJoinExec]]
    * (ExtensionsSpec pins the exec; this gate pins the answers under
    * q73's DuckDB oracle). Until round 15 the SQL gates forced 'merge',
    * leaving the auto selection spec-pinned but not oracle-gated from
    * SQL. */
  private val q134AsofJoinSqlAuto: Q = (s, d) => {
    import s.implicits._
    val ev = eventsTsMicros(s, d)
    ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id", $"ts")
      .createOrReplaceTempView("graft_asof_clicks")
    ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts", $"value")
      .createOrReplaceTempView("graft_asof_purchases")
    s.sql(
      """SELECT user_id, event_id AS click_id,
        |  asof.event_id AS purchase_id, asof.value AS purchase_value
        |FROM asof_join('graft_asof_clicks', 'graft_asof_purchases',
        |               'user_id', 'ts', 'ts', 'event_id', 'auto')""".stripMargin)
  }

  /** q73's lookup from SQL through the TVF's 'split' path (round 15):
    * [[graft.plans.ResolveAsofJoin.lowerSplit]]'s (key, coarse time
    * bucket) construction — the skew answer, now reachable from pure
    * SQL, with the bucket bounds as runtime scalar subqueries instead
    * of a planning-time driver job. Same oracle as
    * q73/q84/q126–q128/q130/q132: nine plans, one contract.
    * ExtensionsSpec pins the >= 2-tasks-share-the-hot-key spread. */
  private val q135AsofJoinSqlSplit: Q = (s, d) => {
    import s.implicits._
    val ev = eventsTsMicros(s, d)
    ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id", $"ts")
      .createOrReplaceTempView("graft_asof_clicks")
    ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts", $"value")
      .createOrReplaceTempView("graft_asof_purchases")
    s.sql(
      """SELECT user_id, event_id AS click_id,
        |  asof.event_id AS purchase_id, asof.value AS purchase_value
        |FROM asof_join('graft_asof_clicks', 'graft_asof_purchases',
        |               'user_id', 'ts', 'ts', 'event_id', 'split:8')""".stripMargin)
  }

  /** The stored-dimension skew shape from PURE SQL (round 15): the
    * dimension at rest ([[asofDimStore]]) recorded its time axis in a
    * manifest note at build; this gate reads the note
    * ([[asofDimTimeBounds]]) and interpolates it into the TVF's
    * 'split:8:lo:hi' path, so the lowering plans NO bounds subquery —
    * the SQL twin of q128's `splitBounds` workflow (a caller that
    * already knows the range never re-scans the time columns for it).
    * Same oracle as the rest of the family: eleven plans, one
    * contract. ExtensionsSpec pins the no-subquery plan shape. */
  private val q136AsofJoinSqlSplitBounds: Q = (s, d) => {
    import s.implicits._
    eventsTsMicros(s, d).filter($"event_type" === "click")
      .select($"user_id", $"event_id", $"ts")
      .createOrReplaceTempView("graft_asof_clicks_sb")
    asofDimStore(s, d).createOrReplaceTempView("graft_asof_dim_sb")
    // a pre-note store root (or an empty dim, whose build skips the
    // note) degrades to plain 'split:8' — subquery bounds, q135's
    // shape — mirroring q128's Option splitBounds contract instead of
    // failing the whole sweep on a missing sidecar
    val path = asofDimTimeBounds(s, d) match {
      case Some((lo, hi)) => s"split:8:$lo:$hi"
      case None => "split:8"
    }
    s.sql(
      s"""SELECT user_id, event_id AS click_id,
         |  asof.event_id AS purchase_id, asof.value AS purchase_value
         |FROM asof_join('graft_asof_clicks_sb', 'graft_asof_dim_sb',
         |               'user_id', 'ts', 'ts', 'event_id',
         |               '$path')""".stripMargin)
  }

  /** The DEPLOYMENT KNOB's SQL behavior under the oracle (round 16 —
    * the r15 verdict's item 5): `spark.graft.asof.skewSplits` set on
    * the session, path 'merge' — the conf must reroute the SQL front
    * door through the split lowering (ExtensionsSpec pins the >= 2-task
    * hot-key spread for this exact shape) and the answers must still
    * hash-match q73's DuckDB oracle. Until now the conf-routed SQL path
    * had only in-JVM spec proof; q135 forces the explicit 'split:8'
    * path instead. The conf only matters while the plan is ANALYZED
    * (the lowering reads it during analysis; execution never re-reads
    * it) and rides the gate's conf SIGNATURE into an isolated clone —
    * see [[inIsolatedSession]] — so no other gate or caller can ever
    * observe it. */
  private val q137AsofJoinSqlSkewConf: Q = (s, d) =>
    inIsolatedSession(s, skewGateConfs) { s2 =>
      import s2.implicits._
      val ev = eventsTsMicros(s2, d)
      ev.filter($"event_type" === "click")
        .select($"user_id", $"event_id", $"ts")
        .createOrReplaceTempView("graft_asof_clicks")
      ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id", $"ts", $"value")
        .createOrReplaceTempView("graft_asof_purchases")
      s2.sql(
        """SELECT user_id, event_id AS click_id,
          |  asof.event_id AS purchase_id, asof.value AS purchase_value
          |FROM asof_join('graft_asof_clicks', 'graft_asof_purchases',
          |               'user_id', 'ts', 'ts', 'event_id', 'merge')""".stripMargin)
    }

  /** Run `body` against a CLONED session (round 17 — r16 verdict item
    * 7): the conf-routed gates set `spark.graft.asof.skewSplits`
    * around analysis, and a try/finally restore on the SHARED session
    * is only safe while nothing analyzes concurrently. `newSession()`
    * shares the SparkContext, the external catalog (stored tables stay
    * visible), and the injected extensions, but carries its OWN
    * runtime conf and temp-view registry — so the knob (and the gate's
    * temp views) can never leak into a caller's concurrent analysis.
    * Deployment confs the caller set at runtime (`spark.graft.*` —
    * store root, lease backend) are copied across; the returned
    * DataFrame stays bound to the clone, which shares the context and
    * outlives the call. */
  /** One clone per (PARENT session, gate-conf signature), cached
    * (weakly by parent, so a stopped parent's clones can be
    * collected): every `newSession()` builds a full SessionState and
    * registers a listener bus on the shared context — per-call clones
    * would accumulate across a bench sweep and bill that construction
    * to the measured gate. Keying by the gate's conf values (round 18,
    * r17 verdict item 3) makes the old comment-level contract ("every
    * conf-routed gate sets the SAME knob value") self-enforcing: a
    * future gate requesting a DIFFERENT value gets its own clone
    * instead of silently racing the shared one. */
  private final case class IsolatedClone(session: SparkSession,
      lock: Object)
  private val isolatedSessions = new java.util.WeakHashMap[
    SparkSession,
    scala.collection.mutable.Map[Seq[(String, String)], IsolatedClone]]

  /** Run `body` against a clone of `s` carrying `gateConfs` (the
    * gate's own `spark.graft.*` knobs — applied here, not inside
    * `body`, so the cache can key on them). The per-clone lock is held
    * ACROSS the conf re-sync AND `body` (ADVICE r17): two concurrent
    * gates sharing one clone can no longer interleave a re-sync's
    * unset into each other's analysis — the conf-routed plan shape
    * this machinery exists to preserve. `body` only ANALYZES (temp
    * views + sql, no actions), so the lock is held for microseconds,
    * and the gate confs it pins stay set on the clone afterwards for
    * the returned DataFrame's lazy execution. Same-signature gates
    * share a clone and serialize; different signatures never contend. */
  private[graft] def inIsolatedSession[A](s: SparkSession,
      gateConfs: Seq[(String, String)] = Nil)(
      body: SparkSession => A): A = {
    val key = gateConfs.sortBy(_._1)
    val clone = isolatedSessions.synchronized {
      var perParent = isolatedSessions.get(s)
      if (perParent == null) {
        perParent = scala.collection.mutable.Map.empty
        isolatedSessions.put(s, perParent)
      }
      perParent.getOrElseUpdate(key, {
        val c = s.newSession()
        graft.GraftSession.requireSqlSurface(c)
        IsolatedClone(c, new Object)
      })
    }
    clone.lock.synchronized {
      val s2 = clone.session
      // re-sync the caller's deployment confs each use (store root,
      // lease knobs may have changed — or been UNSET — between gate
      // invocations); the gate's own confs are re-applied after the
      // sync, so clearing stale graft keys first is safe
      val parentGraft = s.conf.getAll.filter(_._1.startsWith("spark.graft."))
      s2.conf.getAll.keysIterator
        .filter(k => k.startsWith("spark.graft.") && !parentGraft.contains(k))
        .toSeq.foreach(s2.conf.unset)
      parentGraft.foreach { case (k, v) => s2.conf.set(k, v) }
      gateConfs.foreach { case (k, v) => s2.conf.set(k, v) }
      body(s2)
    }
  }

  /** The conf signature every skew-routed SQL gate analyzes under. */
  private val skewGateConfs =
    Seq("spark.graft.asof.skewSplits" -> "8")

  /** The conf-routed split over the STORED dimension (round 16): with
    * only `skewSplits` set — no explicit path bounds — the lowering
    * must find the time axis the store build recorded as the
    * `graft.asof.bounds.ts` catalog table property and plan NO bounds
    * subquery (q136's shape, reached without the manual
    * note-interpolation workflow; ExtensionsSpec pins the plan). q135
    * keeps the subquery path: its views read raw parquet, no catalog
    * table, no property. Same oracle as the rest of the family. */
  private val q138AsofJoinSqlSplitStored: Q = (s, d) =>
    inIsolatedSession(s, skewGateConfs) { s2 =>
      import s2.implicits._
      eventsTsMicros(s2, d).filter($"event_type" === "click")
        .select($"user_id", $"event_id", $"ts")
        .createOrReplaceTempView("graft_asof_clicks_ss")
      asofDimStore(s2, d).createOrReplaceTempView("graft_asof_dim_ss")
      s2.sql(
        """SELECT user_id, event_id AS click_id,
          |  asof.event_id AS purchase_id, asof.value AS purchase_value
          |FROM asof_join('graft_asof_clicks_ss', 'graft_asof_dim_ss',
          |               'user_id', 'ts', 'ts', 'event_id', 'merge')""".stripMargin)
    }

  /** The EFFECTIVE dimension (base ∪ committed accept deltas) probed
    * from PURE SQL through the conf-routed split (round 17 — the r16
    * verdict's item 5): a deployment's real view of a mutable stored
    * dimension is exactly this union, and the lowering must reach the
    * base table's `graft.asof.bounds.ts` property THROUGH the
    * union/project/filter wrappers and plan NO bounds subquery
    * (ExtensionsSpec pins the shape). The accept-side bounds refresh
    * ([[refreshAsofBounds]]) keeps the recorded axis covering the
    * sentinel deltas, so the split spreads over the REAL (extended)
    * range instead of clamping every accepted row into the edge
    * bucket. Answers under q129's oracle: the SQL union and the
    * two-leg DataFrame effective join ([[asofJoinEffective]]) cannot
    * drift. Analyzed in an isolated session like q137/q138. */
  private val q139AsofJoinSqlEffective: Q = (s, d) => {
    // the same idempotent sentinel accepts as q129 (replays no-op)
    acceptSentinelBatches(s, d)
    inIsolatedSession(s, skewGateConfs) { s2 =>
      import s2.implicits._
      val ev = eventsTsMicros(s2, d)
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"event_id", $"ts")
      clicks.unionByName(clicks.select(
          ($"user_id" + 10000000L).as("user_id"),
          ($"event_id" + 300000000L).as("event_id"), $"ts"))
        .createOrReplaceTempView("graft_asof_probe_eff")
      asofDimStore(s2, d)
      asofAcceptStore(s2, d)
      val dimT = graft.storage.Storage.tableNameFor("graft_asof_dim", d)
      val accT = graft.storage.Storage.tableNameFor("graft_asofacc", d)
      // lineage-scoped delta leg (foreign accepts from StoreSpec or
      // streams must not leak into the oracle compare); after a
      // compact folds a1/a2 the partitions are gone and the same rows
      // arrive from the base leg — the union is fold-invariant
      s2.sql(
        s"""SELECT user_id, event_id, ts, value FROM `$dimT`
           |UNION ALL
           |SELECT user_id, event_id, ts, value FROM `$accT`
           |WHERE batch_id IN ('a1', 'a2')""".stripMargin)
        .createOrReplaceTempView("graft_asof_dim_eff")
      s2.sql(
        """SELECT user_id, event_id AS click_id,
          |  asof.event_id AS purchase_id, asof.value AS purchase_value
          |FROM asof_join('graft_asof_probe_eff', 'graft_asof_dim_eff',
          |               'user_id', 'ts', 'ts', 'event_id', 'merge')""".stripMargin)
    }
  }

  val queries: Map[String, Q] = Map(
    "q134_asof_join_sql_auto" -> q134AsofJoinSqlAuto,
    "q135_asof_join_sql_split" -> q135AsofJoinSqlSplit,
    "q136_asof_join_sql_split_bounds" -> q136AsofJoinSqlSplitBounds,
    "q137_asof_join_sql_skew_conf" -> q137AsofJoinSqlSkewConf,
    "q138_asof_join_sql_split_stored" -> q138AsofJoinSqlSplitStored,
    "q139_asof_join_sql_effective" -> q139AsofJoinSqlEffective,
    "q126_asof_join_native" -> q126AsofJoinNative,
    "q132_asof_join_sql" -> q132AsofJoinSql,
    "q133_asof_join_sql_stale" -> q133AsofJoinSqlStale,
    "q130_asof_join_native_split" -> q130AsofJoinNativeSplit,
    "q131_asof_join_stale" -> q131AsofJoinStale,
    "q127_asof_join_broadcast" -> q127AsofJoinBroadcast,
    "q128_asof_join_stored" -> q128AsofJoinStored,
    "q129_asof_accept_probe" -> q129AsofAcceptProbe,
    "q58_sessionize" -> q58Sessionize,
    "q59_percentiles" -> q59Percentiles,
    "q73_asof_join" -> q73AsofJoin,
    "q84_asof_join_split" -> q84AsofJoinSplit,
    "q15_latest_snapshot" -> q15Latest,
    "q16_entity_summary" -> q16EntitySummary,
    "q17_coalesce_nonnull" -> q17CoalesceNonNull,
    "q18_json_merge" -> q18JsonMerge,
    "q19_event_dedup" -> q19EventDedup)

  /** Shared by q73 (plain) and q84 (skew-split): the split is a pure
    * plan change, so both must reproduce the same correlated argmax. */
  private lazy val asofSql: String =
      """WITH c AS (
        |  SELECT user_id, event_id, ts FROM events
        |  WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, event_id, ts, value FROM events
        |  WHERE event_type = 'purchase'),
        |m AS (
        |  SELECT c.user_id, c.event_id AS click_id,
        |    (SELECT p.event_id FROM p
        |     WHERE p.user_id = c.user_id AND p.ts <= c.ts
        |     ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS purchase_id
        |  FROM c)
        |SELECT m.user_id, m.click_id, m.purchase_id,
        |  p.value AS purchase_value
        |FROM m LEFT JOIN p ON p.event_id = m.purchase_id""".stripMargin

  private lazy val asofStaleSql: String =
      """WITH c AS (
        |  SELECT user_id, event_id, ts FROM events
        |  WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, event_id, ts, value FROM events
        |  WHERE event_type = 'purchase'),
        |m AS (
        |  SELECT c.user_id, c.event_id AS click_id,
        |    (SELECT p.event_id FROM p
        |     WHERE p.user_id = c.user_id AND p.ts <= c.ts
        |       AND p.ts >= c.ts - INTERVAL 1 DAY
        |     ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS purchase_id
        |  FROM c)
        |SELECT m.user_id, m.click_id, m.purchase_id,
        |  p.value AS purchase_value
        |FROM m LEFT JOIN p ON p.event_id = m.purchase_id""".stripMargin

  /** q129/q139's shared oracle: dimension = purchases ∪ the two
    * accepted SENTINEL-user batches (deterministic transforms of the
    * source purchases, so the oracle reproduces them from
    * events.parquet alone); probe = clicks ∪ the matching sentinel
    * clicks; interval arithmetic mirrors the gates' +1s/+2s micro
    * shifts. */
  private lazy val q129EffectiveSql: String =
      """WITH c0 AS (
        |  SELECT user_id, event_id, ts FROM events
        |  WHERE event_type = 'click'),
        |c AS (
        |  SELECT * FROM c0
        |  UNION ALL
        |  SELECT user_id + 10000000, event_id + 300000000, ts FROM c0),
        |p0 AS (
        |  SELECT user_id, event_id, ts, value FROM events
        |  WHERE event_type = 'purchase'),
        |p AS (
        |  SELECT * FROM p0
        |  UNION ALL
        |  SELECT user_id + 10000000, event_id + 100000000,
        |    ts + INTERVAL 1 SECOND, value * 2
        |  FROM p0 WHERE event_id % 10 = 3
        |  UNION ALL
        |  SELECT user_id + 10000000, event_id + 200000000,
        |    ts + INTERVAL 2 SECOND, value * 3
        |  FROM p0 WHERE event_id % 10 = 7),
        |m AS (
        |  SELECT c.user_id, c.event_id AS click_id,
        |    (SELECT p.event_id FROM p
        |     WHERE p.user_id = c.user_id AND p.ts <= c.ts
        |     ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS purchase_id
        |  FROM c)
        |SELECT m.user_id, m.click_id, m.purchase_id,
        |  p.value AS purchase_value
        |FROM m LEFT JOIN p ON p.event_id = m.purchase_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "q73_asof_join" -> asofSql,
    "q84_asof_join_split" -> asofSql,
    "q126_asof_join_native" -> asofSql,
    "q130_asof_join_native_split" -> asofSql,
    "q132_asof_join_sql" -> asofSql,
    // SQL front-door twins of the auto (broadcast-planned), split, and
    // manifest-bounded split physical paths — the operator swap must
    // never change the answer
    "q134_asof_join_sql_auto" -> asofSql,
    "q135_asof_join_sql_split" -> asofSql,
    "q136_asof_join_sql_split_bounds" -> asofSql,
    // the deployment knob's SQL reroute (q137) and the conf-routed
    // split over the stored dimension's catalog-property bounds (q138)
    // are pure plan changes over the same correlated argmax
    "q137_asof_join_sql_skew_conf" -> asofSql,
    "q138_asof_join_sql_split_stored" -> asofSql,
    // the staleness-bounded variant: same correlated argmax with the
    // window's lower bound (1 day before the click) — shared by the
    // DataFrame gate (q131) and its SQL-TVF twin (q133)
    "q131_asof_join_stale" -> asofStaleSql,
    "q133_asof_join_sql_stale" -> asofStaleSql,
    "q127_asof_join_broadcast" -> asofSql,
    "q128_asof_join_stored" -> asofSql,
    // q139 = q129's effective dimension probed from pure SQL (the
    // base-∪-deltas union) — same accepted sentinel batches, same
    // oracle, conf-routed split with catalog-carried bounds
    "q139_asof_join_sql_effective" -> q129EffectiveSql,
    "q129_asof_accept_probe" -> q129EffectiveSql,
    "q58_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL 1 HOUR
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM g)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  count(*) AS n_events,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
        |FROM sess GROUP BY user_id, session_id""".stripMargin,
    "q59_percentiles" ->
      """SELECT event_type,
        | round(quantile_cont(value, 0.5), 6) AS p50,
        | round(quantile_cont(value, 0.9), 6) AS p90,
        | round(min(value), 6) AS vmin,
        | round(max(value), 6) AS vmax
        |FROM events GROUP BY event_type""".stripMargin,
    "q15_latest_snapshot" ->
      """SELECT user_id, event_type AS last_type, value AS last_value,
        | strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1""".stripMargin,
    "q16_entity_summary" ->
      """SELECT user_id,
        | strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_seen,
        | strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_seen,
        | count(*) AS n_events,
        | count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases
        |FROM events GROUP BY user_id""".stripMargin,
    "q17_coalesce_nonnull" ->
      """SELECT user_id, round(max(latest_value), 6) AS latest_nonclick_value
        |FROM (
        |  SELECT user_id, first_value(
        |    CASE WHEN event_type <> 'click' THEN value END IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY ts DESC, event_id DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS latest_value
        |  FROM events)
        |GROUP BY user_id""".stripMargin,
    "q18_json_merge" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type = 'click' THEN 'c'
        |         WHEN event_type = 'purchase' THEN 'p'
        |         ELSE 'k' END AS kk,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS v
        |  FROM events),
        |latest AS (
        |  -- latest NON-NULL v per key: to_json drops null fields, so a
        |  -- null-k event is an empty patch and never overwrites
        |  SELECT user_id, kk, v FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY user_id, kk ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM e WHERE v IS NOT NULL)
        |  WHERE rn = 1),
        |assembled AS (
        |  SELECT user_id,
        |    '{' || string_agg('"' || kk || '":' || v, ',' ORDER BY kk) || '}'
        |      AS merged_props
        |  FROM latest GROUP BY user_id)
        |SELECT user_id, merged_props,
        |  CAST(json_extract_string(merged_props, '$.k') AS BIGINT) AS k_final
        |FROM assembled""".stripMargin,
    "q19_event_dedup" ->
      "SELECT DISTINCT user_id, event_type FROM events")
}
