package graft

import org.apache.spark.sql.SparkSession

/** Whole-surface physical-plan audit: builds every SparkEntry query at
  * fixture scale and records, per query, the plan-shape numbers a
  * 100 TB reviewer asks first — how many hash exchanges (shuffles),
  * how many broadcast exchanges, any cartesian/nested-loop joins, how
  * many whole-stage-codegen spans, and how many parquet scans carry NO
  * pushed filters. Writes one JSON artifact (PLAN_AUDIT.json) so plan
  * claims are auditable in bulk rather than per-curated-case
  * (PlanAuditSpec remains the asserting twin for the load-bearing
  * shapes).
  *
  * Each query is EXECUTED (noop sink) before reading the plan: under
  * AQE the final plan — stage coalescing, broadcast conversions,
  * WholeStageCodegen collapse — only exists after the run. Deliberate
  * nested-loop joins (brute-force oracle twins, broadcast-size
  * non-equi sides) and deliberate single-partition windows
  * (bucket-total prefix sums: q88/q96/q98) are expected hits and
  * annotated in the artifact's notes field.
  */
object PlanSweep {

  private final case class Audit(name: String, exchanges: Int,
      broadcasts: Int, cartesian: Int, bnlj: Int, wscg: Int, scans: Int,
      scansNoPushdown: Int, err: Option[String])

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = if (args.length > 1) args(1) else "PLAN_AUDIT.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    GraftSession.requireSqlSurface(spark)
    spark.sparkContext.setLogLevel("ERROR")
    // isolated store root: the lifecycle gates ACCEPT batches into
    // their durable stores as a side effect of building/executing, and
    // an audit tool must not leave gate batches behind in the shared
    // warehouse root (StoreSpec's strict batch-id assertions own that
    // root's sf0.001 stores)
    val auditRoot =
      java.nio.file.Files.createTempDirectory("graft_plansweep_root")
    spark.conf.set("spark.graft.store.root", auditRoot.toString)
    val audits = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, q) =>
        try {
          val df = graft.engine.CacheRegistry.withRetained {
            q(spark, sfDir)
          }
          // EXECUTE first: under AQE the final plan (stage coalescing,
          // broadcast conversions, WholeStageCodegen collapse) only
          // exists after the run — pre-execution counts would miss
          // codegen spans entirely and overcount exchanges. collect()
          // (not a noop write, which runs a SEPARATE query execution)
          // so THIS Dataset's queryExecution is the one that ran;
          // fixture-scale outputs fit the driver trivially
          df.collect()
          val plan = df.queryExecution.executedPlan.toString
            .split("== Initial Plan ==")(0)
          def count(re: String) = re.r.findAllIn(plan).size
          // WSCG spans render as "*(N) Op" in plan strings — count
          // DISTINCT stage ids, not marked lines
          val wscgSpans = "\\*\\((\\d+)\\)".r
            .findAllMatchIn(plan).map(_.group(1)).toSet.size
          Audit(name,
            exchanges = count("(?<!Reused)Exchange hashpartitioning"),
            broadcasts = count("(?<!Reused)BroadcastExchange"),
            cartesian = count("CartesianProduct"),
            bnlj = count("BroadcastNestedLoopJoin"),
            wscg = wscgSpans,
            scans = count("Scan parquet"),
            scansNoPushdown = count("PushedFilters: \\[\\]"),
            err = None)
        } catch {
          case e: Throwable =>
            // getMessage is null for NPE and many wrapped errors — the
            // error-reporting path must not itself throw and abort the
            // sweep; escape backslashes before quotes so the embedded
            // message can never produce invalid JSON
            val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
            // ALL control chars (not just \n) must go: Spark messages
            // embed plan fragments with tabs/CRs, and a raw control
            // char inside a JSON string breaks json.loads downstream
            Audit(name, -1, -1, -1, -1, -1, -1, -1,
              Some(msg.take(200).replace("\\", "/").replace('"', '\'')
                .map(c => if (c < ' ') ' ' else c)))
        }
    }
    val rows = audits.map { a =>
      s"""{"q":"${a.name}","exchanges":${a.exchanges},""" +
        s""""broadcasts":${a.broadcasts},"cartesian":${a.cartesian},""" +
        s""""bnlj":${a.bnlj},"wscg":${a.wscg},"scans":${a.scans},""" +
        s""""scans_no_pushdown":${a.scansNoPushdown}""" +
        a.err.map(e => s""","err":"$e"""").getOrElse("") + "}"
    }
    val carts = audits.filter(a => a.cartesian > 0 || a.bnlj > 0).map(_.name)
    val json =
      s"""{"what":"EXECUTED (final AQE) physical-plan shape per query at $sfDir: hash exchanges, broadcast exchanges, cartesian/nested-loop joins, WholeStageCodegen spans, parquet scans and how many carry NO pushed filters (a scan feeding an unfilterable projection legitimately has none - the number to watch is a scan under a selective predicate)","notes":"cartesian/bnlj hits split two ways: CartesianProduct appears only in the DECLARED brute-force oracle twins (all-pairs cosine ground truth the indexed paths are gated against); BroadcastNestedLoopJoin instances are deliberate non-equi joins over BROADCAST-SIZE sides (fuzzy-search OR conditions, k-sized centroid/vocab tables, scalar-subquery totals) where a nested loop over a dimension-sized broadcast IS the right plan; single-partition exchanges inside q88/q96/q98 carry only bucket totals (PlanAuditSpec asserts the claims on the curated cases)","cartesian_queries":[${carts.map(c => s""""$c"""").mkString(",")}],"queries":[${rows.mkString(",")}]}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    val bad = audits.filter(_.err.isDefined)
    System.err.println(s"[plansweep] ${audits.size} queries audited, " +
      s"${carts.size} with nested-loop joins (declared brute twins / " +
      s"broadcast-size non-equi sides), " +
      s"${bad.size} errors")
    bad.foreach(a => System.err.println(s"[plansweep] ERR ${a.name}: ${a.err.get}"))
    graft.storage.DurableStores.deleteDir(spark, auditRoot.toString)
    spark.stop()
  }
}
