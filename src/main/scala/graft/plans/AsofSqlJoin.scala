package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, AttributeReference, Cast, CreateStruct, Expression,
  ExpressionInfo, IsNotNull, Literal, Subtract, TimestampAddInterval,
  UnaryMinus}
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.catalyst.plans.logical.{
  BinaryNode, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{
  DayTimeIntervalType, NumericType, StringType, TimestampNTZType,
  TimestampType}

/** The SQL surface of the native as-of operator family: a
  * table-valued function
  *
  * {{{
  * SELECT l.*, asof.price
  * FROM asof_join('facts', 'price_history',
  *                'instrument_id', 'trade_ts', 'price_ts', 'seq')
  * -- optional 7th arg: 'auto' (default), 'broadcast', 'merge'
  * }}}
  *
  * so a pure-SQL user reaches the exact operator the DataFrame API
  * plans ([[AsofJoinPlan]] → [[AsofJoinExec]]/[[BroadcastAsofJoinExec]])
  * — until round 13 the engine's flagship custom operator was
  * DataFrame-only and the SQL surface stopped at scalar functions.
  *
  * Mechanics: the TVF builder runs during analysis and only sees its
  * argument EXPRESSIONS (the table names as string literals), so it
  * returns an [[UnresolvedAsofJoin]] carrying [[UnresolvedRelation]]
  * children plus the column NAMES; once the analyzer has resolved the
  * children, [[ResolveAsofJoin]] lowers the node into the same
  * construction [[graft.operators.AsofJoin.asofJoinNative]] builds —
  * null-time right rows filtered, right columns re-aliased to fresh
  * exprIds (self-joins from one scan stay disjoint), the same key /
  * time / float-key type checks — so the two front doors cannot drift.
  * The lowered plan then meets [[PushFilterThroughAsofJoin]] and
  * [[PruneAsofPayload]] in the optimizer exactly like the DataFrame
  * path (the SQL spec pins pushdown + pruning firing).
  *
  * Registered by [[graft.GraftExtensions]] (injectTableFunction +
  * injectResolutionRule). Both pieces are session-BUILD-time hooks, so
  * the SQL surface needs `spark.sql.extensions=graft.GraftExtensions`
  * (which [[graft.GraftSession]] sets for every engine entry point);
  * a runtime [[GraftPlans.install]] cannot add analyzer rules to an
  * already-built session — use the DataFrame API there.
  */
object AsofSqlJoin {

  /** Argument shape: (left_table, right_table, keys_csv, left_time,
    * right_time, tie_break[, path[, max_stale]]) — all string
    * literals; path is 'auto' | 'broadcast' | 'merge'; max_stale is
    * the staleness bound ([[graft.operators.AsofJoin
    * .asofJoinTolerance]] semantics) as a literal in the time axis's
    * own arithmetic — '86400000000' for a day of epoch micros, or
    * 'INTERVAL 1 DAY' for a timestamp axis. */
  val usage: String = "asof_join(left_table, right_table, " +
    "'k1,k2', left_time, right_time, tie_break[, " +
    "'auto'|'broadcast'|'merge'[, max_stale]])"

  private def stringArg(e: Expression, what: String): String = e match {
    case Literal(v, StringType) if v != null => v.toString
    case other if other.foldable && other.dataType == StringType &&
        other.eval() != null => other.eval().toString
    case other => throw new IllegalArgumentException(
      s"asof_join: $what must be a string literal, got $other — $usage")
  }

  /** The TVF builder ([[graft.GraftExtensions]] injects it as
    * `asof_join`). */
  val builder: Seq[Expression] => LogicalPlan = args => {
    if (args.length < 6 || args.length > 8)
      throw new IllegalArgumentException(
        s"asof_join takes 6 to 8 arguments, got ${args.length} — $usage")
    val broadcast = if (args.length >= 7)
      stringArg(args(6), "path") match {
        case "auto" => None
        case "broadcast" => Some(true)
        case "merge" => Some(false)
        case other => throw new IllegalArgumentException(
          s"asof_join: unknown path '$other' (auto|broadcast|merge)")
      }
    else None
    // max_stale parses NOW (fail fast on syntax) and must fold to a
    // literal — the bound is a constant of the query, not a per-row
    // expression
    val maxStale = if (args.length == 8) {
      val text = stringArg(args(7), "max_stale")
      // folding stays inside the guard: a foldable-but-context-needing
      // expression (e.g. a timestamp cast wanting a session timezone)
      // must surface as the contract error, not a raw internal throw
      val lit =
        try {
          val e = CatalystSqlParser.parseExpression(text)
          require(e.foldable,
            s"asof_join: max_stale must be a literal, got '$text'")
          Literal.create(e.eval(), e.dataType)
        } catch {
          case ex: IllegalArgumentException => throw ex
          case ex: Exception => throw new IllegalArgumentException(
            s"asof_join: cannot evaluate max_stale '$text' as a " +
              s"literal (${ex.getClass.getSimpleName}: ${ex.getMessage}) " +
              s"— $usage")
        }
      Some(lit)
    } else None
    def rel(i: Int, what: String) = UnresolvedRelation(
      CatalystSqlParser.parseMultipartIdentifier(stringArg(args(i), what)))
    val keys = stringArg(args(2), "keys")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(keys.nonEmpty, s"asof_join: keys must be non-empty — $usage")
    UnresolvedAsofJoin(rel(0, "left_table"), rel(1, "right_table"), keys,
      stringArg(args(3), "left_time"), stringArg(args(4), "right_time"),
      stringArg(args(5), "tie_break"), broadcast, maxStale)
  }

  /** What [[graft.GraftExtensions]] passes to injectTableFunction. */
  val description: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan) =
    (FunctionIdentifier("asof_join"),
      new ExpressionInfo(AsofSqlJoin.getClass.getCanonicalName, "asof_join"),
      builder)
}

/** The analysis-time placeholder [[AsofSqlJoin.builder]] returns: the
  * relations are still unresolved when the TVF builder runs, so the
  * typed [[AsofJoinPlan]] (whose attributes and output struct type
  * need the children's schemas) cannot be built yet. `resolved` is
  * pinned false so the analyzer keeps iterating until
  * [[ResolveAsofJoin]] lowers it; like Spark's own unresolved nodes it
  * exposes no output. */
case class UnresolvedAsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    keys: Seq[String],
    leftTime: String,
    rightTime: String,
    tieBreak: String,
    broadcast: Option[Boolean],
    maxStale: Option[Literal] = None) extends BinaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] = Nil
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): UnresolvedAsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Lowers [[UnresolvedAsofJoin]] to [[AsofJoinPlan]] once both
  * children are resolved — the plan-level twin of
  * [[graft.operators.AsofJoin.asofJoinNative]]'s construction, with
  * the same safety checks (unique column resolution, key/time type
  * equality, float-key rejection). Injected as an analyzer resolution
  * rule by [[graft.GraftExtensions]]. */
object ResolveAsofJoin extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedAsofJoin if u.childrenResolved => lower(u)
    }

  private def lower(u: UnresolvedAsofJoin): LogicalPlan = {
    def attr(p: LogicalPlan, name: String, side: String): Attribute = {
      val hits = p.output.filter(_.name == name)
      require(hits.size == 1,
        s"asof_join: column '$name' resolved to ${hits.size} attributes " +
          s"on the $side side (${p.output.map(_.name).mkString(", ")})")
      hits.head
    }
    // same construction as the DataFrame path, same guards: the left
    // relation may not already carry an 'asof' column (the output
    // would hold two same-named columns and die downstream with a
    // generic ambiguity instead of this contract error)
    require(u.left.output.forall(_.name != "asof"),
      "asof_join: the left table already has an 'asof' column")
    // drop null right times (they cannot satisfy rightTime <=
    // leftTime), then re-alias every right column so a self-join's
    // sides get disjoint exprIds
    val rFiltered = Filter(
      IsNotNull(attr(u.right, u.rightTime, "right")), u.right)
    val rFresh = Project(
      rFiltered.output.map(a => Alias(a, a.name)()), rFiltered)
    val lKeys = u.keys.map(attr(u.left, _, "left"))
    val rKeys = u.keys.map(attr(rFresh, _, "right"))
    lKeys.zip(rKeys).foreach { case (l, r) =>
      require(l.dataType == r.dataType,
        s"asof_join: key type mismatch: ${l.name} ${l.dataType} vs " +
          s"${r.dataType}")
    }
    lKeys.foreach { k =>
      require(!graft.operators.AsofJoin.hasFloat(k.dataType),
        s"asof_join: key '${k.name}' is ${k.dataType}: floating-point " +
          "keys are not supported — cast to an integral, decimal, or " +
          "string type")
    }
    val lT = attr(u.left, u.leftTime, "left")
    val rT = attr(rFresh, u.rightTime, "right")
    require(lT.dataType == rT.dataType,
      s"asof_join: time type mismatch: ${lT.dataType} vs ${rT.dataType}")
    val payload = rFresh.output.filterNot(a => u.keys.contains(a.name))
    val asofOut = AttributeReference(
      "asof", CreateStruct(payload).dataType, nullable = true)()
    // the staleness bound: same precomputed-left-column mechanics as
    // the DataFrame path, with the arithmetic constructed RESOLVED for
    // the two time-axis shapes the engine supports from SQL — a
    // numeric axis minus a numeric literal, and a timestamp axis minus
    // a day-time interval literal (TimestampAddInterval of the negated interval;
    // its session-timezone field is filled by the analyzer's
    // ResolveTimeZone in the same fixpoint)
    val boundExpr: Option[Expression] = u.maxStale.map { ms =>
      val built = (lT.dataType, ms.dataType) match {
        case (t: NumericType, s: NumericType) =>
          // NEVER narrow the literal into the axis type: a non-ANSI
          // cast would silently wrap ('86400000000' over an INT axis)
          // or truncate ('1.5' over a LONG axis) — fail the way the
          // DataFrame path's widening arithmetic + type require does
          val widened = org.apache.spark.sql.catalyst.analysis
            .TypeCoercion.findTightestCommonType(t, s)
          require(widened.contains(t),
            s"asof_join: max_stale type $s does not fit the $t time " +
              "axis without narrowing — pass a literal of the axis's " +
              "own arithmetic")
          Subtract(lT, Cast(ms, t))
        case (TimestampType | TimestampNTZType, _: DayTimeIntervalType) =>
          TimestampAddInterval(lT, UnaryMinus(ms))
        case (t, s) => throw new IllegalArgumentException(
          s"asof_join: max_stale of type $s cannot bound a $t time " +
            "axis — use a numeric literal for a numeric axis, or a " +
            "day-time INTERVAL literal for a timestamp axis")
      }
      // the kernels compare the bound and the candidate's time under
      // ONE natural ordering built from the time type — mirror the
      // DataFrame path's require so e.g. a decimal axis (where
      // Subtract bumps precision and changes the UnsafeRow format)
      // fails loudly on BOTH front doors instead of comparing garbage
      require(built.dataType == rT.dataType,
        s"asof_join: staleness bound type ${built.dataType} " +
          s"(left_time - max_stale) must equal the right time type " +
          s"${rT.dataType} — the kernels compare them under one " +
          "natural ordering")
      built
    }
    boundExpr match {
      case None =>
        AsofJoinPlan(u.left, rFresh, lKeys, rKeys, lT, rT,
          attr(rFresh, u.tieBreak, "right"), payload, asofOut, u.broadcast)
      case Some(be) =>
        require(u.left.output.forall(_.name != "__asof_bound"),
          "asof_join: the left table may not use the reserved name " +
            "__asof_bound")
        val boundAlias = Alias(be, "__asof_bound")()
        val leftB = Project(u.left.output :+ boundAlias, u.left)
        val node = AsofJoinPlan(leftB, rFresh, lKeys, rKeys, lT, rT,
          attr(rFresh, u.tieBreak, "right"), payload, asofOut, u.broadcast,
          toleranceBound = Some(boundAlias.toAttribute))
        // strip the helper column, exactly like the DataFrame path's
        // drop — the all-attribute Project collapses into the user's
        // own projection in the optimizer, so pruning is unaffected
        Project(u.left.output :+ asofOut, node)
    }
  }
}
