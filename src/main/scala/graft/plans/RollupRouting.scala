package graft.plans

import java.time.{LocalDate, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.planning.PhysicalOperation
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Rollup-aware query ROUTING as an optimizer rule (VERDICT r10 missing
  * #3 — the transparent half; `Ingest.caggRoute` is the explicit half).
  * The materialized-view rewrite every serving layer wants: a user (or a
  * dashboard generator) writes the NAIVE aggregate against the raw
  * day-partitioned events layout —
  *
  *   raw.filter(ts ∈ [lo, hi)).groupBy(date_trunc(day|hour, ts), type)
  *      .agg(count(1))
  *
  * — and this rule, knowing (from the writer-registered catalog) that an
  * hourly rollup of that layout exists for days < cutoff, rewrites the
  * plan to `sum(cnt)` over the stored rollup for the closed range
  * unioned with on-the-fly hourly partials over ONLY the open tail
  * (whose injected day bounds partition-prune the raw scan). At 100 TB
  * the dashboard query drops from a month of raw scan to a summary-file
  * read plus today's directories — with no query change.
  *
  * Soundness: the rewrite fires ONLY when it is bit-exact — grouping at
  * hour grain or coarser (the rollup's grain divides it) and aggregates
  * that are COUNTs (exact longs; `count(1)` ≡ `sum(rollup.cnt)`). Value
  * sums are deliberately NOT routed transparently: the rollup stores
  * 8dp-rounded hourly partials, so a sum served from it differs from the
  * raw sum in deep decimals — that documented two-level-rounding serve
  * contract is the EXPLICIT `caggRoute`/`caggDailyServe` path, opted
  * into by calling it. A transparent rule must never change results.
  * Further guards: every filter conjunct must be a ts bound with foldable
  * literals (any other predicate bails — the rollup could not replay
  * it), lo < cutoff (otherwise routing buys nothing — which also stops
  * the rewritten tail aggregate from re-matching the rule), and the
  * relation's root path must carry a catalog entry. Activated per
  * session via `spark.experimental.extraOptimizations` (no
  * SparkSessionExtensions needed). */
object RollupRouting extends Rule[LogicalPlan] with PredicateHelper {

  /** Conf catalog: comma-separated `rawPath|rollupPath|cutoffDay`. */
  val CatalogKey = "spark.graft.rollup.catalog"

  private val Routed = TreeNodeTag[Boolean]("graft.rollup.routed")

  private val CoarserThanHour =
    Set("hour", "day", "week", "month", "quarter", "year")

  final case class Entry(rawPath: String, rollupPath: String, cutoffDay: String)

  def register(spark: SparkSession, rawPath: String, rollupPath: String,
      cutoffDay: String): Unit = {
    val e = s"${norm(rawPath)}|$rollupPath|$cutoffDay"
    val cur = spark.conf.getOption(CatalogKey).getOrElse("")
    if (!cur.split(',').contains(e))
      spark.conf.set(CatalogKey, if (cur.isEmpty) e else s"$cur,$e")
    if (!spark.experimental.extraOptimizations.contains(RollupRouting))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RollupRouting
  }

  private def norm(p: String): String =
    p.stripPrefix("file:").replaceAll("/+$", "")

  private def entries: Seq[Entry] =
    SQLConf.get.getConfString(CatalogKey, "").split(',').filter(_.nonEmpty).toSeq
      .flatMap { s =>
        s.split('|') match {
          case Array(a, b, c) => Some(Entry(a, b, c))
          case _ => None
        }
      }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val cat = entries
    if (cat.isEmpty) plan
    else plan.transformDown {
      case agg: Aggregate if agg.getTagValue(Routed).isEmpty =>
        tryRoute(agg, cat).getOrElse(agg)
    }
  }

  private def dayUs(day: String): Long =
    LocalDate.parse(day).atStartOfDay.toEpochSecond(ZoneOffset.UTC) * 1000000L

  private def fmtUs(us: Long): String =
    LocalDateTime.ofEpochSecond(us / 1000000L, ((us % 1000000L) * 1000).toInt,
      ZoneOffset.UTC).toString.replace('T', ' ')

  private def tryRoute(agg: Aggregate, cat: Seq[Entry]): Option[LogicalPlan] = {
    val (groups, aggExprs, child) =
      (agg.groupingExpressions, agg.aggregateExpressions, agg.child)
    // projects+filters over a file relation (column pruning has already
    // inserted Projects by the time extraOptimizations run)
    val (projects, filters, rel, fsRel) = child match {
      case PhysicalOperation(ps, fs, r: LogicalRelation)
          if r.relation.isInstanceOf[HadoopFsRelation] =>
        val h = r.relation.asInstanceOf[HadoopFsRelation]
        (ps, fs, r, h)
      case _ => return None
    }
    val entry = {
      val roots = fsRel.location.rootPaths.map(p => norm(p.toString))
      cat.find(e => roots.forall(_.startsWith(e.rawPath))).getOrElse(return None)
    }
    // the optimizer extracts complex groupings into a Project below the
    // Aggregate (`_groupingexpression`); inline those aliases so the
    // shape checks see the real expressions. Inlining a BARE top-level
    // attribute can surface a non-named expression — such shapes are not
    // routable, bail rather than cast
    val aliasMap = AttributeMap(projects.collect {
      case a @ Alias(c, _) => a.toAttribute -> c
    })
    def inline(e: Expression): Expression = e.transformUp {
      case a: AttributeReference if aliasMap.contains(a) => aliasMap(a)
    }
    val groupsIn = groups.map(inline)
    val aggExprsIn = aggExprs.map { e =>
      inline(e) match {
        case ne: NamedExpression => ne
        case _ => return None
      }
    }
    val tsAttr = rel.output.find(a => a.name == "ts" &&
      a.dataType == TimestampNTZType).getOrElse(return None)
    val typeAttr = rel.output.find(_.name == "event_type").getOrElse(return None)
    val dayAttr = rel.output.find(a => a.name == "day" &&
      a.dataType == DateType).getOrElse(return None)

    // every conjunct must be a ts bound (or the implied null check) —
    // anything else bails: the rollup could not replay it
    var lo = Option.empty[Long]
    var hi = Option.empty[Long]
    filters.flatMap(splitConjunctivePredicates).foreach {
        case GreaterThanOrEqual(a: AttributeReference, Literal(v: Long, TimestampNTZType))
          if a.semanticEquals(tsAttr) => lo = Some(v)
        case LessThan(a: AttributeReference, Literal(v: Long, TimestampNTZType))
          if a.semanticEquals(tsAttr) => hi = Some(v)
        case IsNotNull(a: AttributeReference) if a.semanticEquals(tsAttr) => ()
        case _ => return None
      }
    val (loUs, hiUs) = (lo.getOrElse(return None), hi.getOrElse(return None))
    val cutUs = dayUs(entry.cutoffDay)
    if (loUs >= cutUs) return None // pure-tail query: routing buys nothing

    // grouping must be hour-or-coarser truncs of ts (± casts) or event_type
    def isTs(e: Expression): Boolean = e match {
      case a: AttributeReference => a.semanticEquals(tsAttr)
      case Cast(a: AttributeReference, TimestampType, _, _) => a.semanticEquals(tsAttr)
      case _ => false
    }
    def groupOk(e: Expression): Boolean = e match {
      case Cast(inner, DateType, _, _) => groupOk(inner)
      case TruncTimestamp(Literal(fmt, StringType), t, _) if isTs(t) =>
        CoarserThanHour.contains(fmt.toString.toLowerCase)
      case a: AttributeReference => a.semanticEquals(typeAttr)
      case _ => false
    }
    if (!groupsIn.forall(groupOk)) return None
    // aggregates: group refs or count(1)/count(*) only (exact ⇒ routable)
    def isCount(ae: AggregateExpression): Boolean = ae match {
      case AggregateExpression(Count(Seq(Literal(_, _))), _, false, None, _) => true
      case _ => false
    }
    val ok = aggExprsIn.forall {
      case Alias(ae: AggregateExpression, _) => isCount(ae)
      case Alias(e, _) => groupOk(e)
      case e => groupOk(e)
    }
    if (!ok) return None

    // ---- build the routed plan ----
    val session = fsRel.sparkSession
    // closed range from the stored rollup
    val rollup = session.read.parquet(entry.rollupPath)
      .filter(s"h >= TIMESTAMP '${fmtUs(loUs)}' AND h < TIMESTAMP '${fmtUs(math.min(hiUs, cutUs))}'")
      .select("h", "event_type", "cnt")
      .queryExecution.analyzed
    val Seq(rH, rType, rCnt) = rollup.output

    // open tail: hourly partials over the pruned raw directories
    val tailLoUs = math.max(loUs, cutUs)
    val tailCond = And(
      And(GreaterThanOrEqual(tsAttr, Literal(tailLoUs, TimestampNTZType)),
        LessThan(tsAttr, Literal(hiUs, TimestampNTZType))),
      And(GreaterThanOrEqual(dayAttr,
          Literal((tailLoUs / 86400000000L).toInt, DateType)),
        LessThan(dayAttr,
          Literal(((hiUs + 86400000000L - 1) / 86400000000L).toInt, DateType))))
    // mirror the analyzer's typing for date_trunc over NTZ (trunc runs on
    // TimestampType after a UTC micros-identity cast); the rollup's h was
    // written from the same expression, so both union sides are TIMESTAMP
    val tH = Alias(
      TruncTimestamp(Literal("hour"),
        Cast(tsAttr, TimestampType, Some("UTC")), Some("UTC")), "h")()
    val tCnt = Alias(AggregateExpression(
      Count(Seq(Literal(1))), Complete, isDistinct = false), "cnt")()
    val tail = Aggregate(
      Seq(tH.child, typeAttr),
      Seq(tH, typeAttr, tCnt),
      Filter(tailCond, rel))
    tail.setTagValue(Routed, true)
    val Seq(uH, uType, uCnt) =
      Seq(tH.toAttribute, typeAttr.toAttribute, tCnt.toAttribute)

    val union = Union(
      Project(Seq(rH, rType, rCnt), rollup),
      Project(Seq(uH, uType, uCnt), tail))
    val Seq(oH, oType, oCnt) = union.output

    // outer aggregate: the ORIGINAL expressions with ts → h, type → type,
    // count(1) → sum(cnt); aliases keep their exprIds so parents resolve
    def remap(e: Expression): Expression = e.transformUp {
      case a: AttributeReference if a.semanticEquals(tsAttr) => oH
      case a: AttributeReference if a.semanticEquals(typeAttr) => oType
      case ae: AggregateExpression if isCount(ae) =>
        AggregateExpression(Sum(oCnt), Complete, isDistinct = false)
    }
    // top-level bare attribute outputs (event_type) must KEEP their
    // exprIds — parents (Sort, Project) reference them — so they get an
    // explicit Alias carrying the original id; nested references are
    // covered by their enclosing Alias keeping its id through transformUp
    val newAggExprs = aggExprsIn.map {
      case a: AttributeReference if a.semanticEquals(typeAttr) =>
        Alias(oType, a.name)(exprId = a.exprId)
      case e => remap(e).asInstanceOf[NamedExpression]
    }
    val newAgg = Aggregate(groupsIn.map(remap), newAggExprs, union)
    newAgg.setTagValue(Routed, true)
    Some(newAgg)
  }
}
