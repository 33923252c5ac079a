package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}

/** Optimizer rule — tier (b') of the custom-extension ladder, the
  * `Rule[LogicalPlan]` leg next to the Expressions and the
  * Strategy+SparkPlan operator: DERIVED PARTITION FILTERS.
  *
  * A time-partitioned layout stores `day = to_date(ts)` as its partition
  * column, but users (and generated dashboards) filter on raw `ts` —
  * `ts >= X AND ts < Y` alone prunes NOTHING, because partition pruning
  * only sees predicates on the partition column itself, and the planner
  * cannot know `day` is derived from `ts`. This rule encodes that
  * generated-column contract (what Delta's generated-column partition
  * filters do): for every Filter over a day-partitioned file relation
  * whose condition bounds a timestamp column `ts` with literals, it
  * injects the implied `day >= date(X)` / `day <= date(Y)` conjuncts.
  * The derived bounds are a SUPERSET of the original condition (day
  * granularity is coarser), so the rewrite is always sound; the original
  * ts predicate still filters rows inside the scanned directories.
  *
  * At 100 TB this is the difference between "the dashboard's ts-range
  * query scans the year" and "it scans the week", with no query change.
  * Guards: fires only when the relation's root paths are all covered by
  * the `spark.graft.dayFromTs.paths` marker (set by the layout writer —
  * the one component that actually guarantees `day = to_date(ts)`; a
  * processing-date-partitioned table never gets marked, so it is never
  * mis-pruned), the relation is partitioned by a DateType `day`, the
  * condition does not already mention `day` (idempotent under the
  * optimizer's fixed-point loop), and the ts bounds are foldable
  * literals. TIMESTAMP literals convert to day bounds in the WRITER's
  * session timezone, which the marker records per path (ADVICE r7: the
  * zone `to_date(ts)` used at write time is a property of the LAYOUT,
  * not of whoever happens to be querying — converting in the current
  * session zone silently pruned wrong directories once the zones
  * diverged). TIMESTAMP_NTZ is wall-clock and converts zone-free.
  */
object DerivedPartitionFilters extends Rule[LogicalPlan] {

  /** Conf key: comma-separated `pathPrefix=zoneId` entries for layouts
    * whose `day` partition column is derived as `to_date(ts)`, with the
    * session timezone that conversion used at write time. Empty (default)
    * makes the rule inert; `*` opts in every day-partitioned relation at
    * the current session zone (only safe when zones never change). A
    * legacy zone-less entry falls back to the current session zone. */
  val PathsKey = "spark.graft.dayFromTs.paths"

  /** Record that the layout rooted at `path` satisfies day == to_date(ts),
    * stamping the CURRENT session timezone as the layout's writer zone.
    * Called by the writer (graft.sources.Ingest) right after materializing
    * the layout. */
  def registerPath(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    val cur = spark.conf.getOption(PathsKey).getOrElse("")
      .split(',').filter(_.nonEmpty).toSet
    val zone = spark.sessionState.conf.sessionLocalTimeZone
    spark.conf.set(PathsKey, (cur + s"${normalize(path)}=$zone").mkString(","))
  }

  private def normalize(p: String): String = {
    val u = new org.apache.hadoop.fs.Path(p).toUri.getPath
    if (u == null || u.isEmpty) p else u
  }

  /** The writer zone for the relation: Some(zone) iff every root path is
    * covered by the marker AND the covering entries agree on one zone
    * (disagreement = refuse to derive rather than guess). */
  private def writerZone(rel: HadoopFsRelation): Option[java.time.ZoneId] = {
    val raw = conf.getConfString(PathsKey, "")
    val session = java.time.ZoneId.of(conf.sessionLocalTimeZone)
    if (raw.isEmpty) None
    else if (raw.trim == "*") Some(session)
    else {
      val entries = raw.split(',').filter(_.nonEmpty).map { e =>
        e.lastIndexOf('=') match {
          case -1 => (e, session) // legacy zone-less entry
          case i => (e.take(i), java.time.ZoneId.of(e.drop(i + 1)))
        }
      }
      val roots = rel.location.rootPaths
      if (roots.isEmpty) return None
      val zones = roots.map { rp =>
        val p = normalize(rp.toString)
        // ALL covering entries must agree — a path re-registered under a
        // second zone means the layout's provenance is ambiguous: refuse
        entries.collect {
          case (pre, z) if p == pre || p.startsWith(pre + "/") => z
        }.distinct match {
          case Array(z) => Some(z)
          case _ => None
        }
      }
      if (zones.exists(_.isEmpty)) None
      else zones.flatten.distinct match {
        case Seq(z) => Some(z)
        case _ => None // roots written under different zones: refuse
      }
    }
  }

  private val usPerDay = 86400L * 1000000

  /** (lower, upper) epoch-day bounds implied by ts-literal conjuncts. */
  private def tsBounds(cond: Expression, ts: Attribute,
                       zone: java.time.ZoneId): (Option[Int], Option[Int]) = {
    def epochDay(lit: Literal): Option[Int] = lit.dataType match {
      case TimestampNTZType =>
        // wall-clock micros, zone-free by definition
        Some(Math.floorDiv(lit.value.asInstanceOf[Long], usPerDay).toInt)
      case TimestampType =>
        // instant micros: the day directory it falls in is determined by
        // the zone to_date(ts) used AT WRITE TIME (the marker's recorded
        // zone) — never by the querying session's zone
        val inst = java.time.Instant.EPOCH.plus(
          lit.value.asInstanceOf[Long], java.time.temporal.ChronoUnit.MICROS)
        Some(inst.atZone(zone).toLocalDate.toEpochDay.toInt)
      case _ => None
    }
    def walk(e: Expression): (Option[Int], Option[Int]) = e match {
      case And(l, r) =>
        val (ll, lu) = walk(l); val (rl, ru) = walk(r)
        (Seq(ll, rl).flatten.reduceOption(_ max _), Seq(lu, ru).flatten.reduceOption(_ min _))
      case GreaterThanOrEqual(a: Attribute, l: Literal) if a.semanticEquals(ts) => (epochDay(l), None)
      case GreaterThan(a: Attribute, l: Literal) if a.semanticEquals(ts) => (epochDay(l), None)
      case LessThanOrEqual(a: Attribute, l: Literal) if a.semanticEquals(ts) => (None, epochDay(l))
      case LessThan(a: Attribute, l: Literal) if a.semanticEquals(ts) => (None, epochDay(l))
      case GreaterThanOrEqual(l: Literal, a: Attribute) if a.semanticEquals(ts) => (None, epochDay(l))
      case GreaterThan(l: Literal, a: Attribute) if a.semanticEquals(ts) => (None, epochDay(l))
      case LessThanOrEqual(l: Literal, a: Attribute) if a.semanticEquals(ts) => (epochDay(l), None)
      case LessThan(l: Literal, a: Attribute) if a.semanticEquals(ts) => (epochDay(l), None)
      case _ => (None, None)
    }
    walk(cond)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child: LogicalRelation)
      if child.relation.isInstanceOf[HadoopFsRelation] &&
        child.relation.asInstanceOf[HadoopFsRelation].partitionSchema
          .exists(p => p.name == "day" && p.dataType == DateType) &&
        writerZone(child.relation.asInstanceOf[HadoopFsRelation]).isDefined =>
      val zone = writerZone(child.relation.asInstanceOf[HadoopFsRelation]).get
      val out = child.output
      val dayAttr = out.find(_.name == "day").get
      val tsAttr = out.find(a => a.name == "ts" &&
        (a.dataType == TimestampNTZType || a.dataType == TimestampType))
      val alreadyBounded = cond.references.contains(dayAttr)
      tsAttr match {
        case Some(ts) if !alreadyBounded =>
          val (lo, hi) = tsBounds(cond, ts, zone)
          val derived = Seq(
            lo.map(d => GreaterThanOrEqual(dayAttr, Literal(d, DateType)): Expression),
            hi.map(d => LessThanOrEqual(dayAttr, Literal(d, DateType)): Expression)).flatten
          if (derived.isEmpty) f
          else Filter(derived.foldLeft(cond)(And(_, _)), child)
        case _ => f
      }
  }
}
