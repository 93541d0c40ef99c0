package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{ArrayType, StringType}

/** SURVEY §4's routing-pushdown rule: turn per-record routing
  * predicates into SOURCE selection.
  *
  * The reference's multicast is materialized per topic — a record with
  * destinations {reid, save} is physically present in BOTH topics'
  * partitions, and a consumer "filters" by subscribing to one topic
  * (`Stream.java:72-76`, `DataType.java:26-46`: 1 type = 1 topic). The
  * at-rest analog is [[graft.storage.RoutedStore]]: the routed stream
  * exploded on `dest_ports`, written partitioned by `port`, with the
  * writer-enforced ROW-WISE invariant (each stored copy carries only
  * its own port in `dest_ports`, like a Kafka message produced to one
  * topic)
  *
  *   row stored under partition p  ⟺  array_contains(dest_ports, p),
  *
  * which makes the rewrite below a strict equivalence — the array
  * filter and the partition filter select the same multiset of rows.
  *
  * Catalyst cannot push `array_contains(dest_ports, p)` into a parquet
  * scan (no array pushdown), so a consumer's routing filter reads every
  * topic directory and filters row-by-row. This rule rewrites such a
  * filter — including OR-disjunctions over several ports — over a
  * routed-layout relation by conjoining the equivalent partition
  * predicate `port = p` (resp. `port IN (p1..pn)`), which
  * FileSourceStrategy then evaluates at file-listing time: the scan
  * never lists, opens, or reads the other topics' directories. The
  * original array predicate is kept (it is true by the invariant, and
  * costs one codegen'd check per surviving row), so the rewrite is
  * purely additive.
  *
  * The routed layout is recognized structurally: the filter's child
  * must expose, through Project/Filter/SubqueryAlias only, a
  * HadoopFsRelation whose PARTITION schema has `port: string` and whose
  * data schema has `dest_ports: array<string>` — the shape only
  * RoutedStore writes.
  *
  * Injected by GraftExtensions (extension-built sessions) or
  * imperatively via [[install]] (pre-existing sessions) — idempotent
  * either way: a port predicate is only added when the same-set
  * predicate is not already present, so the fixpoint batch terminates.
  */
object RoutingPushdown extends Rule[LogicalPlan] with PredicateHelper {

  /** Register on a live session (the `getOrCreate`-reused-session path,
    * where `withExtensions` is silently ignored). */
  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(RoutingPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RoutingPushdown
  }

  /** The `port` attribute if `plan` is a routed-store read: descends
    * transparent nodes only, so the invariant provably comes from the
    * scanned relation itself. */
  private def routedPortAttr(plan: LogicalPlan): Option[Attribute] = plan match {
    case r: LogicalRelation =>
      r.relation match {
        case fs: HadoopFsRelation
            if fs.partitionSchema.exists(f =>
              f.name == "port" && f.dataType == StringType) &&
              fs.dataSchema.exists(f =>
                f.name == "dest_ports" &&
                  f.dataType == ArrayType(StringType, true)) =>
          r.output.find(_.name == "port")
        case _ => None
      }
    case p: Project       => routedPortAttr(p.child).filter(p.outputSet.contains)
    case f: Filter        => routedPortAttr(f.child)
    case a: SubqueryAlias => routedPortAttr(a.child)
    case _                => None
  }

  /** The port literals of a conjunct that is `array_contains(dest_ports,
    * lit)` or an OR-tree of such — None if any disjunct is anything else
    * (a mixed OR cannot be narrowed to a port set). */
  private def portsOf(conjunct: Expression): Option[Seq[String]] = conjunct match {
    case Or(l, r) =>
      for (a <- portsOf(l); b <- portsOf(r)) yield a ++ b
    case ArrayContains(a: AttributeReference, Literal(p, StringType))
        if a.name == "dest_ports" && p != null =>
      Some(Seq(p.toString))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child)
        if cond.references.exists(_.name == "dest_ports") =>
      routedPortAttr(child) match {
        case None => f
        case Some(portAttr) =>
          val conjuncts = splitConjunctivePredicates(cond)
          // port-predicates already present (as value sets), for idempotence
          val present: Set[Set[String]] = conjuncts.collect {
            case EqualTo(a: Attribute, Literal(p, StringType))
                if a.semanticEquals(portAttr) && p != null => Set(p.toString)
            case In(a: Attribute, vs)
                if a.semanticEquals(portAttr) &&
                  vs.forall(_.isInstanceOf[Literal]) =>
              vs.collect { case Literal(p, StringType) if p != null =>
                p.toString }.toSet
          }.toSet
          val toAdd = conjuncts.flatMap(portsOf)
            .map(_.distinct)
            .filterNot(ps => present.contains(ps.toSet))
            .map {
              case Seq(p) => EqualTo(portAttr, Literal(p))
              case ps     => In(portAttr, ps.map(Literal(_)))
            }
          if (toAdd.isEmpty) f
          else Filter((cond +: toAdd).reduce(And), child)
      }
  }
}
