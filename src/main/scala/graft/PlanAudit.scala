package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec

/** Post-execution plan audit: how many times does the FINAL adaptive
  * plan actually scan each input file? A string grep over the printed
  * plan overcounts — cached relations print their provenance scans and
  * the "Initial Plan" section repeats everything — so this walks the
  * plan TREE: recursing into query stages, deduplicating stage objects
  * by identity (AQE reuse shares the same stage instance at multiple
  * tree positions — it executes once), stopping at InMemoryTableScan
  * (a cache read, not a scan) and ReusedExchange (counted, no re-scan).
  *
  * >1 live scan of the same file means a multi-branch subtree failed
  * exchange reuse — usually the isnotnull-pushdown canonicalization
  * break when a frame joins its own re-aggregate (the round-2 7x
  * Pipeline pathology in query form; see TextAnalysis.bigramLm).
  */
object PlanAudit {

  final case class Audit(scans: Seq[String], cacheReads: Int, reused: Int)

  def audit(root: SparkPlan): Audit = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[AnyRef, java.lang.Boolean]())
    def walk(p: SparkPlan): Audit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec =>
        if (seen.add(q)) walk(q.plan) else Audit(Nil, 0, 1)
      case f: FileSourceScanExec =>
        val cols = f.requiredSchema.fieldNames.length
        // full path, not basename: two datasets whose directories share
        // a final segment must not conflate into one scan count
        Audit(Seq(f.relation.location.rootPaths.map(_.toUri.getPath).mkString(",") +
          (if (cols == 0) "(rowcount)" else "")), 0, 0)
      case _: InMemoryTableScanExec => Audit(Nil, 1, 0)
      case _: ReusedExchangeExec => Audit(Nil, 0, 1)
      case other =>
        val parts = (other.children ++ other.subqueries).map(walk)
        Audit(parts.flatMap(_.scans), parts.map(_.cacheReads).sum,
          parts.map(_.reused).sum)
    }
    walk(root)
  }

  /** Live scan count per file name (rowcount-only scans keyed apart). */
  def liveScans(root: SparkPlan): Map[String, Int] =
    audit(root).scans.groupBy(identity).view.mapValues(_.size).toMap
}
