package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.InputDoc
import graft.kb.Registry
import graft.tables.IceLite

/** Incremental KB population — the reference's defining behavior
  * (indexer/main.py:353-437: entities discovered in one document are
  * visible to the next) re-expressed as a micro-batch loop over IceLite
  * snapshot tables with per-batch lineage checkpointing and resume
  * (north rule: "resumable from checkpoint with per-partition lineage +
  * metrics tables").
  *
  * Batch semantics = the reference's DataEvolver step-k replay
  * (nilcluster/Packages/TimeEvolving.py:11-47): docs inside a batch do
  * not see each other's new entities; every later batch does.
  *
  * State tables under `workDir`:
  *   documents        InputDoc rows            MERGE key (doc_id)
  *   mentions         linked mention rows      MERGE key (doc_id, annset, ann_id)
  *   entity_registry  EntityRecord rows        MERGE key (id, indexer)
  *   triples          (doc_id, subj, pred, obj) MERGE key all four
  *   lineage          (batch_id, stage, status) append-only, no wall-clock
  *   metrics          (batch_id, metric, value) append-only (wall-clock ok;
  *                    excluded from identity checks)
  *
  * Crash consistency: every table commit is an atomic pointer swap; the
  * lineage "done" row for a batch is written LAST, so a kill at any
  * point re-runs the batch, and MERGE INTO keyed upserts make the replay
  * idempotent — the final tables are byte-identical to an uninterrupted
  * run (tested).
  */
object Incremental {

  /** KB state tables. The row tables are hash-BUCKETED on doc_id (a
    * prefix of every merge key), so a micro-batch MERGE rewrites only
    * the touched buckets — O(batch), not O(table), at 10^12 docs.
    * Registry buckets on entity id; lineage/metrics are append-only.
    */
  final case class Tables(workDir: String) {
    val documents = IceLite(s"$workDir/documents", 16, Seq("doc_id"))
    val mentions = IceLite(s"$workDir/mentions", 16, Seq("doc_id"))
    val candidates = IceLite(s"$workDir/mention_candidates", 16, Seq("doc_id"))
    val registry = IceLite(s"$workDir/entity_registry", 8, Seq("id"))
    val triples = IceLite(s"$workDir/triples", 16, Seq("doc_id"))
    val lineage = IceLite(s"$workDir/lineage")
    val metrics = IceLite(s"$workDir/metrics")
  }

  /** Deterministic batch id for a doc (stable across runs/partitionings:
    * Spark murmur3 hash with fixed seed).
    */
  def withBatch(docs: Dataset[InputDoc], numBatches: Int): DataFrame =
    docs.toDF().withColumn("batch_id", pmod(hash(col("doc_id")), lit(numBatches)))

  def doneBatches(spark: SparkSession, t: Tables): Set[Int] =
    t.lineage.read(spark) match {
      case Some(df) => df.filter(col("status") === "done")
        .select("batch_id").distinct().collect().map(_.getInt(0)).toSet
      case None => Set.empty
    }

  /** Registry snapshot each unfinished batch is pinned to (recorded in a
    * batch-start lineage row BEFORE any table mutation). A mid-batch
    * crash replay re-runs against this time-traveled snapshot, not the
    * half-grown registry, so the replay is byte-identical and the keyed
    * MERGEs are idempotent. First attempt's pin wins (min) — later
    * attempts may observe the crashed attempt's registry merge.
    */
  def pinnedSnapshots(spark: SparkSession, t: Tables): Map[Int, Int] =
    t.lineage.read(spark) match {
      case Some(df) => df.filter(col("stage") === "registry_snapshot")
        .groupBy("batch_id").agg(min(col("status").cast("int")).as("snap"))
        .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      case None => Map.empty
    }

  /** Run (or resume) the incremental population. `upToBatch` limits how
    * many batches run this invocation (for kill/resume testing); default
    * runs all remaining.
    */
  def run(spark: SparkSession, docs: Dataset[InputDoc], workDir: String,
          numBatches: Int, upToBatch: Int = Int.MaxValue): Tables = {
    import spark.implicits._
    val t = Tables(workDir)

    if (!t.registry.exists) t.registry.overwrite(Registry.seed(spark).toDF())

    val batched = withBatch(docs, numBatches).cache()
    val done = doneBatches(spark, t)
    val pinned = pinnedSnapshots(spark, t)
    var ran = 0

    (0 until numBatches).foreach { b =>
      if (!done.contains(b) && ran < upToBatch) {
        val batchDocs = batched.filter(col("batch_id") === b)
          .drop("batch_id").as[InputDoc]
        processBatch(spark, t, batchDocs, b, pinned.get(b))
        ran += 1
      }
    }
    batched.unpersist()
    t
  }

  /** One micro-batch of KB population against `t`: pin the registry
    * snapshot, run the pipeline, MERGE results, append metrics, and
    * commit the lineage "done" row LAST (the resume point). Shared by
    * the batch loop above and the Structured Streaming front-end
    * ([[graft.streaming.StreamKb.populate]]) — the crash/replay protocol
    * is identical: a replay of batch `b` (foreachBatch re-invocation or
    * loop resume) is skipped if its done row exists, and otherwise
    * re-runs against the PINNED registry snapshot, making the keyed
    * MERGEs byte-identical to an uninterrupted run.
    */
  def processBatch(spark: SparkSession, t: Tables, batchDocs: Dataset[InputDoc],
                   b: Int, pinnedSnap: Option[Int]): Unit = {
    import spark.implicits._
    val t0 = System.nanoTime()

    // Pin the registry snapshot FIRST (crash idempotency): a replay
    // of this batch must see the registry as of batch start, not the
    // half-merged state a crashed attempt left behind.
    val snapId = pinnedSnap.getOrElse {
      val id = t.registry.latestSnapshot.get
      t.lineage.append(Seq((b, "registry_snapshot", id.toString))
        .toDF("batch_id", "stage", "status"))
      id
    }
    val registry = t.registry.readSnapshot(spark, snapId).cache()

    val res = Pipeline.run(spark, batchDocs, registry)

    t.documents.mergeInto(spark, batchDocs.toDF(), Seq("doc_id"))
    t.mentions.mergeInto(spark,
      res.linked.select("doc_id", "annset", "ann_id", "mention_type",
        "start", "end", "mention", "skip", "entity_id", "title",
        "entity_type", "bi_score", "nil_score", "is_nil", "url", "name"),
      Seq("doc_id", "annset", "ann_id"))
    t.candidates.mergeInto(spark, res.candidates,
      Seq("doc_id", "annset", "ann_id"))
    t.triples.mergeInto(spark, res.triples,
      Seq("doc_id", "subj", "pred", "obj"))
    t.registry.mergeInto(spark, res.newEntities, Seq("id", "indexer"))

    // one fused counting job instead of four eager .count()s — the
    // per-batch serial driver fraction is the scaling bottleneck
    val counts = Seq(
      batchDocs.toDF().select(lit("n_docs").as("metric")),
      res.linked.select(lit("n_mentions").as("metric")),
      res.triples.select(lit("n_triples").as("metric")),
      res.newEntities.select(lit("n_new_entities").as("metric")))
      .reduce(_ unionByName _)
      .groupBy("metric").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val wallMs = (System.nanoTime() - t0) / 1e6

    t.metrics.append((Seq("n_docs", "n_mentions", "n_triples",
        "n_new_entities").map(k => (b, k, counts.getOrElse(k, 0L).toDouble))
      :+ ((b, "wall_ms", wallMs)))
      .toDF("batch_id", "metric", "value"))
    // lineage LAST: commit point for resume
    t.lineage.append(Seq((b, "pipeline", "done")).toDF("batch_id", "stage", "status"))
    registry.unpersist()
  }

  /** I3 reannotate flow (reference pipelinehelper/main.py:19-34): fetch
    * stored documents, re-run the pipeline against the CURRENT registry
    * (entities discovered since the original annotation are now linkable
    * — previously-NIL mentions may resolve to ent: links), and REPLACE
    * the docs' annotations. Stale rows are dropped in the SAME snapshot
    * commit that inserts the fresh ones (IceLite.replaceKeys), so a
    * re-run that emits fewer mentions/triples leaves no orphans AND a
    * crash never leaves a window where the docs' annotations are gone.
    *
    * Crash protocol: a "reannotate_start" lineage row is committed
    * BEFORE any table mutation and a matching "reannotate" row after the
    * last; [[pendingReannotations]] surfaces started-but-unfinished doc
    * sets so a caller can replay them (replay is idempotent: each
    * replaceKeys is keyed and the registry merge is keyed).
    */
  def reannotate(spark: SparkSession, workDir: String,
                 docIds: Seq[String]): Tables = {
    import spark.implicits._
    val t = Tables(workDir)
    val idList = docIds.sorted.mkString(",")
    // bucket-pruned multi-point read: a handful of ids lists only the
    // buckets they hash into, not the whole documents table
    val docs = t.documents.readKeyedIn(spark, docIds).get.as[InputDoc]

    // Registry pin (same protocol as run()'s registry_snapshot rows): a
    // crash REPLAY of this id-set must see the registry as of the first
    // attempt's start — the crashed attempt may already have merged its
    // new NIL entities, and re-running against that half-grown registry
    // would link mentions to entities created by an attempt that "never
    // happened", a state no uninterrupted execution can produce. A
    // dangling start row for the SAME id-set carries the pin to reuse.
    val snapId = latestDanglingSnap(spark, t, idList)
      .getOrElse(t.registry.latestSnapshot.get)
    val registry = t.registry.readSnapshot(spark, snapId).cache()
    val res = Pipeline.run(spark, docs, registry)

    // attempt marker = current lineage snapshot count: unique per attempt
    // (every append bumps it), deterministic (no wall-clock/random), and
    // it lets a done row match ITS start row — a replayed attempt leaves
    // the crashed attempt's start dangling without flagging the replay.
    // The pinned registry snapshot rides in the marker for replays.
    val marker = s"${t.lineage.snapshots.size}:$snapId:$idList"
    t.lineage.append(Seq((-1, "reannotate_start", marker))
      .toDF("batch_id", "stage", "status"))
    val delKeys = docIds.toDF("doc_id")
    t.mentions.replaceKeys(spark, delKeys,
      res.linked.select("doc_id", "annset", "ann_id", "mention_type",
        "start", "end", "mention", "skip", "entity_id", "title",
        "entity_type", "bi_score", "nil_score", "is_nil", "url", "name"))
    t.candidates.replaceKeys(spark, delKeys, res.candidates)
    t.triples.replaceKeys(spark, delKeys, res.triples)
    t.registry.mergeInto(spark, res.newEntities, Seq("id", "indexer"))
    t.lineage.append(Seq((-1, "reannotate", marker))
      .toDF("batch_id", "stage", "status"))
    registry.unpersist()
    t
  }

  /** Doc-id sets of reannotate attempts that started but never recorded
    * completion (crash recovery: replay each with [[reannotate]] —
    * idempotent, and the replay gets its own attempt marker so the
    * crashed attempt's dangling start row never re-flags it).
    */
  /** One parsed reannotate lineage row: (idList, attempt, pinned registry
    * snapshot, isStart). Tolerates all three historical marker formats —
    * "<ids>" (earliest), "<attempt>:<ids>", "<attempt>:<snap>:<ids>" —
    * so crash recovery never throws on a workDir written by older code.
    */
  private def parseMarker(stage: String, status: String): (String, Int, Option[Int], Boolean) = {
    val isStart = stage == "reannotate_start"
    def num(s: String) = s.nonEmpty && s.forall(_.isDigit)
    status.split(":", 3) match {
      case Array(n, s, ids) if num(n) && num(s) => (ids, n.toInt, Some(s.toInt), isStart)
      case Array(n, s, ids) if num(n) => (s"$s:$ids", n.toInt, None, isStart)
      case Array(n, ids) if num(n) => (ids, n.toInt, None, isStart)
      case _ => (status, 0, None, isStart)
    }
  }

  private def reannotateRows(spark: SparkSession, t: Tables): Seq[(String, Int, Option[Int], Boolean)] =
    t.lineage.read(spark) match {
      case None => Seq.empty
      case Some(df) => df.filter(col("stage").startsWith("reannotate"))
        .select("stage", "status").collect().toSeq
        .map(r => parseMarker(r.getString(0), r.getString(1)))
    }

  /** Registry snapshot pinned by the latest UNfinished attempt for this
    * id-set, if any (None for finished sets, unknown sets, or pre-pin
    * marker formats — callers then pin the current snapshot).
    */
  private def latestDanglingSnap(spark: SparkSession, t: Tables,
                                 idList: String): Option[Int] = {
    val attempts = reannotateRows(spark, t).filter(_._1 == idList)
    if (attempts.isEmpty) None
    else {
      val latest = attempts.map(_._2).max
      val latestDone = attempts.exists(a => a._2 == latest && !a._4)
      if (latestDone) None
      else attempts.collectFirst { case (_, `latest`, Some(s), true) => s }
    }
  }

  /** Registry snapshot ids pinned by UNFINISHED work (batches with a
    * registry_snapshot lineage row but no done row; reannotate attempts
    * whose latest marker lacks a completion row). A crash replay
    * time-travels the registry to these — maintenance must not expire
    * them.
    */
  private[graft] def danglingRegistryPins(spark: SparkSession, t: Tables): Set[Int] = {
    val done = doneBatches(spark, t)
    val batchPins = pinnedSnapshots(spark, t)
      .collect { case (b, s) if !done.contains(b) => s }
    val reannPins = reannotateRows(spark, t).groupBy(_._1).values.flatMap {
      attempts =>
        val latest = attempts.map(_._2).max
        val latestDone = attempts.exists(a => a._2 == latest && !a._4)
        if (latestDone) None
        else attempts.collectFirst { case (_, `latest`, Some(s), true) => s }
    }
    (batchPins ++ reannPins).toSet
  }

  /** Table maintenance for a long-lived work dir (Iceberg's
    * expire_snapshots + rewrite_data_files + remove_orphan_files, in
    * that spirit): compact each table's live snapshot into one dir-set,
    * expire history beyond `keepLast`, vacuum crash debris. A
    * micro-batch loop otherwise accretes one data dir (bucketed: one
    * leaf per touched bucket) and one manifest per commit without
    * bound. Run BETWEEN runs, never concurrently with one — IceLite is
    * single-writer. Resume survives it: it reads only the LATEST
    * lineage snapshot (which compaction preserves row-identically), and
    * registry snapshots pinned by unfinished batches or reannotate
    * attempts are excluded from expiry so a post-maintenance replay can
    * still time-travel to its pin.
    */
  def maintain(spark: SparkSession, workDir: String, keepLast: Int = 2): Unit = {
    val t = Tables(workDir)
    val registryPins = danglingRegistryPins(spark, t)
    Seq(t.documents, t.mentions, t.candidates, t.registry, t.triples,
        t.lineage, t.metrics).foreach { tbl =>
      // bucketed KB tables are rewritten key-CLUSTERED: sorted runs give
      // parquet tight row-group min/max stats on the access key, so
      // point/range reads skip row groups instead of scanning the leaf
      if (tbl.numBuckets > 0) tbl.compactSorted(spark, tbl.bucketKeys)
      else tbl.compact(spark)
      tbl.expireSnapshots(keepLast,
        if (tbl eq t.registry) registryPins else Set.empty)
      tbl.vacuum()
    }
  }

  def pendingReannotations(spark: SparkSession, workDir: String): Seq[Seq[String]] = {
    val t = Tables(workDir)
    // an id-set is pending iff its LATEST attempt (highest marker) has
    // no done row — a completed replay supersedes the crashed attempt's
    // dangling start
    reannotateRows(spark, t).groupBy(_._1).toSeq.sortBy(_._1)
      .flatMap { case (ids, attempts) =>
        val latest = attempts.map(_._2).max
        val latestDone = attempts.exists(a => a._2 == latest && !a._4)
        if (latestDone) None else Some(ids.split(",").toSeq)
      }
  }
}
