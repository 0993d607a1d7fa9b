package graft.merge

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Mention

/** Merge of per-source annotation sets into one `entities_merged` set —
  * the Spark re-expression of the reference merger
  * (merge-annotation-sets/merge_sets.py:293-320).
  *
  * Reference algorithm, implemented faithfully:
  *  - P5 annset exclusion + P4 type whitelist (merge_sets.py:77-94);
  *  - F16 normalize_entity (merge_sets.py:50-54);
  *  - span-contextual root type: an annotation's root type comes from a
  *    SAME-SPAN companion in the SAME source annset when the type
  *    relation contains (type -> companion type), else it is its own
  *    normalized type (merge_sets.py:56-74 — determinized: the reference
  *    consults the first overlapping annotation in gatenlp iteration
  *    order, which is insertion-order dependent; we take the minimal
  *    companion type that satisfies the relation);
  *  - ANCHORED overlap groups: annotations sorted by (start, end, type);
  *    a group is its first element plus every following annotation that
  *    starts before the ANCHOR's end — NOT transitive connectivity
  *    (merge_sets.py:99-129: extract_partial compares against
  *    current_element only);
  *  - per group: 5-case root-type consensus (merge_sets.py:184-226),
  *    parts limit (<= 6 tokens if PER root and analyzable else <= 10,
  *    merge_sets.py:243-265 + main.py:15-16), keep ALL tied-longest,
  *    dedup ignoring source (merge_sets.py:151-165).
  *
  * Spark shape: one per-doc shuffle builds transitive overlap CHAINS via
  * the running-max sweep (anchored groups are refinements of chains);
  * each chain — bounded by the overlap fan-in of one text region — is
  * resolved by a pure kernel in flatMapGroups. Linear per partition, no
  * joins; at 10^12 docs this is a single hash shuffle on doc_id.
  */
object MergeAnnsets {

  val AnnSet = "entities_merged"

  /** Reference parts limits (merge-annotation-sets/main.py:15-16). */
  val MaxPerParts = 6
  val MaxParts = 10

  /** type -> root_type relation (reference build_type_relation_df.py:4
    * shape; rows adapted to the engine's fixture type vocabulary).
    */
  val typeRelation: Set[(String, String)] = Set(
    ("ALG", "OP"),
    ("PRODUCT", "ORG"),
    ("ROLE", "PER"),
    ("TYPE", "OP"),
    ("PER", "ORG"),
    ("TRIBUNALE", "LOC"))

  /** source -> priority (higher wins; reference annset priority map,
    * merge-annotation-sets/main.py:90-94).
    */
  val sourcePriority: Map[String, Int] = Map("trie" -> 2, "regex" -> 1)

  /** F16 normalize_entity (merge_sets.py:50-54): 'person'-family types
    * collapse to their 3-char prefix, case preserved.
    */
  def normalizeEntity(t: String): String =
    if (t.toLowerCase == "person") t.take(3) else t

  /** Span-contextual root type (merge_sets.py:56-74, determinized).
    * `companions` = normalized types of OTHER same-span annotations in
    * the same source annset.
    */
  def rootType(selfType: String, companions: Seq[String]): String =
    companions.sorted.find(o => typeRelation.contains((selfType, o)))
      .getOrElse(selfType)

  /** Kernel annotation row (all fields the winners carry forward). */
  final case class Ann(
      doc_id: String, annset: String, mention_type: String,
      root_type: String, start: Int, end: Int, mention: String,
      score: Double, source: String, skip: Boolean, gazetteer_id: Long) {
    def len: Int = end - start
    def parts: Int = mention.split("\\s+").count(_.nonEmpty)
    def prio: Int = sourcePriority.getOrElse(source, 0)
  }

  /** Attach span-contextual root types within a chain: same-span anns of
    * the same source annset are necessarily in the same overlap chain,
    * so the companion lookup is chain-local — no extra shuffle.
    */
  def withRoots(chain: Seq[Ann]): Seq[Ann] = chain.map { a =>
    val companions = chain.collect {
      case o if !(o eq a) && o.annset == a.annset &&
        o.start == a.start && o.end == a.end => o.mention_type
    }
    a.copy(root_type = rootType(a.mention_type, companions))
  }

  /** 5-case root-type consensus (merge_sets.py:184-226). Returns
    * (case 1-5, allowed root types).
    */
  def checkRootType(group: Seq[Ann]): (Int, Set[String]) = {
    val counts = group.groupBy(_.root_type).view.mapValues(_.size).toMap
    // deterministic "most common": count desc, then root type asc
    val ranked = counts.toSeq.sortBy { case (t, c) => (-c, t) }
    val priority: Option[String] = {
      val present = group.map(_.source).distinct
        .map(s => s -> sourcePriority.getOrElse(s, 0))
      val mx = present.map(_._2).max
      present.filter(_._2 == mx) match {
        case Seq((s, _)) => Some(s)
        case _ => None
      }
    }
    val priorityRoots: Set[String] = priority
      .map(p => group.filter(_.source == p).map(_.root_type).toSet)
      .getOrElse(Set.empty)

    if (ranked.size == 1) (1, Set(ranked.head._1))                      // all equal
    else if (ranked(0)._2 > ranked(1)._2) (2, Set(ranked.head._1))      // prevalent
    else if (priority.isDefined && priorityRoots.size == 1) (3, priorityRoots)
    else if (priority.isDefined) (4, priorityRoots)                     // multi-root
    else (5, counts.keySet)                                             // keep all
  }

  /** Dedup ignoring source (merge_sets.py:151-165): annotations equal on
    * (start, end, type, root, text) collapse; the highest-priority source
    * survives (the reference rewrites source to the merged-set name, so
    * its pick is unobservable — ours keeps provenance deterministically).
    */
  private def uniqueAnns(anns: Seq[Ann]): Seq[Ann] =
    anns.groupBy(a => (a.start, a.end, a.mention_type, a.root_type, a.mention))
      .values.map(_.sortBy(a => (-a.prio, a.source)).head).toSeq
      .sortBy(a => (a.start, a.end, a.mention_type, a.source))

  /** Longest-selection over a partial-overlap group
    * (inner_reduce_partial_overlaps, merge_sets.py:243-265): root filter
    * + parts limit, then ALL annotations tied at max length.
    */
  private def innerReducePartial(group: Seq[Ann]): (Int, Seq[Ann]) = {
    val (kase, roots) = checkRootType(group)
    val maxPartsHere =
      if (kase != 4 && roots.contains("PER")) MaxPerParts else MaxParts
    val filtered = group
      .filter(a => roots.contains(a.root_type) && a.parts <= maxPartsHere)
    // the reference indexes [0] of this list and would crash when the
    // parts limit filters everything; keep the root-filtered set instead
    val pool = if (filtered.nonEmpty) filtered
               else group.filter(a => roots.contains(a.root_type))
    val maxLen = pool.map(_.len).max
    (kase, pool.filter(_.len == maxLen))
  }

  /** Resolve one anchored overlap group. */
  def resolveGroup(group: Seq[Ann]): Seq[Ann] = {
    if (group.size == 1) group // disjoint
    else if (group.forall(a => a.start == group.head.start && a.end == group.head.end)) {
      // exact-overlap group (reduce_overlaps): consensus filter + dedup,
      // no longest-selection (spans are all equal)
      val roots = checkRootType(group)._2
      uniqueAnns(group.filter(a => roots.contains(a.root_type)))
    } else {
      val (kase, longest) = innerReducePartial(group)
      // case 4: type analysis was inconclusive — re-run on the longest
      // list (merge_sets.py:285-287)
      val winners = if (kase == 4) innerReducePartial(longest)._2 else longest
      uniqueAnns(winners)
    }
  }

  /** Split a sorted overlap CHAIN into the reference's anchored groups
    * (group = anchor + every following ann starting before the ANCHOR's
    * end; the next group anchors at the first ann past it) and resolve
    * each. Pure; input must be sorted by (start, end, type, source).
    */
  def resolveChain(chain: Seq[Ann]): Seq[Ann] = {
    val out = Seq.newBuilder[Ann]
    var rest = chain
    while (rest.nonEmpty) {
      val anchor = rest.head
      val (group, next) = rest.span(_.start < anchor.end) // head always in
      out ++= resolveGroup(group)
      rest = next
    }
    out.result()
  }

  /** Full merge. `typesWhitelist` = P4 (None = all types pass, reference
    * types_list); `annsetExclusion` = P5 (reference annset_exclusion_list,
    * keyed on the mention's source annset name).
    */
  def merge(spark: SparkSession, sources: Seq[Dataset[Mention]],
            typesWhitelist: Option[Set[String]] = None,
            annsetExclusion: Set[String] = Set.empty): Dataset[Mention] = {
    import spark.implicits._
    val union = sources.map(_.toDF()).reduce(_ unionByName _)

    val selected = union
      .filter(!col("annset").isin(annsetExclusion.toSeq: _*) || lit(annsetExclusion.isEmpty))
      .filter(typesWhitelist match {
        case Some(ts) => col("mention_type").isin(ts.toSeq: _*)
        case None => lit(true)
      })

    // F16 normalize as a codegen'd expression (no UDF in the hot path)
    val normed = selected.withColumn("norm_type",
      when(lower(col("mention_type")) === "person",
        substring(col("mention_type"), 1, 3))
        .otherwise(col("mention_type")))

    // Overlap-chain sweep: ONE shuffle, partitioned by doc. Chains are
    // transitive-overlap components; anchored groups (and same-span
    // root-type companions -- same span => same chain) refine them
    // inside the kernel. Singleton chains -- the overwhelming majority
    // -- bypass the kernel entirely: a 1-element group is kept verbatim,
    // so the row-encoding cost is paid only where overlaps exist.
    val order = Window.partitionBy(col("doc_id"))
      .orderBy(col("start"), col("end"), col("norm_type"), col("source"))
    val runMax = max(col("end")).over(order.rowsBetween(Window.unboundedPreceding, -1))
    val grouped = normed
      .withColumn("prev_max_end", runMax)
      .withColumn("new_grp",
        when(col("prev_max_end").isNull || col("start") >= col("prev_max_end"), 1)
          .otherwise(0))
      .withColumn("grp", sum(col("new_grp")).over(
        order.rowsBetween(Window.unboundedPreceding, 0)))
      // chain size: (doc_id, grp) clustering is satisfied by the
      // existing hash(doc_id) exchange -- no second shuffle
      .withColumn("chain_n", count(lit(1)).over(
        Window.partitionBy(col("doc_id"), col("grp"))))

    val base = grouped.select(
      col("doc_id"), col("annset"), col("norm_type").as("mention_type"),
      col("start"), col("end"), col("mention"),
      col("score"), col("source"), col("skip"), col("gazetteer_id"),
      col("grp"), col("chain_n"))

    val singletons = base.filter(col("chain_n") === 1).drop("grp", "chain_n")

    val resolvedMulti = base.filter(col("chain_n") > 1)
      .as[(String, String, String, Int, Int, String, Double, String, Boolean, Long, Long, Long)]
      .groupByKey { case (doc, _, _, _, _, _, _, _, _, _, grp, _) => (doc, grp) }
      .flatMapGroups { (_: (String, Long), it) =>
        val chain = it.map { case (d, as, t, s, e, m, sc, src, sk, gid, _, _) =>
          Ann(d, as, t, t, s, e, m, sc, src, sk, gid)
        }.toSeq.sortBy(a => (a.start, a.end, a.mention_type, a.source))
        resolveChain(withRoots(chain))
      }
      .toDF()
      .select(col("doc_id"), col("annset"), col("mention_type"),
        col("start"), col("end"), col("mention"), col("score"),
        col("source"), col("skip"), col("gazetteer_id"))

    val winners = singletons.unionByName(resolvedMulti)

    // W7 contiguous ann ids per doc in reading order
    val wAnn = Window.partitionBy(col("doc_id"))
      .orderBy(col("start"), col("end"), col("mention_type"))
    winners
      .withColumn("ann_id", row_number().over(wAnn))
      .select(
        col("doc_id"), lit(AnnSet).as("annset"), col("ann_id"),
        col("mention_type"), col("start"), col("end"), col("mention"),
        col("score"), col("source"), col("skip"), col("gazetteer_id"))
      .as[Mention]
  }

}
