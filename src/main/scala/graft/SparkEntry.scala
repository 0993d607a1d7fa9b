package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 that is implemented has a `queries`
  * entry; SQL-expressible ones also have a DuckDB oracle in `oracleSql`
  * (column names aliased identically on both sides — the driver's compare
  * sorts columns by name before hashing).
  *
  * Float determinism policy: sums/averages of doubles are order-dependent
  * under shuffles, so every aggregated money/measure column is summed as
  * DECIMAL (exact, associative) and divisions happen on the exact decimal
  * result. Per-row double arithmetic (deterministic IEEE) stays double.
  */
object SparkEntry {
  import Tables._

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * End-to-end KB-population: interleaved spans -> mentions -> linking ->
    * clustering -> triples (north rule headline).
    */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.triples(spark, "/root/testdata/sf0.001")

  // Decimal cast used for exact, order-independent aggregation.
  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(30,6)")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.4 aggregations (A-ops) -----------------------------------
    "q1_agg" -> ((s, dir) => {
      lineitem(s, dir)
        .groupBy($c("l_returnflag"), $c("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),

    // ---- §2.5 window top-k (W1/T5) ------------------------------------
    "q2_topk_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      orders(s, dir)
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    }),

    // ---- §2.3 joins (J2 broadcast hydrate) -----------------------------
    "q3_join_agg" -> ((s, dir) => {
      val c = customer(s, dir)
      val n = nation(s, dir)
      orders(s, dir)
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
    }),

    // ---- semi-join (P4 whitelist semantics) ----------------------------
    "q4_semijoin" -> ((s, dir) => {
      val o = orders(s, dir).filter(col("o_orderstatus") === "F")
      customer(s, dir)
        .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    }),

    // ---- anti-join (P5 exclusion semantics) ----------------------------
    "q5_antijoin" -> ((s, dir) => {
      val urgent = orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
      customer(s, dir)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),

    // ---- §2.5 W5 sessionize (sequential grouping sweep) ----------------
    "q6_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      events(s, dir)
        .withColumn("gap",
          unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
        .withColumn("brk", when(col("gap").isNull || col("gap") > 1800, 1).otherwise(0))
        .groupBy(col("user_id"))
        .agg(sum(col("brk")).as("n_sessions"), count(lit(1)).as("n_events"))
    }),

    // ---- §2.7 set ops (U1/U2) ------------------------------------------
    "q7_union_distinct" -> ((s, dir) => {
      val li = lineitem(s, dir)
      li.select(col("l_returnflag").as("tag"))
        .union(li.select(col("l_linestatus").as("tag")))
        .distinct()
    }),

    // ---- §2.1 S4 regex filter + pagination -----------------------------
    "q8_pagination" -> ((s, dir) => {
      documents(s, dir)
        .filter(col("text").rlike("join.*merge"))
        .select(
          col("doc_id"),
          col("lang"),
          substring(col("text"), 1, 40).as("preview"))
        .orderBy(col("doc_id"))
        .offset(5)
        .limit(20)
    }),

    // ---- §2.4 A1/A5 mode with deterministic tie-break ------------------
    "q9_mode" -> ((s, dir) => {
      val counts = documents(s, dir).groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("cnt").desc, col("source").asc)
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("lang"), col("source").as("top_source"), col("cnt"))
    }),

    // ---- §2.4 A7 score stats (mean/median over groups) -----------------
    "q10_stats" -> ((s, dir) => {
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          (sum(dec(col("value"))).cast("double") / count(lit(1)))
            .as("mean_value"),
          round(expr("percentile(value, 0.5)"), 6).as("median_value"))
    }),

    // ---- §2.8 F11/F12 substring mention/context extraction -------------
    "q11_substr_ctx" -> ((s, dir) => {
      documents(s, dir)
        .withColumn("pos", locate("customer", col("text")))
        .filter(col("pos") > 0)
        .select(
          col("doc_id"),
          col("pos"),
          substring(col("text"), greatest(col("pos") - 10, lit(1)), lit(10)).as("ctx_left"),
          substring(col("text"), col("pos"), lit(8)).as("mention"),
          substring(col("text"), col("pos") + 8, lit(10)).as("ctx_right"))
    }),

    // ---- training-data op: exact dedup (hash-groupBy) ------------------
    "t1_exact_dedup" -> ((s, dir) => {
      documents(s, dir)
        .groupBy(md5(col("text")).as("text_md5"))
        .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_dups"))
    })
  )

  // Spark column helper to keep groupBy(...) varargs tidy.
  private def $c(name: String) = col(name)

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
         count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q2_topk_window" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
           FROM orders) WHERE rnk <= 3""",
    "q3_join_agg" ->
      """SELECT n_name,
         CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
         count(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
                     JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""",
    "q4_semijoin" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""",
    "q5_antijoin" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderpriority = '1-URGENT')""",
    "q6_sessionize" ->
      """SELECT user_id, CAST(sum(brk) AS BIGINT) AS n_sessions, count(*) AS n_events FROM (
           SELECT user_id,
                  CASE WHEN date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts), ts) > 1800
                         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                       THEN 1 ELSE 0 END AS brk
           FROM events) GROUP BY user_id""",
    "q7_union_distinct" ->
      """SELECT DISTINCT tag FROM (
           SELECT l_returnflag AS tag FROM lineitem
           UNION ALL
           SELECT l_linestatus AS tag FROM lineitem)""",
    "q8_pagination" ->
      """SELECT doc_id, lang, substring(text, 1, 40) AS preview
         FROM documents WHERE regexp_matches(text, 'join.*merge')
         ORDER BY doc_id OFFSET 5 LIMIT 20""",
    "q9_mode" ->
      """SELECT lang, source AS top_source, cnt FROM (
           SELECT lang, source, count(*) AS cnt,
                  row_number() OVER (PARTITION BY lang
                                     ORDER BY count(*) DESC, source ASC) AS rn
           FROM documents GROUP BY lang, source) WHERE rn = 1""",
    "q10_stats" ->
      """SELECT event_type, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / count(*) AS mean_value,
         round(quantile_cont(value, 0.5), 6) AS median_value
         FROM events GROUP BY event_type""",
    "q11_substr_ctx" ->
      """SELECT doc_id, strpos(text, 'customer') AS pos,
              substring(text, greatest(strpos(text, 'customer') - 10, 1), 10) AS ctx_left,
              substring(text, strpos(text, 'customer'), 8) AS mention,
              substring(text, strpos(text, 'customer') + 8, 10) AS ctx_right
         FROM documents WHERE strpos(text, 'customer') > 0""",
    "t1_exact_dedup" ->
      """SELECT md5(text) AS text_md5, min(doc_id) AS keep_doc_id, count(*) AS n_dups
         FROM documents GROUP BY md5(text)"""
  )
}
