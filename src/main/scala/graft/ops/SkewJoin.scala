package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted-join helper — the north rule's explicit skew defense for
  * head-entity keys at 10^12-document scale.
  *
  * Problem: an equi-join on a key with a heavy head (a handful of surface
  * forms carrying a large share of mentions) funnels those rows into a
  * few shuffle partitions. Salting splits each hot key into `salts`
  * sub-keys: the LARGE side gets a deterministic salt
  * pmod(hash(row-id), salts); the SMALL side is replicated across all
  * salt values. The join key becomes (key, salt); results are identical
  * to the unsalted join, but the hot key's rows spread over `salts`
  * partitions.
  *
  * Deterministic: the salt is a hash of caller-provided distinct columns,
  * never a random number — retries and replays produce identical plans.
  *
  * Complementary runtime defense: AQE skew-join splitting
  * (spark.sql.adaptive.skewJoin.enabled) is ON in every session this
  * engine creates; saltedJoin is the static guarantee for joins AQE
  * cannot rewrite (e.g. followed by a window on the same key).
  */
object SkewJoin {

  /** Join `large` with `small` on `key` (both sides must carry it),
    * salting the large side by `saltBy` columns. `small` is replicated
    * `salts` times — keep it the dimension side.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltBy: Seq[Column], salts: Int,
                 joinType: String = "inner"): DataFrame = {
    val l = large.withColumn("__salt", pmod(hash(saltBy: _*), lit(salts)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(s, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Head-key histogram: the salting-factor input (north rule: "salting
    * factor derived from block histogram"). Returns keys whose row count
    * exceeds `hotThreshold`.
    */
  def hotKeys(df: DataFrame, key: String, hotThreshold: Long): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > hotThreshold)

  /** Two-path skew join: hot keys go through the salted path, the long
    * tail through the plain join; union of both. This keeps the
    * replication cost of the small side proportional to the hot subset.
    */
  def adaptiveSaltedJoin(large: DataFrame, small: DataFrame, key: String,
                         saltBy: Seq[Column], salts: Int,
                         hotThreshold: Long): DataFrame = {
    val hot = hotKeys(large, key, hotThreshold).select(key).cache()
    val largeHot = large.join(broadcast(hot), Seq(key), "left_semi")
    val largeCold = large.join(broadcast(hot), Seq(key), "left_anti")
    val hotJoined = saltedJoin(largeHot, small, key, saltBy, salts)
    val coldJoined = largeCold.join(small, Seq(key))
    hotJoined.unionByName(coldJoined)
  }
}
