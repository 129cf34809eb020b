package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives for 100 TB aggregation/join plans. AQE's
  * skew-join splitting handles most cases at runtime; these are the
  * explicit constructions for when the skew is known up front (a handful
  * of keys holding most of the data — the usual shape of domain or
  * event-type distributions).
  */
object Skew {

  /** Two-phase salted aggregation: stage 1 aggregates on (key, salt) so a
    * hot key spreads across `salts` reducers; stage 2 merges the partials
    * per key. Results are identical to a direct groupBy for any
    * re-associable aggregate map (sum/count/min/max); the salt derives
    * from a per-row id so identical rows still spread.
    *
    * `aggs` maps output column name → (stage1 agg of the input column,
    * stage2 merge of the stage-1 partial).
    */
  def saltedAgg(df: DataFrame, key: Column, salts: Int,
      aggs: Map[String, (Column, Column => Column)]): DataFrame = {
    val stage1 = df
      .withColumn("__salt", pmod(monotonically_increasing_id(), lit(salts.toLong)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(aggs.head._2._1.as("__p_" + aggs.head._1),
        aggs.tail.map { case (n, (a, _)) => a.as("__p_" + n) }.toSeq: _*)
    stage1
      .groupBy(col("key"))
      .agg(aggs.head._2._2(col("__p_" + aggs.head._1)).as(aggs.head._1),
        aggs.tail.map { case (n, (_, m)) => m(col("__p_" + n)).as(n) }.toSeq: _*)
  }

  /** Skewed-key broadcast-salted join: replicate each small-side row
    * `salts` times with an explicit salt column, salt the big side per
    * row, and join on (key, salt) — every reducer sees 1/salts of a hot
    * key's rows. Correct for any 1:N join where `small` is unique on
    * `key` (the replication multiplies nothing because each big-side row
    * matches exactly one replica).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: Column,
      smallKey: Column, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(broadcast(replicated),
        bigKey === smallKey && saltedBig("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
