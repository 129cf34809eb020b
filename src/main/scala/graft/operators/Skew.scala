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

  /** Deterministic per-row salt: a hash of the full row content.
    * monotonically_increasing_id / rand re-assign values when a lost
    * executor forces a partition recompute, and a salt that changes
    * between the original and replayed shuffle map output silently
    * duplicates or drops rows downstream (the SPARK-23207 bug class) —
    * a content hash replays identically. The trade: bit-identical rows
    * land on the same salt, so the spread is over DISTINCT row contents;
    * a hot key made of billions of identical rows should be pre-reduced
    * (count per exact row), not salted.
    */
  private def rowSalt(df: DataFrame, salts: Int): Column = {
    // hash expressions reject MapType (no canonical element order), so
    // map columns are excluded from the content hash — the spread only
    // needs SOME deterministic per-row variety, and schemas with map
    // payloads were accepted before the content-hash salt and must stay
    // accepted. An all-map frame degenerates to one salt (key-hash
    // spread lost), which is still correct, just unspread.
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = {
      import org.apache.spark.sql.types._
      dt match {
        case _: MapType => false
        case s: StructType => s.fields.forall(f => hashable(f.dataType))
        case a: ArrayType => hashable(a.elementType)
        case _ => true
      }
    }
    val cols = df.schema.fields.filter(f => hashable(f.dataType))
      .map(f => col(f.name)).toSeq
    if (cols.isEmpty) lit(0L)
    else pmod(xxhash64(cols: _*), lit(salts.toLong))
  }

  /** Two-phase salted aggregation: stage 1 aggregates on (key, salt) so a
    * hot key spreads across `salts` reducers; stage 2 merges the partials
    * per key. Results are identical to a direct groupBy for any
    * re-associable aggregate map (sum/count/min/max) — including under
    * stage retries, because the salt is a deterministic row-content hash
    * (see [[rowSalt]]).
    *
    * `aggs` maps output column name → (stage1 agg of the input column,
    * stage2 merge of the stage-1 partial).
    */
  def saltedAgg(df: DataFrame, key: Column, salts: Int,
      aggs: Map[String, (Column, Column => Column)]): DataFrame = {
    val stage1 = df
      .withColumn("__salt", rowSalt(df, salts))
      .groupBy(key.as("key"), col("__salt"))
      .agg(aggs.head._2._1.as("__p_" + aggs.head._1),
        aggs.tail.map { case (n, (a, _)) => a.as("__p_" + n) }.toSeq: _*)
    stage1
      .groupBy(col("key"))
      .agg(aggs.head._2._2(col("__p_" + aggs.head._1)).as(aggs.head._1),
        aggs.tail.map { case (n, (_, m)) => m(col("__p_" + n)).as(n) }.toSeq: _*)
  }

  /** Skewed-key salted SHUFFLE join: replicate each small-side row
    * `salts` times with an explicit salt column, salt the big side per
    * row (deterministically — [[rowSalt]]), and join on (key, salt) —
    * both sides hash-shuffle on (key, salt), so every reducer sees
    * 1/salts of a hot key's rows. Correct for any 1:N join where `small`
    * is unique on `key` (each big-side row matches exactly one replica).
    *
    * This is for a small side too big to broadcast but cheap to
    * replicate `salts`×. If the small side FITS in a broadcast, use a
    * plain `big.join(broadcast(small), ...)` instead — a broadcast join
    * never shuffles the big side, so there are no per-key reducers to
    * spread and salting it is pure overhead. (At toy scale AQE may still
    * convert this plan to a broadcast join; the construction targets the
    * sizes where it can't.)
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: Column,
      smallKey: Column, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", rowSalt(big, salts))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(replicated,
        bigKey === smallKey && saltedBig("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
