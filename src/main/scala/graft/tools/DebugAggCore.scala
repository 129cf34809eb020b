package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Dev tool: stage-wise decomposition of the agg_core pipeline. */
object DebugAggCore {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.cacheAll(spark, dir)
    def time(label: String)(f: => Any): Unit = {
      f // warm
      val t0 = System.nanoTime()
      f
      println(f"[agg] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    def dsum(c: org.apache.spark.sql.Column) =
      sum(c.cast("decimal(18,2)")).cast("double")
    val li = Tables.load(spark, dir, "lineitem")
    val orders = Tables.load(spark, dir, "orders")
    val customer = Tables.load(spark, dir, "customer")

    time("li scan only")(li.select(col("l_orderkey")).write.format("noop").mode("overwrite").save())
    val pre = li.groupBy(col("l_orderkey"))
      .agg(dsum(col("l_extendedprice")).as("att_size"), count(lit(1)).as("att_count"))
    time("li preagg")(pre.write.format("noop").mode("overwrite").save())
    val pre2 = li.groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice")).as("att_size"), count(lit(1)).as("att_count"))
    time("li preagg double-sum")(pre2.write.format("noop").mode("overwrite").save())
    val joined = orders.join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(pre, col("o_orderkey") === col("l_orderkey"), "left")
    time("join")(joined.write.format("noop").mode("overwrite").save())
    val full = graft.queries.CoreQueries.aggCore(spark, dir)
    time("full agg_core")(full.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
