package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Embed, Similarity}
import graft.sources.Tables
object AdcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"); cand <- Seq(20, 50)) {
      val emb = Tables.load(spark, s"/root/testdata/$sf", "embeddings")
      val q = emb.filter(col("vec_id") === 0).select(col("embedding"))
        .head().getAs[scala.collection.Seq[Float]](0).toSeq
      val codes = Embed.quantizeInt8(emb, col("vec_id"), col("embedding"))
        .select(col("id").as("vec_id"), transform(col("codes"), _.cast("byte")).as("codes"))
      val brute = Similarity.bruteForceKnn(emb, col("vec_id"), col("embedding"), q, 10)
        .collect().map(_.getLong(0)).toSet
      val adc = Similarity.adcKnn(codes, emb, col("vec_id"), col("embedding"), q, 10, cand)
        .collect().map(_.getLong(0)).toSet
      println(s"[adc] $sf cand=$cand recall@10 = ${(adc & brute).size / 10.0}")
    }
    spark.stop()
  }
}
