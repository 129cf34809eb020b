package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Dev tool: build a LARGER synthetic SF by replicating an existing SF
  * directory `factor`× with consistent key shifts — the measurement
  * target VERDICT r15 #4 asks for (sf0.1 is scheduler-floor bound:
  * 8-core scaling ratios ≈ 1 across the suite, so per-query signal needs
  * more data). NOT an oracle corpus: the driver's correctness gate stays
  * at sf0.01; this exists purely so optimization A/Bs measure compute,
  * not the local-mode job floor.
  *
  * Replication contract (copy 0 is the identity, so every literal-id
  * point lookup in the suite still hits):
  *  - each table's join keys shift by copy × a power of 10 above the
  *    source max, the SAME offset on every referencing table, so FK
  *    relationships hold and per-key cardinalities stay flat (10× users,
  *    10× orders — not 10× rows per user);
  *  - dims `region`/`nation` stay 1× (low-cardinality lookup tables);
  *  - `documents.text` gains a "copyN " prefix for copies ≥ 1
  *    (ScaleProbe's recipe): copies are NEAR-dups of the original —
  *    realistic dedup pressure instead of a degenerate 10-deep
  *    exact-dup multiset;
  *  - `embeddings.embedding` gains a small copy-keyed additive offset
  *    (±0.05·sin((i+1)·copy), identity at copy 0): cosine structure is
  *    preserved per copy, copies of one vector are near- (not exact-)
  *    neighbors, so cluster/pair volumes grow the way a real 10× corpus
  *    grows rather than collapsing into exact-duplicate stacks;
  *  - column dtypes are cast back to the source schema so a consumer
  *    sees the exact same relation shape.
  *
  * Usage: runMain graft.tools.MakeScale [srcDir] [dstDir] [factor]
  */
object MakeScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/root/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")

    // one shared offset per key FAMILY (power of 10 above the source
    // max) so every referencing table shifts identically
    def offsetOf(name: String, key: String): Long = {
      val mx = read(name).agg(max(col(key).cast(LongType))).head().getLong(0)
      var p = 10L
      while (p <= mx) p *= 10
      p
    }
    val offs = Map(
      "cust" -> offsetOf("customer", "c_custkey"),
      "supp" -> offsetOf("supplier", "s_suppkey"),
      "part" -> offsetOf("part", "p_partkey"),
      "order" -> offsetOf("orders", "o_orderkey"),
      "event" -> offsetOf("events", "event_id"),
      "user" -> offsetOf("events", "user_id"),
      "doc" -> offsetOf("documents", "doc_id"),
      "vec" -> offsetOf("embeddings", "vec_id"))
    println(s"[make-scale] offsets: $offs")

    /** factor copies with the named keys shifted; dtypes restored. */
    def replicate(name: String, shifts: Map[String, Long],
        mutate: Map[String, Column] = Map.empty,
        outFiles: Int = 8): Unit = {
      val base = read(name)
      val types = base.schema.fields.map(f => f.name -> f.dataType).toMap
      val copies = spark.range(factor).withColumnRenamed("id", "__copy")
        .crossJoin(base)
      val out = base.columns.foldLeft(copies) { (df, c) =>
        val shifted = shifts.get(c) match {
          case Some(off) =>
            (col(c).cast(LongType) + col("__copy") * lit(off))
              .cast(types(c))
          case None => mutate.getOrElse(c, col(c))
        }
        df.withColumn(c, shifted)
      }.select(base.columns.map(col): _*)
      out.repartition(outFiles)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[make-scale] $name done")
    }

    // 1× dims, copied as-is
    Seq("region", "nation").foreach { n =>
      read(n).repartition(1).write.mode("overwrite")
        .parquet(s"$dst/$n.parquet")
      println(s"[make-scale] $n copied 1x")
    }
    replicate("customer", Map("c_custkey" -> offs("cust")), outFiles = 2)
    replicate("supplier", Map("s_suppkey" -> offs("supp")), outFiles = 1)
    replicate("part", Map("p_partkey" -> offs("part")), outFiles = 1)
    replicate("orders",
      Map("o_orderkey" -> offs("order"), "o_custkey" -> offs("cust")),
      outFiles = 4)
    replicate("lineitem",
      Map("l_orderkey" -> offs("order"), "l_partkey" -> offs("part"),
        "l_suppkey" -> offs("supp")),
      outFiles = 8)
    replicate("events",
      Map("event_id" -> offs("event"), "user_id" -> offs("user")),
      outFiles = 4)
    replicate("documents", Map("doc_id" -> offs("doc")),
      mutate = Map("text" -> when(col("__copy") === 0, col("text"))
        .otherwise(concat(lit("copy"), col("__copy").cast("string"),
          lit(" "), col("text")))),
      outFiles = 4)
    replicate("embeddings", Map("vec_id" -> offs("vec")),
      mutate = Map("embedding" ->
        when(col("__copy") === 0, col("embedding"))
          .otherwise(zip_with(col("embedding"),
            sequence(lit(1), size(col("embedding"))),
            (x, i) => (x.cast("double") +
              sin(i.cast("double") * col("__copy").cast("double")) * 0.05)
              .cast("float")))),
      outFiles = 2)
    println(s"[make-scale] wrote ${factor}x of $src to $dst")
    spark.stop()
  }
}
