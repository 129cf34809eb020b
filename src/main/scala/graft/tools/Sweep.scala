package graft.tools

/** Cross-SF correctness sweep in ONE command: `sbt sweep` (alias for
  * `runMain graft.tools.Sweep`). For each SF dir it runs the full
  * [[graft.Verify]] dump, prunes the four oracles whose only
  * DuckDB-expressible form is O(n²) (they stall >20 min at sf0.1 —
  * Spark's LSH answers them in <1 s; their recall is proven at the
  * smaller SFs), and runs the `tools/compare.py` DuckDB gate. Exits
  * non-zero if ANY query at ANY SF mismatches — this caught the IVF
  * recall cliff in round 6; running it before every commit batch is the
  * documented workflow.
  *
  * Dev instrument only (like the python tools under tools/): the
  * library itself never shells out or depends on python.
  */
object Sweep {
  private val stallOracles = Seq("dedup_minhash", "dedup_incremental",
    "dedup_clusters", "dedup_cluster_survivor")

  /** The O(n²) oracles stall only at sf0.1 (5 000 docs ⇒ 12.5 M exact
    * Jaccard pairs); at sf0.001/sf0.01 they run in seconds and MUST be
    * checked — pruning them everywhere would silently drop four queries
    * from the gate entirely.
    */
  private def pruneFor(sf: String): Seq[String] =
    if (new java.io.File(sf).getName == "sf0.1") stallOracles else Nil

  def main(args: Array[String]): Unit = {
    // all three SFs by default — the sf0.1 leg (stall oracles pruned)
    // is what caught the IVF recall cliff; pass explicit dirs to narrow
    val sfs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    var failures = 0
    sfs.foreach { sf =>
      val name = new java.io.File(sf).getName
      val out = s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/" +
        s"graft_sweep_${name}_${ProcessHandle.current().pid()}"
      println(s"[sweep] verify $sf -> $out")
      graft.Verify.main(Array(sf, out))
      val pruned = pruneFor(sf)
      pruneStallOracles(s"$out/oracle_sql.json", pruned)
      println(s"[sweep] compare $name (${pruned.size} O(n^2)-only " +
        "oracles pruned)")
      val rc = new ProcessBuilder("python3", "tools/compare.py", sf, out)
        .inheritIO().start().waitFor()
      if (rc != 0) { failures += 1; println(s"[sweep] $name: FAILED ($rc)") }
      else println(s"[sweep] $name: ok")
    }
    if (failures > 0) {
      println(s"[sweep] $failures SF(s) failed")
      sys.exit(1)
    }
    println("[sweep] all SFs green")
  }

  private def pruneStallOracles(path: String, names: Seq[String]): Unit = {
    if (names.isEmpty) return
    val p = java.nio.file.Paths.get(path)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(java.nio.file.Files.readString(p))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    names.foreach(root.remove)
    java.nio.file.Files.writeString(p, mapper.writeValueAsString(root))
  }
}
