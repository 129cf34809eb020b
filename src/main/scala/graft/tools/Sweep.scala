package graft.tools

/** Cross-SF correctness sweep in ONE command: `sbt sweep` (alias for
  * `runMain graft.tools.Sweep`). For each SF dir it runs the full
  * [[graft.Verify]] dump and the `tools/compare.py` DuckDB gate. Exits
  * non-zero if ANY query at ANY SF mismatches — this caught the IVF
  * recall cliff in round 6; running it before every commit batch is the
  * documented workflow.
  *
  * There is no skip list anymore: the four formerly-O(n²) oracles
  * (minhash/incremental/clusters/cluster-survivor) now run over
  * DocQueries.boundedDocs' deterministic ~500-doc draw, so their
  * brute-force oracles are tractable at every SF (round 10; they
  * stalled >20 min at sf0.1 before).
  *
  * Dev instrument only (like the python tools under tools/): the
  * library itself never shells out or depends on python.
  */
object Sweep {

  def main(args: Array[String]): Unit = {
    // all three SFs by default — the sf0.1 leg is what caught the IVF
    // recall cliff; pass explicit dirs to narrow
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
      println(s"[sweep] compare $name (full oracle set, no skip list)")
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
}
