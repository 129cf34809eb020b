package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}

/** Tiny shared Hadoop-FS helpers for the streaming sinks' control files
  * (stream-identity marker, compaction manifests) — ONE slurp
  * implementation so charset/stream-handling fixes reach every caller.
  */
private[streaming] object HadoopIo {

  /** Read a small control file fully as UTF-8. */
  def readUtf8(fs: FileSystem, path: Path): String = {
    val in = fs.open(path)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
      buf.toString("UTF-8")
    } finally in.close()
  }
}
