package graft.util

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Small text files (index MANIFESTs, segment counters) routed through
  * the Hadoop FileSystem API so a persisted index can live wherever its
  * parquet data does — HDFS, S3A, or local disk. java.nio would silently
  * pin the index family to the driver's local filesystem while the data
  * went remote (ADVICE r4): the production-crawl framing of
  * DedupIndex/PostingsIndex/IvfIndex requires manifest and data to share
  * one store, atomically visible to whichever driver probes next. */
object FsText {

  def write(conf: Configuration, path: String, txt: String): Unit = {
    val p = new Path(path)
    val out = p.getFileSystem(conf).create(p, true)
    try out.write(txt.getBytes(UTF_8))
    finally out.close()
  }

  def read(conf: Configuration, path: String): String = {
    val p = new Path(path)
    val in = p.getFileSystem(conf).open(p)
    try new String(in.readAllBytes(), UTF_8)
    finally in.close()
  }

  def exists(conf: Configuration, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(conf).exists(p)
  }
}
