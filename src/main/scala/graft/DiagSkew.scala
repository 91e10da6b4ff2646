package graft

import graft.extract.{ExtractMode, Extractor}
import graft.icelite.IceLite
import org.apache.spark.sql.SparkSession

/** Diagnostic: per-payload-kind kernel cost over the bench corpus. */
object DiagSkew {
  def main(args: Array[String]): Unit = {
    val benchRoot = s"${SparkEntry.SynthRoot}/bench_${sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "2000000")}_v${graft.gen.SynthCorpus.GenVersion}"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._
    if (!IceLite.exists(s, s"$benchRoot/pages"))
      IceLite.commit(s, s"$benchRoot/pages", graft.gen.SynthCorpus.pages(s,
        sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "2000000").toLong).toDF())
    val pages = IceLite.read(s, s"$benchRoot/pages")
    val stats = pages.select("url", "html").as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (url, html) =>
          val kind = Extractor.payloadKind(html)
          val t0 = System.nanoTime()
          Extractor.extract(html, ExtractMode.Plain)
          val ns = System.nanoTime() - t0
          (kind, html.length.toLong, ns)
        }
      }.toDF("kind", "bytes", "ns")
    stats.createOrReplaceTempView("st")
    s.sql("""select kind, count(*) n, sum(bytes)/1e6 mb, sum(ns)/1e9 cpu_sec,
             avg(ns)/1e3 avg_us, max(ns)/1e6 max_ms, avg(bytes) avg_bytes
             from st group by kind order by cpu_sec desc""").show(false)
    // per-input-split kernel cost (skew profile)
    val bySplit = pages.select("url", "html").as[(String, Array[Byte])]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var n = 0L; var ns = 0L; var bytes = 0L
        it.foreach { case (_, html) =>
          val t0 = System.nanoTime()
          Extractor.extract(html, ExtractMode.Plain)
          ns += System.nanoTime() - t0; n += 1; bytes += html.length
        }
        Iterator((pid, n, bytes, ns / 1e9))
      }.toDF("pid", "docs", "bytes", "cpu_sec")
    bySplit.createOrReplaceTempView("sp")
    s.sql("""select min(cpu_sec), avg(cpu_sec), max(cpu_sec),
             min(docs), avg(docs), max(docs) from sp""").show(false)
    s.sql("select * from sp order by cpu_sec desc limit 8").show(false)
    // top 10 most expensive individual docs
    val top = pages.select("url", "html").as[(String, Array[Byte])]
      .map { case (url, html) =>
        val t0 = System.nanoTime()
        Extractor.extract(html, ExtractMode.Plain)
        (url, html.length, (System.nanoTime() - t0) / 1e6)
      }.toDF("url", "bytes", "ms").orderBy(org.apache.spark.sql.functions.desc("ms"))
    top.show(10, false)
    s.stop()
  }
}
