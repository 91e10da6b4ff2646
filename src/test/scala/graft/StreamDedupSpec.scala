package graft

import graft.streaming.StreamingExtract
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming exact dedup must hold its seen-set ACROSS query restarts:
  * file A is drained by one availableNow run, file B (which re-serves 20
  * of A's payloads under new urls) by a SECOND run on the same
  * checkpoint — every duplicate verdict in run 2 can only come from the
  * restored state store. */
class StreamDedupSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("stream-dedup-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def writeBatch(dir: String, ids: Seq[Int], urlPrefix: String, hour: Int): Unit = {
    import spark.implicits._
    ids.map { i =>
      (s"https://$urlPrefix$i.example.com/p",
        java.sql.Timestamp.valueOf(f"2024-03-01 $hour%02d:${i % 60}%02d:00"),
        s"spec payload $i".getBytes("UTF-8"),
        null.asInstanceOf[String], null.asInstanceOf[String])
    }.toDF("url", "warc_ts", "html", "text", "lang")
      .coalesce(1).write.mode("append").parquet(dir)
  }

  private def drain(src: String, run: String): Unit = {
    val q = StreamingExtract.dedupStream(StreamingExtract.docSigs(spark, s"$src/*.parquet"))
      .writeStream.format("parquet")
      .option("path", s"$run/out")
      .option("checkpointLocation", s"$run/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("dedup state survives query restart: run-2 duplicates are all flagged") {
    val root = s"${SparkEntry.SynthRoot}/streamdedup_spec_${java.util.UUID.randomUUID().toString.take(8)}"
    val src = s"$root/src"
    writeBatch(src, 0 until 30, "a", hour = 1)
    drain(src, root)
    val out1 = spark.read
      .schema("url STRING, hash STRING, first_seen BOOLEAN, prior_count LONG")
      .parquet(s"$root/out")
    assert(out1.count() == 30 && out1.filter("first_seen").count() == 30)

    // second query, same checkpoint: 15 re-served payloads + 10 new
    writeBatch(src, 0 until 15, "dup", hour = 5)
    writeBatch(src, 100 until 110, "b", hour = 6)
    drain(src, root)
    val out2 = spark.read
      .schema("url STRING, hash STRING, first_seen BOOLEAN, prior_count LONG")
      .parquet(s"$root/out")
    assert(out2.count() == 55)
    val dups = out2.filter("NOT first_seen").collect()
    assert(dups.length == 15)
    assert(dups.forall(_.getAs[String]("url").contains("dup")))
    assert(dups.forall(_.getAs[Long]("prior_count") == 1L))
    assert(out2.filter("first_seen").count() == 40)
  }
}
