package graft.streaming

import graft.extract.ExtractMode
import graft.pipeline.Pipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Incremental extraction as a Structured Streaming job (SURVEY.md §2.9):
  * the idiomatic Spark home for the reference's resume-loop behavior.
  * `Trigger.AvailableNow` drains everything currently committed and stops
  * — batch semantics with streaming checkpoints, so a re-run picks up
  * exactly where the checkpoint left off (the streaming twin of the
  * lineage anti-join in ResumableRun).
  */
object StreamingExtract {

  /** The `pages` schema (BASELINE.json input_hint) — readStream needs it
    * declared explicitly. */
  val pagesSchema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("warc_ts", TimestampType, nullable = false),
    StructField("html", BinaryType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true)))

  /** Start an available-now streaming extraction over a parquet directory
    * of pages, writing extracted parquet via foreachBatch. Returns the
    * query; caller awaits termination. */
  def availableNow(spark: SparkSession, pagesGlob: String, outDir: String,
      checkpointDir: String, mode: ExtractMode = ExtractMode.Plain): StreamingQuery = {
    val stream = spark.readStream
      .schema(pagesSchema)
      .parquet(pagesGlob)
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val extracted = Pipeline.extract(batch, mode).toDF()
          .withColumn("batch_id", lit(batchId))
        extracted.write.mode("append").parquet(outDir)
      }
      .start()
  }

  /** Windowed extraction-rate monitoring over the crawl timestamps —
    * watermark + tumbling window aggregation (the streaming-native agg
    * surface; batch tests drive it with availableNow). */
  def rateByWindow(spark: SparkSession, pagesGlob: String): DataFrame = {
    spark.readStream
      .schema(pagesSchema)
      .parquet(pagesGlob)
      .withWatermark("warc_ts", "1 day")
      .groupBy(window(col("warc_ts"), "7 days"), col("lang"))
      .agg(count(lit(1)).as("n_pages"),
        sum(length(col("html"))).as("bytes_in"))
  }
}
