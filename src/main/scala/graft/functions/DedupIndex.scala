package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted near-dup index with DELTA probing — the production dedup
  * loop at crawl scale: the corpus's MinHash band signatures are built
  * ONCE and persisted; each incoming crawl delta probes new-vs-old and
  * new-vs-new WITHOUT ever recomputing old-vs-old (at 10^12 docs the
  * full-corpus x08 pass costs what it costs — paying it per ingest
  * batch is the thing this index exists to avoid). Follows the
  * IvfIndex/PostingsIndex persisted-operator discipline: partitioned
  * parquet + XOR-maintained staleness MANIFEST + append that equals
  * rebuild.
  *
  * Layout under `dir`:
  *   hashes/hb=<0..255>/   (h STRING md5, rep_id LONG)  — one row per
  *                         distinct content hash; rep = min doc_id
  *   bands/kb=<0..255>/    (band INT, key LONG, doc_id LONG,
  *                         sig ARRAY<LONG>) — band rows of exact-dup
  *                         REPRESENTATIVES only (exact members never
  *                         band — same as lshCandidatePairs)
  *   MANIFEST              rows + bit_xor(xxhash64(doc_id, text)) +
  *                         build params
  *
  * Probe reads are PRUNED twice: partition elimination on hb/kb (a
  * small delta touches few of the 256 buckets) and an equi-semi-join
  * on the delta's exact (band, key) set — buckets holding no new row
  * can produce no new-touching pair, so they are never paired.
  *
  * Equivalence contract (pinned by DedupIndexSpec): with doc_ids
  * MONOTONE across ingests (old < new — true of crawl ingestion
  * sequence numbers), probeDelta(new) emits exactly the pairs of
  * `TextSketch.lshCandidatePairs(old ∪ new)` in which at least one
  * side is new — including the hub-star degrade of oversized buckets,
  * replicated here over the identical bucket contents.
  */
object DedupIndex extends Serializable {

  // agg + join-back, never a window over the content hash — see
  // TextSketch.withRep for the mega-key reasoning (VERDICT r4 #1)
  private def withRep(docs: DataFrame): DataFrame = TextSketch.withRep(docs)

  private def bandRows(uniqueDocs: DataFrame): DataFrame = {
    val spark = uniqueDocs.sparkSession
    import spark.implicits._
    uniqueDocs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val sig = TextSketch.minhashSignature(text)
        TextSketch.bandKeys(sig).zipWithIndex.map { case (k, b) =>
          (b, k, id, sig)
        }
      }
      .toDF("band", "key", "doc_id", "sig")
      .withColumn("kb", pmod(col("key"), lit(256)).cast("int"))
  }

  private def fingerprint(docs: DataFrame): (Long, Long) = {
    val r = docs.select(xxhash64(col("doc_id"), col("text")).as("x"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(x)").as("fp")).head()
    // bit_xor over zero rows is NULL — an empty corpus/delta (a crawl
    // round that fetched nothing) fingerprints as 0, not an NPE
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  // manifest I/O goes through the Hadoop FS of `dir` (graft.util.FsText)
  // so the index can live on HDFS/S3 alongside its parquet (ADVICE r4)
  private def hconf(spark: SparkSession) =
    spark.sparkContext.hadoopConfiguration

  private def writeManifest(spark: SparkSession, dir: String, rows: Long,
      fp: Long): Unit =
    graft.util.FsText.write(hconf(spark), s"$dir/MANIFEST",
      s"""{"rows":$rows,"fingerprint":$fp,"bands":${TextSketch.Bands},"minhashK":${TextSketch.MinHashK}}""")

  private def readManifest(spark: SparkSession, dir: String): (Long, Long) = {
    val txt = graft.util.FsText.read(hconf(spark), s"$dir/MANIFEST")
    val rows = "\"rows\":(-?\\d+)".r.findFirstMatchIn(txt).get.group(1).toLong
    val fp = "\"fingerprint\":(-?\\d+)".r.findFirstMatchIn(txt).get.group(1).toLong
    (rows, fp)
  }

  /** True iff the index at `dir` was built from exactly this corpus
    * (same rows, same order-independent content fingerprint). */
  def isCurrent(dir: String, docs: DataFrame): Boolean =
    graft.util.FsText.exists(hconf(docs.sparkSession), s"$dir/MANIFEST") && {
      val (rows, fp) = fingerprint(
        docs.select(col("doc_id").cast("long").as("doc_id"), col("text")))
      readManifest(docs.sparkSession, dir) == ((rows, fp))
    }

  /** Build the index from the full corpus (doc_id, text). */
  def build(docs: DataFrame, dir: String): Unit = {
    // three consumers walk the withRep lineage (hashes write, bands
    // write, fingerprint), and withRep's agg+join-back already scans
    // its input twice per evaluation — persist like append() does, or
    // a build costs ~6 corpus scans with md5 recomputed each time
    // (review finding)
    val reps = withRep(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // one row per distinct h, map-only off withRep's join (the rep
      // row is the one whose doc_id IS the rep)
      reps.filter(col("doc_id") === col("rep_id"))
        .select(col("h"), col("rep_id"))
        .withColumn("hb", conv(substring(col("h"), 1, 2), 16, 10).cast("int"))
        .write.mode("overwrite").partitionBy("hb").parquet(s"$dir/hashes")
      bandRows(reps.filter(col("doc_id") === col("rep_id"))
          .select(col("doc_id"), col("text")))
        .write.mode("overwrite").partitionBy("kb").parquet(s"$dir/bands")
      val (n, fp) = fingerprint(reps)
      writeManifest(docs.sparkSession, dir, n, fp)
    } finally reps.unpersist()
  }

  /** Ingest a delta into the index so the NEXT probe sees it: new
    * content hashes gain (h, rep) rows and band their new rep; content
    * already indexed adds nothing (its rep already bands — exactly the
    * rows a fresh build over old ∪ delta would hold). Manifest updates
    * by delta-XOR, so `isCurrent(old ∪ delta)` holds afterwards. */
  def append(spark: SparkSession, dir: String, newDocs: DataFrame): Unit = {
    // the two index writes and the manifest fingerprint all walk the
    // delta lineage — one delta-sized cache instead of three passes
    val reps = withRep(newDocs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val oldHashes = spark.read.parquet(s"$dir/hashes")
      val fresh = reps.filter(col("doc_id") === col("rep_id"))
        .join(oldHashes.select(col("h")), Seq("h"), "left_anti")
      fresh.select(col("h"), col("doc_id").as("rep_id"))
        .withColumn("hb", conv(substring(col("h"), 1, 2), 16, 10).cast("int"))
        .write.mode("append").partitionBy("hb").parquet(s"$dir/hashes")
      bandRows(fresh.select(col("doc_id"), col("text")))
        .write.mode("append").partitionBy("kb").parquet(s"$dir/bands")
      val (oldN, oldFp) = readManifest(spark, dir)
      val (dn, dfp) = fingerprint(reps)
      writeManifest(spark, dir, oldN + dn, oldFp ^ dfp)
    } finally reps.unpersist()
  }

  /** Merge each hb/kb bucket's accumulated delta files back into one —
    * the small-file compaction step that completes the lifecycle
    * (build → append* → compact → append* …), mirroring
    * [[PostingsIndex.compact]]. [[append]] writes one parquet file per
    * TOUCHED bucket per ingest, so after hundreds of crawl deltas the
    * 256 fixed bucket directories are small-file swamps: every probe
    * opens O(ingests) files per pruned bucket and the namenode/listing
    * cost grows without bound. Compaction rewrites each side with ONE
    * shuffle hashed on its bucket column (all rows of a bucket land in
    * one task → one file per bucket dir), write-then-swap so the lazy
    * read never sees its own output dir. The indexed corpus is
    * unchanged: MANIFEST is untouched, [[isCurrent]] holds across a
    * compact, and probeDelta results are identical before and after
    * (spec-pinned). Cost: one full read+write of the index — amortize
    * over many appends, exactly like Lucene merges. */
  def compact(spark: SparkSession, dir: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    def swapOneFilePerBucket(sub: String, partCol: String): Unit = {
      val src = new org.apache.hadoop.fs.Path(s"$dir/$sub")
      val tmp = new org.apache.hadoop.fs.Path(s"$dir/.compact-tmp-$sub")
      val fs = src.getFileSystem(conf)
      spark.read.parquet(src.toString)
        .repartition(col(partCol))
        .write.mode("overwrite").partitionBy(partCol).parquet(tmp.toString)
      fs.delete(src, true)
      fs.rename(tmp, src)
    }
    // crash-safety discipline (review finding): the delete-then-rename
    // swap has a window where a data dir is gone — so the MANIFEST (the
    // validity marker every reader checks first) is taken DOWN before
    // the swap and restored after. A driver death mid-compact leaves
    // isCurrent() == false and the caller rebuilds, instead of a
    // "current" index that throws path-not-found on the next probe.
    val manifestTxt = graft.util.FsText.read(hconf(spark), s"$dir/MANIFEST")
    val mp = new org.apache.hadoop.fs.Path(s"$dir/MANIFEST")
    mp.getFileSystem(conf).delete(mp, false)
    swapOneFilePerBucket("hashes", "hb")
    swapOneFilePerBucket("bands", "kb")
    graft.util.FsText.write(hconf(spark), s"$dir/MANIFEST", manifestTxt)
  }

  /** All near-dup pairs of (indexed corpus ∪ newDocs) touching at
    * least one new doc: (doc_a, doc_b, jaccard_x100), doc_a < doc_b
    * except exact-pair rep order (rep first — lshCandidatePairs
    * layout). Old-vs-old work: none.
    *
    * Cache discipline: the hb/kb pruning needs two eager collects over
    * the delta lineage, so two DELTA-sized persists back them. With
    * `materialize = true` (default) the result is computed eagerly
    * (localCheckpoint) and BOTH persists are released before
    * returning — a per-crawl-round probe loop leaks nothing. Pass
    * false to get the lazy plan (plan inspection, custom sinks); the
    * two persists then stay pinned until the caller clears them. */
  def probeDelta(spark: SparkSession, dir: String, newDocs: DataFrame,
                 minJaccardX100: Int = 50, maxBucket: Int = 1024,
                 materialize: Boolean = true): DataFrame = {
    import spark.implicits._
    // DELTA-sized caches (never corpus-sized): the hb/kb pruning
    // collects below force two eager jobs over the delta lineage, and
    // the returned plan evaluates it once more — without these persists
    // every MinHash signature would compute three times per probe
    val reps = withRep(newDocs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // -- exact dups vs the indexed corpus: hb-pruned equi-join
    val newHashes = reps.select(col("doc_id"), col("h"))
      .withColumn("hb", conv(substring(col("h"), 1, 2), 16, 10).cast("int"))
    val hbs = newHashes.select("hb").distinct().as[Int].collect() // <= 256
    val oldHashes = spark.read.parquet(s"$dir/hashes")
      .filter(col("hb").isin(hbs.toIndexedSeq.map(Integer.valueOf): _*))
    val vsOldExact = newHashes.join(oldHashes, Seq("h", "hb"))
      .select(col("rep_id").as("doc_a"), col("doc_id").as("doc_b"),
        lit(1.0).as("est_jaccard"))

    // -- within-delta exact dups (content NOT in the index): rep star
    val unseen = reps.join(oldHashes.select("h"), Seq("h"), "left_anti")
    val withinExact = unseen.filter(col("doc_id") =!= col("rep_id"))
      .select(col("rep_id").as("doc_a"), col("doc_id").as("doc_b"),
        lit(1.0).as("est_jaccard"))

    // -- LSH: band the unseen reps, pull ONLY the old bucket rows that
    // share a (band, key) with the delta (kb partition pruning + exact
    // semi-join), pair within buckets with the hub-star degrade
    val newBanded = bandRows(
        unseen.filter(col("doc_id") === col("rep_id"))
          .select(col("doc_id"), col("text")))
      .withColumn("is_new", lit(true))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val kbs = newBanded.select("kb").distinct().as[Int].collect() // <= 256
    val deltaKeys = newBanded.select("band", "key").distinct()
    val oldBanded = spark.read.parquet(s"$dir/bands")
      .filter(col("kb").isin(kbs.toIndexedSeq.map(Integer.valueOf): _*))
      .join(deltaKeys.hint("broadcast"), Seq("band", "key"), "left_semi")
      .withColumn("is_new", lit(false))
    val bucketPairs = newBanded.unionByName(oldBanded)
      .select(col("band"), col("key"), col("doc_id"), col("sig"), col("is_new"))
      .repartition(col("band"), col("key"))
      .sortWithinPartitions("band", "key", "doc_id")
      .as[(Int, Long, Long, Array[Long], Boolean)]
      // the ONE pairing implementation, shared with lshCandidatePairs —
      // index rows are tagged old, so old-vs-old pairs never emit and
      // the equivalence contract cannot drift from the full-corpus op
      .mapPartitions(it => TextSketch.bucketPairIterator(it, maxBucket))
      .toDF("doc_a", "doc_b", "est_jaccard")

    val pairs = bucketPairs.unionByName(vsOldExact).unionByName(withinExact)
      .filter(col("doc_a") =!= col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(max(col("est_jaccard")).as("est_jaccard"))
      .filter(col("est_jaccard") * 100 >= minJaccardX100)
      .select(col("doc_a"), col("doc_b"),
        floor(col("est_jaccard") * 100).cast("long").as("jaccard_x100"))
    if (!materialize) pairs
    else {
      val out = pairs.localCheckpoint(true) // eager: result self-contained
      reps.unpersist()
      newBanded.unpersist()
      out
    }
  }
}
