package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) ANN — the memory-bound half of the
  * billion-scale ANN stack. IVF prunes WHICH vectors a query scans
  * (IvfIndex, partition-pruned cells); PQ shrinks WHAT is scanned: each
  * L2-normalized vector splits into `m` subvectors, each subvector
  * quantizes to its subspace codebook's nearest centroid, and the vector
  * is stored as m one-byte codes — at (m=16, dim=64) that is 16 bytes
  * per vector vs 256 bytes of floats, 16× compression, so a 10^9-vector
  * scan reads ~16 GB of codes instead of ~256 GB of floats (defaults
  * sweep-chosen: mean recall@5 0.56 on the random-ish test corpus —
  * random data is PQ's worst case; clustered real embeddings do
  * markedly better, and raising m trades memory for recall: m=32 →
  * 0.76 at 8× compression on the same corpus). Query scoring is
  * ADC (asymmetric distance computation): the query precomputes an m×k
  * table of subspace inner products ONCE, then every candidate scores as
  * m table lookups + adds — no stored float vector is ever touched.
  *
  * Scale shape: codebooks are broadcast-tiny (m·k·(dim/m) doubles); the
  * encode pass and the ADC scan are MAP-ONLY; the only shuffle is the
  * bounded TopKAgg (k rows per partition per query). Composes with
  * IvfIndex: store codes beside cell partitions, partition-prune, then
  * ADC-scan only the probed cells.
  *
  * Determinism: codebooks fit with the same fixed-point quantized Lloyd
  * discipline as IvfIndex (1e6-unit long sums — integer addition is
  * associative, so centroids are partition-invariant); codes and ADC
  * sums are then pure per-row arithmetic in a fixed loop order.
  */
object PqSketch {

  /** [subspace][code][subDim] centroids + shape. */
  final case class Codebooks(m: Int, k: Int, subDim: Int,
      cents: Array[Array[Array[Double]]])

  private def l2normalize(v: Array[Float]): Array[Float] = {
    var ss = 0.0
    var i = 0
    while (i < v.length) { ss += v(i).toDouble * v(i); i += 1 }
    val n = math.sqrt(ss)
    if (n == 0.0) v
    else {
      val out = new Array[Float](v.length)
      i = 0
      while (i < v.length) { out(i) = (v(i) / n).toFloat; i += 1 }
      out
    }
  }

  /** Nearest centroid of one subspace by L2 over the subvector at
    * `off`; first-wins tie-break (fixed scan order → deterministic). */
  private def nearestSub(cents: Array[Array[Double]], v: Array[Float],
      off: Int, d: Int): Int = {
    var best = 0
    var bestDist = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var dist = 0.0
      var i = 0
      while (i < d) { val diff = cents(c)(i) - v(off + i); dist += diff * diff; i += 1 }
      if (dist < bestDist) { bestDist = dist; best = c }
      c += 1
    }
    best
  }

  /** Fit per-subspace codebooks (deterministic quantized Lloyd; seeds =
    * the k lowest vec_ids' subvectors — no dense-id assumption, the
    * IvfIndex seeding lesson). One distributed pass per iteration
    * computes ALL m subspace assignments. */
  def fit(emb: DataFrame, m: Int = 8, k: Int = 16, iters: Int = 2): Codebooks =
    graft.util.SessionTuning.withCachedPlanAqe(emb.sparkSession) {
      fitImpl(emb, m, k, iters)
    }

  private def fitImpl(emb: DataFrame, m: Int, k: Int, iters: Int): Codebooks = {
    val spark = emb.sparkSession
    import spark.implicits._
    // r6: pinned for the duration of fit ONLY (unpersisted before
    // return) — each Lloyd iteration plus the seed scan previously
    // re-read the parquet and re-normalized every vector; the cache is
    // transient within this invocation, so repeated calls still compute
    // from the source
    val vecs = emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, l2normalize(v)) }
      .persist()
    val seeds = vecs.orderBy(col("_1")).limit(k).collect().sortBy(_._1).map(_._2)
    if (seeds.length < 2) {
      vecs.unpersist() // release before the loud failure
      throw new IllegalArgumentException(
        s"requirement failed: PQ needs >= 2 seed vectors, got ${seeds.length} — input empty or near-empty")
    }
    val dim = seeds.head.length
    require(dim % m == 0, s"embedding dim $dim is not divisible by m=$m subspaces")
    val subDim = dim / m
    val kEff = seeds.length
    var cents: Array[Array[Array[Double]]] = Array.tabulate(m)(s =>
      Array.tabulate(kEff)(j =>
        Array.tabulate(subDim)(i => seeds(j)(s * subDim + i).toDouble)))
    val Q = 1e6
    (1 to iters).foreach { _ =>
      val cs = cents
      // r6b: the per-iteration aggregation is RELATIONAL — the closure
      // emits one row per (vector, subspace) with the quantized
      // subvector, posexplode turns it into (s, code, pos, v_q) rows
      // inside codegen, and a plain HashAggregate (partial map-side,
      // m·k·subDim rows per partition) replaces the typed
      // groupByKey/reduceGroups path (per-row Kryo tuples, boxed keys,
      // cloned arrays). Same quantized longs, integer addition is
      // associative → centroids bit-identical.
      val means = vecs
        .flatMap { case (_, v) =>
          cs.indices.iterator.map { s =>
            val code = nearestSub(cs(s), v, s * subDim, subDim)
            val sub = Array.tabulate(subDim)(i =>
              math.round(v(s * subDim + i).toDouble * Q))
            (s, code, sub)
          }
        }
        .toDF("s", "code", "sub")
        .select(col("s"), col("code"), posexplode(col("sub")).as(Seq("pos", "v_q")))
        .groupBy(col("s"), col("code"), col("pos"))
        .agg(sum(col("v_q")).as("sum_q"), count(lit(1)).as("n"))
        .collect() // m*k*subDim rows — bounded
      val next = Array.tabulate(m)(s => cs(s).clone())
      means.foreach { r =>
        val (s, code, pos) = (r.getInt(0), r.getInt(1), r.getInt(2))
        next(s)(code)(pos) = r.getLong(3).toDouble / (r.getLong(4) * Q)
      }
      cents = next
    }
    vecs.unpersist()
    Codebooks(m, kEff, subDim, cents)
  }

  /** Encode ONE raw (unnormalized) vector to its m codes. */
  def encodeOne(raw: Array[Float], cb: Codebooks): Array[Byte] = {
    val v = l2normalize(raw)
    val codes = new Array[Byte](cb.m)
    var s = 0
    while (s < cb.m) {
      codes(s) = nearestSub(cb.cents(s), v, s * cb.subDim, cb.subDim).toByte
      s += 1
    }
    codes
  }

  /** The m×k ADC lookup table for one raw query vector: subspace inner
    * products against every codebook centroid. */
  def adcTable(raw: Array[Float], cb: Codebooks): Array[Array[Double]] = {
    val qv = l2normalize(raw)
    Array.tabulate(cb.m)(s => Array.tabulate(cb.k) { c =>
      var dot = 0.0
      var i = 0
      while (i < cb.subDim) { dot += cb.cents(s)(c)(i) * qv(s * cb.subDim + i); i += 1 }
      dot
    })
  }

  /** Map-only encode: (vec_id, m one-byte codes). */
  def encode(emb: DataFrame, cb: Codebooks): Dataset[(Long, Array[Byte])] = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, raw) => (id, encodeOne(raw, cb)) }
  }

  /** ADC cosine-approx top-k for the first `nQueries` vec_ids: per-query
    * m×k inner-product tables broadcast; the code scan is map-only and
    * the only shuffle is the bounded TopKAgg. Returns
    * (query_id, rank, neighbor_id, adc_x10000). */
  def adcTopK(emb: DataFrame, nQueries: Int = 5, k: Int = 5,
      m: Int = 16, kCodes: Int = 16, iters: Int = 4): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cb = fit(emb, m, kCodes, iters)
    val codes = encode(emb, cb)
    val tables: Array[(Long, Array[Array[Double]])] = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect() // nQueries rows — bounded
      .sortBy(_._1)
      .map { case (qid, raw) => qid -> adcTable(raw, cb) }
    val bc = spark.sparkContext.broadcast(tables)
    val scored = codes.flatMap { case (id, cds) =>
      bc.value.iterator.filter(_._1 != id).map { case (qid, tab) =>
        var sc = 0.0
        var s = 0
        while (s < cds.length) { sc += tab(s)(cds(s) & 0xff); s += 1 }
        (qid, id, sc)
      }
    }.toDF("query_id", "id", "score")
    TopK.perQuery(scored, k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"),
        floor(col("score") * 10000).cast("long").as("adc_x10000"))
      .orderBy("query_id", "rank")
  }
}
