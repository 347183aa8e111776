package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** IVF (inverted-file) ANN — the coarse-quantizer scale path (Jégou et al.,
  * "Product Quantization for Nearest Neighbor Search", the IVF part only):
  *
  *   1. train K centroids by Lloyd's k-means on a small deterministic SAMPLE
  *      collected to the driver (training cost is O(sample), independent of N);
  *   2. broadcast centroids; every vector maps row-locally to its nearest
  *      cell (one narrow pass, no shuffle);
  *   3. each query probes its `nprobe` nearest cells; candidates = vectors in
  *      probed cells; exact cosine on candidates only.
  *
  * At 10^9 vectors the only wide operation is the cell-key join, and the
  * candidate volume per query is N * nprobe / K — the canonical IVF shape.
  * Complements AnnLsh (random-hyperplane buckets): IVF adapts to the data
  * distribution, LSH is oblivious; both are exposed so recall/cost can be
  * compared per corpus.
  */
object AnnIvf {

  /** Deterministic Lloyd k-means over a sample (driver-side; the sample is
    * small by construction). Seeded by picking every (n/k)-th sample vector.
    */
  def trainCentroids(sample: Array[Array[Float]], k: Int, iters: Int = 5): Array[Array[Float]] = {
    require(sample.nonEmpty)
    val dim = sample(0).length
    val stride = math.max(1, sample.length / k)
    var centroids = (0 until k).map(i => sample((i * stride) % sample.length).clone()).toArray
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        val c = nearestCentroid(v, centroids)
        counts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c) // empty cell keeps its seed
        else Array.tabulate(dim)(i => (sums(c)(i) / counts(c)).toFloat)
      }
      it += 1
    }
    centroids
  }

  /** Nearest centroid by L2 (row-local assignment). */
  def nearestCentroid(v: Seq[Float], centroids: Array[Array[Float]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val ct = centroids(c)
      var d = 0.0
      var i = 0
      val n = math.min(v.length, ct.length)
      while (i < n) { val x = v(i) - ct(i); d += x * x; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** The `nprobe` nearest cells for a query vector. */
  def probeCells(v: Seq[Float], centroids: Array[Array[Float]], nprobe: Int): Seq[Int] = {
    val dists = centroids.indices.map { c =>
      val ct = centroids(c)
      var d = 0.0
      var i = 0
      val n = math.min(v.length, ct.length)
      while (i < n) { val x = v(i) - ct(i); d += x * x; i += 1 }
      (d, c)
    }
    dists.sorted.take(nprobe).map(_._2)
  }

  /** Top-k cosine neighbors for queries (vec_id < numQueries) via IVF:
    * train on the sample vec_id < sampleSize, assign row-locally, probe
    * nprobe cells per query. Returns (query_id, neighbor_id, rank).
    */
  // Default nprobe=6/16 cells: on uniform random vectors (the synthetic
  // corpus — the hardest case for a data-adaptive quantizer) this measures
  // recall@5 0.8 vs brute force; on real clustered embeddings the same
  // ratio probes far less of the data for the same recall.
  /** Scored candidate set (query_id, vec_id, cosine). Deterministic: the
    * training sample is collected in vec_id order (k-means seeding is
    * order-sensitive, and parquet collect order is not guaranteed), so the
    * companion dump query (q32) and the top-k ranker recompute the identical
    * set — which lets the DuckDB oracle re-rank the dumped candidates and
    * verify the top-k stage independently.
    */
  def candidates(spark: SparkSession, dir: String, numQueries: Int = 10,
                 cells: Int = 16, nprobe: Int = 6, sampleSize: Int = 256): DataFrame = {
    // graft_dot_f: codegen'd dot product, bit-identical to the former
    // aggregate(zip_with(...)) interpreted higher-order expressions
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"),
        NativeFns.dotF(col("embedding"), col("embedding")).as("norm2"))

    // 1. train: deterministic sample to the driver (tiny, O(sample) not O(N))
    val sample = emb.where(col("vec_id") < sampleSize)
      .orderBy("vec_id").select("embedding").collect()
      .map(_.getAs[scala.collection.Seq[Float]](0).toArray)
    val centroids = spark.sparkContext.broadcast(trainCentroids(sample, cells))

    // 2. row-local cell assignment (narrow; at scale this is write-once metadata)
    val cellUdf = udf { v: Seq[Float] => nearestCentroid(v, centroids.value) }
    val assigned = emb.withColumn("cell", cellUdf(col("embedding")))

    // 3. queries probe their nprobe nearest cells; the cell join is the only shuffle
    val probeUdf = udf { v: Seq[Float] => probeCells(v, centroids.value, nprobe) }
    val queries = broadcast(emb.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("norm2").as("q_norm2"), explode(probeUdf(col("embedding"))).as("cell")))

    assigned.join(queries, "cell")
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("dot", NativeFns.dotF(col("embedding"), col("q_emb")))
      .withColumn("cosine", col("dot") / sqrt(col("norm2") * col("q_norm2")))
    // no dedup needed (unlike LSH multi-table): every vector lives in exactly
    // one cell and a query's probe list is distinct, so (query_id, vec_id)
    // pairs are unique by construction — skipping the extra exchange
  }

  def annTopK(spark: SparkSession, dir: String, numQueries: Int = 10, k: Int = 5,
              cells: Int = 16, nprobe: Int = 6, sampleSize: Int = 256): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id").asc)
    candidates(spark, dir, numQueries, cells, nprobe, sampleSize)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        row_number().over(w).as("rank"))
      .where(col("rank") <= k)
      .orderBy("query_id", "rank")
  }
}
