package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scale-path ANN: random-hyperplane LSH (SimHash for vectors, Charikar '02)
  * bucketing + multi-probe. Brute force is O(N*Q); this shape is the one that
  * survives 10^9 vectors: each vector maps row-locally to a small code, the
  * only shuffle is the bucket join, and candidates per query are bounded by
  * bucket size.
  */
object AnnLsh {

  /** Deterministic pseudo-random hyperplanes (splitmix64 stream). */
  def hyperplanes(dim: Int, bits: Int, seed: Long = 42L): Array[Array[Float]] = {
    var s = seed
    def next(): Long = {
      s += 0x9E3779B97F4A7C15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    Array.fill(bits, dim)(((next() >>> 11).toDouble / (1L << 53).toDouble).toFloat * 2 - 1)
  }

  def code(vec: Seq[Float], planes: Array[Array[Float]]): Int = {
    var c = 0
    var b = 0
    while (b < planes.length) {
      var dot = 0.0f
      val p = planes(b)
      var i = 0
      val n = math.min(vec.length, p.length)
      while (i < n) { dot += vec(i) * p(i); i += 1 }
      if (dot >= 0) c |= (1 << b)
      b += 1
    }
    c
  }

  /** Multi-probe codes: the bucket itself plus all Hamming-distance-1
    * neighbors — recall/compute tradeoff knob.
    */
  def probeCodes(c: Int, bits: Int): Seq[Int] = c +: (0 until bits).map(b => c ^ (1 << b))

  /** Top-k cosine neighbors for queries (vec_id < numQueries) via
    * multi-table LSH (L independent tables of `bits` hyperplanes) with
    * Hamming<=1 multi-probe on the query side; returns
    * (query_id, neighbor_id, rank). bits scales with log2(N) on real data;
    * tables trade recall for candidate volume.
    */
  /** Scored candidate set (query_id, vec_id, cosine): bucket join + exact
    * cosine on bucket-mates only. Deterministic (seeded hyperplanes), so the
    * companion dump query (q31) and the top-k ranker below recompute the
    * identical set — which lets the DuckDB oracle re-rank the dumped
    * candidates independently and verify the top-k stage end-to-end.
    */
  def candidates(spark: SparkSession, dir: String, numQueries: Int = 10,
                 bits: Int = 5, tables: Int = 6): DataFrame = {
    val allPlanes = (0 until tables).map(t => hyperplanes(dim = 64, bits = bits, seed = 42L + t)).toArray
    val planes = spark.sparkContext.broadcast(allPlanes)
    val codesUdf = udf { v: Seq[Float] =>
      planes.value.zipWithIndex.map { case (p, t) => s"$t:${code(v, p)}" }
    }
    val probesUdf = udf { v: Seq[Float] =>
      planes.value.zipWithIndex.flatMap { case (p, t) =>
        probeCodes(code(v, p), bits).map(c => s"$t:$c")
      }
    }

    // graft_dot_f: codegen'd dot product, bit-identical to the former
    // aggregate(zip_with(...)) interpreted higher-order expressions
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"),
        NativeFns.dotF(col("embedding"), col("embedding")).as("norm2"))
    val bucketed = emb.withColumn("code", explode(codesUdf(col("embedding"))))
    val queries = broadcast(emb.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("norm2").as("q_norm2"), explode(probesUdf(col("embedding"))).as("code"))
      .dropDuplicates("query_id", "code"))

    bucketed.join(queries, "code")
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("dot", NativeFns.dotF(col("embedding"), col("q_emb")))
      .withColumn("cosine", col("dot") / sqrt(col("norm2") * col("q_norm2")))
      .dropDuplicates("query_id", "vec_id")
  }

  def annTopK(spark: SparkSession, dir: String, numQueries: Int = 10, k: Int = 5,
              bits: Int = 5, tables: Int = 6): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id").asc)
    candidates(spark, dir, numQueries, bits, tables)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cosine"),
        row_number().over(w).as("rank"))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
      .orderBy("query_id", "rank")
  }
}
