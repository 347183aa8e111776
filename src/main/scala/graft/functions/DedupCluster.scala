package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate CLUSTERING: connected components over a candidate-pair
  * graph (the step after MinHash/LSH pair generation in a training-data
  * dedup pipeline — "keep one document per duplicate cluster").
  *
  * Algorithm: iterative minimum-label propagation over the undirected edge
  * set (the classic Spark/MapReduce connected-components shape, cf.
  * Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC
  * 2014). Each iteration joins the current labels to the edges and takes
  * the min label over {self} ∪ neighbors; convergence in O(diameter)
  * iterations — near-dup clusters are small and dense, so the practical
  * iteration count is 2-4.
  *
  * Scale shape: every iteration shuffles ONLY the pair-member vertex set
  * (documents that appear in at least one candidate pair), never the
  * corpus. At 10^9 docs the near-dup graph is orders of magnitude smaller
  * than the corpus, and the per-iteration cost is a shuffle join keyed by
  * vertex id with map-side-combined min aggregation.
  */
object DedupCluster {

  /** (doc_id, cluster_id) for every vertex of `pairs` (columns a, b);
    * cluster_id = min doc_id of the connected component. */
  def connectedComponents(spark: SparkSession, pairs: DataFrame,
                          a: String, b: String, maxIter: Int = 25): DataFrame = {
    // undirected edge list, deduped (propagation is symmetric)
    val edges = pairs.select(col(a).as("src"), col(b).as("dst"))
      .union(pairs.select(col(b).as("src"), col(a).as("dst")))
      .distinct()
      .cache()
    try {
      // EAGER localCheckpoint each iteration: iterative label propagation
      // references the previous labels twice per step (directly and through
      // neighborMin), so without lineage truncation the logical plan
      // doubles every iteration and prior shuffles re-execute each round;
      // checkpointing materializes the labels AND cuts the plan, which also
      // makes the returned frame independent of the edges cache below
      var labels = edges.select(col("src").as("id")).distinct()
        .withColumn("label", col("id"))
        .localCheckpoint(true)
      var changed = 1L
      var iter = 0
      while (changed > 0 && iter < maxIter) {
        // min over neighbor labels, then min with the current label
        val neighborMin = edges
          .join(labels.withColumnRenamed("id", "dst"), "dst")
          .groupBy(col("src").as("id"))
          .agg(min("label").as("nmin"))
        val next = labels.join(neighborMin, Seq("id"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nmin"), col("label"))).as("label"),
            (col("nmin") < col("label")).as("moved"))
          .localCheckpoint(true)
        changed = next.where(col("moved")).count()
        labels = next.select("id", "label")
        iter += 1
      }
      require(changed == 0, s"connected components did not converge in $maxIter iterations")
      labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
    } finally { edges.unpersist(); () } // never leak the cache, even on failure
  }
}
