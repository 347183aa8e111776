package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** AQE skew-join evidence (north rule: "partitioning / shuffle / skew
  * handled explicitly"): beyond the salted repartition in ExtractionJob,
  * a skewed shuffle join must be split at runtime by AQE's
  * OptimizeSkewedJoin. Thresholds are lowered so the sandbox-sized input
  * exhibits the behavior the defaults give at 100 TB.
  */
class SkewJoinSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // set at runtime: getOrCreate may reuse a prior suite's session, which
    // would silently drop builder configs
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // sandbox-scale thresholds: at 100 TB the 256MB defaults fire the same way
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force sort-merge
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("AQE splits the skewed partition of a hot-key join at runtime") {
    // heavy-tailed fact: one hot key owns 90% of rows (a hot conversation)
    val fact = spark.range(0, 200000)
      .select((when(col("id") % 10 < 9, lit(7L)).otherwise(col("id") % 1000)).as("k"),
        concat(lit("payload-"), col("id")).as(("payload")))
    val dim = spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("v"))
    val joined = fact.join(dim, "k")
    // collect() executes THIS dataset's queryExecution (count()/foreach()
    // would build a separate one and leave this plan unexecuted)
    assert(joined.collect().length == 200000)
    // after execution AQE has finalized the plan; the skewed side must show
    // the skew=true marker (OptimizeSkewedJoin split the hot partition)
    val finalPlan = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    assert(finalPlan.contains("skew=true"),
      s"expected OptimizeSkewedJoin marker in final plan:\n${finalPlan.take(2000)}")
  }

  test("connected components: clusters labeled by min member, multi-hop chains converge") {
    val ss = spark
    import ss.implicits._
    // components: {1,2,3,4} as a PATH (multi-hop propagation), {10,11}
    // as one edge, {20,21,22} as a triangle; 30/31 isolated pair
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L), // path 1-2-3-4 (min at one end)
      (11L, 10L),
      (20L, 21L), (21L, 22L), (22L, 20L),
      (31L, 30L)).toDF("a", "b")
    val got = graft.functions.DedupCluster
      .connectedComponents(spark, pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L,
      30L -> 30L, 31L -> 30L), got.toString)
    // a longer chain (diameter 7) still converges and labels by the min
    val chain = (1L until 8L).map(i => (i + 1, i)).toDF("a", "b")
    val gotChain = graft.functions.DedupCluster
      .connectedComponents(spark, chain, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotChain == (1L to 8L).map(_ -> 1L).toMap, gotChain.toString)
  }

  test("connected components: adversarial 10k-vertex path converges within the round budget (large-star/small-star)") {
    val ss = spark
    import ss.implicits._
    // a seeded PERMUTED path: diameter 9,999 with the min vertex at a
    // random interior position — min-label propagation would need one
    // iteration per hop; the two-phase star contraction must finish in
    // O(log n) rounds (maxIter default 25)
    val n = 10000
    val rnd = new scala.util.Random(42)
    val perm = rnd.shuffle((0L until n.toLong).toVector)
    val pairs = (1 until n).map(i => (perm(i - 1), perm(i))).toDF("a", "b")
    val got = graft.functions.DedupCluster.connectedComponents(spark, pairs, "a", "b")
    assert(got.count() == n.toLong, "every vertex labeled")
    assert(got.where(col("cluster_id") =!= 0L).count() == 0,
      "single component rooted at the minimum vertex")

    // seeded random forest: labels must equal a driver-side union-find
    val m = 2000
    val edges = Vector.tabulate(m) { i =>
      val a = rnd.nextInt(3000).toLong; val b = rnd.nextInt(3000).toLong; (a, b)
    }
    val uf = new Array[Long](3000); for (i <- uf.indices) uf(i) = i.toLong
    def find(x: Long): Long = { var r = x; while (uf(r.toInt) != r) r = uf(r.toInt); r }
    edges.foreach { case (x, y) =>
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) { val (lo, hi) = (math.min(rx, ry), math.max(rx, ry)); uf(hi.toInt) = lo }
    }
    // path-compress to the true min root
    val want = edges.flatMap { case (x, y) => Seq(x, y) }.distinct
      .map(v => v -> find(v)).toMap
    val gotRnd = graft.functions.DedupCluster
      .connectedComponents(spark, edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotRnd == want,
      s"random-graph mismatch: ${gotRnd.toSet.diff(want.toSet).take(5)}")
  }
}
