package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession

/** q45 (target-mixture reweighting) and q46 (deterministic epoch shuffle):
  * the invariants the DuckDB value-oracle cannot state — that the sampled
  * corpus actually HITS the target mixture (the binding language kept in
  * full, every other language's kept share matching its derived rate), and
  * that the epoch order is a genuine permutation (each shard's positions
  * are exactly 1..count, reproducible across runs).
  */
class MixtureShuffleSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q45: binding language kept in full; kept counts track rate*n within the md5-uniformity tolerance") {
    val target = Map("en" -> 0.50, "es" -> 0.10, "de" -> 0.15, "fr" -> 0.15, "zh" -> 0.10)
    val totals = graft.queries.Queries.table(spark, dir, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = graft.queries.Queries.q45MixtureReweight(spark, dir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.keySet == target.keySet)
    val c = target.keys.map(l => totals(l) / target(l)).min
    val binding = target.keys.minBy(l => totals(l) / target(l))
    assert(kept(binding) == totals(binding), s"binding lang $binding must keep 100%")
    for (l <- target.keys) {
      val expected = math.min(1.0, c * target(l) / totals(l)) * totals(l)
      // md5-prefix acceptance is uniform; allow a generous binomial band
      val slack = 4 * math.sqrt(expected) + 3
      assert(math.abs(kept(l) - expected) <= slack,
        s"lang $l kept ${kept(l)}, expected ~$expected (±$slack)")
    }
  }

  test("q46: each shard's positions are exactly 1..count and the order is reproducible") {
    val df = graft.queries.Queries.q46EpochShuffle(spark, dir).cache()
    val byShard = df.groupBy("shard")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.countDistinct("pos").as("d"),
        org.apache.spark.sql.functions.min("pos").as("lo"),
        org.apache.spark.sql.functions.max("pos").as("hi"))
      .collect()
    assert(byShard.length == 8)
    byShard.foreach { r =>
      val (n, d, lo, hi) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(d == n && lo == 1 && hi == n, s"shard ${r.getInt(0)}: not a permutation ($r)")
    }
    // reproducible: the seeded key is a pure function of doc_id
    val again = graft.queries.Queries.q46EpochShuffle(spark, dir).collect().toSeq
    assert(df.collect().toSeq == again)
    df.unpersist()
    ()
  }
}
