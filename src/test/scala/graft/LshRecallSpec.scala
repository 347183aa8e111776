package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import graft.functions.TextFns

/** MinHash-LSH near-dup recall vs the exact shingle-Jaccard ground truth
  * (the q14 analog of AnnRecallSpec for q23): the banding (16 bands x 4
  * rows over 64 perms) must surface nearly all true Jaccard>=0.5 pairs.
  *
  * Band/row tradeoff at these parameters: candidate probability for
  * similarity s is 1-(1-s^4)^16 — ~0.96 at s=0.5, >0.9999 at s=0.7 — so
  * recall>=0.85 on a 500-doc sample leaves headroom for sampling noise
  * while catching any regression in the signature or banding code.
  */
class LshRecallSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q14 MinHash-LSH recall >= 0.85 of exact Jaccard>=0.5 pairs on sf0.001") {
    // exact ground truth, computed driver-side from the same shingle defs
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    val truth = (for {
      i <- docs.indices.iterator
      j <- (i + 1) until docs.length
      if TextFns.jaccardShingles(docs(i)._2, docs(j)._2, 3) >= 500
    } yield (docs(i)._1, docs(j)._1)).toSet
    assert(truth.nonEmpty, "test data must contain true near-dup pairs")

    val found = graft.queries.Queries.q14MinhashLsh(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // q14's verify stage already enforces precision (every emitted pair has
    // exact Jaccard >= 0.5); this asserts the banding stage's recall
    assert(found.subsetOf(truth), s"precision breach: ${found.diff(truth)}")
    val recall = truth.intersect(found).size.toDouble / truth.size
    info(s"recall=$recall (|truth|=${truth.size}, |found|=${found.size})")
    assert(recall >= 0.85, s"LSH recall $recall below bound (|truth|=${truth.size}, |found|=${found.size})")
  }

  test("degenerate-band skew guard: capped pairs are a subset; default cap is inert here") {
    import graft.queries.Queries
    def pairs(cap: Int) = Queries.q14MinhashLsh(spark, dir, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val unbounded = pairs(Int.MaxValue)
    // the production default (1000) drops nothing at this scale — capped
    // output identical, so the bench/oracle numbers measure the guard too
    assert(pairs(1000) == unbounded, "default cap must be inert at sandbox scale")
    // a tiny cap drops hot buckets but never invents pairs, and survivors
    // still pair through their other bands
    val tight = pairs(2)
    assert(tight.subsetOf(unbounded), "capped candidates must be a subset")
  }
}
