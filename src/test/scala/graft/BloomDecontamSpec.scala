package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession

/** q43 (bloom-prefiltered decontamination) must be semantically identical
  * to q40 (exact broadcast decontamination): the Bloom filter is a pure
  * prefilter — false positives die in the exact confirm join, and false
  * negatives are impossible because every eval gram's probe bits are set
  * by construction. Any divergence means the build/probe hash positions
  * disagree, which is exactly the bug class a bloom prefilter can hide
  * silently at scale (missed contamination).
  */
class BloomDecontamSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q43 equals q40 row-for-row (no false negatives, FPs removed)") {
    val exact = graft.queries.Queries.q40Decontaminate(spark, dir).collect()
    val bloom = graft.queries.Queries.q43BloomDecontaminate(spark, dir).collect()
    assert(exact.nonEmpty, "fixture must produce contaminated docs")
    assert(bloom.toSeq == exact.toSeq)
  }
}
