package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.functions.{NativeFns, TextFns}

/** Native Catalyst expressions (SimHash64 & co): SQL registration via
  * SparkSessionExtensions, value equivalence with the row-local functions,
  * codegen path (no ScalaUDF in the plan), and null handling.
  */
class NativeExprSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    // extensions apply at session construction — a reused session would
    // silently skip them, so force a fresh one
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession).foreach(_.stop())
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val samples = Seq("hello world", "", "the dental office called",
    "patient name: ___", "café ’quote’ text")

  test("SQL functions registered through SparkSessionExtensions") {
    val sp = spark
    import sp.implicits._
    samples.foreach { s =>
      val lit = s.replace("'", "''")
      val Array(sim, h, bpe) = spark.sql(
        s"select graft_simhash64('$lit'), graft_hash64('$lit'), graft_bpe_token_count('$lit')")
        .as[(Long, Long, Long)].head() match { case (a, b, c) => Array(a, b, c) }
      assert(sim == TextFns.simHash(s), s"simhash s=$s")
      assert(h == TextFns.hash64(s), s"hash64 s=$s")
      assert(bpe == TextFns.bpeTokenCount(s).toLong, s"bpe s=$s")
      assert(spark.sql(s"select graft_lang_id('$lit')").as[String].head() ==
        TextFns.detectLanguage(s), s"lang s=$s")
    }
  }

  test("LshBandKeys / JaccardShingles1000 match the row-local functions") {
    val sp = spark
    import sp.implicits._
    val df = samples.toDF("text")
    val bandRows = df.select(col("text"),
      NativeFns.lshBandKeys(col("text"), 3, 64, 16).as("bands")).collect()
    bandRows.foreach { r =>
      val s = r.getAs[String]("text")
      val want = TextFns.lshBandKeys(TextFns.minHashSignature(s, 3, 64), 16)
        .zipWithIndex.map { case (h, b) => s"$b:$h" }.toList
      assert(r.getSeq[String](1).toList == want, s"bands s=$s")
    }
    val pairs = Seq(("hello world", "hello world"), ("abcdef", "abcxyz"), ("", "x"))
    val jacRows = pairs.toDF("a", "b").select(col("a"), col("b"),
      NativeFns.jaccardShingles1000(col("a"), col("b"), 3).as("j")).collect()
    jacRows.foreach { r =>
      assert(r.getAs[Int]("j") ==
        TextFns.jaccardShingles(r.getAs[String]("a"), r.getAs[String]("b"), 3))
    }
    // SQL registration + codegen path (no ScalaUDF in plan)
    val planStr = df.select(NativeFns.lshBandKeys(col("text")).as("b"),
      NativeFns.jaccardShingles1000(col("text"), col("text")).as("j"))
      .queryExecution.executedPlan.toString
    assert(!planStr.contains("ScalaUDF"), planStr)
    assert(spark.sql("select graft_jaccard_shingles('abcdef','abcdef')").as[Int].head() == 1000)
    assert(spark.sql("select size(graft_lsh_band_keys('hello world'))").as[Int].head() == 16)
  }

  test("Column API equivalence on a table and null propagation") {
    val sp = spark
    import sp.implicits._
    val df = (samples.map(Option(_)) :+ None).toDF("text")
    val rows = df.select(NativeFns.simhash64(col("text")).as("sim"),
      NativeFns.hash64(col("text")).as("h"),
      NativeFns.bpeTokenCount(col("text")).as("bpe"),
      NativeFns.langId(col("text")).as("lang"),
      col("text")).collect()
    rows.foreach { r =>
      Option(r.getAs[String]("text")) match {
        case Some(s) =>
          assert(r.getAs[Long]("sim") == TextFns.simHash(s))
          assert(r.getAs[Long]("h") == TextFns.hash64(s))
          assert(r.getAs[Long]("bpe") == TextFns.bpeTokenCount(s).toLong)
          assert(r.getAs[String]("lang") == TextFns.detectLanguage(s))
        case None => // nullIntolerant: null in -> null out
          assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
      }
    }
  }

  test("expressions stay inside whole-stage codegen (no ScalaUDF boundary)") {
    val df = spark.range(200).selectExpr("cast(id as string) as text")
      .select(NativeFns.simhash64(col("text")).as("sim"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    // "*(1)" marks the WholeStageCodegen stage in the compact plan string —
    // the projection carrying the expression must sit inside one
    assert(plan.contains("*(1) Project [graft_simhash64"), plan)
    // and the values it computes under codegen are the row-local values
    val viaSql = df.collect().map(_.getLong(0)).sorted
    val expected = (0L until 200L).map(i => TextFns.simHash(i.toString)).sorted
    assert(viaSql.toSeq == expected)
  }
}
