package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import graft.functions.IncrementalNearDup
import java.nio.file.Files

/** Incremental near-dup cluster maintenance must stay EQUAL to the
  * from-scratch LSH+connected-components computation over the current
  * corpus after every batch — including cluster MERGES (a new bridge doc
  * joins two clusters) and SPLITS (deleting the bridge separates them
  * again), the two transitions a naive incremental index gets wrong. */
class IncrementalNearDupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // sliding 64-word windows over a synthetic word sequence: a shift-8
  // neighbor shares 56 words (~0.77 shingle jaccard — band-hit odds
  // ≈0.999), shift-12 ~0.68 (≈0.97), shift-32 ~0.44 (below the 0.5 pair
  // threshold). All strings are fixed, so the minhash band collisions
  // are deterministic — once green, always green.
  private def seqWords(tag: String, n: Int): IndexedSeq[String] =
    (0 until n).map(i => s"$tag$i")
  private def window(ws: IndexedSeq[String], from: Int): String =
    ws.slice(from, from + 64).mkString(" ")

  test("merge, split, update, and delete transitions all match from-scratch clustering") {
    val ss = spark
    import ss.implicits._
    val work = Files.createTempDirectory("graft-incdup").toString
    var corpus = Map.empty[Long, String]
    def lookup(ids: Seq[Long]) =
      ids.map(i => (i, corpus(i))).toDF("doc_id", "text")
    def applyB(added: Seq[(Long, String)], removed: Seq[Long]): Unit = {
      val remDf = removed.map(i => (i, corpus(i))).toDF("doc_id", "text")
      corpus = corpus -- removed ++ added
      IncrementalNearDup.applyBatch(spark, work,
        added.toDF("doc_id", "text"), remDf, lookup)
      ()
    }
    def got: Map[Long, Long] = IncrementalNearDup.clusters(spark, work)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def check(ctx: String): Map[Long, Long] = {
      val g = got
      val want = IncrementalNearDup.fromScratch(spark,
        corpus.toSeq.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(g == want, s"[$ctx] incremental=$g from-scratch=$want")
      g
    }

    val X = seqWords("x", 88)
    val C = seqWords("c", 104)
    val y0 = seqWords("y", 32).mkString(" ")
    val y1 = (seqWords("y", 30) ++ Seq("yq", "yr")).mkString(" ")

    // batch 1: an adjacency-only chain x0-x1-x2 (shift 12: adjacent 0.68,
    // ends 0.44), a duplicate pair (y), two c-clusters 32 words apart,
    // one unrelated singleton
    applyB(Seq(
      10L -> window(X, 0), 11L -> window(X, 12), 12L -> window(X, 24),
      20L -> y0, 21L -> y1,
      50L -> window(C, 0), 51L -> window(C, 8),
      52L -> window(C, 32), 53L -> window(C, 40),
      30L -> seqWords("solo", 32).mkString(" ")), Seq.empty)
    val g1 = check("initial corpus")
    assert(g1.get(10L) == g1.get(11L) && g1.get(11L) == g1.get(12L) &&
      g1.get(10L).isDefined, s"x chain must be one cluster: $g1")
    assert(g1.get(20L) == g1.get(21L) && g1.get(20L).isDefined)
    assert(g1.get(50L) == g1.get(51L) && g1.get(52L) == g1.get(53L) &&
      g1(50L) != g1(52L), s"c pairs must start as two clusters: $g1")
    assert(!g1.contains(30L), "a doc with no pairs is not in the cluster table")

    // batch 2: bridge doc MERGES the two c-clusters (shares 52 words
    // with c1 and with c2 — ~0.68 to both sides)
    applyB(Seq(54L -> window(C, 20)), Seq.empty)
    val g2 = check("bridge merge")
    assert(Set(50L, 51L, 52L, 53L, 54L).flatMap(g2.get).size == 1,
      s"bridge must merge the c clusters: $g2")

    // batch 3: deleting the bridge SPLITS them again
    applyB(Seq.empty, Seq(54L))
    val g3 = check("bridge delete split")
    assert(g3(50L) == g3(51L) && g3(52L) == g3(53L) && g3(50L) != g3(52L),
      s"delete must split the merged cluster: $g3")

    // batch 4: deleting the chain's middle doc dissolves the x cluster
    applyB(Seq.empty, Seq(11L))
    val g4 = check("chain middle delete")
    assert(!g4.contains(10L) && !g4.contains(12L),
      s"severed chain ends have no pairs and must drop out: $g4")

    // batch 5: UPDATE a duplicate to unrelated content (remove+add):
    // its twin becomes a singleton and leaves too
    applyB(Seq(21L -> seqWords("other", 32).mkString(" ")), Seq(21L))
    val g5 = check("update dissolves duplicate pair")
    assert(!g5.contains(20L) && !g5.contains(21L), g5.toString)

    // batch 6: a fresh duplicate of y0 re-forms the cluster
    applyB(Seq(22L -> (seqWords("y", 31) :+ "yz").mkString(" ")), Seq.empty)
    val g6 = check("new duplicate re-pairs")
    assert(g6.get(20L) == g6.get(22L) && g6.get(20L).isDefined, g6.toString)

    // batch 7: everything y-related removed in one batch
    applyB(Seq.empty, Seq(20L, 22L))
    check("bulk delete")
  }

  test("seeded random add/update/delete sequence stays equal to from-scratch") {
    val ss = spark
    import ss.implicits._
    val work = Files.createTempDirectory("graft-incdup-rnd").toString
    var corpus = Map.empty[Long, String]
    def lookup(ids: Seq[Long]) =
      ids.map(i => (i, corpus(i))).toDF("doc_id", "text")
    def applyB(added: Seq[(Long, String)], removed: Seq[Long]): Unit = {
      val remDf = removed.map(i => (i, corpus(i))).toDF("doc_id", "text")
      corpus = corpus -- removed ++ added
      IncrementalNearDup.applyBatch(spark, work,
        added.toDF("doc_id", "text"), remDf, lookup)
      ()
    }
    val W = seqWords("r", 120)
    val rnd = new scala.util.Random(11)
    var nextId = 100L
    (1 to 12).foreach { step =>
      val ids = corpus.keys.toVector.sorted
      val roll = if (ids.size < 3) 0 else rnd.nextInt(3)
      roll match {
        case 0 => // add 1-2 docs at random shifts
          val adds = (0 to rnd.nextInt(2)).map { _ =>
            val id = nextId; nextId += 1
            id -> window(W, rnd.nextInt(56))
          }
          applyB(adds, Seq.empty)
        case 1 => applyB(Seq.empty, Seq(ids(rnd.nextInt(ids.size))))
        case 2 =>
          val id = ids(rnd.nextInt(ids.size))
          applyB(Seq(id -> window(W, rnd.nextInt(56))), Seq(id))
      }
      val g = IncrementalNearDup.clusters(spark, work)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = IncrementalNearDup.fromScratch(spark,
        corpus.toSeq.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(g == want, s"[step $step] incremental=$g from-scratch=$want")
    }
  }

  test("a crash mid state-swap is recovered: the state never silently empties") {
    val ss = spark
    import ss.implicits._
    val work = Files.createTempDirectory("graft-incdup-crash").toString
    var corpus = Map.empty[Long, String]
    def lookup(ids: Seq[Long]) =
      ids.map(i => (i, corpus(i))).toDF("doc_id", "text")
    def applyB(added: Seq[(Long, String)], removed: Seq[Long]): Unit = {
      val remDf = removed.map(i => (i, corpus(i))).toDF("doc_id", "text")
      corpus = corpus -- removed ++ added
      IncrementalNearDup.applyBatch(spark, work,
        added.toDF("doc_id", "text"), remDf, lookup)
      ()
    }
    def got: Map[Long, Long] = IncrementalNearDup.clusters(spark, work)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val W = seqWords("k", 96)
    applyB(Seq(1L -> window(W, 0), 2L -> window(W, 8)), Seq.empty)
    val before = got
    assert(before.nonEmpty)

    val dir = java.nio.file.Paths.get(work, "clusters")
    val next = java.nio.file.Paths.get(work, "clusters.next")
    val old = java.nio.file.Paths.get(work, "clusters.old")

    // crash between the swap's two renames: dir missing, fully-written
    // `.next`, stale `.old` — a PASSIVE read serves the completed .next
    // without touching anything (a reader racing the writer must never
    // rename/delete; the pre-fix delete-then-rename protocol made this
    // state a permanent silent loss of the whole cluster index)
    Files.createDirectories(old)
    Files.write(old.resolve("stale.parquet"), Array[Byte](9, 9, 9))
    Files.move(dir, next)
    assert(got == before, "a passive read must serve the completed .next state")
    assert(!Files.exists(dir) && Files.isDirectory(next) && Files.isDirectory(old),
      "reads must not mutate the crash state")

    // the WRITER heals the swap at the next batch and advances correctly
    applyB(Seq(3L -> window(W, 16)), Seq.empty)
    assert(Files.isDirectory(dir) && !Files.exists(next) && !Files.exists(old),
      "the next batch's writer-side recovery must finish the swap")
    val want = IncrementalNearDup.fromScratch(spark,
      corpus.toSeq.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)

    // crash DURING the `.next` write: dir intact, `.next` partial garbage
    // — reads serve the authoritative dir; the next write discards the
    // partial
    Files.createDirectories(next)
    Files.write(next.resolve("part-garbage.parquet"), Array[Byte](1, 2, 3))
    assert(got == want, "the authoritative dir must win over a partial .next")
    applyB(Seq(4L -> window(W, 24)), Seq.empty)
    assert(!Files.exists(next))
    val want2 = IncrementalNearDup.fromScratch(spark,
      corpus.toSeq.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want2)
  }
}
