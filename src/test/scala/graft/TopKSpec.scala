package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TopKBuffer

/** The bounded-heap top-k buffer behind [[graft.functions.TopKPairs]]:
  * exhaustive agreement with brute-force sorting under seeded random
  * inputs, merge associativity (the partial-aggregation contract), and
  * byte round-trips (the shuffle contract). SQL-route coverage lives in
  * SqlSurfaceSpec (same session as the other extension functions). */
class TopKSpec extends AnyFunSuite {

  private def brute(pairs: Seq[(Long, Long)], k: Int): Seq[(Long, Long)] =
    pairs.sorted(Ordering.Tuple2(Ordering.Long.reverse, Ordering.Long)).take(k)

  private def viaHeap(pairs: Seq[(Long, Long)], k: Int): Seq[(Long, Long)] = {
    val b = new TopKBuffer(k)
    pairs.foreach { case (v, p) => b.offer(v, p) }
    b.sortedBestFirst().toSeq
  }

  test("heap agrees with brute force across seeded random inputs (duplicates, negatives, small k)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 200) {
      val n = rnd.nextInt(60)
      val k = 1 + rnd.nextInt(12)
      // tight value range forces duplicate values => payload tiebreaks
      val pairs = Seq.fill(n)((rnd.nextInt(8).toLong - 4, rnd.nextInt(20).toLong - 10))
      assert(viaHeap(pairs, k) == brute(pairs, k), s"trial $trial: k=$k pairs=$pairs")
    }
  }

  test("merge of split buffers equals one buffer over the whole input (partial-agg contract)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 100) {
      val k = 1 + rnd.nextInt(8)
      val pairs = Seq.fill(rnd.nextInt(80))((rnd.nextInt(10).toLong, rnd.nextInt(30).toLong))
      val cut = if (pairs.isEmpty) 0 else rnd.nextInt(pairs.length + 1)
      val (a, b) = pairs.splitAt(cut)
      val left = new TopKBuffer(k); a.foreach { case (v, p) => left.offer(v, p) }
      val right = new TopKBuffer(k); b.foreach { case (v, p) => right.offer(v, p) }
      right.foreach(left.offer) // merge right into left, as TopKPairs.merge does
      assert(left.sortedBestFirst().toSeq == brute(pairs, k), s"trial $trial")
    }
  }

  test("serialize/deserialize round-trips the retained set exactly") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 50) {
      val k = 1 + rnd.nextInt(10)
      val b = new TopKBuffer(k)
      Seq.fill(rnd.nextInt(40))((rnd.nextLong(), rnd.nextLong()))
        .foreach { case (v, p) => b.offer(v, p) }
      val back = TopKBuffer.fromBytes(k, b.toBytes)
      assert(back.sortedBestFirst().toSeq == b.sortedBestFirst().toSeq)
    }
  }

  test("corrupt buffer bytes are refused, not silently truncated") {
    val b = new TopKBuffer(2)
    b.offer(1, 1); b.offer(2, 2); b.offer(3, 3)
    intercept[IllegalArgumentException] {
      TopKBuffer.fromBytes(1, b.toBytes) // claims 2 entries for bound 1
    }
  }
}
