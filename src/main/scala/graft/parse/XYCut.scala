package graft.parse

import scala.collection.mutable

/** PDF layout parsing: text-run clustering into blocks and reading order via
  * recursive XY-cut (Nagy & Seth's projection-profile page decomposition —
  * public literature; see PAPERS.md). This is the from-scratch replacement
  * for the reference's Docling layout stage (SURVEY.md §2.1 #1): text runs
  * (page, x0, y0, x1, y1, text) in arbitrary order -> lines in reading order.
  */
object XYCut {

  final case class Run(page: Int, x0: Double, y0: Double, x1: Double, y1: Double, text: String)

  /** Serialized form used in transcript payloads: one run per line,
    * tab-separated `page\tx0\ty0\tx1\ty1\ttext`.
    */
  def parseRuns(payload: String): Vector[Run] =
    payload.split("\n").toVector.flatMap { l =>
      val parts = l.split("\t", 6)
      if (parts.length == 6)
        try Some(Run(parts(0).toInt, parts(1).toDouble, parts(2).toDouble,
          parts(3).toDouble, parts(4).toDouble, parts(5)))
        catch { case _: NumberFormatException => None }
      else None
    }

  def renderRuns(runs: Seq[Run]): String =
    runs.map(r => s"${r.page}\t${r.x0}\t${r.y0}\t${r.x1}\t${r.y1}\t${r.text}").mkString("\n")

  /** Recursive XY-cut over one page's runs. Coordinates: y grows downward.
    * At each level, find the widest whitespace valley (horizontal first —
    * i.e. a y-gap splitting top/bottom; then vertical — an x-gap splitting
    * columns); recurse left-to-right / top-to-bottom. Leaves group runs into
    * visual lines by y-overlap and sort left-to-right.
    */
  def readingOrder(runs0: Seq[Run], minGap: Double = 6.0): Vector[Run] = {
    if (runs0.isEmpty) return Vector.empty
    runs0.groupBy(_.page).toVector.sortBy(_._1).flatMap { case (_, pageRuns) =>
      order(pageRuns.toVector, minGap, vertical = false)
    }
  }

  private def order(runs: Vector[Run], minGap: Double, vertical: Boolean): Vector[Run] = {
    if (runs.length <= 1) return runs
    // try a horizontal cut (y-gap) first, then vertical (x-gap)
    hCut(runs, minGap) match {
      case Some((top, bottom)) =>
        order(top, minGap, vertical) ++ order(bottom, minGap, vertical)
      case None =>
        vCut(runs, minGap) match {
          case Some((left, right)) =>
            order(left, minGap, vertical) ++ order(right, minGap, vertical)
          case None => leafOrder(runs)
        }
    }
  }

  /** Largest y-gap across the full width: split top/bottom. */
  private def hCut(runs: Vector[Run], minGap: Double): Option[(Vector[Run], Vector[Run])] =
    projectionCut(runs, minGap, _.y0, _.y1).map { cutAt =>
      runs.partition(_.y1 <= cutAt) match { case (a, b) => (a, b) }
    }

  /** Largest x-gap across the full height: split left/right columns. */
  private def vCut(runs: Vector[Run], minGap: Double): Option[(Vector[Run], Vector[Run])] =
    projectionCut(runs, minGap, _.x0, _.x1).map { cutAt =>
      runs.partition(_.x1 <= cutAt) match { case (a, b) => (a, b) }
    }

  /** Find the midpoint of the widest empty interval in the projection of
    * [lo(r), hi(r)] intervals; None if no gap >= minGap or a cut would not
    * split the set.
    */
  private def projectionCut(runs: Vector[Run], minGap: Double,
                            lo: Run => Double, hi: Run => Double): Option[Double] = {
    val intervals = runs.map(r => (lo(r), hi(r))).sortBy(_._1)
    var bestGap = 0.0
    var bestCut = Double.NaN
    var coveredTo = intervals.head._2
    intervals.tail.foreach { case (s, e) =>
      if (s > coveredTo) {
        val gap = s - coveredTo
        if (gap > bestGap) { bestGap = gap; bestCut = (coveredTo + s) / 2 }
      }
      coveredTo = math.max(coveredTo, e)
    }
    if (bestGap >= minGap) {
      val (a, b) = runs.partition(r => hi(r) <= bestCut)
      if (a.nonEmpty && b.nonEmpty) Some(bestCut) else None
    } else None
  }

  /** Leaf: cluster runs into lines by vertical overlap of their midlines,
    * order lines top-to-bottom, runs within a line left-to-right.
    */
  private def leafOrder(runs: Vector[Run]): Vector[Run] = {
    val sorted = runs.sortBy(r => (r.y0 + r.y1) / 2)
    val lines = mutable.ArrayBuffer[mutable.ArrayBuffer[Run]]()
    sorted.foreach { r =>
      val mid = (r.y0 + r.y1) / 2
      lines.lastOption match {
        case Some(line) if {
          val lt = line.map(_.y0).min; val lb = line.map(_.y1).max
          mid >= lt && mid <= lb
        } => line += r
        case _ => lines += mutable.ArrayBuffer(r)
      }
    }
    lines.flatMap(_.sortBy(_.x0)).toVector
  }

  /** Runs -> text lines: reading order, then join runs that share a visual
    * line with single spaces.
    */
  def toLines(runs0: Seq[Run], minGap: Double = 6.0): Vector[String] = {
    val ordered = readingOrder(runs0, minGap)
    if (ordered.isEmpty) return Vector.empty
    val out = mutable.ArrayBuffer[String]()
    val current = mutable.ArrayBuffer[Run]()
    def flush(): Unit = if (current.nonEmpty) {
      out += current.map(_.text).mkString(" ")
      current.clear()
    }
    ordered.foreach { r =>
      current.lastOption match {
        case Some(prev) if prev.page == r.page && {
          val mid = (r.y0 + r.y1) / 2
          mid >= current.map(_.y0).min && mid <= current.map(_.y1).max && r.x0 >= prev.x0
        } => current += r
        case _ => flush(); current += r
      }
    }
    flush()
    out.toVector
  }

  /** Deterministic fixture synthesis: lay lines out as text runs in `cols`
    * columns (top-down, then next column), one run per line — the inverse
    * view used by tests to assert reading-order recovery.
    */
  def synthesizeColumns(lines: Seq[String], cols: Int, page: Int = 0,
                        colWidth: Double = 300.0, lineHeight: Double = 14.0,
                        colGutter: Double = 40.0): Vector[Run] = {
    val perCol = math.ceil(lines.length.toDouble / cols).toInt
    lines.zipWithIndex.map { case (text, i) =>
      val col = i / perCol
      val row = i % perCol
      val x0 = col * (colWidth + colGutter)
      val y0 = row * lineHeight
      Run(page, x0, y0, x0 + colWidth, y0 + lineHeight - 4, text)
    }.toVector
  }
}
