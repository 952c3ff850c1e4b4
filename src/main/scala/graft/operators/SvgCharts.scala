package graft.operators

import java.util.Locale

/** Deterministic pure-Scala SVG chart writer — the rendering tier the
  * reference ships as matplotlib PNGs (plots_from_spark_outputs.py:30-113
  * save_bar: sorted bars, shortened labels, value labels on top, dashed
  * y grid; integratedplots_query.py:19-44 scatter). PNGs need a raster
  * dependency; SVG is plain text, so the same figures render from the
  * chart frames with no new libraries and BYTE-DETERMINISTIC output
  * (Locale.ROOT formatting, no timestamps) — a re-run on the same data
  * produces the identical file, which is what makes figures diffable
  * run artifacts rather than screenshots.
  *
  * Only driver-sized data is ever rendered: every input is a bounded
  * chart frame (top-k rows, segment counts, the buyers scatter), so the
  * collect() feeding a figure is part of the report sink, not the
  * distributed plan.
  */
object SvgCharts {

  private val W = 1100
  private val H = 620

  private def fmt(v: Double): String =
    if (v == v.floor && math.abs(v) < 1e15)
      String.format(Locale.ROOT, "%,d", Long.box(v.toLong))
    else String.format(Locale.ROOT, "%,.2f", Double.box(v))

  private def coord(v: Double): String =
    String.format(Locale.ROOT, "%.2f", Double.box(v))

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Shorten long category labels the way the reference does
    * (plots_from_spark_outputs.py:22 shorten_label).
    */
  private def shorten(s: String, maxLen: Int): String =
    if (s.length <= maxLen) s else s.take(maxLen) + "..."

  /** Largest "nice" tick step (1/2/5 × 10^k) so ~`n` ticks cover
    * [0, vMax] — the deterministic stand-in for matplotlib's locator.
    */
  private def niceStep(vMax: Double, n: Int): Double = {
    val raw = math.max(vMax, 1e-9) / n
    val mag = math.pow(10, math.floor(math.log10(raw)))
    val m   = raw / mag
    (if (m <= 1) 1.0 else if (m <= 2) 2.0 else if (m <= 5) 5.0 else 10.0) * mag
  }

  private def header(title: String): String =
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$W" height="$H" viewBox="0 0 $W $H">
       |<rect width="$W" height="$H" fill="white"/>
       |<text x="${W / 2}" y="30" text-anchor="middle" font-family="sans-serif" font-size="18" font-weight="bold">${esc(title)}</text>""".stripMargin

  /** Vertical bar chart: bars in the input order (callers pass frames
    * already sorted descending, the reference's save_bar contract),
    * dashed y gridlines, value labels on top, 45°-rotated x labels.
    */
  def barChart(
      title: String,
      xLabel: String,
      yLabel: String,
      data: Seq[(String, Double)],
      maxLabelLen: Int = 18): String = {
    require(data.nonEmpty, s"barChart '$title': no data")
    val (mL, mR, mT, mB) = (90, 30, 60, 150)
    val plotW = W - mL - mR
    val plotH = H - mT - mB
    val vMax  = math.max(data.map(_._2).max, 1e-9)
    val step  = niceStep(vMax, 5)
    val yTop  = math.ceil(vMax / step) * step
    def yPix(v: Double) = mT + plotH - v / yTop * plotH
    val sb = new StringBuilder(header(title))
    // dashed y grid + tick labels
    var t = 0.0
    while (t <= yTop + 1e-9) {
      val y = coord(yPix(t))
      sb.append(
        s"""\n<line x1="$mL" y1="$y" x2="${W - mR}" y2="$y" stroke="#bbbbbb" stroke-dasharray="4,3" stroke-width="1"/>""")
      sb.append(
        s"""\n<text x="${mL - 8}" y="$y" text-anchor="end" dominant-baseline="middle" font-family="sans-serif" font-size="11">${fmt(t)}</text>""")
      t += step
    }
    // bars + value labels + rotated x labels
    val slot = plotW.toDouble / data.size
    data.zipWithIndex.foreach { case ((label, v), i) =>
      val bw = slot * 0.8
      val x  = mL + i * slot + slot * 0.1
      val y  = yPix(v)
      val cx = x + bw / 2
      sb.append(
        s"""\n<rect class="bar" x="${coord(x)}" y="${coord(y)}" width="${coord(bw)}" height="${coord(mT + plotH - y)}" fill="#4878a8"/>""")
      sb.append(
        s"""\n<text x="${coord(cx)}" y="${coord(y - 4)}" text-anchor="middle" font-family="sans-serif" font-size="10">${fmt(v)}</text>""")
      sb.append(
        s"""\n<text x="${coord(cx)}" y="${mT + plotH + 14}" text-anchor="end" font-family="sans-serif" font-size="11" transform="rotate(-45 ${coord(cx)} ${mT + plotH + 14})">${esc(shorten(label, maxLabelLen))}</text>""")
    }
    // axes + axis labels
    sb.append(
      s"""\n<line x1="$mL" y1="$mT" x2="$mL" y2="${mT + plotH}" stroke="black" stroke-width="1"/>""")
    sb.append(
      s"""\n<line x1="$mL" y1="${mT + plotH}" x2="${W - mR}" y2="${mT + plotH}" stroke="black" stroke-width="1"/>""")
    sb.append(
      s"""\n<text x="${mL + plotW / 2}" y="${H - 12}" text-anchor="middle" font-family="sans-serif" font-size="12">${esc(xLabel)}</text>""")
    sb.append(
      s"""\n<text x="20" y="${mT + plotH / 2}" text-anchor="middle" font-family="sans-serif" font-size="12" transform="rotate(-90 20 ${mT + plotH / 2})">${esc(yLabel)}</text>""")
    sb.append("\n</svg>\n")
    sb.toString
  }

  /** Scatter plot (the integrated engagement-vs-spend figure): dashed
    * grid both axes, half-opacity points.
    */
  def scatter(
      title: String,
      xLabel: String,
      yLabel: String,
      pts: Seq[(Double, Double)]): String = {
    require(pts.nonEmpty, s"scatter '$title': no data")
    val (mL, mR, mT, mB) = (90, 30, 60, 70)
    val plotW = W - mL - mR
    val plotH = H - mT - mB
    val xMax  = math.max(pts.map(_._1).max, 1e-9)
    val yMax  = math.max(pts.map(_._2).max, 1e-9)
    val xStep = niceStep(xMax, 6)
    val yStep = niceStep(yMax, 5)
    val xTop  = math.ceil(xMax / xStep) * xStep
    val yTop  = math.ceil(yMax / yStep) * yStep
    def xPix(v: Double) = mL + v / xTop * plotW
    def yPix(v: Double) = mT + plotH - v / yTop * plotH
    val sb = new StringBuilder(header(title))
    var t = 0.0
    while (t <= yTop + 1e-9) {
      val y = coord(yPix(t))
      sb.append(
        s"""\n<line x1="$mL" y1="$y" x2="${W - mR}" y2="$y" stroke="#bbbbbb" stroke-dasharray="4,3" stroke-width="1"/>""")
      sb.append(
        s"""\n<text x="${mL - 8}" y="$y" text-anchor="end" dominant-baseline="middle" font-family="sans-serif" font-size="11">${fmt(t)}</text>""")
      t += yStep
    }
    t = 0.0
    while (t <= xTop + 1e-9) {
      val x = coord(xPix(t))
      sb.append(
        s"""\n<line x1="$x" y1="$mT" x2="$x" y2="${mT + plotH}" stroke="#bbbbbb" stroke-dasharray="4,3" stroke-width="1"/>""")
      sb.append(
        s"""\n<text x="$x" y="${mT + plotH + 16}" text-anchor="middle" font-family="sans-serif" font-size="11">${fmt(t)}</text>""")
      t += xStep
    }
    pts.foreach { case (x, y) =>
      sb.append(
        s"""\n<circle class="pt" cx="${coord(xPix(x))}" cy="${coord(yPix(y))}" r="4" fill="#4878a8" fill-opacity="0.5"/>""")
    }
    sb.append(
      s"""\n<line x1="$mL" y1="$mT" x2="$mL" y2="${mT + plotH}" stroke="black" stroke-width="1"/>""")
    sb.append(
      s"""\n<line x1="$mL" y1="${mT + plotH}" x2="${W - mR}" y2="${mT + plotH}" stroke="black" stroke-width="1"/>""")
    sb.append(
      s"""\n<text x="${mL + plotW / 2}" y="${H - 12}" text-anchor="middle" font-family="sans-serif" font-size="12">${esc(xLabel)}</text>""")
    sb.append(
      s"""\n<text x="20" y="${mT + plotH / 2}" text-anchor="middle" font-family="sans-serif" font-size="12" transform="rotate(-90 20 ${mT + plotH / 2})">${esc(yLabel)}</text>""")
    sb.append("\n</svg>\n")
    sb.toString
  }
}
