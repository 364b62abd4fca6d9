package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths => JPaths}

import org.apache.spark.sql.DataFrame

/** Small-result reporting tail (SURVEY.md §2.2 "toPandas → csv/plots/
  * HTML"): the reference collects aggregates to pandas and renders
  * HTML tables (dbs_hdfs_eos.py:214-219, condor_cpu_efficiency HTML).
  * Here the contract is explicit: `collect()` is only legal after the
  * aggregation has reduced the relation to report size — enforce with
  * `maxRows`, fail loudly instead of OOMing a driver at scale. */
object Reports {

  /** Render a (small) DataFrame as a self-contained HTML table. */
  def htmlTable(df: DataFrame, title: String, maxRows: Int = 10000)
      : String = {
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"report exceeds $maxRows rows — aggregate further before reporting")
    val cols = df.columns
    val sb = new StringBuilder
    sb ++= s"<!DOCTYPE html><html><head><meta charset='utf-8'>"
    sb ++= s"<title>${escape(title)}</title></head><body>"
    sb ++= s"<h2>${escape(title)}</h2><table border='1'><thead><tr>"
    cols.foreach(c => sb ++= s"<th>${escape(c)}</th>")
    sb ++= "</tr></thead><tbody>"
    rows.foreach { r =>
      sb ++= "<tr>"
      cols.indices.foreach { i =>
        sb ++= s"<td>${escape(String.valueOf(r.get(i)))}</td>"
      }
      sb ++= "</tr>"
    }
    sb ++= "</tbody></table></body></html>"
    sb.toString
  }

  /** Write the HTML report to a local/posix path (the EOS-www pattern,
    * rucio_datasets_stats.py write_stats_to_eos:122-140). */
  def writeHtml(df: DataFrame, title: String, outFile: String,
      maxRows: Int = 10000): Unit = {
    val p = JPaths.get(outFile)
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.write(p, htmlTable(df, title, maxRows)
      .getBytes(StandardCharsets.UTF_8))
  }

  /** Bar chart as a self-contained SVG — the plot-rendering tail of
    * the reporting jobs (condor_hs06coreHrPlot.py:96-120 seaborn
    * barplot, hpc_running_cores_and_corehr.py:185 plotly), pure JVM:
    * no plotting library exists on a bare cluster and none is needed
    * for a bar chart. Input is (label, value) rows AFTER aggregation;
    * the same bounded-collect contract as the HTML table applies. */
  def barChartSvg(df: DataFrame, labelCol: String, valueCol: String,
      title: String, maxBars: Int = 200, width: Int = 960,
      height: Int = 420): String = {
    val rows = df.select(labelCol, valueCol).limit(maxBars + 1).collect()
    require(rows.length <= maxBars,
      s"chart exceeds $maxBars bars — aggregate further before plotting")
    val data = rows.map(r =>
      (String.valueOf(r.get(0)),
        Option(r.get(1)).map(v => v.toString.toDouble).getOrElse(0.0)))
    val (mTop, mBottom, mLeft, mRight) = (40, 70, 70, 20)
    val (plotW, plotH) = (width - mLeft - mRight, height - mTop - mBottom)
    val maxV = math.max(data.map(_._2).foldLeft(0.0)(math.max), 1e-12)
    val barW = plotW.toDouble / math.max(data.length, 1)
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="$height">"""
    sb ++= s"""<text x="${width / 2}" y="20" text-anchor="middle" font-size="16">${escape(title)}</text>"""
    // y axis: zero line + max gridline with its value
    sb ++= s"""<line x1="$mLeft" y1="$mTop" x2="$mLeft" y2="${mTop + plotH}" stroke="black"/>"""
    sb ++= s"""<line x1="$mLeft" y1="${mTop + plotH}" x2="${mLeft + plotW}" y2="${mTop + plotH}" stroke="black"/>"""
    sb ++= s"""<text x="${mLeft - 6}" y="${mTop + 4}" text-anchor="end" font-size="11">$maxV</text>"""
    sb ++= s"""<text x="${mLeft - 6}" y="${mTop + plotH + 4}" text-anchor="end" font-size="11">0</text>"""
    data.zipWithIndex.foreach { case ((label, v), i) =>
      val h = (v / maxV * plotH).max(0.0)
      val x = mLeft + i * barW
      val y = mTop + plotH - h
      sb ++= f"""<rect x="$x%.1f" y="$y%.1f" width="${barW * 0.8}%.1f" height="$h%.1f" fill="steelblue"><title>${escape(label)}: $v</title></rect>"""
      sb ++= f"""<text x="${x + barW * 0.4}%.1f" y="${mTop + plotH + 14}" text-anchor="end" font-size="10" transform="rotate(-45 ${x + barW * 0.4}%.1f ${mTop + plotH + 14})">${escape(label)}</text>"""
    }
    sb ++= "</svg>"
    sb.toString
  }

  /** Write the SVG chart next to the HTML reports (EOS-www pattern). */
  def writeBarChart(df: DataFrame, labelCol: String, valueCol: String,
      title: String, outFile: String, maxBars: Int = 200): Unit = {
    val p = JPaths.get(outFile)
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.write(p, barChartSvg(df, labelCol, valueCol, title, maxBars)
      .getBytes(StandardCharsets.UTF_8))
  }

  /** Multi-series line chart as a self-contained SVG — the
    * time-series half of the reporting tail (the reference's
    * running-cores / core-hours plotly timelines,
    * hpc_running_cores_and_corehr.py:150-204). Input is
    * (x, series, value) rows AFTER aggregation — one polyline per
    * distinct `seriesCol` value, x ordered by `xCol`'s sort order,
    * both axes annotated with their extrema. Same bounded-collect
    * contract as the HTML table. */
  def lineChartSvg(df: DataFrame, xCol: String, seriesCol: String,
      valueCol: String, title: String, maxPoints: Int = 5000,
      width: Int = 960, height: Int = 420): String = {
    val rows = df.select(xCol, seriesCol, valueCol)
      .limit(maxPoints + 1).collect()
    require(rows.length <= maxPoints,
      s"chart exceeds $maxPoints points — aggregate further before plotting")
    val data = rows.map(r => (String.valueOf(r.get(0)),
      String.valueOf(r.get(1)),
      Option(r.get(2)).map(v => v.toString.toDouble).getOrElse(0.0)))
    val xs = data.map(_._1).distinct.sorted
    val xIdx = xs.zipWithIndex.toMap
    val series = data.map(_._2).distinct.sorted
    val palette = Seq("steelblue", "darkorange", "seagreen", "crimson",
      "mediumpurple", "goldenrod", "teal", "deeppink")
    val (mTop, mBottom, mLeft, mRight) = (40, 70, 70, 120)
    val (plotW, plotH) = (width - mLeft - mRight, height - mTop - mBottom)
    val maxV = math.max(data.map(_._3).foldLeft(0.0)(math.max), 1e-12)
    def px(x: String): Double =
      mLeft + (if (xs.length <= 1) plotW / 2.0
               else xIdx(x).toDouble / (xs.length - 1) * plotW)
    def py(v: Double): Double = mTop + plotH - v / maxV * plotH
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="$height">"""
    sb ++= s"""<text x="${width / 2}" y="20" text-anchor="middle" font-size="16">${escape(title)}</text>"""
    sb ++= s"""<line x1="$mLeft" y1="$mTop" x2="$mLeft" y2="${mTop + plotH}" stroke="black"/>"""
    sb ++= s"""<line x1="$mLeft" y1="${mTop + plotH}" x2="${mLeft + plotW}" y2="${mTop + plotH}" stroke="black"/>"""
    sb ++= s"""<text x="${mLeft - 6}" y="${mTop + 4}" text-anchor="end" font-size="11">$maxV</text>"""
    sb ++= s"""<text x="${mLeft - 6}" y="${mTop + plotH + 4}" text-anchor="end" font-size="11">0</text>"""
    xs.headOption.foreach(x0 => sb ++= s"""<text x="$mLeft" y="${mTop + plotH + 16}" text-anchor="start" font-size="10">${escape(x0)}</text>""")
    if (xs.length > 1) sb ++= s"""<text x="${mLeft + plotW}" y="${mTop + plotH + 16}" text-anchor="end" font-size="10">${escape(xs.last)}</text>"""
    series.zipWithIndex.foreach { case (s, si) =>
      val color = palette(si % palette.length)
      val pts = data.filter(_._2 == s).sortBy(d => xIdx(d._1))
        .map(d => f"${px(d._1)}%.1f,${py(d._3)}%.1f").mkString(" ")
      sb ++= s"""<polyline points="$pts" fill="none" stroke="$color" stroke-width="1.5"><title>${escape(s)}</title></polyline>"""
      sb ++= s"""<text x="${mLeft + plotW + 8}" y="${mTop + 14 + si * 16}" font-size="11" fill="$color">${escape(s)}</text>"""
    }
    sb ++= "</svg>"
    sb.toString
  }

  /** Write the SVG line chart (EOS-www pattern). */
  def writeLineChart(df: DataFrame, xCol: String, seriesCol: String,
      valueCol: String, title: String, outFile: String,
      maxPoints: Int = 5000): Unit = {
    val p = JPaths.get(outFile)
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.write(p,
      lineChartSvg(df, xCol, seriesCol, valueCol, title, maxPoints)
        .getBytes(StandardCharsets.UTF_8))
  }

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
}
