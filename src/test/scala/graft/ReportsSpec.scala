package graft

import java.nio.file.{Files, Paths => JPaths}

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Reports

/** Reporting tail: HTML rendering of small aggregates with a hard
  * row cap (no silent driver-side collects of big relations). */
class ReportsSpec extends AnyFunSuite {

  lazy val spark = graft.core.Sessions.local(4, "graft-report-test")

  test("htmlTable renders and escapes; writeHtml persists") {
    import spark.implicits._
    val df = Seq(("<b>tier</b>", 42L), ("RAW", 7L)).toDF("name", "n")
    val html = Reports.htmlTable(df, "Tiers & sizes")
    assert(html.contains("&lt;b&gt;tier&lt;/b&gt;"))
    assert(html.contains("Tiers &amp; sizes"))
    assert(html.contains("<th>name</th>"))
    val out = Files.createTempDirectory("graft-rep").toString + "/r.html"
    Reports.writeHtml(df, "t", out)
    assert(Files.readString(JPaths.get(out)).contains("<table"))
  }

  test("htmlTable refuses oversized results") {
    import spark.implicits._
    val big = spark.range(100).toDF("x")
    val e = intercept[IllegalArgumentException] {
      Reports.htmlTable(big, "too big", maxRows = 10)
    }
    assert(e.getMessage.contains("aggregate further"))
  }

  test("barChartSvg renders scaled bars, labels, and persists") {
    import spark.implicits._
    val df = Seq(("2024-01", 10.0), ("2024-02", 5.0), ("<x>", 0.0))
      .toDF("period", "hs06")
    val svg = Reports.barChartSvg(df, "period", "hs06", "HS06 kdays")
    assert(svg.startsWith("<svg") && svg.endsWith("</svg>"))
    assert(svg.contains("HS06 kdays"))
    assert(svg.contains("&lt;x&gt;")) // label escaping
    // the max bar spans the full plot height (420 - 40 top - 70 bottom)
    assert(svg.contains("height=\"310.0\""))
    val out = Files.createTempDirectory("graft-rep").toString + "/c.svg"
    Reports.writeBarChart(df, "period", "hs06", "t", out)
    assert(Files.readString(JPaths.get(out)).contains("<rect"))
  }

  test("barChartSvg refuses oversized results") {
    import spark.implicits._
    val big = spark.range(50).selectExpr("cast(id as string) l",
      "cast(id as double) v")
    val e = intercept[IllegalArgumentException] {
      Reports.barChartSvg(big, "l", "v", "big", maxBars = 10)
    }
    assert(e.getMessage.contains("aggregate further"))
  }

  test("lineChartSvg: one polyline per series, scaled points, legend, " +
      "persistence, and the row cap") {
    import spark.implicits._
    val df = Seq(
      ("2024-01-01", "cores", 0.0), ("2024-01-02", "cores", 10.0),
      ("2024-01-03", "cores", 5.0),
      ("2024-01-01", "corehr", 2.0), ("2024-01-03", "corehr", 10.0))
      .toDF("day", "metric", "v")
    val svg = Reports.lineChartSvg(df, "day", "metric", "v", "HPC usage")
    assert(svg.startsWith("<svg") && svg.endsWith("</svg>"))
    assert(svg.contains("HPC usage"))
    // two series → two polylines, legend carries both names
    assert("<polyline".r.findAllIn(svg).length == 2)
    assert(svg.contains(">cores</text>") && svg.contains(">corehr</text>"))
    // max value (10.0) maps to the plot top: y = mTop = 40
    assert(svg.contains(",40.0"))
    // zero maps to the axis line: y = 40 + 310 = 350
    assert(svg.contains(",350.0"))
    val out = Files.createTempDirectory("graft-rep").toString + "/l.svg"
    Reports.writeLineChart(df, "day", "metric", "v", "t", out)
    assert(Files.readString(JPaths.get(out)).contains("<polyline"))
    val e = intercept[IllegalArgumentException] {
      Reports.lineChartSvg(df, "day", "metric", "v", "t", maxPoints = 2)
    }
    assert(e.getMessage.contains("aggregate further"))
  }
}
