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

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
}
