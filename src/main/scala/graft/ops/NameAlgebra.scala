package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dataset / site / DN name algebra (SURVEY.md §1.4, §2.9, §2.11).
  *
  * All pure-Catalyst replacements for the reference's Python UDFs, so they
  * stay inside whole-stage codegen:
  *  - dataset `/primds/procds/tier` splitting (spark_utils.py:727-733)
  *  - campaign token (reports/aggregate_campaigns.py:137)
  *  - site `T2_US_FNAL` → tier/country/lab (data_aggregation.py:374-397)
  *  - `clean_site_name` keep-first-3-tokens (data_aggregation.py:374-386)
  *  - X.509 `parse_dn` / `dn2uuid` (data_aggregation.py:389-420)
  */
object NameAlgebra {

  /** `/primds/procds/tier` → primds (token 1; token 0 is empty).
    * Part extraction uses null-safe `get`: under ANSI mode (Spark 4
    * default) `getItem` THROWS on a name with missing components, and
    * real dumps contain malformed names ("UNKNOWN", bare strings) —
    * a dirty row must yield NULL, not kill the job. DuckDB list
    * indexing already returns NULL out-of-bounds, so this is also the
    * oracle's semantics. */
  def primaryDataset(dataset: Column): Column = get(split(dataset, "/"), lit(1))

  def processedDataset(dataset: Column): Column =
    get(split(dataset, "/"), lit(2))

  def dataTier(dataset: Column): Column = get(split(dataset, "/"), lit(3))

  /** campaign = `dataset.split('/')[2]` per the reference. */
  def campaign(dataset: Column): Column = processedDataset(dataset)

  /** Block name `dataset#uuid` → dataset part. */
  def blockDataset(block: Column): Column =
    substring_index(block, "#", 1)

  /** Site tier: first `_` token (`T2` of `T2_US_FNAL`). */
  def siteTier(site: Column): Column = split(site, "_").getItem(0)

  def siteCountry(site: Column): Column = get(split(site, "_"), lit(1))

  /** `clean_site_name`: keep at most the first three `_`-separated parts. */
  def cleanSiteName(site: Column): Column =
    concat_ws("_", slice(split(site, "_"), 1, 3))

  /** Tape/buffer endpoint filter (phedex.py:38-42). */
  def isTapeEndpoint(site: Column): Column =
    site.endsWith("_MSS") || site.endsWith("_Buffer") ||
      site.endsWith("_Export")

  /** `parse_dn`: last `/CN=` segment of an X.509 DN that contains a letter
    * (skipping purely numeric CNs), as a Catalyst expression chain.
    * A name with no such segment passes through unchanged — the
    * reference's "return it as is" fallback (data_aggregation
    * .py:389-398), which also covers plain usernames (GridName). */
  def parseDn(dn: Column): Column = {
    val cns = filter(split(dn, "/"),
      s => s.startsWith("CN=") && s.rlike("[A-Za-z]"))
    when(size(cns) > 0, regexp_replace(element_at(cns, -1), "^CN=", ""))
      .otherwise(dn)
  }

  /** `dn2uuid`: `BigInt(sha1(parse_dn(dn)), 16) mod 10^16` — needs
    * BigInt (the value exceeds Long before the mod), implemented as the
    * native codegen expression `graft.functions.Sha1Mod1e16`,
    * registered as SQL function `dn_uuid` (GraftExtensions /
    * Sessions.ensureQueryConfs). Exact parity with the reference. */
  def dnToUuid(dn: Column): Column = call_function("dn_uuid", parseDn(dn))
}
