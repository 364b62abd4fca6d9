package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query
  * over the same parquet tables. Column aliases MUST match between the
  * two — the verification harness compares name-sorted columns.
  *
  * Oracle-parity rules used throughout:
  *  - double SUM/AVG → exact DECIMAL sums cast back to DOUBLE
  *    (order-independent, engine-neutral dtype);
  *  - DuckDB conditional counts use `count(*) FILTER (...)` (BIGINT) to
  *    match Spark's `sum(when(...))` LongType — plain `sum(int)` in DuckDB
  *    is a HUGEINT and would not dtype-match;
  *  - dates/timestamps that could surface as different pandas dtypes are
  *    formatted to strings;
  *  - every ranking has a total tie-break order.
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)
