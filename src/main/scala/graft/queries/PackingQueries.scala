package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables
import graft.llmops.Packing

/** Training-sequence packing audits (llmops/Packing): how a curated
  * corpus turns into fixed-length context windows. Both policies run
  * per deterministic shard (hash order), so the oracle replays the
  * identical layout: q250 is pure window arithmetic, q251 replays
  * the greedy fold with the same bit-packed integer state via
  * DuckDB's `list_reduce` — no doubles inside either recurrence.
  */
object PackingQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.loadSpread(s, d, n)

  /** Shared CTE: per-doc token counts with shard + sort key (the
    * Sharding.assignShards layout: hash60(id) mod N, order by (hash,
    * id)). */
  private def dkSharded(nShards: Int): String =
    s"""d AS (SELECT doc_id,
      |             ('0x'||substr(md5(doc_id::VARCHAR),1,15))::BIGINT
      |               AS sk,
      |             len(string_split(text,' '))::BIGINT AS nt
      |      FROM documents),
      |s AS (SELECT doc_id, sk, nt, (sk % $nShards)::INT AS shard
      |      FROM d)""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // Concat-and-chunk packing audit (GPT-3 recipe): per shard, the
    // number of 512-token windows the concatenated stream cuts into,
    // the documents straddling a window boundary, and the final
    // partial-window padding. The oracle's running offset is the
    // same shard-partitioned window sum.
    QueryDef(
      "q250_pack_concat_chunk",
      Some(s"""
        WITH ${dkSharded(16)},
        o AS (SELECT shard, doc_id, nt,
                COALESCE(sum(nt) OVER (PARTITION BY shard
                  ORDER BY sk, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0)::BIGINT AS st
              FROM s),
        b AS (SELECT shard, nt,
                (CASE WHEN nt > 0 AND
                   (st + nt - 1) // 512 > st // 512
                 THEN 1 ELSE 0 END) AS crosses
              FROM o),
        g AS (SELECT shard, count(*) AS n_docs,
                sum(nt)::BIGINT AS n_tokens,
                sum(crosses)::BIGINT AS n_crossing
              FROM b GROUP BY 1)
        SELECT shard, n_docs, n_tokens,
               (n_tokens + 511) // 512 AS n_windows,
               n_crossing,
               CAST(n_crossing AS DOUBLE) / CAST(n_docs AS DOUBLE)
                 AS cross_frac,
               ((n_tokens + 511) // 512) * 512 - n_tokens
                 AS pad_tokens,
               CAST(((n_tokens + 511) // 512) * 512 - n_tokens
                    AS DOUBLE)
                 / CAST(((n_tokens + 511) // 512) * 512 AS DOUBLE)
                 AS pad_frac
        FROM g"""),
      (s, d) => Packing.concatChunkStats(
        t(s, d, "documents"), "doc_id", "text",
        ctx = 512, nShards = 16)),

    // Greedy no-split packing audit: each document (truncated at 512)
    // goes whole into the current window or opens a new one. The
    // sequential fold runs once per shard over the bit-packed
    // `bins<<30|fill` BIGINT state — DuckDB's list_reduce replays the
    // identical integer recurrence, so window counts hash-match
    // exactly.
    QueryDef(
      "q251_pack_greedy",
      Some(s"""
        WITH ${dkSharded(16)},
        l AS (SELECT shard, count(*) AS n_docs,
                sum(nt)::BIGINT AS n_tokens,
                count(*) FILTER (WHERE nt > 512) AS n_truncated,
                sum(least(nt, 512))::BIGINT AS packed_tokens,
                list_reduce(
                  list_prepend(512::BIGINT,
                    list(least(nt, 512)::BIGINT ORDER BY sk, doc_id)),
                  (a, x) -> CASE
                    WHEN (a & 1073741823) + x <= 512 THEN a + x
                    ELSE ((a >> 30) + 1) * 1073741824 + x END)
                  AS st
              FROM s GROUP BY 1)
        SELECT shard, n_docs, n_tokens, n_truncated, packed_tokens,
               (st >> 30) AS n_windows,
               (packed_tokens + 511) // 512 AS windows_lower_bound,
               (st >> 30) * 512 - packed_tokens AS pad_tokens,
               CAST((st >> 30) * 512 - packed_tokens AS DOUBLE)
                 / CAST((st >> 30) * 512 AS DOUBLE) AS pad_frac
        FROM l"""),
      (s, d) => Packing.greedyPackStats(
        t(s, d, "documents"), "doc_id", "text",
        ctx = 512, nShards = 16)))
}
