package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llmops.{DedupClusters, Multimodal, Similarity, TextOps}
import graft.core.Checkpoints.BarrierOps

/** Training-data-pipeline operator family (SURVEY.md §7.1 `llmops`):
  * deduplication (exact, n-gram Jaccard, MinHash+LSH, SimHash,
  * embedding near-dup), similarity search (brute-force / IVF / LSH
  * top-k), text analysis (lang-ID, quality, token counting,
  * fingerprinting) and multimodal binary-column plumbing.
  *
  * Every query is oracle-verifiable because the only primitives are
  * md5-derived 60-bit hashes and sequential-fold double dot products —
  * both bit-reproducible in DuckDB (see TextOps/Similarity scaladoc).
  */
object LlmQueries {

  /** All llmops inputs go through loadSpread: their map stages are
    * compute-heavy (md5 shingles, 64-dim folds), so they must not
    * serialize on a single small-file split. */
  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.loadSpread(s, d, n)

  /** DuckDB fragment: 60-bit md5 hash of expression `e` (TextOps.hash60). */
  private def dkHash60(e: String): String =
    s"('0x'||substr(md5($e),1,15))::BIGINT"

  /** DuckDB fragment: sequential-fold double dot product of two lists. */
  private def dkDot(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), " +
      s"s -> CAST(s[1] AS DOUBLE)*CAST(s[2] AS DOUBLE)), (x,y) -> x+y)"

  /** DuckDB fragment: unrounded cosine over precomputed norm2 columns
    * (IEEE ops on identical operands — bit-exact, no tie risk); the
    * zero-norm guard mirrors Similarity.cosineWithNorms so both
    * engines agree on degenerate vectors too. */
  private def dkCos(dot: String, na: String, nb: String): String =
    s"(CASE WHEN $na = 0 OR $nb = 0 THEN 0.0 " +
      s"ELSE $dot / (sqrt($na)*sqrt($nb)) END)"

  /** DuckDB CTEs: distinct 3-word shingles per doc (parity with
    * TextOps.shingles: Spark sequence(1,n-2) == DuckDB range(1,n-1)).
    * Parameterized over the source relation so the LSH chain can run
    * over the exact-deduped corpus (dkLshCand) while q41/q42/q126
    * keep the raw one. */
  private def dkShinglesFrom(src: String): String =
    s"""t AS (SELECT doc_id, string_split(text,' ') toks FROM $src),
       |sarr AS (SELECT doc_id,
       |        CASE WHEN len(toks) >= 3
       |             THEN list_transform(range(1, len(toks)-1),
       |                    i -> array_to_string(toks[i:i+2], ' '))
       |             ELSE []::VARCHAR[] END AS shs
       |      FROM t),
       |s AS (SELECT doc_id, unnest(list_distinct(shs)) AS sh FROM sarr)""".stripMargin

  private val dkShingles = dkShinglesFrom("documents")

  private def dkMinhashSigsFrom(src: String): String = {
    val perms = TextOps.MinHashPerms
    val p = TextOps.MinHashP
    val slots = perms.zipWithIndex.map { case ((a, b), i) =>
      s"min(($a*xm+$b)%$p) AS sig_$i"
    }.mkString(", ")
    s"""${dkShinglesFrom(src)},
       |x AS (SELECT doc_id, ${dkHash60("sh")} % $p AS xm FROM s),
       |sigs AS (SELECT doc_id, $slots FROM x GROUP BY doc_id)""".stripMargin
  }

  private val dkMinhashSigs = dkMinhashSigsFrom("documents")

  /** DuckDB CTEs: LSH candidate pairs with the SAME per-bucket cap as
    * `TextOps.lshCandidatePairs` (all (i<j) pairs among the first
    * `DefaultMaxBucket` docs in doc-id order; every overflow doc emits
    * one "star" pair to the bucket minimum) — mirrored, like q41's df
    * cap, so both engines agree at any scale. At the test scale
    * factors no bucket approaches the cap, so it is semantically inert
    * there; the mirror matters the day one does. */
  private val dkLshCand = {
    val mb = TextOps.DefaultMaxBucket
    // exact-dedup-first (TextOps.exactDedupFirst): the LSH chain runs
    // over the min-id keeper per byte-identical fingerprint, mirrored
    // here so both engines collapse duplicate mass before banding
    s"""dd AS (SELECT min(doc_id) AS doc_id FROM documents
       |         GROUP BY md5(text)),
       |ddocs AS (SELECT d.* FROM documents d JOIN dd USING (doc_id)),
       |${dkMinhashSigsFrom("ddocs")},
       |banded AS (
       |  SELECT doc_id AS doc, j AS band,
       |         CASE j WHEN 0 THEN sig_0 WHEN 1 THEN sig_1
       |                WHEN 2 THEN sig_2 ELSE sig_3 END AS bucket
       |  FROM sigs CROSS JOIN range(0,4) r(j)),
       |rk AS (
       |  SELECT doc, band, bucket,
       |         row_number() OVER (PARTITION BY band, bucket
       |                            ORDER BY doc) AS rn,
       |         min(doc) OVER (PARTITION BY band, bucket) AS mn
       |  FROM banded),
       |cand AS (
       |  SELECT DISTINCT doc_a, doc_b FROM (
       |    SELECT a.doc AS doc_a, b.doc AS doc_b
       |    FROM rk a JOIN rk b
       |      ON a.band = b.band AND a.bucket = b.bucket
       |     AND a.rn < b.rn AND b.rn <= $mb
       |    UNION ALL
       |    SELECT mn AS doc_a, doc AS doc_b FROM rk WHERE rn > $mb))""".stripMargin
  }

  /** DuckDB fragment: 8-bit sign-random-projection LSH bucket of list
    * column `v` (parity with Similarity.lshBucket, dim=64, nBits=8). */
  private def dkLshBucket(v: String): String =
    (0 until 8).map { j =>
      val plane = s"list_transform(range(0,64), " +
        s"i -> CAST((${17 * (j + 1)}*(i+3)+7)%19 - 9 AS DOUBLE))"
      s"(CASE WHEN ${dkDot(v, plane)} > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** DuckDB CTEs replaying [[Multimodal.syntheticVideos]] +
    * [[Multimodal.frameFingerprints]]: the synthetic frame-pool
    * formula → per-frame content fingerprints (hash60 of the frame
    * bytes' hex — exact because the frame bytes are ASCII of the
    * formula, so both engines hash identical strings). Ends in
    * `d(doc_id, frame_fp)` distinct. Shared by q269 and q270. */
  private val dkVideoFrames: String = s"""
    f AS (SELECT doc_id, CAST(j AS BIGINT) AS j,
                 (doc_id % 96) * 16 + (doc_id % 5) + j AS fid
          FROM documents, range(0, 8) r(j)),
    d AS (SELECT DISTINCT doc_id,
                 ${dkHash60("hex(encode(printf('fr:%013d', fid)))")}
                   AS frame_fp
          FROM f)"""

  /** DuckDB CTE chain replaying [[Multimodal.videoLshNearDupPairs]]
    * over the `d(doc_id, frame_fp)` relation from [[dkVideoFrames]]:
    * frame-SET fingerprint dedup (`sfp`/`kmap` — exposed for q271's
    * expansion), set-MinHash signatures, the capped (band, bucket)
    * candidate engine, and the exact containment verify at ≥ 0.75.
    * Ends in `vp(doc_a, doc_b, shared, containment)`. Shared by q270
    * (the pair list) and q271 (components + keep-list over it). */
  private val dkVideoLshPairs: String = {
    val mb = TextOps.DefaultMaxBucket
    val p = TextOps.MinHashP
    val slots = TextOps.MinHashPerms.zipWithIndex.map {
      case ((a, b), i) => s"min(($a*xm+$b)%$p) AS sig_$i"
    }.mkString(", ")
    s"""sfp AS (SELECT doc_id,
                   ${dkHash60(
      "string_agg(CAST(frame_fp AS VARCHAR), ':' " +
        "ORDER BY frame_fp)")} AS set_fp
            FROM d GROUP BY 1),
    kmap AS (SELECT set_fp, min(doc_id) AS rep FROM sfp GROUP BY 1),
    dd AS (SELECT d.* FROM d JOIN kmap ON kmap.rep = d.doc_id),
    x AS (SELECT doc_id, frame_fp % $p AS xm FROM dd),
    sigs AS (SELECT doc_id, $slots FROM x GROUP BY doc_id),
    banded AS (
      SELECT doc_id AS doc, j AS band,
             CASE j WHEN 0 THEN sig_0 WHEN 1 THEN sig_1
                    WHEN 2 THEN sig_2 ELSE sig_3 END AS bucket
      FROM sigs CROSS JOIN range(0,4) r(j)),
    rk AS (
      SELECT doc, band, bucket,
             row_number() OVER (PARTITION BY band, bucket
                                ORDER BY doc) AS rn,
             min(doc) OVER (PARTITION BY band, bucket) AS mn
      FROM banded),
    cand AS (
      SELECT DISTINCT doc_a, doc_b FROM (
        SELECT a.doc AS doc_a, b.doc AS doc_b
        FROM rk a JOIN rk b
          ON a.band = b.band AND a.bucket = b.bucket
         AND a.rn < b.rn AND b.rn <= $mb
        UNION ALL
        SELECT mn AS doc_a, doc AS doc_b FROM rk WHERE rn > $mb)),
    n AS (SELECT doc_id, count(*) AS nf FROM dd GROUP BY 1),
    c AS (SELECT cand.doc_a, cand.doc_b, count(*) AS shared
          FROM cand
          JOIN dd a ON a.doc_id = cand.doc_a
          JOIN dd b ON b.doc_id = cand.doc_b
           AND b.frame_fp = a.frame_fp
          GROUP BY 1, 2),
    vp AS (SELECT c.doc_a, c.doc_b, c.shared,
                  CAST(c.shared AS DOUBLE)/least(na.nf, nb.nf)
                    AS containment
           FROM c
           JOIN n na ON na.doc_id = c.doc_a
           JOIN n nb ON nb.doc_id = c.doc_b
           WHERE CAST(c.shared AS DOUBLE)/least(na.nf, nb.nf)
             >= 0.75)"""
  }

  /** DuckDB CTE chain replaying [[Multimodal.hammingNearDupPairs]]:
    * 4×16-bit banding of a 64-bit hash relation `hashRel(doc_id,
    * hashCol)` → capped buckets with star-pair fallback (the q70/q77
    * pigeonhole machinery) → exact bit_count verify at ≤ maxHam.
    * Ends in `ip(doc_a, doc_b, hamming)`. Shared by the image (q263/
    * q267) and audio (q268) near-dup oracles. */
  private def dkHammingChain(hashRel: String, hashCol: String,
      maxHam: Int): String = s"""
    banded AS (SELECT doc_id AS doc, j AS band,
                      ($hashCol >> CAST(16 * j AS INT)) & 65535
                        AS bucket
               FROM $hashRel CROSS JOIN range(0, 4) rj(j)),
    rk AS (SELECT doc, band, bucket,
                  row_number() OVER (PARTITION BY band, bucket
                                     ORDER BY doc) AS rn,
                  min(doc) OVER (PARTITION BY band, bucket) AS mn
           FROM banded),
    cand AS (SELECT DISTINCT doc_a, doc_b FROM (
               SELECT a.doc AS doc_a, b.doc AS doc_b
               FROM rk a JOIN rk b
                 ON a.band = b.band AND a.bucket = b.bucket
                AND a.rn < b.rn
                AND b.rn <= ${TextOps.DefaultMaxBucket}
               UNION ALL
               SELECT mn AS doc_a, doc AS doc_b FROM rk
               WHERE rn > ${TextOps.DefaultMaxBucket})),
    ip AS (SELECT c.doc_a, c.doc_b,
                  CAST(bit_count(xor(ha.$hashCol, hb.$hashCol)) AS INT)
                    AS hamming
           FROM cand c
           JOIN $hashRel ha ON ha.doc_id = c.doc_a
           JOIN $hashRel hb ON hb.doc_id = c.doc_b
           WHERE bit_count(xor(ha.$hashCol, hb.$hashCol)) <= $maxHam)"""

  /** DuckDB CTE chain replaying the q263 image dHash kernel:
    * synthetic pixel grids → 9×8 pooled luma cells → 64-bit dHash.
    * Ends in `dh(doc_id, dhash)`. Valid as an oracle because both
    * containers are lossless so decode(encode(p)) ≡ p; the decode
    * path itself is pinned by MultimodalSpec. */
  private val dkImgDhash: String = s"""
    px AS (SELECT doc_id, doc_id % 32 AS g,
                  (doc_id // 32) % 72 AS v,
                  (doc_id % 5) * 8 AS br,
                  CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y
           FROM documents, range(0, 36) rx(x),
                range(0, 32) ry(y)),
    pv AS (SELECT doc_id, (y * 8) // 32 AS r, (x * 9) // 36 AS c,
                  ((g + 3) * x + (2 * g + 5) * y
                    + ((x * y * (g + 1)) % 31)) % 150
                  + br
                  + (CASE WHEN x // 4 = v % 9
                          AND y // 4 = (v // 9) % 8
                          THEN 60 ELSE 0 END) AS p
           FROM px),
    cells AS (SELECT doc_id, r, c, CAST(sum(p) AS BIGINT) AS s,
                     CAST(count(*) AS BIGINT) AS n
              FROM pv GROUP BY 1, 2, 3),
    bits AS (SELECT a.doc_id, a.r, a.c,
                    CASE WHEN b.s * a.n > a.s * b.n
                         THEN 1 ELSE 0 END AS bit
             FROM cells a JOIN cells b
               ON a.doc_id = b.doc_id AND a.r = b.r
              AND b.c = a.c + 1
             WHERE a.c <= 7),
    dh0 AS (SELECT doc_id,
                   sum(CAST(bit AS HUGEINT)
                     * (CAST(1 AS HUGEINT)
                        << CAST(r * 8 + c AS INT))) AS hsum
            FROM bits GROUP BY 1),
    dh AS (SELECT doc_id,
                  CAST(CASE WHEN hsum >= CAST(1 AS HUGEINT) << 63
                            THEN hsum
                              - ((CAST(1 AS HUGEINT) << 63) * 2)
                            ELSE hsum END AS BIGINT) AS dhash
           FROM dh0)"""

  /** [[dkImgDhash]] + the banded pair chain over ALL docs — q263's
    * full oracle, ending in `ip(doc_a, doc_b, hamming)`. */
  private val dkImgDhashPairs: String =
    s"""$dkImgDhash,
    ${dkHammingChain("dh", "dhash", 4)}"""

  /** DuckDB CTE chain replaying
    * [[Multimodal.pairedCaptionNearDupPairs]] over q41's caption rail
    * and q263's dHash kernel: df-capped shingle inverted index →
    * caption pairs at jac ≥ 0.2 → dHash verify at Hamming ≤ 4.
    * Ends in `pp(doc_a, doc_b, jac, hamming)`. Shared by q274 (the
    * pair list) and q275 (the keep-list over it). */
  private val dkPairedCaptionPairs: String = s"""
    $dkShingles,
    psh AS (SELECT doc_id, len(shsd) AS nsh, unnest(shsd) AS sh
            FROM (SELECT doc_id, list_distinct(
                    list_transform(shs, g -> ${dkHash60("g")})) shsd
                  FROM sarr)),
    pkept AS (SELECT sh FROM psh GROUP BY sh
              HAVING count(*) <= 1000),
    pc AS (SELECT a.doc_id da, b.doc_id db, a.nsh na, b.nsh nb,
                  count(*) common
           FROM psh a JOIN psh b
             ON a.sh = b.sh AND a.doc_id < b.doc_id
           JOIN pkept k ON a.sh = k.sh
           GROUP BY 1, 2, 3, 4),
    tp AS (SELECT da AS doc_a, db AS doc_b,
                  CAST(common AS DOUBLE)/(na+nb-common) AS jac
           FROM pc
           WHERE CAST(common AS DOUBLE)/(na+nb-common) >= 0.2),
    $dkImgDhash,
    pp AS (SELECT tp.doc_a, tp.doc_b, tp.jac,
                  CAST(bit_count(xor(ha.dhash, hb.dhash)) AS INT)
                    AS hamming
           FROM tp JOIN dh ha ON ha.doc_id = tp.doc_a
                   JOIN dh hb ON hb.doc_id = tp.doc_b
           WHERE bit_count(xor(ha.dhash, hb.dhash)) <= 4)"""

  /** Spark side of the q274 chain, shared with q275's keep-list:
    * caption pairs propose, dHash verifies; the decode runs only for
    * pair PARTICIPANTS. The pairs barrier covers its triple
    * consumption (participants + both hash joins read it). */
  private def pairedCaptionPairs(s: SparkSession, d: String)
      : DataFrame = {
    val docs = t(s, d, "documents")
    val pairs = TextOps.ngramJaccardPairs(docs, "doc_id", "text",
      minJac = 0.2, maxDf = 1000).barrier()
    val participants = pairs
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct()
    val hashes = Multimodal.imageDHash(Multimodal.syntheticImages(
        docs.join(participants, Seq("doc_id"), "left_semi"))).toDF()
      .barrier() // joined onto both pair sides
    Multimodal.pairedCaptionNearDupPairs(pairs, hashes, maxHamming = 4)
  }

  /** DuckDB CTE chain replaying [[TextOps.minhashContainment]]:
    * the q43 dedup-first LSH candidate engine (`dkLshCand`), the q71
    * slot-agreement Jaccard estimate, per-doc distinct-shingle sets,
    * and the exact candidate-restricted intersection. Ends in
    * `j(doc_a, doc_b, jaccard_est, na, nb, common)`. Shared by q278
    * (the calibration view) and q279 (the drop rule over it). */
  private val dkContainmentPairs: String = s"""
    $dkLshCand,
    est AS (SELECT c.doc_a, c.doc_b,
             CAST((CASE WHEN sa.sig_0 = sb.sig_0 THEN 1 ELSE 0 END +
                   CASE WHEN sa.sig_1 = sb.sig_1 THEN 1 ELSE 0 END +
                   CASE WHEN sa.sig_2 = sb.sig_2 THEN 1 ELSE 0 END +
                   CASE WHEN sa.sig_3 = sb.sig_3 THEN 1 ELSE 0 END)
               AS DOUBLE) / 4.0 AS jaccard_est
            FROM cand c
            JOIN sigs sa ON sa.doc_id = c.doc_a
            JOIN sigs sb ON sb.doc_id = c.doc_b),
    sz AS (SELECT doc_id,
             list_distinct(list_transform(shs,
               g -> ${dkHash60("g")})) AS arr
           FROM sarr WHERE len(shs) >= 1),
    j AS (SELECT e.doc_a, e.doc_b, e.jaccard_est,
            CAST(len(a.arr) AS BIGINT) AS na,
            CAST(len(b.arr) AS BIGINT) AS nb,
            CAST(len(list_intersect(a.arr, b.arr)) AS BIGINT)
              AS common
          FROM est e
          JOIN sz a ON a.doc_id = e.doc_a
          JOIN sz b ON b.doc_id = e.doc_b)"""

  /** Spark side of the q263 chain: decode → dHash → Hamming-banded
    * verified pairs. Shared by q263 and q267. */
  private def imgDhashPairs(s: SparkSession, d: String): DataFrame = {
    val hashes = Multimodal.imageDHash(
      Multimodal.syntheticImages(t(s, d, "documents"))).toDF()
      .barrier()
    Multimodal.hammingNearDupPairs(hashes, "doc_id", "dhash",
      maxHamming = 4)
  }

  val defs: Seq[QueryDef] = Seq(

    // Exact dedup via content fingerprint: groups of byte-identical docs.
    QueryDef(
      "q40_dedup_exact_docs",
      Some("""
        SELECT md5(text) AS fp, count(*) AS n_docs, min(doc_id) AS keeper
        FROM documents GROUP BY 1"""),
      (s, d) =>
        t(s, d, "documents")
          .groupBy(md5(col("text")).as("fp"))
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))),

    // Exact n-gram (3-shingle) Jaccard near-dup pairs ≥ 0.2 via a
    // shingle inverted index with a document-frequency cap of 1000
    // (TextOps.ngramJaccardPairs scaladoc: hot-shingle guard against
    // quadratic pair explosions at corpus scale; the oracle applies the
    // SAME cap, so both engines agree at any scale — at the test scale
    // factors max df is ~25, so the cap is semantically inert there).
    QueryDef(
      "q41_dedup_ngram_jaccard",
      Some(s"""
        WITH $dkShingles,
        sh AS (SELECT doc_id, len(shsd) AS nsh, unnest(shsd) AS sh
               FROM (SELECT doc_id, list_distinct(
                       list_transform(shs, g -> ${dkHash60("g")})) shsd
                     FROM sarr)),
        kept AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= 1000),
        c AS (SELECT a.doc_id da, b.doc_id db, a.nsh na, b.nsh nb,
                     count(*) common
              FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
              JOIN kept k ON a.sh = k.sh
              GROUP BY 1, 2, 3, 4)
        SELECT da AS doc_a, db AS doc_b,
               CAST(common AS DOUBLE)/(na+nb-common) AS jac
        FROM c WHERE CAST(common AS DOUBLE)/(na+nb-common) >= 0.2"""),
      (s, d) =>
        TextOps.ngramJaccardPairs(t(s, d, "documents"), "doc_id", "text",
          minJac = 0.2, maxDf = 1000)),

    // Prefix-filtered EXACT Jaccard join at the near-dup threshold
    // (0.8): only each doc's (df asc, hash) prefix enters the inverted
    // index — ~5× fewer index rows at t=0.8, zero false negatives —
    // then candidates verify by exact array intersection. Because the
    // algorithm is lossless, the oracle is the TRUE uncapped Jaccard
    // pair set: this query proves the prefix filter drops nothing.
    // Stopword shingles sort to the end of every doc and never enter
    // a prefix, so q41's hot-key cap is structurally unnecessary here.
    QueryDef(
      "q126_jaccard_prefix_join",
      Some(s"""
        WITH $dkShingles,
        sh AS (SELECT doc_id, len(shsd) AS nsh, unnest(shsd) AS sh
               FROM (SELECT doc_id, list_distinct(
                       list_transform(shs, g -> ${dkHash60("g")})) shsd
                     FROM sarr)),
        c AS (SELECT a.doc_id da, b.doc_id db, a.nsh na, b.nsh nb,
                     count(*) common
              FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2, 3, 4)
        SELECT da AS doc_a, db AS doc_b,
               CAST(common AS DOUBLE)/(na+nb-common) AS jac
        FROM c WHERE CAST(common AS DOUBLE)/(na+nb-common) >= 0.8"""),
      (s, d) =>
        TextOps.prefixJaccardJoin(t(s, d, "documents"), "doc_id",
          "text", minJac = 0.8)),

    // MinHash signatures (4 permutations over the Mersenne prime).
    QueryDef(
      "q42_dedup_minhash_sigs",
      Some(s"WITH $dkMinhashSigs SELECT * FROM sigs"),
      (s, d) =>
        TextOps.minhashSignatures(t(s, d, "documents"), "doc_id", "text")),

    // MinHash LSH banding: candidate pairs sharing any signature band.
    // Routes through exactDedupFirst — byte-identical mass collapses
    // to its q40 keeper BEFORE banding (structural precondition, not
    // prose; the oracle's dd/ddocs CTEs mirror it).
    QueryDef(
      "q43_dedup_minhash_lsh",
      Some(s"""
        WITH $dkLshCand
        SELECT doc_a, doc_b FROM cand"""),
      (s, d) =>
        TextOps.lshCandidatePairs(
          TextOps.minhashSignatures(
            TextOps.exactDedupFirst(t(s, d, "documents"), "doc_id",
              "text"), "doc_id", "text"),
          "doc_id")),

    // 16-bit SimHash per document.
    QueryDef(
      "q44_dedup_simhash",
      Some(s"""
        WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) tok
                     FROM documents),
        f AS (SELECT doc_id, tok, count(*) freq FROM tok GROUP BY 1, 2),
        h AS (SELECT doc_id, freq, ${dkHash60("tok")} AS hh FROM f),
        b AS (SELECT doc_id, j,
                     sum(CASE WHEN (hh >> CAST(j AS INT)) & 1 = 1
                              THEN freq ELSE -freq END) s
              FROM h CROSS JOIN range(0,16) r(j) GROUP BY 1, 2)
        SELECT doc_id,
               CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << CAST(j AS INT))
                             ELSE 0 END) AS BIGINT) AS simhash
        FROM b GROUP BY 1"""),
      (s, d) =>
        TextOps.simhash16(t(s, d, "documents"), "doc_id", "text")),

    // MinHash Jaccard estimate over the LSH candidates: fraction of
    // agreeing signature slots — sigs → candidates → estimate, the
    // full MinHash chain in one query.
    QueryDef(
      "q71_dedup_minhash_estimate",
      Some(s"""
        WITH $dkLshCand
        SELECT c.doc_a, c.doc_b,
               CAST((CASE WHEN sa.sig_0 = sb.sig_0 THEN 1 ELSE 0 END +
                     CASE WHEN sa.sig_1 = sb.sig_1 THEN 1 ELSE 0 END +
                     CASE WHEN sa.sig_2 = sb.sig_2 THEN 1 ELSE 0 END +
                     CASE WHEN sa.sig_3 = sb.sig_3 THEN 1 ELSE 0 END)
                 AS DOUBLE) / 4.0 AS jaccard_est
        FROM cand c
        JOIN sigs sa ON sa.doc_id = c.doc_a
        JOIN sigs sb ON sb.doc_id = c.doc_b"""),
      (s, d) => {
        // barrier: the dedup + signature pipeline feeds the banding
        // AND both sides of the estimate join — checkpoint once so
        // the chain isn't re-inlined per consumer
        val sigs = TextOps.minhashSignatures(
          TextOps.exactDedupFirst(t(s, d, "documents"), "doc_id",
            "text"), "doc_id", "text").barrier()
        TextOps.minhashJaccardEstimate(
          TextOps.lshCandidatePairs(sigs, "doc_id"), sigs, "doc_id")
      }),

    // MinHash CONTAINMENT estimates over the LSH candidates — the
    // asymmetric "A quoted inside B" direction Jaccard misses (a short
    // doc inside a long one has low J but containment ≈ 1): Ĉ(A⊆B) =
    // Ĵ·(na+nb)/((1+Ĵ)·na), recovered from the slot-agreement Ĵ plus
    // the exact per-doc set sizes every doc carries anyway. The exact
    // candidate-restricted intersection rides along as audit columns
    // (q224's est-vs-exact calibration shape); everything after the
    // capped banding is candidate-sized.
    QueryDef(
      "q278_minhash_containment",
      Some(s"""
        WITH $dkContainmentPairs
        SELECT doc_a, doc_b, jaccard_est, na, nb, common,
               (jaccard_est * CAST(na + nb AS DOUBLE))
                 / ((1.0 + jaccard_est) * CAST(na AS DOUBLE))
                 AS cont_a_in_b_est,
               (jaccard_est * CAST(na + nb AS DOUBLE))
                 / ((1.0 + jaccard_est) * CAST(nb AS DOUBLE))
                 AS cont_b_in_a_est,
               CAST(common AS DOUBLE) / CAST(na AS DOUBLE)
                 AS cont_a_in_b,
               CAST(common AS DOUBLE) / CAST(nb AS DOUBLE)
                 AS cont_b_in_a
        FROM j"""),
      (s, d) =>
        TextOps.minhashContainment(t(s, d, "documents"), "doc_id",
          "text")),

    // SimHash near-dup pairs: hamming ≤ 1 via 2-block banding
    // (pigeonhole) + exact bit_count filter — the dedup use of q44's
    // hashes.
    QueryDef(
      "q70_dedup_simhash_pairs",
      Some(s"""
        WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) tok
                     FROM documents),
        f AS (SELECT doc_id, tok, count(*) freq FROM tok GROUP BY 1, 2),
        h AS (SELECT doc_id, freq, ${dkHash60("tok")} AS hh FROM f),
        bsum AS (SELECT doc_id, j,
                     sum(CASE WHEN (hh >> CAST(j AS INT)) & 1 = 1
                              THEN freq ELSE -freq END) s
              FROM h CROSS JOIN range(0,16) r(j) GROUP BY 1, 2),
        s AS (SELECT doc_id,
               CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << CAST(j AS INT))
                             ELSE 0 END) AS BIGINT) AS simhash
              FROM bsum GROUP BY 1),
        bd AS (SELECT doc_id, simhash, j AS band,
                      CASE j WHEN 0 THEN simhash // 256
                             ELSE simhash % 256 END AS block
               FROM s CROSS JOIN range(0,2) r(j)),
        c AS (SELECT DISTINCT a.doc_id da, b2.doc_id db,
                     a.simhash sa, b2.simhash sb
              FROM bd a JOIN bd b2 ON a.band = b2.band
                AND a.block = b2.block AND a.doc_id < b2.doc_id)
        SELECT da AS doc_a, db AS doc_b,
               CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
        FROM c WHERE bit_count(xor(sa, sb)) <= 1"""),
      (s, d) =>
        TextOps.simhashNearDupPairs(t(s, d, "documents"), "doc_id",
          "text", maxHamming = 1)),

    // 60-bit SimHash near-dup pairs — the SCALE variant of q70: 2^31
    // (band, block) buckets instead of 512, so bucket population (and
    // the quadratic in-bucket expansion) stays near-dup-only at any
    // corpus size instead of growing linearly with it.
    QueryDef(
      "q77_dedup_simhash60_pairs",
      Some(s"""
        WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) tok
                     FROM documents),
        f AS (SELECT doc_id, tok, count(*) freq FROM tok GROUP BY 1, 2),
        h AS (SELECT doc_id, freq, ${dkHash60("tok")} AS hh FROM f),
        bsum AS (SELECT doc_id, j,
                     sum(CASE WHEN (hh >> CAST(j AS INT)) & 1 = 1
                              THEN freq ELSE -freq END) s
              FROM h CROSS JOIN range(0,60) r(j) GROUP BY 1, 2),
        s AS (SELECT doc_id,
               CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << CAST(j AS INT))
                             ELSE 0 END) AS BIGINT) AS simhash
              FROM bsum GROUP BY 1),
        bd AS (SELECT doc_id, simhash, j AS band,
                      CASE j WHEN 0 THEN simhash // 1073741824
                             ELSE simhash % 1073741824 END AS block
               FROM s CROSS JOIN range(0,2) r(j)),
        c AS (SELECT DISTINCT a.doc_id da, b2.doc_id db,
                     a.simhash sa, b2.simhash sb
              FROM bd a JOIN bd b2 ON a.band = b2.band
                AND a.block = b2.block AND a.doc_id < b2.doc_id)
        SELECT da AS doc_a, db AS doc_b,
               CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
        FROM c WHERE bit_count(xor(sa, sb)) <= 1"""),
      (s, d) =>
        TextOps.simhashNearDupPairs(t(s, d, "documents"), "doc_id",
          "text", maxHamming = 1, nBits = 60)),

    // Brute-force cosine top-5 for 8 query vectors over the corpus.
    QueryDef(
      "q45_sim_bruteforce_topk",
      Some(s"""
        WITH e AS (SELECT vec_id, embedding v,
                          ${dkDot("embedding", "embedding")} AS nn
                   FROM embeddings),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                 ${dkCos(dkDot("q.v", "c.v"), "q.nn", "c.nn")} AS cos_sim
          FROM e q JOIN e c ON q.vec_id <> c.vec_id
          WHERE q.vec_id < 8)
        SELECT query_id, cand_id, cos_sim, rk FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, cand_id) AS INT) AS rk FROM scored)
        WHERE rk <= 5"""),
      (s, d) => {
        val e = t(s, d, "embeddings")
        Similarity.bruteForceTopK(e.filter(col("vec_id") < 8), e,
          "vec_id", "embedding", 5)
      }),

    // MMR diversified top-5 (λ = 0.7, pool 20): greedy
    // λ·rel − (1−λ)·max-sim-to-selected over q45's relevance pool —
    // near-dup candidates can't fill the whole window. The oracle
    // unrolls all 5 greedy rounds; the interpolation constant is
    // (1.0 − 0.7) computed in DOUBLE in both engines, never a
    // pre-rounded 0.3 literal (they differ in the last ulp).
    QueryDef(
      "q240_mmr_topk",
      Some(s"""
        WITH e AS (SELECT vec_id, embedding v,
                          ${dkDot("embedding", "embedding")} AS nn
                   FROM embeddings),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                 ${dkCos(dkDot("q.v", "c.v"), "q.nn", "c.nn")} AS rel
          FROM e q JOIN e c ON q.vec_id <> c.vec_id
          WHERE q.vec_id < 8),
        pool AS (SELECT query_id, cand_id, rel FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY rel DESC, cand_id) AS rk FROM scored)
          WHERE rk <= 20),
        pa AS (SELECT p.query_id, p.cand_id AS a, e.v AS va,
                      e.nn AS na
               FROM pool p JOIN e ON e.vec_id = p.cand_id),
        sims AS (SELECT x.query_id, x.a, y.a AS b,
                   ${dkCos(dkDot("x.va", "y.va"), "x.na", "y.na")}
                     AS sim
                 FROM pa x JOIN pa y
                   ON x.query_id = y.query_id AND x.a <> y.a),
        sel1 AS (SELECT query_id, cand_id, 1 AS step,
                        CAST(0.7 AS DOUBLE) * rel AS mmr_score
                 FROM (SELECT *, row_number() OVER (
                         PARTITION BY query_id
                         ORDER BY rel DESC, cand_id) AS r1 FROM pool)
                 WHERE r1 = 1),
        mx2 AS (SELECT p.query_id, p.cand_id, p.rel, max(s.sim) AS mx
                FROM pool p
                JOIN sel1 sl ON sl.query_id = p.query_id
                JOIN sims s ON s.query_id = p.query_id
                  AND s.a = p.cand_id AND s.b = sl.cand_id
                WHERE NOT EXISTS (SELECT 1 FROM sel1 x
                  WHERE x.query_id = p.query_id
                    AND x.cand_id = p.cand_id)
                GROUP BY 1, 2, 3),
        sc2 AS (SELECT query_id, cand_id,
                       CAST(0.7 AS DOUBLE) * rel
                         - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE))
                           * mx AS sc FROM mx2),
        pk2 AS (SELECT query_id, cand_id, 2 AS step, sc AS mmr_score
                FROM (SELECT *, row_number() OVER (
                        PARTITION BY query_id
                        ORDER BY sc DESC, cand_id) AS r2 FROM sc2)
                WHERE r2 = 1),
        sel2 AS (SELECT * FROM sel1 UNION ALL SELECT * FROM pk2),
        mx3 AS (SELECT p.query_id, p.cand_id, p.rel, max(s.sim) AS mx
                FROM pool p
                JOIN sel2 sl ON sl.query_id = p.query_id
                JOIN sims s ON s.query_id = p.query_id
                  AND s.a = p.cand_id AND s.b = sl.cand_id
                WHERE NOT EXISTS (SELECT 1 FROM sel2 x
                  WHERE x.query_id = p.query_id
                    AND x.cand_id = p.cand_id)
                GROUP BY 1, 2, 3),
        sc3 AS (SELECT query_id, cand_id,
                       CAST(0.7 AS DOUBLE) * rel
                         - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE))
                           * mx AS sc FROM mx3),
        pk3 AS (SELECT query_id, cand_id, 3 AS step, sc AS mmr_score
                FROM (SELECT *, row_number() OVER (
                        PARTITION BY query_id
                        ORDER BY sc DESC, cand_id) AS r3 FROM sc3)
                WHERE r3 = 1),
        sel3 AS (SELECT * FROM sel2 UNION ALL SELECT * FROM pk3),
        mx4 AS (SELECT p.query_id, p.cand_id, p.rel, max(s.sim) AS mx
                FROM pool p
                JOIN sel3 sl ON sl.query_id = p.query_id
                JOIN sims s ON s.query_id = p.query_id
                  AND s.a = p.cand_id AND s.b = sl.cand_id
                WHERE NOT EXISTS (SELECT 1 FROM sel3 x
                  WHERE x.query_id = p.query_id
                    AND x.cand_id = p.cand_id)
                GROUP BY 1, 2, 3),
        sc4 AS (SELECT query_id, cand_id,
                       CAST(0.7 AS DOUBLE) * rel
                         - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE))
                           * mx AS sc FROM mx4),
        pk4 AS (SELECT query_id, cand_id, 4 AS step, sc AS mmr_score
                FROM (SELECT *, row_number() OVER (
                        PARTITION BY query_id
                        ORDER BY sc DESC, cand_id) AS r4 FROM sc4)
                WHERE r4 = 1),
        sel4 AS (SELECT * FROM sel3 UNION ALL SELECT * FROM pk4),
        mx5 AS (SELECT p.query_id, p.cand_id, p.rel, max(s.sim) AS mx
                FROM pool p
                JOIN sel4 sl ON sl.query_id = p.query_id
                JOIN sims s ON s.query_id = p.query_id
                  AND s.a = p.cand_id AND s.b = sl.cand_id
                WHERE NOT EXISTS (SELECT 1 FROM sel4 x
                  WHERE x.query_id = p.query_id
                    AND x.cand_id = p.cand_id)
                GROUP BY 1, 2, 3),
        sc5 AS (SELECT query_id, cand_id,
                       CAST(0.7 AS DOUBLE) * rel
                         - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE))
                           * mx AS sc FROM mx5),
        pk5 AS (SELECT query_id, cand_id, 5 AS step, sc AS mmr_score
                FROM (SELECT *, row_number() OVER (
                        PARTITION BY query_id
                        ORDER BY sc DESC, cand_id) AS r5 FROM sc5)
                WHERE r5 = 1)
        SELECT * FROM sel4 UNION ALL SELECT * FROM pk5"""),
      (s, d) => {
        val e = t(s, d, "embeddings")
        Similarity.mmrTopK(e.filter(col("vec_id") < 8), e,
          "vec_id", "embedding", k = 5, poolSize = 20, lambda = 0.7)
      }),

    // Two-stage truncated-dim search: coarse top-20 on the first 8 of
    // 64 dims, exact rerank to top-5. Deterministic in both stages
    // (sequential-fold doubles, cand_id tie-break) → full hash oracle,
    // unlike recall-contracted ANN.
    QueryDef(
      "q154_sim_twostage_topk",
      Some(s"""
        WITH e AS (SELECT vec_id, embedding v, embedding[1:8] p
                   FROM embeddings),
        en AS (SELECT vec_id, v, p,
                      ${dkDot("p", "p")} AS pn,
                      ${dkDot("v", "v")} AS nn
               FROM e),
        coarse AS (
          SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                 ${dkCos(dkDot("q.p", "c.p"), "q.pn", "c.pn")} AS cos_pre
          FROM en q JOIN en c ON q.vec_id <> c.vec_id
          WHERE q.vec_id < 8),
        pool AS (SELECT query_id, cand_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cos_pre DESC, cand_id) AS rk FROM coarse)
          WHERE rk <= 20),
        rer AS (
          SELECT p.query_id, p.cand_id,
                 ${dkCos(dkDot("q.v", "c.v"), "q.nn", "c.nn")} AS cos_sim
          FROM pool p
          JOIN en q ON q.vec_id = p.query_id
          JOIN en c ON c.vec_id = p.cand_id)
        SELECT query_id, cand_id, cos_sim, rk FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, cand_id) AS INT) AS rk FROM rer)
        WHERE rk <= 5"""),
      (s, d) => {
        val e = t(s, d, "embeddings")
        Similarity.twoStageTopK(e.filter(col("vec_id") < 8), e,
          "vec_id", "embedding", dPrefix = 8, m = 20, k = 5)
      }),

    // ANN quality report: recall@5 of the two-stage truncated-dim
    // search against the brute-force ground truth, per query — the
    // tuning table for choosing (dPrefix, m). Both rankings are
    // deterministic, so the recall itself is engine-exact; the left
    // join keeps queries with zero overlap visible at recall 0.
    QueryDef(
      "q161_ann_recall",
      Some(s"""
        WITH e AS (SELECT vec_id, embedding v, embedding[1:8] p
                   FROM embeddings),
        en AS (SELECT vec_id, v, p,
                      ${dkDot("p", "p")} AS pn,
                      ${dkDot("v", "v")} AS nn
               FROM e),
        bscored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                 ${dkCos(dkDot("q.v", "c.v"), "q.nn", "c.nn")} AS cs
          FROM en q JOIN en c ON q.vec_id <> c.vec_id
          WHERE q.vec_id < 8),
        brute AS (SELECT query_id, cand_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cs DESC, cand_id) AS rk FROM bscored)
          WHERE rk <= 5),
        coarse AS (
          SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                 ${dkCos(dkDot("q.p", "c.p"), "q.pn", "c.pn")} AS cp
          FROM en q JOIN en c ON q.vec_id <> c.vec_id
          WHERE q.vec_id < 8),
        pool AS (SELECT query_id, cand_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cp DESC, cand_id) AS rk FROM coarse)
          WHERE rk <= 20),
        rer AS (
          SELECT p.query_id, p.cand_id,
                 ${dkCos(dkDot("q.v", "c.v"), "q.nn", "c.nn")} AS cs
          FROM pool p
          JOIN en q ON q.vec_id = p.query_id
          JOIN en c ON c.vec_id = p.cand_id),
        two AS (SELECT query_id, cand_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cs DESC, cand_id) AS rk FROM rer)
          WHERE rk <= 5),
        hit AS (SELECT b.query_id, count(t.cand_id) AS n_overlap
                FROM brute b LEFT JOIN two t
                  ON t.query_id = b.query_id AND t.cand_id = b.cand_id
                GROUP BY 1)
        SELECT query_id, n_overlap,
               CAST(n_overlap AS DOUBLE) / 5.0 AS recall
        FROM hit"""),
      (s, d) => {
        val e = t(s, d, "embeddings")
        val q = e.filter(col("vec_id") < 8)
        // each side is a complete operator output of #queries×k rows;
        // checkpoint them so the comparison join doesn't re-inline
        // both search pipelines (q65 composition precedent)
        val brute = Similarity.bruteForceTopK(q, e, "vec_id",
          "embedding", 5).select(col("query_id"), col("cand_id"))
          .barrier()
        val two = Similarity.twoStageTopK(q, e, "vec_id", "embedding",
          dPrefix = 8, m = 20, k = 5)
          .select(col("query_id"), col("cand_id").as("tc"))
          .barrier()
        brute.join(two,
            brute("query_id") === two("query_id") &&
              col("cand_id") === col("tc"), "left")
          .groupBy(brute("query_id"))
          .agg(count(col("tc")).as("n_overlap"))
          .select(col("query_id"), col("n_overlap"),
            (col("n_overlap").cast("double") / 5.0).as("recall"))
      }),

    // IVF-style top-3 restricted to the query's label cell.
    QueryDef(
      "q46_sim_ivf_topk",
      Some(s"""
        WITH e AS (SELECT vec_id, label, embedding v,
                          ${dkDot("embedding", "embedding")} AS nn
                   FROM embeddings),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                 ${dkCos(dkDot("q.v", "c.v"), "q.nn", "c.nn")} AS cos_sim
          FROM e q JOIN e c ON q.label = c.label AND q.vec_id <> c.vec_id
          WHERE q.vec_id < 8)
        SELECT query_id, cand_id, cos_sim, rk FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, cand_id) AS INT) AS rk FROM scored)
        WHERE rk <= 3"""),
      (s, d) => {
        val e = t(s, d, "embeddings")
        Similarity.ivfTopK(e.filter(col("vec_id") < 8), e,
          "vec_id", "embedding", "label", 3)
      }),

    // Hyperplane-LSH bucketed ANN: top-3 among same-bucket candidates.
    QueryDef(
      "q47_sim_lsh_topk",
      Some(s"""
        WITH e AS (SELECT vec_id, embedding v,
                          ${dkDot("embedding", "embedding")} AS nn,
                          ${dkLshBucket("embedding")} AS bucket
                   FROM embeddings),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                 ${dkCos(dkDot("q.v", "c.v"), "q.nn", "c.nn")} AS cos_sim
          FROM e q JOIN e c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
          WHERE q.vec_id < 8)
        SELECT query_id, cand_id, cos_sim, rk FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, cand_id) AS INT) AS rk FROM scored)
        WHERE rk <= 3"""),
      (s, d) => {
        val e = t(s, d, "embeddings")
        Similarity.lshTopK(e.filter(col("vec_id") < 8), e,
          "vec_id", "embedding", nBits = 8, dim = 64, k = 3)
      }),

    // Embedding near-duplicate pairs within an IVF cell, cosine ≥ 0.35.
    QueryDef(
      "q48_dedup_embedding",
      Some(s"""
        WITH e AS (SELECT vec_id, label, embedding v,
                          ${dkDot("embedding", "embedding")} AS nn
                   FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ${dkCos(dkDot("a.v", "b.v"), "a.nn", "b.nn")} AS cos_sim
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE ${dkCos(dkDot("a.v", "b.v"), "a.nn", "b.nn")} >= 0.35"""),
      (s, d) =>
        Similarity.nearDupPairs(t(s, d, "embeddings"),
          "vec_id", "embedding", "label", 0.35)),

    // q48's SCALE route (r9): the same exact within-cell pair join
    // over LSH-REFINED composite cells (label × 8-bit sign-random-
    // projection bucket). q48's sf1 decade measured exp 1.38 — the
    // honest (n/cells)² shape of an all-pairs join when the caller
    // hands it coarse cells whose population grows with the corpus;
    // refining with the q47 bucket bounds cell population (cells
    // multiply instead), at the usual LSH recall trade. Same operator,
    // different cellCol — the contract q48's scaladoc states, now
    // registered and measured (SCALE.md: exp ~0 at the same decade).
    QueryDef(
      "q242_dedup_embedding_lsh",
      Some(s"""
        WITH e AS (SELECT vec_id, label, embedding v,
                          ${dkDot("embedding", "embedding")} AS nn,
                          ${dkLshBucket("embedding")} AS bucket
                   FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ${dkCos(dkDot("a.v", "b.v"), "a.nn", "b.nn")} AS cos_sim
        FROM e a JOIN e b
          ON a.label = b.label AND a.bucket = b.bucket
         AND a.vec_id < b.vec_id
        WHERE ${dkCos(dkDot("a.v", "b.v"), "a.nn", "b.nn")} >= 0.35"""),
      (s, d) => {
        val e = t(s, d, "embeddings")
          .withColumn("cell", concat_ws("_", col("label"),
            Similarity.lshBucket(col("embedding"), nBits = 8, dim = 64)))
        Similarity.nearDupPairs(e, "vec_id", "embedding", "cell", 0.35)
      }),

    // Heuristic stopword-argmax language ID.
    QueryDef(
      "q49_text_langid",
      Some(s"""
        WITH t AS (SELECT doc_id, string_split(text,' ') toks
                   FROM documents),
        h AS (SELECT doc_id,
          len(list_filter(toks, x -> list_contains(
            [${TextOps.StopEn.map("'" + _ + "'").mkString(",")}], x))) he,
          len(list_filter(toks, x -> list_contains(
            [${TextOps.StopEs.map("'" + _ + "'").mkString(",")}], x))) hs,
          len(list_filter(toks, x -> list_contains(
            [${TextOps.StopDe.map("'" + _ + "'").mkString(",")}], x))) hd,
          len(list_filter(toks, x -> list_contains(
            [${TextOps.StopFr.map("'" + _ + "'").mkString(",")}], x))) hf
        FROM t)
        SELECT doc_id,
          CASE WHEN greatest(he,hs,hd,hf) = 0 THEN 'und'
               WHEN hd = greatest(he,hs,hd,hf) THEN 'de'
               WHEN he = greatest(he,hs,hd,hf) THEN 'en'
               WHEN hs = greatest(he,hs,hd,hf) THEN 'es'
               ELSE 'fr' END AS lang_pred
        FROM h"""),
      (s, d) =>
        t(s, d, "documents")
          .select(col("doc_id"), TextOps.langId(col("text")).as("lang_pred"))),

    // Quality metrics + composite score. All metrics are single IEEE
    // divisions of integers — no round() (half-ties like 0.2878125
    // break differently across engines; see TextOps scaladoc).
    QueryDef(
      "q50_text_quality",
      Some("""
        WITH t AS (SELECT doc_id, text, string_split(text,' ') toks,
                          CAST(len(string_split(text,' ')) AS BIGINT) nt,
                          CAST(length(replace(text,' ','')) AS BIGINT) nc
                   FROM documents),
        h AS (SELECT *, CAST(len(list_filter(toks, x -> list_contains(
                ['the','a','of','and','to','in','is','it'], x))) AS BIGINT) he
              FROM t)
        SELECT doc_id,
               CAST(len(toks) AS INT) AS n_tokens,
               CAST(nc AS DOUBLE)/CAST(nt AS DOUBLE) AS avg_token_len,
               CAST(he AS DOUBLE)/CAST(nt AS DOUBLE) AS stopword_ratio,
               CAST(800*he + 6*nt*least(nt,100) + 75*least(nc,8*nt)
                 AS DOUBLE) / (2000.0*CAST(nt AS DOUBLE)) AS quality_score
        FROM h"""),
      (s, d) =>
        t(s, d, "documents")
          .select(col("doc_id") +: TextOps.qualityColumns(col("text")): _*)),

    // Token counting: whitespace and BPE-ish subword regex.
    QueryDef(
      "q51_text_tokens",
      Some("""
        SELECT doc_id,
               CAST(len(string_split(text,' ')) AS INT) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text,
                 '([A-Za-z]+|[0-9]+|[^A-Za-z0-9 ])', 1)) AS INT) AS n_bpeish
        FROM documents"""),
      (s, d) =>
        t(s, d, "documents")
          .select(col("doc_id"),
            size(TextOps.tokens(col("text"))).as("n_ws_tokens"),
            TextOps.bpeishTokenCount(col("text")).as("n_bpeish"))),

    // Rolling-hash (char 5-gram min) document fingerprint.
    QueryDef(
      "q52_text_fingerprint",
      Some(s"""
        SELECT doc_id,
               list_min(list_transform(
                 range(1, greatest(length(text)-4, 1)+1),
                 i -> ${dkHash60("substr(text,CAST(i AS INT),5)")})) AS fp
        FROM documents"""),
      (s, d) =>
        t(s, d, "documents")
          .select(col("doc_id"),
            TextOps.fingerprint(col("text")).as("fp"))),

    // Multimodal binary plumbing: pack → stub-decode → feature stats.
    QueryDef(
      "q53_multimodal_features",
      Some("""
        WITH g AS (SELECT doc_id, source,
                          CAST(octet_length(encode(text)) AS BIGINT) n_bytes
                   FROM documents),
        f AS (SELECT source, n_bytes,
                     CAST(n_bytes%640 + 16 AS INT) width,
                     CAST(n_bytes%24 + 1 AS INT) n_frames,
                     CASE WHEN n_bytes%2 = 0 THEN 'image' ELSE 'audio' END
                       AS media_kind
              FROM g)
        SELECT source, media_kind,
               count(*) AS n_media,
               CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
               avg(width) AS avg_width,
               max(n_frames) AS max_frames
        FROM f GROUP BY 1, 2"""),
      (s, d) => Multimodal.featureStats(s, t(s, d, "documents"))),

    // Deterministic keyframe sampling over the multimodal rows: the
    // evenly-spaced ⌊j·n/s⌋ grid a video pipeline feeds to a vision
    // encoder. frame_fp is the 60-bit hash of the sampled frame's
    // ACTUAL BYTES (the payload's data section split into n_frames
    // equal-floor chunks, hashed via hex — real frame-byte hashing,
    // replayable in the oracle through hex-string slicing since
    // DuckDB has no blob md5). Grid + fingerprint hash-oracled end
    // to end. Pinned to the FALLBACK grid (parseContainers = false):
    // the oracle replays only the len%24+1 formula, so the parity
    // contract must not hinge on no fixture text starting with a
    // printable container magic; the parsed branch is spec-pinned
    // separately.
    QueryDef(
      "q160_frame_sample",
      Some("""
        WITH g AS (SELECT doc_id, text,
                          CAST(octet_length(encode(text)) AS BIGINT)
                            AS n_bytes
                   FROM documents),
        f AS (SELECT doc_id, text, n_bytes,
                     CAST(n_bytes%24 + 1 AS INT) AS n_frames
              FROM g),
        s AS (SELECT doc_id, text, n_bytes, n_frames,
                     least(4, n_frames) AS ns FROM f),
        j AS (SELECT doc_id, text, n_bytes, n_frames,
                     CAST(i AS INT) AS sample_j,
                     CAST((CAST(i AS INT) * n_frames) // ns AS INT)
                       AS frame_idx
              FROM s, unnest(range(ns)) r(i))
        SELECT doc_id, n_frames, sample_j, frame_idx,
               ('0x'||substr(md5(substr(hex(encode(text)),
                  CAST(((frame_idx * n_bytes) // n_frames) * 2 + 1
                    AS INT),
                  CAST((((frame_idx + 1) * n_bytes) // n_frames
                       - (frame_idx * n_bytes) // n_frames) * 2
                    AS INT))), 1, 15))::BIGINT AS frame_fp
        FROM j"""),
      (s, d) => Multimodal.sampleFrames(s, t(s, d, "documents"), 4,
        parseContainers = false)),

    // Pixel-level image near-dup (the multimodal dedup operator):
    // synthetic BMP/PNG images derived from doc ids are DECODED with
    // javax.imageio, average-pooled to 9×8 integer luma cells, hashed
    // to a 64-bit dHash, and near-dup-paired by 4×16-bit Hamming
    // banding (the q70/q77 pigeonhole machinery via the capped LSH
    // bucket engine) with exact bit_count verification at ≤ 4 bits.
    // The oracle recomputes the SAME dHash from the pixel formula —
    // valid because both containers are lossless, so decode(encode(p))
    // ≡ p; the decode path itself is additionally pinned by
    // MultimodalSpec (re-encode and brightness invariance, known
    // dup/non-dup pairs, partition invariance).
    QueryDef(
      "q263_image_dhash_neardup",
      Some(s"""
        WITH $dkImgDhashPairs
        SELECT doc_a, doc_b, hamming FROM ip"""),
      (s, d) => imgDhashPairs(s, d)),

    // PCM audio window features (the audio analog of q263): synthetic
    // 8-bit mono WAV payloads are REALLY parsed — header fields, then
    // the raw data-section bytes — and folded into per-window integer
    // energy and zero-crossing counts (the standard VAD/segmentation
    // features). The oracle replays the sample formula; raw PCM
    // round-trips bytes exactly, so the decoded-path values match.
    QueryDef(
      "q264_audio_window_features",
      Some("""
        WITH s AS (SELECT doc_id, source, CAST(t AS BIGINT) AS t,
                          ((((doc_id % 13) + 1) * t * t
                            + (doc_id % 97) * t
                            + (doc_id % 256)) % 256) - 128 AS sv
                   FROM documents, range(0, 256) r(t)),
        w AS (SELECT doc_id, source, t, sv, t // 32 AS window_idx,
                     lag(sv) OVER (PARTITION BY doc_id ORDER BY t)
                       AS pv
              FROM s)
        SELECT doc_id, source, CAST(window_idx AS INT) AS window_idx,
               CAST(count(*) AS INT) AS n_samples,
               CAST(sum(sv * sv) AS BIGINT) AS energy,
               CAST(count(*) FILTER (WHERE t % 32 <> 0 AND pv * sv < 0)
                 AS INT) AS zero_crossings
        FROM w GROUP BY 1, 2, 3"""),
      (s, d) =>
        Multimodal.audioWindowFeatures(
          Multimodal.syntheticWavs(t(s, d, "documents")), window = 32)
          .toDF()),

    // Audio near-dup via quantized energy envelopes: per clip, the
    // window-energy sequence (q264's features) quantized by 2^16 and
    // hashed — clips that are the same signal at slightly different
    // gain (the synthetic corpus folds ids mod 64 — coprime to the
    // jitter modulus 3, so every pattern class spans all offsets —
    // and adds a clamped
    // per-doc DC offset, so payload BYTES differ) collapse into one
    // envelope group. The audio analog of q265's exact-pixel rail:
    // dedup on decoded CONTENT where byte hashing sees distinct
    // files. One narrow decode + one ordered fold per clip.
    QueryDef(
      "q266_audio_envelope_group",
      Some("""
        WITH s AS (SELECT doc_id, CAST(t AS BIGINT) AS t,
                          least((((((doc_id % 64) % 13) + 1) * t * t
                            + ((doc_id % 64) % 97) * t
                            + ((doc_id % 64) % 256)) % 256)
                            + (doc_id % 3), 255) - 128 AS sv
                   FROM documents, range(0, 256) r(t)),
        w AS (SELECT doc_id, t // 32 AS window_idx,
                     CAST(sum(sv * sv) AS BIGINT) AS energy
              FROM s GROUP BY 1, 2),
        env AS (SELECT doc_id,
                       string_agg(CAST(energy // 65536 AS VARCHAR), ':'
                         ORDER BY window_idx) AS env_s
                FROM w GROUP BY 1),
        fp AS (SELECT doc_id,
                      ('0x'||substr(md5(env_s), 1, 15))::BIGINT
                        AS env_fp
               FROM env)
        SELECT env_fp, count(*) AS n_clips, min(doc_id) AS keeper,
               CAST(count(DISTINCT doc_id % 3) AS BIGINT)
                 AS n_gain_variants
        FROM fp GROUP BY 1"""),
      (s, d) => {
        val feats = Multimodal.audioWindowFeatures(
          Multimodal.syntheticWavs(t(s, d, "documents"),
            patternPeriod = 64L, jitterMod = 3L), window = 32).toDF()
        feats
          .select(col("doc_id"), col("window_idx"),
            expr("energy div 65536").as("eq"))
          .groupBy(col("doc_id"))
          .agg(TextOps.hash60(expr(
            "array_join(transform(sort_array(collect_list(" +
              "struct(window_idx, eq))), s -> CAST(s.eq AS STRING)), " +
              "':')")).as("env_fp"))
          .groupBy(col("env_fp"))
          .agg(count(lit(1)).as("n_clips"),
            min(col("doc_id")).as("keeper"),
            countDistinct(pmod(col("doc_id"), lit(3L)))
              .as("n_gain_variants"))
      }),

    // Re-encode-invariant EXACT image dedup: fingerprint = hash of
    // the DECODED luma grid (row-major uppercase hex), so a PNG and a
    // BMP of the same pixels collapse into one group where byte-level
    // md5 (q40's rail) sees two distinct files. The synthetic corpus
    // folds doc ids mod 96 before the pixel formula while container
    // choice follows the real id's parity — every group genuinely
    // mixes containers (n_containers = 2), which is the whole point.
    QueryDef(
      "q265_image_exact_dedup",
      Some("""
        WITH px AS (SELECT doc_id, doc_id % 96 AS pid,
                           CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y
                    FROM documents, range(0, 36) rx(x),
                         range(0, 32) ry(y)),
        pv AS (SELECT doc_id, y, x,
                      ((pid % 32 + 3) * x + (2 * (pid % 32) + 5) * y
                        + ((x * y * (pid % 32 + 1)) % 31)) % 150
                      + (pid % 5) * 8
                      + (CASE WHEN x // 4 = ((pid // 32) % 72) % 9
                              AND y // 4 = (((pid // 32) % 72) // 9) % 8
                              THEN 60 ELSE 0 END) AS p
               FROM px),
        hx AS (SELECT doc_id,
                      string_agg(printf('%02X', p), '' ORDER BY y, x)
                        AS hs
               FROM pv GROUP BY 1),
        fp AS (SELECT doc_id,
                      ('0x'||substr(md5(hs), 1, 15))::BIGINT AS pix_fp
               FROM hx)
        SELECT pix_fp, count(*) AS n_images, min(doc_id) AS keeper,
               CAST(count(DISTINCT doc_id % 2) AS BIGINT)
                 AS n_containers
        FROM fp GROUP BY 1"""),
      (s, d) =>
        Multimodal.imagePixelFingerprint(
            Multimodal.syntheticImages(t(s, d, "documents"),
              patternPeriod = 96L)).toDF()
          .filter(col("pix_fp").isNotNull)
          .groupBy(col("pix_fp"))
          .agg(count(lit(1)).as("n_images"),
            min(col("doc_id")).as("keeper"),
            countDistinct(pmod(col("doc_id"), lit(2L)))
              .as("n_containers"))),

    // Image survivorship: decode → dHash → EXACT-DEDUP-FIRST
    // (dHash-identical images collapse to the min-id representative
    // before any banding — brightness re-exposures and re-encodes
    // are Hamming 0, so at corpus scale the identical mass dominates
    // the pair graph; collapsing it first is the same structural
    // discipline as TextOps.exactDedupFirst and shrinks q267's sf0.1
    // pair graph 388k → ~97k) → banded verified pairs over the
    // REPRESENTATIVES → connected components (min-label propagation;
    // oracle = recursive-CTE transitive closure, q54's pattern) →
    // expand every doc through its representative into the canonical
    // keep-list over the WHOLE corpus. End-to-end hash-oracled, the
    // compression mirrored in the oracle.
    QueryDef(
      "q267_image_keep_list",
      Some(s"""
        WITH RECURSIVE $dkImgDhash,
        reps AS (SELECT dhash, min(doc_id) AS doc_id FROM dh
                 GROUP BY 1),
        ${dkHammingChain("reps", "dhash", 4)},
        edges AS (SELECT doc_a s, doc_b d FROM ip
                  UNION SELECT doc_b, doc_a FROM ip),
        reach AS (
          SELECT s AS node, s AS r FROM edges
          UNION
          SELECT e.s, reach.r FROM edges e JOIN reach ON e.d = reach.node),
        comp AS (SELECT node, min(r) AS cluster FROM reach GROUP BY 1),
        m AS (SELECT dh.doc_id,
                     coalesce(comp.cluster, r.doc_id) AS cluster
              FROM dh
              JOIN reps r ON r.dhash = dh.dhash
              LEFT JOIN comp ON comp.node = r.doc_id)
        SELECT d.doc_id,
               coalesce(m.cluster, d.doc_id) AS cluster,
               (m.cluster IS NULL OR m.cluster = d.doc_id) AS is_kept
        FROM documents d LEFT JOIN m ON m.doc_id = d.doc_id"""),
      // maxIters generous for the same reason as q54: the oracle is
      // EXACT components, so the split-cluster fallback must never
      // fire on the oracled path; the convergence probe exits after
      // the true diameter anyway.
      (s, d) => {
        val hashes = Multimodal.imageDHash(
          Multimodal.syntheticImages(t(s, d, "documents"))).toDF()
          .barrier()
        val valid = hashes.filter(col("dhash").isNotNull)
        val reps = valid.groupBy(col("dhash"))
          .agg(min(col("doc_id")).as("doc_id"))
          .barrier() // feeds pairs, keep-list base AND the expansion
        val pairs = Multimodal.hammingNearDupPairs(
          reps, "doc_id", "dhash", maxHamming = 4)
        val repClusters = DedupClusters.keepList(
            reps, "doc_id", pairs, "doc_a", "doc_b", maxIters = 100)
          .select(col("doc_id").as("__rep"), col("cluster"))
        // fuse the expansion: clusters land on the (tiny) rep table
        // first, so the corpus-sized side is joined ONCE, on dhash,
        // instead of once per mapping
        val repsWithCluster = reps
          .select(col("dhash"), col("doc_id").as("__rep"))
          .join(repClusters, Seq("__rep"))
        val expanded = valid.select(col("doc_id"), col("dhash"))
          .join(repsWithCluster, Seq("dhash"))
          .select(col("doc_id"), col("cluster"))
        // MERGE hint (r15): under the fleet SHJ default the static
        // planner picked ShuffledHashJoin BuildLeft — building the
        // hash map on the FULL corpus side, the unbounded-build case
        // that cannot be right at 100 TB; locally SMJ also measured
        // ~5-8% faster (benchab_shj6_r15.json)
        t(s, d, "documents").select(col("doc_id"))
          .join(expanded.hint("merge"), Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("cluster"), col("doc_id")).as("cluster"),
            (col("cluster").isNull
              || col("cluster") === col("doc_id")).as("is_kept"))
      }),

    // Audio near-dup via an acoustic fingerprint (the audio analog of
    // q263): decoded PCM → 64 window energies → 63 delta-SIGN bits
    // (Chromaprint's core idea — delta signs survive gain changes
    // because a DC offset moves neighboring windows together) →
    // 4×16-bit Hamming banding with exact bit_count verify. Catches
    // the gain-jittered variants q266's exact envelope rail would
    // need a coarse quantizer for, with measured separation: same
    // signal ≤ 4 bits, different signals ≥ 10. Oracle replays the
    // sample formula — exact because raw PCM round-trips bytes.
    QueryDef(
      "q268_audio_fingerprint_neardup",
      Some(s"""
        WITH s AS (SELECT doc_id, CAST(t AS BIGINT) AS t,
                          least((((((doc_id % 64) % 13) + 1) * t * t
                            + ((doc_id % 64) % 97) * t
                            + ((doc_id % 64) % 256)) % 256)
                            + (doc_id % 3), 255) - 128 AS sv
                   FROM documents, range(0, 256) r(t)),
        w AS (SELECT doc_id, t // 4 AS wi,
                     CAST(sum(sv * sv) AS BIGINT) AS energy
              FROM s GROUP BY 1, 2),
        dlt AS (SELECT doc_id, wi, energy,
                       lead(energy) OVER (PARTITION BY doc_id
                                          ORDER BY wi) AS nxt
                FROM w),
        ah AS (SELECT doc_id,
                      coalesce(CAST(sum(
                        CASE WHEN nxt > energy THEN
                          CAST(1 AS BIGINT) << CAST(wi AS INT)
                        ELSE 0 END) AS BIGINT), 0) AS env_hash
               FROM dlt WHERE wi <= 62 AND nxt IS NOT NULL
               GROUP BY 1),
        ${dkHammingChain("ah", "env_hash", 4)}
        SELECT doc_a, doc_b, hamming FROM ip"""),
      (s, d) => {
        val hashes = Multimodal.audioEnvelopeHash(
          Multimodal.syntheticWavs(t(s, d, "documents"),
            patternPeriod = 64L, jitterMod = 3L), window = 4).toDF()
          .barrier()
        Multimodal.hammingNearDupPairs(hashes, "doc_id", "env_hash",
          maxHamming = 4)
      }),

    // The SCALE route for video near-dup, beside q269's exact path
    // (the q41→q43 relationship, and q48→q242's): exact-dedup-first
    // on the clip's frame-SET fingerprint, MinHash over the frame-fp
    // set (frames ARE the clip's shingles — the text permutations
    // apply unchanged), capped (band,bucket) candidates, exact
    // containment verify restricted to CANDIDATES. Pair volume is
    // bucket-cap-bounded however many re-cuts a family has, where
    // q269's inverted index grows with the family square.
    QueryDef(
      "q270_video_lsh_neardup",
      Some(s"""
        WITH $dkVideoFrames,
        $dkVideoLshPairs
        SELECT doc_a, doc_b, shared, containment FROM vp"""),
      (s, d) =>
        Multimodal.videoLshNearDupPairs(
          Multimodal.frameFingerprints(
            Multimodal.syntheticVideos(t(s, d, "documents")),
            frameBytes = 16),
          minContainment = 0.75)),

    // Video survivorship keep-list (q267's role for the third
    // modality): q270's verified pairs over the exact-set keepers →
    // connected components → every clip expands through its
    // frame-set representative into the corpus-wide keep-list.
    // Completes per-modality parity: pairs + keep-list for images
    // (q263/q267), audio (q268), video (q270/q271).
    QueryDef(
      "q271_video_keep_list",
      Some(s"""
        WITH RECURSIVE $dkVideoFrames,
        $dkVideoLshPairs,
        edges AS (SELECT doc_a s, doc_b dst FROM vp
                  UNION SELECT doc_b, doc_a FROM vp),
        reach AS (
          SELECT s AS node, s AS r FROM edges
          UNION
          SELECT e.s, reach.r FROM edges e
          JOIN reach ON e.dst = reach.node),
        comp AS (SELECT node, min(r) AS cluster FROM reach GROUP BY 1),
        m AS (SELECT sfp.doc_id,
                     coalesce(comp.cluster, kmap.rep) AS cluster
              FROM sfp
              JOIN kmap USING (set_fp)
              LEFT JOIN comp ON comp.node = kmap.rep)
        SELECT docs.doc_id,
               coalesce(m.cluster, docs.doc_id) AS cluster,
               (m.cluster IS NULL OR m.cluster = docs.doc_id)
                 AS is_kept
        FROM documents docs LEFT JOIN m ON m.doc_id = docs.doc_id"""),
      (s, d) => {
        val d0 = Multimodal.frameFingerprints(
            Multimodal.syntheticVideos(t(s, d, "documents")),
            frameBytes = 16)
          .select(col("doc_id"), col("frame_fp")).distinct()
          .barrier()
        // ONE aggregation yields set-fp, reps, MinHash sigs and frame
        // counts for every consumer (exact rail, pair stage,
        // expansion map); the pairs barrier keeps the verify chain
        // OUT of every component round's plan (per-round analysis
        // over the inlined chain costs more wall than the jobs)
        val prof = Multimodal.frameSetProfile(d0).barrier()
        val repMap = prof.select(col("doc_id"), col("rep"))
        val pairs = Multimodal.videoLshNearDupPairsFrom(d0,
          minContainment = 0.75, profile = Some(prof)).barrier()
        val repClusters = DedupClusters.keepList(
            repMap.filter(col("doc_id") === col("rep"))
              .select(col("doc_id")),
            "doc_id", pairs, "doc_a", "doc_b", maxIters = 100)
          .select(col("doc_id").as("rep"), col("cluster"))
        val expanded = repMap.join(repClusters, Seq("rep"))
          .select(col("doc_id"), col("cluster"))
        // MERGE hint (r15): same rationale as q267's attach join —
        // the SHJ default built on the full-corpus side
        t(s, d, "documents").select(col("doc_id"))
          .join(expanded.hint("merge"), Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("cluster"), col("doc_id")).as("cluster"),
            (col("cluster").isNull
              || col("cluster") === col("doc_id")).as("is_kept"))
      }),

    // Image quality gates over DECODED pixels (the image analog of
    // q50's text gates): integer luma sum/square-sum (variance),
    // total absolute neighbor difference (edge energy — the standard
    // blur/blank proxy; a flat or blurred image scores low), and the
    // dominant-luma count (near-constant "blank" detector). Integer
    // stats from one decode pass; the derived ratios are single IEEE
    // divisions with identical operands in both engines.
    QueryDef(
      "q272_image_quality",
      Some("""
        WITH px AS (SELECT doc_id, doc_id % 32 AS g,
                           (doc_id // 32) % 72 AS v,
                           (doc_id % 5) * 8 AS br,
                           CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y
                    FROM documents, range(0, 36) rx(x),
                         range(0, 32) ry(y)),
        pv AS (SELECT doc_id, x, y,
                      ((g + 3) * x + (2 * g + 5) * y
                        + ((x * y * (g + 1)) % 31)) % 150 + br
                      + (CASE WHEN x // 4 = v % 9
                              AND y // 4 = (v // 9) % 8
                              THEN 60 ELSE 0 END) AS p
               FROM px),
        base AS (SELECT doc_id, count(*) AS n_px,
                        CAST(sum(p) AS BIGINT) AS luma_sum,
                        CAST(sum(p * p) AS BIGINT) AS luma_sq_sum
                 FROM pv GROUP BY 1),
        ex AS (SELECT a.doc_id, sum(abs(b.p - a.p)) AS e
               FROM pv a JOIN pv b
                 ON a.doc_id = b.doc_id AND b.y = a.y
                AND b.x = a.x + 1
               GROUP BY 1),
        ey AS (SELECT a.doc_id, sum(abs(b.p - a.p)) AS e
               FROM pv a JOIN pv b
                 ON a.doc_id = b.doc_id AND b.x = a.x
                AND b.y = a.y + 1
               GROUP BY 1),
        dom AS (SELECT doc_id, max(c) AS n_dominant
                FROM (SELECT doc_id, p, count(*) AS c
                      FROM pv GROUP BY 1, 2) GROUP BY 1)
        SELECT base.doc_id, n_px, luma_sum, luma_sq_sum,
               CAST(ex.e + ey.e AS BIGINT) AS edge_energy,
               CAST(dom.n_dominant AS BIGINT) AS n_dominant,
               CAST(luma_sq_sum AS DOUBLE)/n_px
                 - (CAST(luma_sum AS DOUBLE)/n_px)
                   * (CAST(luma_sum AS DOUBLE)/n_px) AS luma_var,
               CAST(ex.e + ey.e AS DOUBLE)/n_px AS sharpness,
               CAST(dom.n_dominant AS DOUBLE)/n_px AS dominant_frac
        FROM base
        JOIN ex USING (doc_id)
        JOIN ey USING (doc_id)
        JOIN dom USING (doc_id)"""),
      (s, d) =>
        Multimodal.imageQualityStats(
            Multimodal.syntheticImages(t(s, d, "documents"))).toDF()
          .drop("source")
          .withColumn("luma_var",
            col("luma_sq_sum").cast("double") / col("n_px")
              - (col("luma_sum").cast("double") / col("n_px"))
                * (col("luma_sum").cast("double") / col("n_px")))
          .withColumn("sharpness",
            col("edge_energy").cast("double") / col("n_px"))
          .withColumn("dominant_frac",
            col("n_dominant").cast("double") / col("n_px"))),

    // Audio quality gates over decoded PCM (the audio analog of
    // q50/q272): clipped-sample count, silent analysis windows,
    // dynamic range — the stats a speech pipeline reads before
    // admitting a clip. Exact integers + mirrored single divisions.
    QueryDef(
      "q273_audio_quality",
      Some("""
        WITH s AS (SELECT doc_id, CAST(t AS BIGINT) AS t,
                          ((((doc_id % 13) + 1) * t * t
                            + (doc_id % 97) * t
                            + (doc_id % 256)) % 256) - 128 AS sv
                   FROM documents, range(0, 256) r(t)),
        w AS (SELECT doc_id, t // 32 AS wi,
                     CAST(sum(sv * sv) AS BIGINT) AS e
              FROM s GROUP BY 1, 2),
        wa AS (SELECT doc_id, count(*) AS n_windows,
                      count(*) FILTER (WHERE e < 1000)
                        AS n_silent_windows
               FROM w GROUP BY 1),
        sa AS (SELECT doc_id, count(*) AS n_samples,
                      count(*) FILTER (WHERE abs(sv) >= 120)
                        AS n_clipped,
                      CAST(min(sv) AS INT) AS sample_min,
                      CAST(max(sv) AS INT) AS sample_max
               FROM s GROUP BY 1)
        SELECT sa.doc_id, n_samples,
               CAST(n_clipped AS BIGINT) AS n_clipped,
               CAST(n_windows AS BIGINT) AS n_windows,
               CAST(n_silent_windows AS BIGINT) AS n_silent_windows,
               sample_min, sample_max,
               CAST(n_clipped AS DOUBLE)/n_samples AS clip_frac,
               CAST(n_silent_windows AS DOUBLE)/n_windows
                 AS silence_frac
        FROM sa JOIN wa USING (doc_id)"""),
      (s, d) =>
        Multimodal.audioQualityStats(
            Multimodal.syntheticWavs(t(s, d, "documents"))).toDF()
          .drop("source")
          .withColumn("clip_frac",
            col("n_clipped").cast("double") / col("n_samples"))
          .withColumn("silence_frac",
            col("n_silent_windows").cast("double")
              / col("n_windows"))),

    // Video near-dup via shared frame CONTENT (the third modality of
    // the q263/q268 family): fixed-size frames hashed through the
    // pure-Catalyst hex∘substring route (q160's grid), inverted-index
    // join on the frame fingerprint with the q41 df cap, containment
    // = shared/min(|A|,|B|) ≥ 0.75 — the direction that catches a
    // TRIMMED re-cut at 1.0 where Jaccard would dilute it. Synthetic
    // clips in one family at different starts share 8−|Δ| of 8
    // frames; the oracle recomputes the identical fingerprints from
    // the frame formula (frame bytes are ASCII, hex round-trips).
    QueryDef(
      "q269_video_frame_neardup",
      Some(s"""
        WITH $dkVideoFrames,
        n AS (SELECT doc_id, count(*) AS nf FROM d GROUP BY 1),
        kept AS (SELECT frame_fp FROM d GROUP BY 1
                 HAVING count(*) <= 1000),
        c AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     count(*) AS shared
              FROM d a JOIN d b ON a.frame_fp = b.frame_fp
                AND a.doc_id < b.doc_id
              JOIN kept k ON a.frame_fp = k.frame_fp
              GROUP BY 1, 2)
        SELECT doc_a, doc_b, shared,
               CAST(shared AS DOUBLE)/least(na.nf, nb.nf)
                 AS containment
        FROM c
        JOIN n na ON na.doc_id = c.doc_a
        JOIN n nb ON nb.doc_id = c.doc_b
        WHERE CAST(shared AS DOUBLE)/least(na.nf, nb.nf) >= 0.75"""),
      (s, d) =>
        Multimodal.sharedFrameNearDupPairs(
          Multimodal.frameFingerprints(
            Multimodal.syntheticVideos(t(s, d, "documents")),
            frameBytes = 16),
          minContainment = 0.75)),

    // LSH banding audit: recall of the MinHash-LSH candidate set (q43)
    // against the exact n-gram-Jaccard ground truth (q41's contract),
    // banded by true Jaccard — the S-curve a dedup engineer reads to
    // pick (bands, rows-per-band) before trusting LSH at corpus scale.
    // Both sides are complete operator outputs (candidate pairs are
    // ~linear in corpus size by the bucket-cap contract; truth pairs by
    // the df cap), so the audit join is pair-bounded, never quadratic.
    // Each side checkpoints before the comparison join (q161
    // precedent) so the shingle kernel isn't re-inlined per consumer.
    QueryDef(
      "q180_lsh_recall_curve",
      Some(s"""
        WITH $dkLshCand,
        sh2 AS (SELECT doc_id, len(shsd) AS nsh, unnest(shsd) AS sh
                FROM (SELECT doc_id, list_distinct(
                        list_transform(shs, g -> ${dkHash60("g")})) shsd
                      FROM sarr)),
        kept AS (SELECT sh FROM sh2 GROUP BY sh HAVING count(*) <= 1000),
        truth AS (SELECT * FROM (
            SELECT da, db,
                   CAST(common AS DOUBLE)/(na+nb-common) AS jac
            FROM (SELECT a.doc_id da, b.doc_id db, a.nsh na, b.nsh nb,
                         count(*) common
                  FROM sh2 a JOIN sh2 b
                    ON a.sh = b.sh AND a.doc_id < b.doc_id
                  JOIN kept k ON a.sh = k.sh
                  GROUP BY 1, 2, 3, 4))
          WHERE jac >= 0.2),
        lab AS (SELECT CASE WHEN jac >= 0.8 THEN '[0.8,1.0]'
                            WHEN jac >= 0.6 THEN '[0.6,0.8)'
                            WHEN jac >= 0.4 THEN '[0.4,0.6)'
                            ELSE '[0.2,0.4)' END AS jac_band,
                       CASE WHEN c.doc_a IS NULL THEN 0 ELSE 1 END
                         AS caught
                FROM truth t LEFT JOIN cand c
                  ON c.doc_a = t.da AND c.doc_b = t.db)
        SELECT jac_band, count(*) AS n_pairs,
               CAST(sum(caught) AS BIGINT) AS n_caught,
               CAST(sum(caught) AS DOUBLE)/count(*) AS recall
        FROM lab GROUP BY 1"""),
      (s, d) => {
        // the whole audit runs on the exact-deduped corpus (the LSH
        // route's structural precondition): truth AND candidates over
        // the same keeper set, as in the oracle's dd/ddocs chain
        val docs = TextOps.exactDedupFirst(t(s, d, "documents"),
          "doc_id", "text").barrier()
        val truth = TextOps.ngramJaccardPairs(docs, "doc_id", "text",
            minJac = 0.2, maxDf = 1000)
          .barrier()
        val cand = TextOps.lshCandidatePairs(
            TextOps.minhashSignatures(docs, "doc_id", "text"),
            "doc_id")
          .withColumn("hit", lit(1))
          .barrier()
        truth.join(cand, Seq("doc_a", "doc_b"), "left")
          .select(
            when(col("jac") >= 0.8, "[0.8,1.0]")
              .when(col("jac") >= 0.6, "[0.6,0.8)")
              .when(col("jac") >= 0.4, "[0.4,0.6)")
              .otherwise("[0.2,0.4)").as("jac_band"),
            coalesce(col("hit"), lit(0)).as("caught"))
          .groupBy(col("jac_band"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("caught")).cast("long").as("n_caught"))
          .select(col("jac_band"), col("n_pairs"), col("n_caught"),
            (col("n_caught").cast("double") / col("n_pairs"))
              .as("recall"))
      }),

    // Retrieval-quality evaluation harness: MRR, capped recall@10 and
    // dyadic DCG@10 of the dense top-k against label ground truth, per
    // label. Every metric is built from INTEGER-scaled per-query terms
    // (reciprocal ranks ×2520 = lcm(1..10), DCG gains as 2^(10-rk)),
    // summed exactly and divided ONCE — so the whole eval, not just
    // the rankings, is hash-oracled (classic log2-based nDCG is libm-
    // dependent; the dyadic gain ladder ranks systems identically).
    QueryDef(
      "q200_retrieval_eval",
      Some(s"""
        WITH e AS (SELECT vec_id, label, embedding v,
                          ${dkDot("embedding", "embedding")} AS nn
                   FROM embeddings),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                 q.label AS lq, c.label AS lc2,
                 ${dkCos(dkDot("q.v", "c.v"), "q.nn", "c.nn")} AS cos_sim
          FROM e q JOIN e c ON q.vec_id <> c.vec_id
          WHERE q.vec_id < 64),
        ranked AS (SELECT query_id, lq, lc2, rk FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, cand_id) AS rk FROM scored)
          WHERE rk <= 10),
        perq AS (SELECT query_id, lq,
                   count(*) FILTER (WHERE lq = lc2) AS hits,
                   min(rk) FILTER (WHERE lq = lc2) AS first_rel,
                   COALESCE(CAST(sum(1::BIGINT << (10 - rk))
                     FILTER (WHERE lq = lc2) AS BIGINT), 0) AS dcgx
                 FROM ranked GROUP BY 1, 2),
        lcnt AS (SELECT label, count(*) AS n_label
                 FROM embeddings GROUP BY 1),
        agg AS (SELECT lq AS label, count(*) AS n_queries,
                  CAST(sum(hits) AS BIGINT) AS shits,
                  CAST(sum(CASE WHEN first_rel IS NULL THEN 0
                           ELSE 2520 // first_rel END) AS BIGINT) AS smrr,
                  CAST(sum(dcgx) AS BIGINT) AS sdcg
                FROM perq GROUP BY 1)
        SELECT agg.label, n_queries, n_label,
               CAST(smrr AS DOUBLE) / (2520.0 * n_queries) AS mrr,
               CAST(shits AS DOUBLE)
                 / CAST(n_queries * least(greatest(n_label - 1, 1), 10)
                        AS DOUBLE) AS recall_at_10,
               CAST(sdcg AS DOUBLE) / (512.0 * n_queries) AS dcg_at_10
        FROM agg JOIN lcnt ON agg.label = lcnt.label
        ORDER BY 1"""),
      (s, d) => {
        val e = t(s, d, "embeddings")
        val ranked = Similarity.bruteForceTopK(
          e.filter(col("vec_id") < 64), e, "vec_id", "embedding", 10)
        // the narrow (vec_id, label) frame feeds three consumers
        // (query labels, candidate labels, per-label counts) — barrier
        // it so the vectors-bearing table is scanned once for all of
        // them, and broadcast the nQueries×k ranked side through both
        // label joins so the corpus-sized label side streams unshuffled.
        val lab = e.select(col("vec_id"), col("label")).barrier()
        val perq = broadcast(broadcast(ranked)
            .join(lab.select(col("vec_id").as("query_id"),
              col("label").as("lq")), "query_id"))
          .join(lab.select(col("vec_id").as("cand_id"),
            col("label").as("lc2")), "cand_id")
          .groupBy(col("query_id"), col("lq"))
          .agg(
            sum(when(col("lq") === col("lc2"), 1L).otherwise(0L))
              .as("hits"),
            min(when(col("lq") === col("lc2"), col("rk")))
              .as("first_rel"),
            coalesce(sum(when(col("lq") === col("lc2"),
              expr("shiftleft(CAST(1 AS BIGINT), 10 - rk)"))), lit(0L))
              .as("dcgx"))
        val lcnt = lab.groupBy(col("label"))
          .agg(count(lit(1)).as("n_label"))
        perq
          .groupBy(col("lq").as("label"))
          .agg(count(lit(1)).as("n_queries"),
            sum(col("hits")).as("shits"),
            sum(coalesce(expr("2520 div first_rel"), lit(0L))).as("smrr"),
            sum(col("dcgx")).as("sdcg"))
          .join(broadcast(lcnt), "label")
          .select(col("label"), col("n_queries"), col("n_label"),
            (col("smrr").cast("double") /
              (lit(2520.0) * col("n_queries"))).as("mrr"),
            // greatest(...,1): a singleton label has no relevant docs;
            // hits are 0 there, so clamping the denominator keeps the
            // metric finite (0) instead of ANSI-dividing by zero
            (col("shits").cast("double") /
              (col("n_queries") *
                least(greatest(col("n_label") - 1, lit(1L)), lit(10L)))
                .cast("double")).as("recall_at_10"),
            (col("sdcg").cast("double") /
              (lit(512.0) * col("n_queries"))).as("dcg_at_10"))
      }),

    // Blocking-quality report (the entity-resolution pair of metrics):
    // pairs-completeness (what fraction of q41's true near-dup pairs
    // land in the same cheap block) and reduction ratio (what fraction
    // of C(n,2) the blocking key avoids scoring). The (lang,
    // n_chars÷64) key is deliberately naive — the report is the
    // operator; it tells you whether that key may replace LSH for a
    // first pass. All counts exact; two single divisions.
    QueryDef(
      "q223_blocking_quality",
      Some(s"""
        WITH $dkShingles,
        sh2 AS (SELECT doc_id, len(shsd) AS nsh, unnest(shsd) AS sh
                FROM (SELECT doc_id, list_distinct(
                        list_transform(shs, g -> ${dkHash60("g")})) shsd
                      FROM sarr)),
        kept AS (SELECT sh FROM sh2 GROUP BY sh
                 HAVING count(*) <= 1000),
        truth AS (SELECT * FROM (
            SELECT da, db,
                   CAST(common AS DOUBLE)/(na+nb-common) AS jac
            FROM (SELECT a.doc_id da, b.doc_id db, a.nsh na, b.nsh nb,
                         count(*) common
                  FROM sh2 a JOIN sh2 b
                    ON a.sh = b.sh AND a.doc_id < b.doc_id
                  JOIN kept k ON a.sh = k.sh
                  GROUP BY 1, 2, 3, 4))
          WHERE jac >= 0.2),
        bl AS (SELECT doc_id, lang, n_chars // 64 AS bkt
               FROM documents),
        tb AS (SELECT (a.lang = b.lang AND a.bkt = b.bkt) AS same_block
               FROM truth tr
               JOIN bl a ON tr.da = a.doc_id
               JOIN bl b ON tr.db = b.doc_id),
        ts AS (SELECT CAST(count(*) AS BIGINT) AS n_truth,
                      coalesce(count(*) FILTER (WHERE same_block), 0)
                        AS n_caught
               FROM tb),
        cs AS (SELECT CAST(sum(c*(c-1)//2) AS BIGINT) AS n_cand_pairs
               FROM (SELECT count(*) AS c FROM bl GROUP BY lang, bkt)),
        ns AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
        SELECT n_truth, n_caught,
               CASE WHEN n_truth > 0
                    THEN CAST(n_caught AS DOUBLE)
                         / CAST(n_truth AS DOUBLE) END
                 AS pairs_completeness,
               n_cand_pairs,
               n*(n-1)//2 AS n_all_pairs,
               1.0 - CAST(n_cand_pairs AS DOUBLE)
                     / CAST(n*(n-1)//2 AS DOUBLE) AS reduction_ratio
        FROM ts CROSS JOIN cs CROSS JOIN ns"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        val truth = TextOps.ngramJaccardPairs(docs, "doc_id", "text",
          minJac = 0.2, maxDf = 1000).barrier()
        val bl = docs.select(col("doc_id"), col("lang"),
          expr("n_chars div 64").as("bkt")).barrier()
        val tb = truth
          .join(bl.select(col("doc_id").as("doc_a"),
            col("lang").as("la"), col("bkt").as("ba")), Seq("doc_a"))
          .join(bl.select(col("doc_id").as("doc_b"),
            col("lang").as("lb"), col("bkt").as("bb")), Seq("doc_b"))
          .select((col("la") === col("lb") && col("ba") === col("bb"))
            .as("same_block"))
        // a dup-free corpus has an EMPTY tb: count → 0 but the
        // sum-based countIf → NULL, and 0/0 diverges across engines —
        // coalesce the count and gate the ratio on n_truth > 0
        val ts = tb.agg(count(lit(1)).as("n_truth"),
          coalesce(graft.ops.Aggregates.countIf(col("same_block")),
            lit(0L)).as("n_caught"))
        val cs = bl.groupBy(col("lang"), col("bkt"))
          .agg(count(lit(1)).as("c"))
          // c·(c−1) is even ⇒ >>1 is the exact halving; a double
          // division would round above 2^53 (oracle uses `//`)
          .agg(sum(shiftright(col("c") * (col("c") - 1), 1))
            .cast("long").as("n_cand_pairs"))
        val ns = bl.agg(count(lit(1)).as("n"))
        ts.crossJoin(broadcast(cs)).crossJoin(broadcast(ns))
          .select(col("n_truth"), col("n_caught"),
            when(col("n_truth") > 0, col("n_caught").cast("double") /
              col("n_truth").cast("double"))
              .as("pairs_completeness"),
            col("n_cand_pairs"),
            shiftright(col("n") * (col("n") - 1), 1).as("n_all_pairs"),
            (lit(1.0) - col("n_cand_pairs").cast("double") /
              shiftright(col("n") * (col("n") - 1), 1).cast("double"))
              .as("reduction_ratio"))
      }),

    // Dedup threshold-sensitivity curve: q41's true pair mass bucketed
    // by Jaccard decile with a descending cumulative — "how many pairs
    // does each threshold choice remove". The cumulative window runs
    // over ≤8 aggregated band rows, never pairs.
    QueryDef(
      "q224_dedup_threshold_curve",
      Some(s"""
        WITH $dkShingles,
        sh2 AS (SELECT doc_id, len(shsd) AS nsh, unnest(shsd) AS sh
                FROM (SELECT doc_id, list_distinct(
                        list_transform(shs, g -> ${dkHash60("g")})) shsd
                      FROM sarr)),
        kept AS (SELECT sh FROM sh2 GROUP BY sh
                 HAVING count(*) <= 1000),
        truth AS (SELECT * FROM (
            SELECT da, db,
                   CAST(common AS DOUBLE)/(na+nb-common) AS jac
            FROM (SELECT a.doc_id da, b.doc_id db, a.nsh na, b.nsh nb,
                         count(*) common
                  FROM sh2 a JOIN sh2 b
                    ON a.sh = b.sh AND a.doc_id < b.doc_id
                  JOIN kept k ON a.sh = k.sh
                  GROUP BY 1, 2, 3, 4))
          WHERE jac >= 0.02),
        bands AS (SELECT CAST(least(floor(jac * 10), 9) AS BIGINT)
                    AS band,
                       count(*) AS n_pairs
                  FROM truth GROUP BY 1)
        SELECT band,
               CAST(band AS DOUBLE) / 10.0 AS jac_lo,
               n_pairs,
               CAST(sum(n_pairs) OVER (ORDER BY band DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS pairs_at_or_above
        FROM bands"""),
      (s, d) => {
        val truth = TextOps.ngramJaccardPairs(t(s, d, "documents"),
          "doc_id", "text", minJac = 0.02, maxDf = 1000)
        val bands = truth
          .select(least(floor(col("jac") * 10), lit(9.0)).cast("long")
            .as("band"))
          .groupBy(col("band")).agg(count(lit(1)).as("n_pairs"))
        bands.select(col("band"),
          (col("band").cast("double") / 10.0).as("jac_lo"),
          col("n_pairs"),
          sum(col("n_pairs")).over(
            Window.orderBy(col("band").desc)
              .rowsBetween(Window.unboundedPreceding,
                Window.currentRow)).cast("long")
            .as("pairs_at_or_above"))
      }),

    // Group-level MinHash: per-source signature = elementwise min of
    // doc signatures (= the signature of the union of shingle sets —
    // min is associative/commutative/idempotent, so group signatures
    // MERGE across shards without co-locating documents), then
    // source×source slot agreement as a coarse Jaccard screen
    // (±1/√4; q168's KMV refines, q41 exacts).
    QueryDef(
      "q225_group_minhash",
      Some(s"""
        WITH $dkMinhashSigs,
        gs AS (SELECT d.source,
                      min(sig_0) AS g0, min(sig_1) AS g1,
                      min(sig_2) AS g2, min(sig_3) AS g3
               FROM sigs JOIN documents d USING (doc_id)
               GROUP BY 1)
        SELECT a.source AS source_a, b.source AS source_b,
               CAST((a.g0 = b.g0)::INT + (a.g1 = b.g1)::INT
                  + (a.g2 = b.g2)::INT + (a.g3 = b.g3)::INT AS BIGINT)
                 AS n_match,
               CAST((a.g0 = b.g0)::INT + (a.g1 = b.g1)::INT
                  + (a.g2 = b.g2)::INT + (a.g3 = b.g3)::INT AS DOUBLE)
                 / 4.0 AS jaccard_est
        FROM gs a JOIN gs b ON a.source < b.source"""),
      (s, d) => {
        val gs = TextOps.groupMinhash(t(s, d, "documents"), "doc_id",
          "text", "source").barrier()
        val matches = (0 to 3).map(i =>
          when(col(s"a.sig_$i") === col(s"b.sig_$i"), 1L)
            .otherwise(0L)).reduce(_ + _)
        // the group frame is |sources| rows — broadcast the probe side
        // so the non-equi pairing is a BNLJ, never a CartesianProduct
        gs.as("a").join(broadcast(gs.as("b")),
            col("a.source") < col("b.source"))
          .select(col("a.source").as("source_a"),
            col("b.source").as("source_b"),
            matches.as("n_match"),
            (matches.cast("double") / 4.0).as("jaccard_est"))
      }),

    // LSH-graph transitivity: global clustering coefficient
    // 3·triangles / wedges of the q43 candidate graph — the number
    // that justifies (or indicts) running connected components over
    // LSH candidates: high transitivity means buckets capture genuine
    // duplicate CLIQUES, low means chains of accidental collisions
    // that components would wrongly glue. Wedge space is structurally
    // bounded by the LSH bucket cap (degree ≤ 4·(cap−1)); exact
    // integers, one division.
    QueryDef(
      "q226_lsh_transitivity",
      Some(s"""
        WITH $dkLshCand,
        e AS (SELECT DISTINCT doc_a AS src, doc_b AS dst FROM cand),
        deg AS (SELECT v, count(*) AS deg FROM
                  (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)
                GROUP BY 1),
        w AS (SELECT CAST(sum(deg*(deg-1)//2) AS BIGINT) AS n_wedges
              FROM deg),
        tri AS (SELECT count(*) AS t FROM
                  (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
                   FROM e e1 JOIN e e2 ON e1.dst = e2.src) wdg
                JOIN e e3 ON wdg.a = e3.src AND wdg.c = e3.dst),
        ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e)
        SELECT n_edges, n_wedges, CAST(t AS BIGINT) AS n_triangles,
               CASE WHEN n_wedges > 0
                    THEN 3.0 * CAST(t AS DOUBLE)
                         / CAST(n_wedges AS DOUBLE)
                    ELSE 0.0 END AS transitivity
        FROM ne CROSS JOIN w CROSS JOIN tri"""),
      (s, d) => {
        val cand = TextOps.lshCandidatePairs(
          TextOps.minhashSignatures(
            TextOps.exactDedupFirst(t(s, d, "documents"), "doc_id",
              "text"), "doc_id", "text"), "doc_id")
        val e = cand.select(col("doc_a").as("src"),
          col("doc_b").as("dst")).distinct().barrier()
        val ne = e.agg(count(lit(1)).as("n_edges"))
        val w = e.select(explode(array(col("src"), col("dst"))).as("v"))
          .groupBy(col("v")).agg(count(lit(1)).as("deg"))
          .agg(sum(shiftright(col("deg") * (col("deg") - 1), 1))
            .cast("long").as("n_wedges"))
        // triangle-free graph: the global agg over the empty per-vertex
        // frame yields NULL — coalesce to 0 to match the oracle's count
        val tri = graft.ops.Graphs.triangleCounts(e)
          .agg(coalesce((sum(col("n_triangles")) / 3).cast("long"),
            lit(0L)).as("t"))
        ne.crossJoin(broadcast(w)).crossJoin(broadcast(tri))
          .select(col("n_edges"), col("n_wedges"),
            col("t").as("n_triangles"),
            when(col("n_wedges") > 0,
              lit(3.0) * col("t").cast("double") /
                col("n_wedges").cast("double"))
              .otherwise(lit(0.0)).as("transitivity"))
      }),

    // SimHash Hamming calibration: the 60-bit Hamming-distance
    // histogram of TRUE near-dup pairs (exact Jaccard ≥ 0.5) next to
    // hash-bucket-sampled BACKGROUND pairs — the two curves whose gap
    // picks q77's maxHamming threshold (dups pile into the low bands,
    // background centers near 30 bits). Pure integer bands; the
    // background sample is an equi-join (q218's trick), never a
    // filtered cross join.
    QueryDef(
      "q229_simhash_hamming",
      Some(s"""
        WITH $dkShingles,
        sh2 AS (SELECT doc_id, len(shsd) AS nsh, unnest(shsd) AS sh
                FROM (SELECT doc_id, list_distinct(
                        list_transform(shs, g -> ${dkHash60("g")})) shsd
                      FROM sarr)),
        kept AS (SELECT sh FROM sh2 GROUP BY sh
                 HAVING count(*) <= 1000),
        truth AS (SELECT * FROM (
            SELECT da, db,
                   CAST(common AS DOUBLE)/(na+nb-common) AS jac
            FROM (SELECT a.doc_id da, b.doc_id db, a.nsh na, b.nsh nb,
                         count(*) common
                  FROM sh2 a JOIN sh2 b
                    ON a.sh = b.sh AND a.doc_id < b.doc_id
                  JOIN kept k ON a.sh = k.sh
                  GROUP BY 1, 2, 3, 4))
          WHERE jac >= 0.5),
        tk AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok
               FROM documents),
        fq AS (SELECT doc_id, tok, count(*) AS freq FROM tk
               GROUP BY 1, 2),
        hh AS (SELECT doc_id, freq, ${dkHash60("tok")} AS hv FROM fq),
        bs AS (SELECT doc_id, j,
                      sum(CASE WHEN (hv >> CAST(j AS INT)) & 1 = 1
                               THEN freq ELSE -freq END) AS sgn
               FROM hh CROSS JOIN range(0,60) r(j) GROUP BY 1, 2),
        sims AS (SELECT doc_id,
                   CAST(sum(CASE WHEN sgn > 0
                     THEN (1::BIGINT << CAST(j AS INT))
                     ELSE 0 END) AS BIGINT) AS simhash
                 FROM bs GROUP BY 1),
        bg AS (SELECT a.doc_id AS da, b.doc_id AS db FROM
                 (SELECT doc_id, ${dkHash60(
          "CAST(doc_id AS VARCHAR)||':shbg'")} % 16 AS bk
                  FROM documents) a
                 JOIN (SELECT doc_id, ${dkHash60(
          "CAST(doc_id AS VARCHAR)||':shbg'")} % 16 AS bk
                       FROM documents) b
                   ON a.bk = b.bk AND a.doc_id < b.doc_id),
        pr AS (SELECT da, db, 'dup' AS label FROM truth
               UNION ALL
               SELECT da, db, 'background' FROM bg),
        hm AS (SELECT pr.label,
                      CAST(bit_count(xor(x.simhash, y.simhash)) AS INT)
                        AS hamming
               FROM pr JOIN sims x ON pr.da = x.doc_id
                       JOIN sims y ON pr.db = y.doc_id)
        SELECT label, CAST(hamming // 4 AS BIGINT) AS band,
               CAST((hamming // 4) * 4 AS BIGINT) AS ham_lo,
               count(*) AS n_pairs
        FROM hm GROUP BY 1, 2, 3"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        val sh = TextOps.simhash60(docs, "doc_id", "text").barrier()
        val truth = TextOps.ngramJaccardPairs(docs, "doc_id", "text",
          minJac = 0.5, maxDf = 1000)
        // buckets=16 pins the ORACLE's fixed modulus — a calibration
        // -sample setting (backgroundPairSample's scaladoc: at corpus
        // scale the caller grows buckets ∝ n)
        val bg = TextOps.backgroundPairSample(docs, "doc_id",
          buckets = 16L)
        val pr = truth.select(col("doc_a"), col("doc_b"),
            lit("dup").as("label"))
          .unionByName(bg.select(col("doc_a"), col("doc_b"),
            lit("background").as("label")))
        TextOps.hammingForPairs(pr, sh, "doc_id", "simhash")
          .select(col("label"),
            expr("CAST(hamming div 4 AS BIGINT)").as("band"),
            expr("CAST((hamming div 4) * 4 AS BIGINT)").as("ham_lo"))
          .groupBy(col("label"), col("band"), col("ham_lo"))
          .agg(count(lit(1)).as("n_pairs"))
      }),

    // Cross-modal PAIRED near-dup (the captioned-corpus keep
    // decision): a (image, caption) doc pair is a duplicate only
    // when BOTH rails agree — caption 3-shingle Jaccard ≥ 0.2 (q41's
    // df-capped inverted index) AND image dHash Hamming ≤ 4 (q263's
    // kernel). The caption rail PROPOSES (captions are near-unique,
    // so its pair set is the small one — 256 vs 388k image pairs at
    // sf0.1) and the image rail VERIFIES: two hash lookups + one XOR
    // per candidate, no visual banding pass at all. The decode is
    // restricted to pair PARTICIPANTS (semi-join before
    // syntheticImages): the verify rail only ever reads hashes of
    // proposed docs, so the codec cost scales with the caption pair
    // set, not the corpus (sf1: 19.1 s → 3.3 s; identical results —
    // the inner join reads no other rows).
    QueryDef(
      "q274_paired_caption_neardup",
      Some(s"""
        WITH $dkPairedCaptionPairs
        SELECT doc_a, doc_b, jac, hamming FROM pp"""),
      (s, d) => pairedCaptionPairs(s, d)),

    // Paired-dedup survivorship: the q274 pair set → connected
    // components → corpus-wide keep-list (q267/q271's role for the
    // paired modality). Same-image/different-caption and
    // same-caption/different-image docs all stay kept; only pairs
    // both rails agreed on collapse to the component minimum.
    QueryDef(
      "q275_paired_caption_keep_list",
      Some(s"""
        WITH RECURSIVE $dkPairedCaptionPairs,
        edges AS (SELECT doc_a s, doc_b dst FROM pp
                  UNION SELECT doc_b, doc_a FROM pp),
        reach AS (
          SELECT s AS node, s AS r FROM edges
          UNION
          SELECT e.s, reach.r FROM edges e
          JOIN reach ON e.dst = reach.node),
        comp AS (SELECT node, min(r) AS cluster FROM reach GROUP BY 1)
        SELECT d.doc_id,
               coalesce(comp.cluster, d.doc_id) AS cluster,
               (comp.cluster IS NULL OR comp.cluster = d.doc_id)
                 AS is_kept
        FROM documents d LEFT JOIN comp ON comp.node = d.doc_id"""),
      (s, d) => {
        // barriered like q267/q271's pair stages: the caption-index +
        // decode chain must not inline into every component round's
        // plan (or the final keep-list join)
        val pairs = pairedCaptionPairs(s, d).barrier()
        DedupClusters.keepList(
          t(s, d, "documents").select(col("doc_id")), "doc_id",
          pairs, "doc_a", "doc_b", maxIters = 100)
      })
  )
}
