package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llmops.{Classifier, Drift, LanguageModel, Privacy, TextOps}
import graft.ops.Aggregates

/** Corpus-evaluation audits (round 9): the statistics an operator
  * reads before trusting a corpus or a cheap classifier at 100 TB —
  * Good-Turing unseen-vocabulary mass (is more crawl worth it?) and
  * classifier calibration (can this score gate a sampling policy?).
  * Both are exact-integer aggregates with single IEEE divisions (and
  * the ordered-fold idiom where doubles must sum), so the DuckDB
  * oracle hash-matches.
  */
object EvalQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.loadSpread(s, d, n)

  /** DuckDB fragment: 0.0-seeded ordered double fold (the
    * engine-wide deterministic-sum idiom, LmQueries precedent). */
  private def dkOrderedSum(x: String, ord: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list($x ORDER BY $ord)), (a, b) -> a + b)"

  /** DuckDB fragment: 60-bit md5 hash (TextOps.hash60). */
  private def dkHash60(e: String): String =
    s"('0x'||substr(md5($e),1,15))::BIGINT"

  /** DuckDB fragment: the q102 deterministic split bucket of doc_id
    * (Mixture.trainSplit — hash60(id ∥ ":split") mod 100). */
  private def dkSplitBucket: String =
    s"${dkHash60("CAST(doc_id AS VARCHAR)||':split'")} % 100"


  /** DuckDB fragment: one column of the NULL-explicit, length-prefixed
    * class-key encoding (Privacy.classKey) — `v<len>:<value>` or the
    * `n` sentinel for NULL, so NULL keys still draw noise and no
    * separator-containing value can collide two classes. */
  private def dkKeyCol(e: String): String =
    s"coalesce('v' || length(CAST($e AS VARCHAR)) || ':' " +
      s"|| CAST($e AS VARCHAR), 'n')"

  /** q282's DuckDB oracle: the iterative finest-first ladder release
    * (Privacy.kAnonymizeBands) as a chained CTE per level — each
    * level's window count runs only over rows not released at a finer
    * level, mirroring the Scala loop round for round. */
  private lazy val kGenOracleSql: String = {
    val divisors = Seq(1000L, 2000L, 4000L, 8000L)
    val ladder = divisors.map(Option(_)) :+ Option.empty[Long]
    val levels = ladder.zipWithIndex.map { case (div, lvl) =>
      val bandE = div
        .map(d => s"CAST(floor(c_acctbal / $d.0) AS BIGINT)")
        .getOrElse("CAST(NULL AS BIGINT)")
      s"""
        b$lvl AS (SELECT *, $bandE AS band FROM r$lvl),
        s$lvl AS (SELECT *, count(*) OVER (PARTITION BY nation,
                    segment, band) AS class_size
                  FROM b$lvl),
        p$lvl AS (SELECT c_custkey, $lvl AS level, band, class_size
                  FROM s$lvl WHERE class_size >= 5),
        r${lvl + 1} AS (SELECT c_custkey, nation, segment, c_acctbal
                        FROM s$lvl WHERE class_size < 5)"""
    }.mkString(",")
    val union = ladder.indices
      .map(l => s"SELECT * FROM p$l").mkString("\n          UNION ALL ")
    s"""
      WITH r0 AS (SELECT c_custkey, c_nationkey AS nation,
                         c_mktsegment AS segment, c_acctbal
                  FROM customer),$levels,
      sel AS (
          $union)
      SELECT c.c_custkey, c.c_nationkey AS nation,
             c.c_mktsegment AS segment,
             COALESCE(sel.level, ${divisors.size + 1}) AS level,
             sel.band AS band,
             COALESCE(sel.class_size, 0) AS class_size,
             sel.class_size IS NULL AS suppressed
      FROM customer c LEFT JOIN sel ON c.c_custkey = sel.c_custkey"""
  }

  /** Shared CTE chain for the hashed linear classifier (Classifier
    * .hashedBigramMargin): per-doc margin over unigram + bigram
    * features in 4096 Knuth-scrambled weight buckets (q257/q258). */
  private lazy val dkMarginCtes: String =
    s"""tk AS (SELECT doc_id, source, string_split(text, ' ') AS t
      |        FROM documents),
      |feats AS (
      |  SELECT doc_id, source, unnest(t) AS f FROM tk
      |  UNION ALL
      |  SELECT doc_id, source, t[i+1] || ' ' || t[i+2] AS f
      |  FROM tk, unnest(range(0, len(t) - 1)) r(i)),
      |w AS (SELECT doc_id, source,
      |             ((${dkHash60("f")} % 4096) * 2654435761)
      |               % 1001 - 500 AS wi
      |      FROM feats),
      |dm AS (SELECT doc_id, source,
      |              CAST(sum(wi) AS BIGINT) AS sw,
      |              count(*) AS nf
      |       FROM w GROUP BY 1, 2),
      |sc AS (SELECT doc_id, source,
      |              CAST(sw AS DOUBLE)
      |                / (CAST(500.0 AS DOUBLE)
      |                   * CAST(nf AS DOUBLE)) AS margin
      |       FROM dm)""".stripMargin

  /** q290/q292's DuckDB CTE chain: replay `epochs` full-batch epochs
    * of the fast-sigmoid logistic trainer
    * (Classifier.trainHashedLogistic) over the bounded weight
    * table — same featurization as dkMarginCtes (unigrams + bigrams,
    * hash60 % 4096), labels y = (lang = 'en'), every margin/gradient
    * fold the tie-free floor-quantized integer sum (⌊v·10¹²⌋ — a
    * double→DECIMAL cast would NOT replay: DuckDB rounds v·10^s
    * computed in double arithmetic while Spark rounds the exact
    * binary expansion; floor of the identical IEEE product has no
    * such divergence). No libm: the link is the rational fast
    * sigmoid. `where` filters the TRAINING docs (q293 trains on the
    * deterministic hash split's train side only); `buckets`
    * parameterizes the hash width (q294 pins a second point of the
    * trainer's determinism contract at B=256). */
  private def clfTrainCtes(epochs: Int, buckets: Int = 4096,
      where: String = "", lr: Double = 1.0, l2: Double = 0.0)
      : String = {
    // the same Scala double the Spark side folds into lit(decay) —
    // both engines parse the decimal repr to the identical IEEE
    // value, and ·1.0 is a bit-exact no-op when l2 = 0
    val decay = 1.0 - lr * l2
    val epochCtes = (1 to epochs).map { e =>
      s"""
        m$e AS (SELECT f.doc_id, f.y,
                  CAST(sum(CAST(floor(
                      (coalesce(w.w, CAST(0.0 AS DOUBLE)) * f.x)
                      * 1000000000000.0) AS HUGEINT)) AS DOUBLE)
                    / 1000000000000.0 AS m
                FROM feats f LEFT JOIN w${e - 1} w USING (bucket)
                GROUP BY 1, 2),
        r$e AS (SELECT doc_id,
                  (CAST(0.5 AS DOUBLE)
                   + m / (CAST(2.0 AS DOUBLE)
                          * (CAST(1.0 AS DOUBLE) + abs(m)))) - y AS r
                FROM m$e),
        g$e AS (SELECT f.bucket,
                  CAST(sum(CAST(floor((r.r * f.x)
                      * 1000000000000.0) AS HUGEINT)) AS DOUBLE)
                    / 1000000000000.0 / (SELECT n FROM nd) AS g
                FROM feats f JOIN r$e r USING (doc_id) GROUP BY 1),
        w$e AS (SELECT bucket,
                  coalesce(w.w, CAST(0.0 AS DOUBLE))
                    * CAST($decay AS DOUBLE)
                    - CAST($lr AS DOUBLE)
                      * coalesce(g.g, CAST(0.0 AS DOUBLE)) AS w
                FROM w${e - 1} w FULL JOIN g$e g USING (bucket))"""
    }.mkString(",")
    s"""tk AS (SELECT doc_id,
                    CASE WHEN lang = 'en' THEN CAST(1.0 AS DOUBLE)
                         ELSE CAST(0.0 AS DOUBLE) END AS y,
                    string_split(text, ' ') AS t
                  FROM documents $where),
      fe AS (SELECT doc_id, y, unnest(t) AS f FROM tk
             UNION ALL
             SELECT doc_id, y, t[i+1] || ' ' || t[i+2] AS f
             FROM tk, unnest(range(0, len(t) - 1)) r(i)),
      fc AS (SELECT doc_id, y, ${dkHash60("f")} % $buckets AS bucket,
                    count(*) AS cnt
             FROM fe GROUP BY 1, 2, 3),
      feats AS (SELECT doc_id, y, bucket,
                  CAST(cnt AS DOUBLE)
                    / CAST(sum(cnt) OVER (PARTITION BY doc_id)
                        AS DOUBLE) AS x
                FROM fc),
      nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n
             FROM feats),
      w0 AS (SELECT CAST(NULL AS BIGINT) AS bucket,
                    CAST(NULL AS DOUBLE) AS w WHERE 1=0),$epochCtes"""
  }

  /** q290's full oracle: the CTE chain + the weight-table select. */
  private def clfTrainOracleSql(epochs: Int): String =
    s"""
      WITH ${clfTrainCtes(epochs)}
      SELECT bucket, w FROM w$epochs"""

  val defs: Seq[QueryDef] = Seq(

    // TRAIN the CCNet-style quality gate in-engine (q257 scores with
    // a pseudo-model; this learns real weights): 3 full-batch epochs
    // of gradient descent on the fast-sigmoid logistic surrogate over
    // the same hashed unigram+bigram features, labels y=(lang='en'),
    // zero init, lr=1. No libm anywhere — the link is rational and
    // every margin/gradient sum is an exact order-free fold of
    // floor-quantized integer terms (⌊v·10¹²⌋ — tie-free where a
    // double→decimal cast measurably diverges across engines), which
    // is what lets DuckDB replay the whole epoch recurrence
    // bit-exactly over the bounded (≤4096-row)
    // weight table. Scale shape: featurize once (barriered), then per
    // epoch two corpus-sized hash aggregations + one broadcast of the
    // weight table; epochs barrier so the plan stays epoch-sized.
    QueryDef(
      "q290_classifier_train",
      Some(clfTrainOracleSql(3)),
      (s, d) =>
        Classifier.trainHashedLogistic(
          t(s, d, "documents")
            .withColumn("y", (col("lang") === "en").cast("int")),
          "doc_id", "y", "text", 4096, epochs = 3, lr = 1.0)),

    // The trained-gate AUDIT — q290's weights applied back through
    // the production scorer (marginWithWeights: same featurization,
    // same tie-free fold, so a training doc's gate margin is
    // bit-identical to its last training margin): per-language doc
    // counts, pass rates at margin ≥ 0, and the doc-id-ordered mean
    // margin. The frame an operator reads before picking a
    // --clf-min-margin for corpus_release_export — q257/q258's shape
    // with LEARNED weights closing the loop. Oracle = the full
    // 3-epoch training replay + one more margin fold with w3.
    QueryDef(
      "q292_classifier_gate",
      Some(s"""
        WITH ${clfTrainCtes(3)},
        sc AS (SELECT f.doc_id,
                 CAST(sum(CAST(floor(
                     (coalesce(w.w, CAST(0.0 AS DOUBLE)) * f.x)
                     * 1000000000000.0) AS HUGEINT)) AS DOUBLE)
                   / 1000000000000.0 AS margin
               FROM feats f LEFT JOIN w3 w USING (bucket)
               GROUP BY 1),
        g AS (SELECT s.doc_id, d.lang, s.margin
              FROM sc s JOIN documents d USING (doc_id))
        SELECT lang, count(*) AS n_docs,
               count(*) FILTER (WHERE margin >= CAST(0.0 AS DOUBLE))
                 AS n_pass,
               ${dkOrderedSum("margin", "doc_id")}
                 / CAST(count(*) AS DOUBLE) AS mean_margin
        FROM g GROUP BY 1"""),
      (s, d) => {
        val docs = t(s, d, "documents")
          .withColumn("y", (col("lang") === "en").cast("int"))
        val w = Classifier.trainHashedLogistic(docs, "doc_id", "y",
          "text", 4096, epochs = 3, lr = 1.0)
        Classifier
          .marginWithWeights(docs, "doc_id", "text", Seq("lang"), w,
            4096)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            coalesce(Aggregates.countIf(col("margin") >= 0.0),
              lit(0L)).as("n_pass"),
            (Aggregates.orderedSum(col("doc_id"), col("margin"))
              / count(lit(1)).cast("double")).as("mean_margin"))
      }),

    // HELD-OUT threshold selection (Classifier.holdoutThresholdTable)
    // — the step q292 leaves open: q292 audits the gate on its own
    // training set, where the fit is optimistic by construction; a
    // real curation gate picks --clf-min-margin from data the trainer
    // never saw. Train on the q102 deterministic hash split's train
    // side, score the UNSEEN val side through the production scorer,
    // and emit per candidate threshold the held-out pass rate and
    // precision/recall against the label — the frame an operator
    // reads to freeze the gate (test side untouched, in reserve).
    // Oracle = the training replay restricted to the train split +
    // a second featurize/margin fold over the val split + the
    // threshold-grid aggregation; every count exact-integer, every
    // double a single IEEE division.
    QueryDef(
      "q293_classifier_holdout",
      Some(s"""
        WITH ${clfTrainCtes(3,
          where = s"WHERE $dkSplitBucket < 80")},
        hk AS (SELECT doc_id,
                 CASE WHEN lang = 'en' THEN CAST(1.0 AS DOUBLE)
                      ELSE CAST(0.0 AS DOUBLE) END AS y,
                 string_split(text, ' ') AS t
               FROM documents
               WHERE $dkSplitBucket >= 80
                 AND $dkSplitBucket < 90),
        hfe AS (SELECT doc_id, y, unnest(t) AS f FROM hk
                UNION ALL
                SELECT doc_id, y, t[i+1] || ' ' || t[i+2] AS f
                FROM hk, unnest(range(0, len(t) - 1)) r(i)),
        hfc AS (SELECT doc_id, y, ${dkHash60("f")} % 4096 AS bucket,
                  count(*) AS cnt
                FROM hfe GROUP BY 1, 2, 3),
        hfeats AS (SELECT doc_id, y, bucket,
                     CAST(cnt AS DOUBLE)
                       / CAST(sum(cnt) OVER (PARTITION BY doc_id)
                           AS DOUBLE) AS x
                   FROM hfc),
        hsc AS (SELECT f.doc_id, f.y,
                  CAST(sum(CAST(floor(
                      (coalesce(w.w, CAST(0.0 AS DOUBLE)) * f.x)
                      * 1000000000000.0) AS HUGEINT)) AS DOUBLE)
                    / 1000000000000.0 AS margin
                FROM hfeats f LEFT JOIN w3 w USING (bucket)
                GROUP BY 1, 2),
        mm AS (SELECT min(margin) AS mn, max(margin) AS mx FROM hsc),
        th AS (SELECT mn + (mx - mn)
                 * (CAST(i AS DOUBLE) / CAST(8.0 AS DOUBLE))
                 AS threshold
               FROM mm, unnest(range(0, 9)) r(i)),
        ag AS (SELECT threshold, count(*) AS n_docs,
                 count(*) FILTER (WHERE margin >= threshold)
                   AS n_pass,
                 count(*) FILTER (WHERE margin >= threshold
                   AND y = CAST(1.0 AS DOUBLE)) AS tp,
                 count(*) FILTER (WHERE margin >= threshold
                   AND y <> CAST(1.0 AS DOUBLE)) AS fp,
                 count(*) FILTER (WHERE margin < threshold
                   AND y = CAST(1.0 AS DOUBLE)) AS fn
               FROM hsc CROSS JOIN th GROUP BY 1)
        SELECT threshold, n_docs, n_pass, tp, fp, fn,
               CAST(n_pass AS DOUBLE) / CAST(n_docs AS DOUBLE)
                 AS pass_rate,
               CASE WHEN n_pass > 0 THEN
                 CAST(tp AS DOUBLE) / CAST(n_pass AS DOUBLE)
               END AS precision,
               CASE WHEN tp + fn > 0 THEN
                 CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)
               END AS recall
        FROM ag"""),
      (s, d) =>
        Classifier.holdoutThresholdTable(
          t(s, d, "documents")
            .withColumn("y", (col("lang") === "en").cast("int")),
          "doc_id", "y", "text", 4096, gridSize = 8,
          epochs = 3, lr = 1.0)),

    // The trainer's determinism contract at a SECOND parameter point
    // (B=256 hash buckets, 5 epochs, lr=0.5): q290 pins one point of
    // the (buckets, epochs, lr) surface; this pins that the
    // bit-exact epoch replay is a property of the algorithm, not of
    // one parameter choice — more collisions per bucket (256 wide),
    // a longer epoch recurrence (5 deep), and a non-unit lr all
    // replay exactly.
    QueryDef(
      "q294_classifier_train_b256",
      Some(s"""
        WITH ${clfTrainCtes(5, buckets = 256, lr = 0.5)}
        SELECT bucket, w FROM w5"""),
      (s, d) =>
        Classifier.trainHashedLogistic(
          t(s, d, "documents")
            .withColumn("y", (col("lang") === "en").cast("int")),
          "doc_id", "y", "text", 256, epochs = 5, lr = 0.5)),

    // L2-regularized training (λ = 0.01): the decay step
    // w ← w·(1−lr·λ) − lr·g is one extra broadcast-side IEEE
    // multiply per epoch — still integer-fold exact, so the full
    // epoch recurrence WITH shrinkage replays bit-for-bit. The
    // regularizer is the defensible default against the
    // hash-collision overfit the planted-corpus spec probes: decayed
    // weights bound how much mass a memorized bucket can hoard.
    QueryDef(
      "q295_classifier_train_l2",
      Some(s"""
        WITH ${clfTrainCtes(3, l2 = 0.01)}
        SELECT bucket, w FROM w3"""),
      (s, d) =>
        Classifier.trainHashedLogistic(
          t(s, d, "documents")
            .withColumn("y", (col("lang") === "en").cast("int")),
          "doc_id", "y", "text", 4096, epochs = 3, lr = 1.0,
          l2 = 0.01)),

    // Good-Turing vocabulary audit per source: counts-of-counts
    // N1..N5 over the term-frequency table, unseen probability mass
    // p0 = N1/N (the classic Good-Turing estimate: the chance the
    // NEXT token drawn from this source is a type never seen), and
    // the first two smoothed-count ratios r* = (r+1)·N_{r+1}/N_r.
    // The curation read: a source with high p0 still yields new
    // vocabulary — more crawl helps; p0 ≈ 0 means the source is
    // exhausted and further ingestion only re-weights. One tokenize
    // + two hash aggregations; every emitted double is one exact
    // integer ratio, so scale changes nothing about the math.
    QueryDef(
      "q243_good_turing",
      Some("""
        WITH tok AS (SELECT source, unnest(string_split(text, ' ')) term
                     FROM documents),
        tf AS (SELECT source, term, count(*) AS c FROM tok GROUP BY 1, 2),
        cc AS (SELECT source,
                      CAST(sum(c) AS BIGINT) AS n_tokens,
                      count(*) AS vocab,
                      count(*) FILTER (WHERE c = 1) AS n1,
                      count(*) FILTER (WHERE c = 2) AS n2,
                      count(*) FILTER (WHERE c = 3) AS n3,
                      count(*) FILTER (WHERE c = 4) AS n4,
                      count(*) FILTER (WHERE c = 5) AS n5
               FROM tf GROUP BY 1)
        SELECT source, n_tokens, vocab, n1, n2, n3, n4, n5,
               CAST(n1 AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS p_unseen,
               CASE WHEN n1 > 0 THEN 2.0 * CAST(n2 AS DOUBLE)
                                     / CAST(n1 AS DOUBLE) END AS r_star_1,
               CASE WHEN n2 > 0 THEN 3.0 * CAST(n3 AS DOUBLE)
                                     / CAST(n2 AS DOUBLE) END AS r_star_2
        FROM cc"""),
      (s, d) => {
        val tf = t(s, d, "documents")
          .select(col("source"),
            explode(TextOps.tokens(col("text"))).as("term"))
          .groupBy(col("source"), col("term"))
          .agg(count(lit(1)).as("c"))
        def nr(r: Int) =
          Aggregates.countIf(col("c") === r).as(s"n$r")
        tf.groupBy(col("source"))
          .agg(sum(col("c")).as("n_tokens"),
            count(lit(1)).as("vocab"),
            nr(1), nr(2), nr(3), nr(4), nr(5))
          .select(col("source"), col("n_tokens"), col("vocab"),
            col("n1"), col("n2"), col("n3"), col("n4"), col("n5"),
            (col("n1").cast("double") / col("n_tokens").cast("double"))
              .as("p_unseen"),
            when(col("n1") > 0,
              lit(2.0) * col("n2").cast("double")
                / col("n1").cast("double")).as("r_star_1"),
            when(col("n2") > 0,
              lit(3.0) * col("n3").cast("double")
                / col("n2").cast("double")).as("r_star_2"))
      }),

    // Classifier-calibration audit: the q50 quality score read as a
    // P(doc is English) predictor against the lang label — the
    // reliability diagram + ECE + Brier an operator checks before
    // letting a cheap score gate a sampling policy. Ten fixed score
    // bins; per bin the mean score ("confidence", ordered doc-id
    // fold), the empirical positive rate ("accuracy", exact integer
    // ratio), and |conf − acc|; globally ECE = Σ (n_b/N)·gap_b (a
    // 10-term bin-ordered fold) and the Brier score ((s−y)² summed by
    // the doc-id fold). Two hash aggregations over the corpus + a
    // 10-row tail; the one-row totals broadcast. The emitted table is
    // the 10-bin diagram with the global metrics carried on each row
    // (a reporting frame, q193's top-k-report shape).
    QueryDef(
      "q244_quality_calibration",
      Some(s"""
        WITH sc0 AS (
          SELECT doc_id,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                 string_split(text, ' ') AS toks, text
          FROM documents),
        sc1 AS (
          SELECT doc_id, y,
                 CAST(len(toks) AS BIGINT) AS nt,
                 CAST(length(replace(text, ' ', '')) AS BIGINT) AS nc,
                 CAST(len(list_filter(toks, x -> list_contains(
                   ['the','a','of','and','to','in','is','it'], x)))
                   AS BIGINT) AS he
          FROM sc0),
        sc AS (
          SELECT doc_id, y,
                 CAST(800*he + 6*nt*least(nt, 100) + 75*least(nc, 8*nt)
                   AS DOUBLE) / (2000.0 * CAST(nt AS DOUBLE)) AS s
          FROM sc1),
        b AS (
          SELECT doc_id, y, s,
                 least(CAST(floor(s * 10) AS BIGINT), 9) AS bin
          FROM sc),
        bins AS (
          SELECT bin, count(*) AS n_docs,
                 count(*) FILTER (WHERE y = 1) AS n_pos,
                 ${dkOrderedSum("s", "doc_id")}
                   / CAST(count(*) AS DOUBLE) AS confidence
          FROM b GROUP BY 1),
        bins2 AS (
          SELECT *, CAST(n_pos AS DOUBLE) / CAST(n_docs AS DOUBLE)
                      AS accuracy,
                 abs(confidence - CAST(n_pos AS DOUBLE)
                   / CAST(n_docs AS DOUBLE)) AS gap
          FROM bins),
        tot AS (
          SELECT count(*) AS n_total,
                 ${dkOrderedSum("(s - CAST(y AS DOUBLE)) * " +
                   "(s - CAST(y AS DOUBLE))", "doc_id")}
                   / CAST(count(*) AS DOUBLE) AS brier
          FROM b),
        ece AS (
          SELECT ${dkOrderedSum(
                  "(CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE))" +
                  " * gap", "bin")} AS ece
          FROM bins2 CROSS JOIN tot)
        SELECT bin, n_docs, n_pos, confidence, accuracy, gap,
               ece, brier
        FROM bins2 CROSS JOIN tot CROSS JOIN ece"""),
      (s, d) => {
        import graft.core.Checkpoints.BarrierOps
        val scored = t(s, d, "documents")
          .select(col("doc_id"),
            when(col("lang") === "en", 1L).otherwise(0L).as("y"),
            TextOps.qualityColumns(col("text"))(3))
          .select(col("doc_id"), col("y"),
            col("quality_score").as("s"),
            least(floor(col("quality_score") * 10).cast("long"),
              lit(9L)).as("bin"))
          .barrier() // feeds the bin table AND the global totals
        val bins = scored.groupBy(col("bin"))
          .agg(count(lit(1)).as("n_docs"),
            Aggregates.countIf(col("y") === 1L).as("n_pos"),
            (Aggregates.orderedSum(col("doc_id"), col("s"))
              / count(lit(1)).cast("double")).as("confidence"))
          .withColumn("accuracy",
            col("n_pos").cast("double") / col("n_docs").cast("double"))
          .withColumn("gap", abs(col("confidence") - col("accuracy")))
          .barrier() // feeds the ECE fold AND the output rows
        val tot = scored.agg(
          count(lit(1)).as("n_total"),
          (Aggregates.orderedSum(col("doc_id"),
            (col("s") - col("y").cast("double"))
              * (col("s") - col("y").cast("double")))
            / count(lit(1)).cast("double")).as("brier"))
        val ece = bins.crossJoin(broadcast(tot))
          .agg(Aggregates.orderedSum(col("bin"),
            col("n_docs").cast("double") / col("n_total").cast("double")
              * col("gap")).as("ece"))
        bins.crossJoin(broadcast(tot)).crossJoin(broadcast(ece))
          .select(col("bin"), col("n_docs"), col("n_pos"),
            col("confidence"), col("accuracy"), col("gap"),
            col("ece"), col("brier"))
      }),

    // Content-defined chunking + chunk-level dedup: every doc split
    // at hash-determined boundaries (TextOps.cdcChunks, w=4 grams,
    // mod 16 ⇒ ~19-token expected chunks), each chunk fingerprinted,
    // and each chunk annotated with how many DISTINCT docs carry an
    // identical chunk — passage-grade duplication at sub-document
    // granularity, the unit an incremental re-release deduplicates
    // on. The oracle rebuilds the same spans relationally (cut
    // positions → lag window → list slice).
    QueryDef(
      "q245_cdc_chunks",
      Some("""
        WITH t AS (SELECT doc_id, string_split(text, ' ') toks
                   FROM documents),
        base AS (SELECT doc_id, toks, CAST(len(toks) AS INT) n FROM t),
        grams AS (SELECT doc_id, unnest(range(1, n - 2)) AS j, toks
                  FROM base WHERE n >= 4),
        cuts AS (SELECT doc_id, j + 3 AS e FROM grams
                 WHERE ('0x'||substr(md5(
                         array_to_string(toks[j:j+3], ' ')),1,15))::BIGINT
                       % 16 = 0),
        ends AS (SELECT doc_id, e FROM cuts
                 UNION SELECT doc_id, n FROM base),
        spans AS (SELECT doc_id, e,
                         coalesce(lag(e) OVER (PARTITION BY doc_id
                           ORDER BY e), 0) AS s,
                         CAST(row_number() OVER (PARTITION BY doc_id
                           ORDER BY e) AS INT) - 1 AS chunk_idx
                  FROM ends),
        ch AS (SELECT sp.doc_id, chunk_idx, e - s AS n_tokens,
                      ('0x'||substr(md5(array_to_string(
                        b.toks[s+1:e], ' ')),1,15))::BIGINT AS chunk_hash
               FROM spans sp JOIN base b ON sp.doc_id = b.doc_id),
        sh AS (SELECT chunk_hash,
                      count(DISTINCT doc_id) AS n_docs_sharing
               FROM ch GROUP BY 1)
        SELECT doc_id, chunk_idx, n_tokens, chunk_hash, n_docs_sharing
        FROM ch JOIN sh USING (chunk_hash)"""),
      (s, d) => {
        import graft.core.Checkpoints.BarrierOps
        val ch = TextOps.cdcChunks(t(s, d, "documents"),
          "doc_id", "text").barrier() // chunk rows + sharing counts
        val sharing = ch.groupBy(col("chunk_hash"))
          .agg(countDistinct(col("doc_id")).as("n_docs_sharing"))
        ch.join(sharing, Seq("chunk_hash"))
          .select(col("doc_id"), col("chunk_idx"), col("n_tokens"),
            col("chunk_hash"), col("n_docs_sharing"))
      }),

    // CDC edit-locality, measured: prepend one token to every even
    // doc_id (the worst case for offset-based chunking) and count,
    // per doc, how many distinct chunk fingerprints survive into the
    // edited version — content-defined boundaries resynchronize after
    // the edit (all but the leading chunk survive), while the
    // fixed-stride windows of q67 shift wholesale (near-zero
    // survivors on edited docs, 100% on untouched ones). All-integer
    // output; the audit that justifies chunk-keyed incremental
    // processing.
    QueryDef(
      "q246_cdc_stability",
      Some("""
        WITH v1 AS (SELECT doc_id, text FROM documents),
        v2 AS (SELECT doc_id,
                      CASE WHEN doc_id % 2 = 0 THEN 'EDIT ' || text
                           ELSE text END AS text
               FROM documents),
        t1 AS (SELECT doc_id, string_split(text, ' ') toks FROM v1),
        t2 AS (SELECT doc_id, string_split(text, ' ') toks FROM v2),
        b1 AS (SELECT doc_id, toks, CAST(len(toks) AS INT) n FROM t1),
        b2 AS (SELECT doc_id, toks, CAST(len(toks) AS INT) n FROM t2),
        g1 AS (SELECT doc_id, unnest(range(1, n - 2)) AS j, toks
               FROM b1 WHERE n >= 4),
        g2 AS (SELECT doc_id, unnest(range(1, n - 2)) AS j, toks
               FROM b2 WHERE n >= 4),
        c1 AS (SELECT doc_id, j + 3 AS e FROM g1
               WHERE ('0x'||substr(md5(
                       array_to_string(toks[j:j+3], ' ')),1,15))::BIGINT
                     % 16 = 0),
        c2 AS (SELECT doc_id, j + 3 AS e FROM g2
               WHERE ('0x'||substr(md5(
                       array_to_string(toks[j:j+3], ' ')),1,15))::BIGINT
                     % 16 = 0),
        e1 AS (SELECT doc_id, e FROM c1 UNION SELECT doc_id, n FROM b1),
        e2 AS (SELECT doc_id, e FROM c2 UNION SELECT doc_id, n FROM b2),
        s1 AS (SELECT doc_id, e, coalesce(lag(e) OVER (
                 PARTITION BY doc_id ORDER BY e), 0) AS s FROM e1),
        s2 AS (SELECT doc_id, e, coalesce(lag(e) OVER (
                 PARTITION BY doc_id ORDER BY e), 0) AS s FROM e2),
        h1 AS (SELECT DISTINCT sp.doc_id,
                      ('0x'||substr(md5(array_to_string(
                        b.toks[s+1:e], ' ')),1,15))::BIGINT AS h
               FROM s1 sp JOIN b1 b ON sp.doc_id = b.doc_id),
        h2 AS (SELECT DISTINCT sp.doc_id,
                      ('0x'||substr(md5(array_to_string(
                        b.toks[s+1:e], ' ')),1,15))::BIGINT AS h
               FROM s2 sp JOIN b2 b ON sp.doc_id = b.doc_id),
        f1 AS (SELECT DISTINCT b.doc_id,
                      ('0x'||substr(md5(array_to_string(
                        b.toks[i*16+1 : least(n, (i+1)*16)], ' ')),
                        1,15))::BIGINT AS h
               FROM b1 b, unnest(range(0, (n - 1) // 16 + 1)) r(i)),
        f2 AS (SELECT DISTINCT b.doc_id,
                      ('0x'||substr(md5(array_to_string(
                        b.toks[i*16+1 : least(n, (i+1)*16)], ' ')),
                        1,15))::BIGINT AS h
               FROM b2 b, unnest(range(0, (n - 1) // 16 + 1)) r(i)),
        cdc AS (SELECT h1.doc_id, count(*) AS cdc_total,
                       count(h2.h) AS cdc_shared
                FROM h1 LEFT JOIN h2
                  ON h1.doc_id = h2.doc_id AND h1.h = h2.h
                GROUP BY 1),
        fix AS (SELECT f1.doc_id, count(*) AS fixed_total,
                       count(f2.h) AS fixed_shared
                FROM f1 LEFT JOIN f2
                  ON f1.doc_id = f2.doc_id AND f1.h = f2.h
                GROUP BY 1)
        SELECT doc_id, cdc_total, cdc_shared, fixed_total, fixed_shared
        FROM cdc JOIN fix USING (doc_id)"""),
      (s, d) => {
        // one tagged union + presence-flag aggregation per chunking
        // family — two exchanges each (vs a 4-way distinct + two
        // joins, which planned to 10), and the per-(doc, hash) group
        // is the natural unit a chunk-keyed incremental pipeline
        // shuffles on anyway
        val v1 = t(s, d, "documents").select(col("doc_id"), col("text"))
        val v2 = v1.withColumn("text",
          when(col("doc_id") % 2 === 0, concat(lit("EDIT "), col("text")))
            .otherwise(col("text")))
        def cdcH(df: DataFrame, side: Int) =
          TextOps.cdcChunks(df, "doc_id", "text")
            .select(col("doc_id"), col("chunk_hash").as("h"),
              lit(side).as("side"))
        def fixH(df: DataFrame, side: Int) = TextOps
          .chunkWindows(df, "doc_id", "text", chunk = 16, overlap = 0)
          .select(col("doc_id"), col("chunk_fp").as("h"),
            lit(side).as("side"))
        def survival(u: DataFrame, total: String, sh: String) =
          u.groupBy(col("doc_id"), col("h"))
            .agg(max(col("side") === 1).as("in1"),
              max(col("side") === 2).as("in2"))
            .filter(col("in1"))
            .groupBy(col("doc_id"))
            .agg(count(lit(1)).as(total),
              Aggregates.countIf(col("in2")).as(sh))
        survival(cdcH(v1, 1).unionByName(cdcH(v2, 2)),
            "cdc_total", "cdc_shared")
          .join(survival(fixH(v1, 1).unionByName(fixH(v2, 2)),
            "fixed_total", "fixed_shared"), Seq("doc_id"))
          .select(col("doc_id"), col("cdc_total"), col("cdc_shared"),
            col("fixed_total"), col("fixed_shared"))
      }),

    // k-anonymity / l-diversity release audit: customers grouped by
    // their quasi-identifier tuple (nation, market segment, account-
    // balance thousand-band) — per equivalence class its size (k of
    // that class: 1 means uniquely re-identifiable) and the diversity
    // of a sensitive attribute (custkey mod 5 plays it), plus the
    // corpus-level k_min and the fraction of ROWS sitting in classes
    // below k=5 carried on every row. The pre-release privacy check
    // a metadata table gets before shipping alongside a corpus; two
    // hash aggregations + a one-row broadcast, integers and one
    // exact ratio.
    QueryDef(
      "q247_k_anonymity",
      Some("""
        WITH cls AS (
          SELECT c_nationkey AS nation, c_mktsegment AS segment,
                 CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
                 count(*) AS class_size,
                 count(DISTINCT c_custkey % 5) AS l_distinct
          FROM customer GROUP BY 1, 2, 3),
        tot AS (
          SELECT min(class_size) AS k_min,
                 CAST(sum(class_size) AS BIGINT) AS n_rows,
                 CAST(coalesce(sum(class_size)
                   FILTER (WHERE class_size < 5), 0) AS BIGINT)
                   AS rows_at_risk
          FROM cls)
        SELECT nation, segment, bal_band, class_size, l_distinct,
               class_size < 5 AS at_risk, k_min,
               CAST(rows_at_risk AS DOUBLE) / CAST(n_rows AS DOUBLE)
                 AS risk_frac
        FROM cls CROSS JOIN tot"""),
      (s, d) => {
        import graft.core.Checkpoints.BarrierOps
        val cls = t(s, d, "customer")
          .groupBy(col("c_nationkey").as("nation"),
            col("c_mktsegment").as("segment"),
            floor(col("c_acctbal") / 1000.0).cast("long").as("bal_band"))
          .agg(count(lit(1)).as("class_size"),
            countDistinct(col("c_custkey") % 5).as("l_distinct"))
          .barrier() // class rows + the global risk summary
        val tot = cls.agg(min(col("class_size")).as("k_min"),
          sum(col("class_size")).as("n_rows"),
          coalesce(sum(when(col("class_size") < 5, col("class_size"))),
            lit(0L)).as("rows_at_risk"))
        cls.crossJoin(broadcast(tot))
          .select(col("nation"), col("segment"), col("bal_band"),
            col("class_size"), col("l_distinct"),
            (col("class_size") < 5).as("at_risk"), col("k_min"),
            (col("rows_at_risk").cast("double")
              / col("n_rows").cast("double")).as("risk_frac"))
      }),

    // Differentially-private noisy release of the per-(lang, source)
    // class counts — q247's k-anonymity audit answers "is the release
    // table safe as-is?", this is the mechanism that makes it safe:
    // two-sided geometric noise at α = 1/2 (ε = ln 2, the geometric
    // mechanism — exact for integer counting queries) + suppression
    // of classes whose NOISY count lands below 5. Noise is sampled
    // with integer-only bit arithmetic (trailing-zero runs of keyed
    // md5 bits — libm-free, so the oracle is bit-exact) and keyed by
    // class + release salt: the derandomized replayable form every
    // versioned release needs. n_true/noise are audit columns of this
    // calibration view; scale shape is one counting aggregation plus
    // a per-row projection on the class table.
    QueryDef(
      "q276_dp_noisy_release",
      Some(s"""
        WITH cls AS (SELECT lang, source, count(*) AS n_true
                     FROM documents GROUP BY 1, 2),
        h AS (SELECT lang, source, n_true,
                ${dkHash60(s"${dkKeyCol("lang")} || " +
                  s"${dkKeyCol("source")} || '|dp1|cnt'")} AS hh
              FROM cls),
        g AS (SELECT lang, source, n_true,
                (len(bin((hh & 1073741823) + 1073741824))
                 - len(rtrim(bin((hh & 1073741823) + 1073741824), '0')))
                - (len(bin((hh >> 30) + 1073741824))
                   - len(rtrim(bin((hh >> 30) + 1073741824), '0')))
                  AS noise
              FROM h)
        SELECT lang, source, n_true, noise,
               n_true + noise AS n_noisy,
               (n_true + noise) < 5 AS suppressed,
               CASE WHEN (n_true + noise) >= 5
                    THEN n_true + noise END AS n_released
        FROM g"""),
      (s, d) =>
        Privacy.dpNoisyCounts(t(s, d, "documents"),
          Seq("lang", "source"), "dp1")),

    // DP noisy histogram — q276's mechanism over q78's per-(lang,
    // log2-token-bucket) length histogram, the second artifact every
    // release ships (distribution shape, not just class totals). Same
    // integer-only geometric noise keyed per (class, salt); sparse
    // tail buckets land under the suppression floor, which is the
    // mechanism working as intended.
    QueryDef(
      "q281_dp_noisy_histogram",
      Some(s"""
        WITH b AS (SELECT lang,
                     CAST(len(string_split(text,' ')) AS BIGINT) AS nt
                   FROM documents),
        cls AS (SELECT lang,
                       CAST(length(bin(nt)) - 1 AS INT) AS bucket,
                       count(*) AS n_true
                FROM b GROUP BY 1, 2),
        h AS (SELECT lang, bucket, n_true,
                ${dkHash60(s"${dkKeyCol("lang")} || " +
                  s"${dkKeyCol("bucket")} || '|dph1|cnt'")} AS hh
              FROM cls),
        g AS (SELECT lang, bucket, n_true,
                (len(bin((hh & 1073741823) + 1073741824))
                 - len(rtrim(bin((hh & 1073741823) + 1073741824), '0')))
                - (len(bin((hh >> 30) + 1073741824))
                   - len(rtrim(bin((hh >> 30) + 1073741824), '0')))
                  AS noise
              FROM h)
        SELECT lang, bucket, n_true, noise,
               n_true + noise AS n_noisy,
               (n_true + noise) < 5 AS suppressed,
               CASE WHEN (n_true + noise) >= 5
                    THEN n_true + noise END AS n_released
        FROM g"""),
      (s, d) =>
        Privacy.dpNoisyCounts(
          t(s, d, "documents").select(col("lang"),
            (length(bin(size(TextOps.tokens(col("text")))
              .cast("long"))) - 1).cast("int").as("bucket")),
          Seq("lang", "bucket"), "dph1")),

    // k-anonymization by ladder generalization — the RELEASE op that
    // fixes what q247's audit flags: each customer's balance band is
    // coarsened down the 1000/2000/4000/8000 ladder (then dropped
    // entirely), releasing ITERATIVELY from the finest level: each
    // level's (nation, segment, band) classes are counted over the
    // rows NOT yet released at a finer level, and classes at k=5
    // release all their remaining rows — so every PUBLISHED group has
    // ≥ k rows (counting fanned-out rows that in fact ship at a finer
    // level would let sub-k remainders leak through). Rows whose
    // bandless class is still sub-k are suppressed. 5 rounds, each
    // one spillable window over a shrinking remainder; no self-join.
    QueryDef(
      "q282_k_generalize",
      Some(kGenOracleSql),
      (s, d) =>
        Privacy.kAnonymizeBands(
          t(s, d, "customer").select(col("c_custkey"),
            col("c_nationkey").as("nation"),
            col("c_mktsegment").as("segment"), col("c_acctbal")),
          "c_custkey", Seq("nation", "segment"), "c_acctbal")),

    // USER-level DP release (q276 is row-level): every web corpus has
    // contributors owning many rows, so the row-level ε is vacuous
    // there — bound each source's contribution to m=8 rows first (a
    // deterministic per-contributor window, ranked by the encoded
    // class key so released counts are replay-stable), then release
    // the per-lang counts through the same integer-only geometric
    // mechanism. Stated guarantee: ε = m·ln 2 user-level (sequential
    // composition over the ≤ m affected coordinates) — finite, where
    // the unclamped form's user-level ε is unbounded. One spillable
    // window + one counting agg + the per-row noise projection.
    QueryDef(
      "q285_dp_user_level",
      Some(s"""
        WITH cl AS (
          SELECT lang,
                 row_number() OVER (PARTITION BY source
                   ORDER BY ${dkKeyCol("lang")}) AS rn
          FROM documents),
        cls AS (SELECT lang, count(*) AS n_true
                FROM cl WHERE rn <= 8 GROUP BY 1),
        h AS (SELECT lang, n_true,
                ${dkHash60(s"${dkKeyCol("lang")} || '|dpu1|cnt:u8'")} AS hh
              FROM cls),
        g AS (SELECT lang, n_true,
                (len(bin((hh & 1073741823) + 1073741824))
                 - len(rtrim(bin((hh & 1073741823) + 1073741824), '0')))
                - (len(bin((hh >> 30) + 1073741824))
                   - len(rtrim(bin((hh >> 30) + 1073741824), '0')))
                  AS noise
              FROM h)
        SELECT lang, n_true, noise,
               n_true + noise AS n_noisy,
               (n_true + noise) < 5 AS suppressed,
               CASE WHEN (n_true + noise) >= 5
                    THEN n_true + noise END AS n_released
        FROM g"""),
      (s, d) =>
        Privacy.dpUserLevelCounts(t(s, d, "documents"), Seq("lang"),
          "source", "dpu1", maxPerContributor = 8)),

    // DP noisy SUM release — per-lang TOTAL token counts (q276/q281
    // release row counts; totals are the other number every corpus
    // card ships): per-row clip to [0, 128] (n_clipped audits the
    // bias), then release the clipped sum in clip-units —
    // clip·(⌊S/clip⌋ + noise) — so ⌊S/clip⌋ is a unit-sensitivity
    // integer query and the same integer-only α=1/2 geometric noise
    // gives row-level ε = ln 2 exactly. Suppression on the noisy
    // unit count; quantization error < clip = the noise's own scale.
    QueryDef(
      "q288_dp_noisy_sum",
      Some(s"""
        WITH b AS (SELECT lang,
                     CAST(len(string_split(text,' ')) AS BIGINT) AS nt
                   FROM documents),
        cls AS (SELECT lang,
                  CAST(sum(least(greatest(nt, 0), 128)) AS BIGINT)
                    AS sum_true,
                  CAST(coalesce(count(*) FILTER (WHERE nt > 128), 0)
                    AS BIGINT) AS n_clipped,
                  CAST(coalesce(count(*) FILTER (WHERE nt < 0), 0)
                    AS BIGINT) AS n_floor_clipped
                FROM b GROUP BY 1),
        u AS (SELECT lang, sum_true, n_clipped, n_floor_clipped,
                sum_true // 128 AS units_true,
                ${dkHash60(s"${dkKeyCol("lang")} || '|dps1|sum:c128'")}
                  AS hh
              FROM cls),
        g AS (SELECT lang, sum_true, n_clipped, n_floor_clipped,
                units_true,
                (len(bin((hh & 1073741823) + 1073741824))
                 - len(rtrim(bin((hh & 1073741823) + 1073741824), '0')))
                - (len(bin((hh >> 30) + 1073741824))
                   - len(rtrim(bin((hh >> 30) + 1073741824), '0')))
                  AS noise
              FROM u)
        SELECT lang, sum_true, n_clipped, n_floor_clipped, units_true,
               noise,
               units_true + noise AS units_noisy,
               (units_true + noise) < 5 AS suppressed,
               CASE WHEN (units_true + noise) >= 5
                    THEN (units_true + noise) * 128 END AS sum_released
        FROM g"""),
      (s, d) =>
        Privacy.dpNoisySums(
          t(s, d, "documents").select(col("lang"),
            size(TextOps.tokens(col("text"))).cast("long").as("nt")),
          Seq("lang"), "nt", clip = 128L, salt = "dps1")),

    // USER-level DP noisy sum — the fourth cell of the {counts, sums}
    // × {row, user} release matrix: clamp each source to m=8 rows
    // (window ranked by (class key, value) — (class, value) ties are
    // interchangeable for sums, so released totals are replay-stable
    // under any tie-break), clip each kept row's token count to
    // [0, 128], release clip-quantized per-lang totals. Stated
    // guarantee ε ≤ 2m·ln 2 user-level (unit-count vector moves ≤ 2m
    // in L1), vs unbounded unclamped.
    QueryDef(
      "q289_dp_user_sum",
      Some(s"""
        WITH b AS (SELECT lang, source,
                     CAST(len(string_split(text,' ')) AS BIGINT) AS nt
                   FROM documents),
        cl AS (SELECT lang, nt,
                 row_number() OVER (PARTITION BY source
                   ORDER BY ${dkKeyCol("lang")}, nt) AS rn
               FROM b),
        cls AS (SELECT lang,
                  CAST(sum(least(greatest(nt, 0), 128)) AS BIGINT)
                    AS sum_true,
                  CAST(coalesce(count(*) FILTER (WHERE nt > 128), 0)
                    AS BIGINT) AS n_clipped,
                  CAST(coalesce(count(*) FILTER (WHERE nt < 0), 0)
                    AS BIGINT) AS n_floor_clipped
                FROM cl WHERE rn <= 8 GROUP BY 1),
        u AS (SELECT lang, sum_true, n_clipped, n_floor_clipped,
                sum_true // 128 AS units_true,
                ${dkHash60(s"${dkKeyCol("lang")} || '|dpus1|sum:c128:u8'")}
                  AS hh
              FROM cls),
        g AS (SELECT lang, sum_true, n_clipped, n_floor_clipped,
                units_true,
                (len(bin((hh & 1073741823) + 1073741824))
                 - len(rtrim(bin((hh & 1073741823) + 1073741824), '0')))
                - (len(bin((hh >> 30) + 1073741824))
                   - len(rtrim(bin((hh >> 30) + 1073741824), '0')))
                  AS noise
              FROM u)
        SELECT lang, sum_true, n_clipped, n_floor_clipped, units_true,
               noise,
               units_true + noise AS units_noisy,
               (units_true + noise) < 5 AS suppressed,
               CASE WHEN (units_true + noise) >= 5
                    THEN (units_true + noise) * 128 END AS sum_released
        FROM g"""),
      (s, d) =>
        Privacy.dpUserLevelSums(
          t(s, d, "documents").select(col("lang"), col("source"),
            size(TextOps.tokens(col("text"))).cast("long").as("nt")),
          Seq("lang"), "source", "nt", clip = 128L, salt = "dpus1",
          maxPerContributor = 8)),

    // Effective sample size of the DSIR importance weights (q234's
    // output read as a sampling design): ESS = (Σw)²/Σw² — the
    // number of equally-weighted docs the weighted corpus is worth —
    // unclipped and at clip caps 1/2/4, the curve an operator reads
    // to pick a weight clip before resampling (a handful of huge
    // ratios can collapse ESS to a few docs; clipping trades bias
    // for variance). Sums are doc-id-ordered folds; each ESS is two
    // multiplies and two divisions on identical operands in both
    // engines. Corpus-sized work = the one DSIR scoring pass; the
    // clip fan-out is 4× a (doc_id, weight) pair table.
    QueryDef(
      "q248_dsir_ess",
      Some(s"""
        WITH tk AS (SELECT doc_id, lang, string_split(text,' ') AS t
                    FROM documents),
        tok AS (SELECT doc_id, lang, CAST(i AS BIGINT) AS pos,
                       ${dkHash60("t[i+1]")} % 4096 AS ft
                FROM tk, unnest(range(0, len(t))) r(i)),
        rc AS (SELECT ft, count(*) AS cr FROM tok GROUP BY 1),
        tc AS (SELECT ft, count(*) AS ct FROM tok
               WHERE lang = 'en' GROUP BY 1),
        tot AS (SELECT (SELECT count(*) FROM tok) AS r_total,
                       (SELECT count(*) FROM tok WHERE lang = 'en')
                         AS t_total),
        ratios AS (SELECT rc.ft,
                     CAST(COALESCE(tc.ct, 0) + 1 AS DOUBLE)
                       * CAST(tot.r_total + 4096 AS DOUBLE)
                       / (CAST(rc.cr + 1 AS DOUBLE)
                          * CAST(tot.t_total + 4096 AS DOUBLE)) AS r
                   FROM rc LEFT JOIN tc ON rc.ft = tc.ft
                   CROSS JOIN tot),
        w AS (SELECT doc_id,
                     ${dkOrderedSum("r", "pos")}
                       / CAST(count(*) AS DOUBLE) AS w
              FROM tok JOIN ratios USING (ft) GROUP BY 1),
        lv AS (SELECT unnest([CAST(-1.0 AS DOUBLE),
                 CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE),
                 CAST(4.0 AS DOUBLE)]) AS clip),
        wc AS (SELECT clip, doc_id,
                      CASE WHEN clip < 0 THEN w
                           ELSE least(w, clip) END AS wc
               FROM w CROSS JOIN lv),
        agg AS (SELECT clip, count(*) AS n_docs,
                       ${dkOrderedSum("wc", "doc_id")} AS s1,
                       ${dkOrderedSum("wc * wc", "doc_id")} AS s2
                FROM wc GROUP BY 1)
        SELECT clip, n_docs, s1 AS sum_w,
               s1 * s1 / s2 AS ess,
               (s1 * s1 / s2) / CAST(n_docs AS DOUBLE) AS ess_frac
        FROM agg"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        val w = LanguageModel.dsirWeights(docs,
            docs.filter(col("lang") === "en"), "doc_id", "text")
          .select(col("doc_id"), col("weight").as("w"))
        val wc = w
          .select(col("doc_id"), col("w"),
            explode(array(lit(-1.0), lit(1.0), lit(2.0), lit(4.0)))
              .as("clip"))
          .select(col("clip"), col("doc_id"),
            when(col("clip") < 0, col("w"))
              .otherwise(least(col("w"), col("clip"))).as("wc"))
        wc.groupBy(col("clip"))
          .agg(count(lit(1)).as("n_docs"),
            Aggregates.orderedSum(col("doc_id"), col("wc")).as("s1"),
            Aggregates.orderedSum(col("doc_id"),
              col("wc") * col("wc")).as("s2"))
          .select(col("clip"), col("n_docs"), col("s1").as("sum_w"),
            (col("s1") * col("s1") / col("s2")).as("ess"),
            (col("s1") * col("s1") / col("s2")
              / col("n_docs").cast("double")).as("ess_frac"))
      }),

    // Two-sample Kolmogorov–Smirnov drift per source (Drift
    // .ksByGroup): D = max over token-count values of the gap
    // between the source's ECDF and the rest-of-corpus ECDF, plus
    // the value achieving it — the length-distribution drift check
    // run before accepting a new crawl slice. Exact over the
    // discrete support: one (source, value) count aggregation, then
    // cumulative windows on the bounded group × value grid.
    QueryDef(
      "q254_ks_drift",
      Some("""
        WITH dv AS (SELECT source AS g,
                           CAST(len(string_split(text, ' ')) AS BIGINT)
                             AS v
                    FROM documents),
        c AS (SELECT g, v, count(*) AS cnt FROM dv GROUP BY 1, 2),
        ng AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS n_g
               FROM c GROUP BY 1),
        cv AS (SELECT v, CAST(sum(cnt) AS BIGINT) AS c_all
               FROM c GROUP BY 1),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_all FROM c),
        j AS (SELECT ng.g, ng.n_g, cv.v, cv.c_all,
                     coalesce(c.cnt, 0) AS c_own
              FROM ng CROSS JOIN cv
              LEFT JOIN c ON ng.g = c.g AND cv.v = c.v),
        cum AS (SELECT g, n_g, v,
                       CAST(sum(c_own) OVER w AS BIGINT) AS cum_own,
                       CAST(sum(c_all - c_own) OVER w AS BIGINT)
                         AS cum_rest
                FROM j WINDOW w AS (PARTITION BY g ORDER BY v)),
        dd AS (SELECT g, n_g, n_all - n_g AS n_rest,
                      v,
                      abs(CAST(cum_own AS DOUBLE)
                            / CAST(n_g AS DOUBLE)
                        - CAST(cum_rest AS DOUBLE)
                            / CAST(n_all - n_g AS DOUBLE)) AS d
               FROM cum CROSS JOIN tot
               WHERE n_all - n_g > 0),
        mx AS (SELECT *, max(d) OVER (PARTITION BY g) AS dmax FROM dd)
        SELECT g AS source, n_g AS n_grp, n_rest, d AS ks_d,
               min(v) AS ks_at
        FROM mx WHERE d = dmax GROUP BY 1, 2, 3, 4"""),
      (s, d) =>
        Drift.ksByGroup(
          t(s, d, "documents").select(col("source"),
            size(TextOps.tokens(col("text"))).cast("long").as("v")),
          "source", "v")),

    // Fixed-bin length drift per source vs the pooled corpus (Drift
    // .binDrift): chi-square divergence + squared Hellinger distance
    // over Laplace-smoothed shares of 20 token-count bands — the
    // log-free PSI stand-ins (libm ln is not cross-engine
    // reproducible; sqrt is correctly rounded). All 20 bins fold per
    // source in bin order, so the report hash-matches.
    QueryDef(
      "q255_bin_drift",
      Some(s"""
        WITH dv AS (SELECT source AS g,
                           least(CAST(len(string_split(text, ' '))
                               AS BIGINT) // 16, 19) AS b
                    FROM documents),
        c AS (SELECT g, b, count(*) AS cnt FROM dv GROUP BY 1, 2),
        ng AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS n_g
               FROM c GROUP BY 1),
        cb AS (SELECT b, CAST(sum(cnt) AS BIGINT) AS c_b
               FROM c GROUP BY 1),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_all FROM c),
        bins AS (SELECT CAST(unnest(range(0, 20)) AS BIGINT) AS b),
        grid AS (SELECT ng.g, ng.n_g, bins.b,
                        coalesce(c.cnt, 0) AS c_own,
                        coalesce(cb.c_b, 0) AS c_all
                 FROM ng CROSS JOIN bins
                 LEFT JOIN c ON ng.g = c.g AND bins.b = c.b
                 LEFT JOIN cb ON bins.b = cb.b),
        tm AS (SELECT g, n_g, b,
                      (CAST(c_own AS DOUBLE) + CAST(0.5 AS DOUBLE))
                        / (CAST(n_g AS DOUBLE)
                           + CAST(10.0 AS DOUBLE)) AS p,
                      (CAST(c_all AS DOUBLE) + CAST(0.5 AS DOUBLE))
                        / (CAST(n_all AS DOUBLE)
                           + CAST(10.0 AS DOUBLE)) AS q
               FROM grid CROSS JOIN tot)
        SELECT g AS source, n_g AS n_docs,
               ${dkOrderedSum("(p - q) * (p - q) / q", "b")}
                 AS chi2_drift,
               ${dkOrderedSum(
                   "(sqrt(p) - sqrt(q)) * (sqrt(p) - sqrt(q))", "b")}
                 * CAST(0.5 AS DOUBLE) AS hellinger_sq
        FROM tm GROUP BY 1, 2"""),
      (s, d) =>
        Drift.binDrift(
          t(s, d, "documents").select(col("source"),
            least(shiftright(size(TextOps.tokens(col("text")))
              .cast("long"), 4), lit(19L)).as("b")),
          "source", "b", 20)),

    // Median-shift audit with false-discovery control (Drift
    // .medianShiftBhFdr): per (source, lang) cell, an EXACT sign
    // test of token count against the global lower median on a
    // deterministic 40-doc probe (hash-ranked doc ids), then
    // Benjamini–Hochberg across the ~32-cell family at α = 0.1 —
    // the multiple-testing discipline that keeps a per-cell audit
    // from flagging ~3 cells by chance. p-values are exact dyadic
    // rationals (q228's integral binomial fold); BH is a rank window
    // + tail running-min over the bounded family.
    QueryDef(
      "q256_median_shift_fdr",
      Some(s"""
        WITH dv AS (SELECT doc_id, source, lang,
                           CAST(len(string_split(text, ' ')) AS BIGINT)
                             AS v
                    FROM documents),
        vh AS (SELECT v, count(*) AS cnt FROM dv GROUP BY 1),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_all FROM vh),
        md AS (SELECT min(v) AS med FROM
                (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum FROM vh)
                CROSS JOIN tot WHERE cum * 2 >= n_all + 1),
        sp AS (SELECT * FROM
                (SELECT doc_id, source, lang, v,
                        row_number() OVER (PARTITION BY source, lang
                          ORDER BY ${dkHash60(
                            "CAST(doc_id AS VARCHAR)")}, doc_id)
                          AS rn
                 FROM dv) WHERE rn <= 40),
        cells AS (SELECT source, lang, count(*) AS n_probe,
                         count(*) FILTER (WHERE v <> med) AS m,
                         count(*) FILTER (WHERE v > med) AS wins
                  FROM sp CROSS JOIN md GROUP BY 1, 2),
        tl AS (SELECT source, lang, n_probe, m, wins,
                      CAST(sum(CASE WHEN k = 0 THEN 1 ELSE
                        list_reduce(
                          list_prepend(CAST(1 AS HUGEINT),
                            list_transform(range(1, k + 1),
                              i -> CAST(i AS HUGEINT))),
                          (acc, i) -> acc * (m - k + i) // i)
                        END) AS BIGINT) AS tail_sum
               FROM (SELECT *, unnest(range(greatest(wins, m - wins),
                       m + 1)) AS k
                     FROM cells)
               GROUP BY 1, 2, 3, 4, 5),
        pv AS (SELECT source, lang, n_probe, m, wins,
                      least(CAST(1.0 AS DOUBLE),
                        CAST(2.0 AS DOUBLE)
                          * CAST(tail_sum AS DOUBLE)
                          / CAST(CAST(1 AS BIGINT) << m AS DOUBLE))
                        AS p_sign
               FROM tl),
        mt AS (SELECT count(*) AS m_tests FROM pv),
        rk AS (SELECT *, row_number()
                 OVER (ORDER BY p_sign, source, lang) AS rnk
               FROM pv CROSS JOIN mt),
        bh AS (SELECT source, lang, n_probe, m, wins, p_sign,
                      least(CAST(1.0 AS DOUBLE),
                        min(p_sign * CAST(m_tests AS DOUBLE)
                            / CAST(rnk AS DOUBLE))
                          OVER (ORDER BY rnk DESC)) AS p_bh
               FROM rk)
        SELECT source, lang, n_probe, m, wins, p_sign, p_bh,
               CASE WHEN p_bh <= CAST(0.1 AS DOUBLE) THEN 1 ELSE 0 END
                 AS reject
        FROM bh"""),
      (s, d) =>
        Drift.medianShiftBhFdr(
          t(s, d, "documents").select(col("source"), col("lang"),
            col("doc_id"),
            size(TextOps.tokens(col("text"))).cast("long").as("v")),
          Seq("source", "lang"), "doc_id", "v", probe = 40,
          alpha = 0.1)),

    // Hashed linear-classifier gate per source (Classifier
    // .hashedBigramMargin — the fastText inference shape): unigram +
    // bigram features hashed into 4096 weight buckets, integral
    // weight sums, one terminal division per document; per source
    // the pass rate at margin ≥ 0.1 and the mean margin (ordered
    // doc-id fold). The weights are the deterministic pseudo-model
    // (Knuth-scrambled buckets) so the whole scorer oracle-checks;
    // a trained model is a 4096-row broadcast swap.
    QueryDef(
      "q257_hashed_classifier",
      Some(s"""
        WITH $dkMarginCtes
        SELECT source, count(*) AS n_docs,
               count(*) FILTER (WHERE margin >= CAST(0.1 AS DOUBLE))
                 AS n_pass,
               ${dkOrderedSum("margin", "doc_id")}
                 / CAST(count(*) AS DOUBLE) AS mean_margin
        FROM sc GROUP BY 1"""),
      (s, d) =>
        Classifier.hashedBigramMargin(t(s, d, "documents"),
            "doc_id", "text", Seq("source"), 4096)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            coalesce(Aggregates.countIf(col("margin") >= 0.1),
              lit(0L)).as("n_pass"),
            (Aggregates.orderedSum(col("doc_id"), col("margin"))
              / count(lit(1)).cast("double")).as("mean_margin"))),

    // Split-conformal calibration + coverage audit (Drift
    // .conformalCoverage) over the q257 classifier margin: a 5%
    // hash-split calibration slice sets the 90% conformal threshold
    // τ (exact order statistic over the permille-discretized score —
    // a bounded cumsum, not a global sort); the other 95% audits
    // per-source empirical coverage. A source far below 0.9 is not
    // exchangeable with the calibration slice — drifted — with a
    // finite-sample guarantee instead of a heuristic cutoff.
    QueryDef(
      "q258_conformal_coverage",
      Some(s"""
        WITH $dkMarginCtes,
        b AS (SELECT source AS g,
                     CAST(floor(margin * CAST(1000.0 AS DOUBLE))
                       AS BIGINT) AS q,
                     (${dkHash60("CAST(doc_id AS VARCHAR)")} % 20) = 0
                       AS is_cal
              FROM sc),
        vh AS (SELECT q, count(*) AS cnt FROM b WHERE is_cal
               GROUP BY 1),
        nc AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_cal FROM vh),
        ta AS (SELECT coalesce(
                        min(CASE WHEN cum >= ((n_cal + 1) * 9 + 9) // 10
                                 THEN q END),
                        CASE WHEN min(n_cal) > 0
                             THEN 9223372036854775807 END) AS tau,
                      min(n_cal) AS n_cal FROM
                (SELECT q, sum(cnt) OVER (ORDER BY q) AS cum FROM vh)
                CROSS JOIN nc)
        SELECT g AS source, tau, n_cal, count(*) AS n_eval,
               count(*) FILTER (WHERE q <= tau) AS n_covered,
               CAST(count(*) FILTER (WHERE q <= tau) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) AS coverage
        FROM b CROSS JOIN ta WHERE NOT is_cal
        GROUP BY 1, 2, 3"""),
      (s, d) =>
        Drift.conformalCoverage(
          Classifier.hashedBigramMargin(t(s, d, "documents"),
            "doc_id", "text", Seq("source"), 4096),
          "doc_id", "source", "margin", scaleTo = 1000,
          calibBuckets = 20, keepNum = 9, keepDen = 10)),

    // Simplified silhouette per IVF cell (Similarity
    // .simplifiedSilhouette over the q62 centroid convention — first
    // 8 vectors): s = (b − a)/max(a, b) from the nearest and
    // second-nearest centroid distances, per cell count/mean/min/max
    // — the index-quality audit before trusting IVF probe recall.
    // Centroids broadcast; one candidate map, two aggregations.
    QueryDef(
      "q259_silhouette",
      Some(s"""
        WITH c AS (SELECT vec_id AS cell, embedding AS cvec
                   FROM embeddings WHERE vec_id < 8),
        s AS (SELECT e.vec_id, c.cell,
                list_reduce(list_transform(
                  list_zip(e.embedding, c.cvec),
                  p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                     * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),
                  (x, y) -> x + y) AS d2
              FROM embeddings e CROSS JOIN c),
        r AS (SELECT *, row_number() OVER (PARTITION BY vec_id
                ORDER BY d2, cell) AS rk FROM s),
        p AS (SELECT vec_id,
                     min(cell) FILTER (WHERE rk = 1) AS cell,
                     sqrt(min(d2) FILTER (WHERE rk = 1)) AS a,
                     sqrt(min(d2) FILTER (WHERE rk = 2)) AS b
              FROM r WHERE rk <= 2 GROUP BY 1),
        sil AS (SELECT vec_id, cell,
                       CASE WHEN greatest(a, b) <= CAST(0.0 AS DOUBLE)
                            THEN CAST(0.0 AS DOUBLE)
                            ELSE (b - a) / greatest(a, b) END AS sv
                FROM p)
        SELECT cell, count(*) AS n_vecs,
               ${dkOrderedSum("sv", "vec_id")}
                 / CAST(count(*) AS DOUBLE) AS mean_sil,
               min(sv) AS min_sil, max(sv) AS max_sil
        FROM sil GROUP BY 1"""),
      (s, d) => {
        val e = t(s, d, "embeddings")
        graft.llmops.Similarity.simplifiedSilhouette(e, "vec_id",
          "embedding",
          e.filter(col("vec_id") < 8)
            .select(col("vec_id").as("cell"),
              col("embedding").as("cvec")),
          "cell", "cvec")
      }),

    // Theoretical LSH banding planner (DedupAudit.lshPlanCurve — the
    // MMDS S-curve design step the empirical q180/q224 curves then
    // validate): p(s) = 1 − (1 − s^r)^b for every b·r = 64 and s on
    // the 1/20 grid, plus each banding's effective threshold (first
    // grid s with p ≥ ½). Corpus-free dimension table; powers are
    // ordered multiplication folds, never libm pow.
    QueryDef(
      "q260_lsh_plan",
      Some("""
        WITH f AS (SELECT unnest(range(1, 65)) AS bf),
        fac AS (SELECT CAST(bf AS INT) AS bands,
                       CAST(64 // bf AS INT) AS rpb
                FROM f WHERE 64 % bf = 0),
        sg AS (SELECT CAST(i AS DOUBLE) / CAST(20.0 AS DOUBLE) AS s
               FROM (SELECT unnest(range(1, 20)) AS i)),
        c1 AS (SELECT bands, rpb, s,
                      list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
                        list_transform(range(1, rpb + 1), y -> s)),
                        (a, b) -> a * b) AS sr
               FROM fac CROSS JOIN sg),
        curve AS (SELECT bands, rpb, s,
                         CAST(1.0 AS DOUBLE) - list_reduce(
                           list_prepend(CAST(1.0 AS DOUBLE),
                             list_transform(range(1, bands + 1),
                               x -> CAST(1.0 AS DOUBLE) - sr)),
                           (a, b) -> a * b) AS p_collide
                  FROM c1),
        s50 AS (SELECT bands, rpb,
                       min(s) FILTER (WHERE p_collide >=
                         CAST(0.5 AS DOUBLE)) AS s50
                FROM curve GROUP BY 1, 2)
        SELECT curve.bands, curve.rpb, curve.s, curve.p_collide,
               s50.s50
        FROM curve JOIN s50 USING (bands, rpb)"""),
      (s, _) =>
        graft.llmops.DedupAudit.lshPlanCurve(s, sigLen = 64,
          sGridDen = 20)),

    // Mann–Whitney rank AUC per source (Drift.rankAucByGroup): the
    // exact tie-corrected P(random doc of the source is longer than
    // a random doc of the rest) + Cliff's δ — the nonparametric
    // effect size that tells an operator HOW shifted a slice is
    // where q254's KS only says whether. 2U stays integral over the
    // value histogram (rest-below/rest-at decomposition), summed in
    // DECIMAL/HUGEINT so corpus-scale products cannot overflow.
    QueryDef(
      "q261_rank_auc",
      Some("""
        WITH dv AS (SELECT source AS g,
                           CAST(len(string_split(text, ' ')) AS BIGINT)
                             AS v
                    FROM documents),
        c AS (SELECT g, v, count(*) AS cnt FROM dv GROUP BY 1, 2),
        ng AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS n_g
               FROM c GROUP BY 1),
        cv AS (SELECT v, CAST(sum(cnt) AS BIGINT) AS c_all
               FROM c GROUP BY 1),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_all FROM c),
        j AS (SELECT ng.g, ng.n_g, cv.v, cv.c_all,
                     coalesce(c.cnt, 0) AS c_own
              FROM ng CROSS JOIN cv
              LEFT JOIN c ON ng.g = c.g AND cv.v = c.v),
        cum AS (SELECT g, n_g, v, c_own, c_all - c_own AS c_rest,
                       sum(c_all - c_own)
                         OVER (PARTITION BY g ORDER BY v) AS cum_rest
                FROM j),
        u AS (SELECT g, n_g, n_all - n_g AS n_rest,
                     CAST(sum(CAST(c_own AS HUGEINT)
                       * (2 * (cum_rest - c_rest) + c_rest))
                       AS DOUBLE) AS u2
              FROM cum CROSS JOIN tot WHERE n_all - n_g > 0
              GROUP BY 1, 2, 3),
        a AS (SELECT g, n_g, n_rest,
                     u2 / (CAST(2.0 AS DOUBLE)
                       * (CAST(n_g AS DOUBLE)
                          * CAST(n_rest AS DOUBLE))) AS auc
              FROM u)
        SELECT g AS source, n_g AS n_grp, n_rest, auc,
               CAST(2.0 AS DOUBLE) * auc - CAST(1.0 AS DOUBLE)
                 AS cliffs_delta
        FROM a"""),
      (s, d) =>
        Drift.rankAucByGroup(
          t(s, d, "documents").select(col("source"),
            size(TextOps.tokens(col("text"))).cast("long").as("v")),
          "source", "v")),

    // Energy distance per source (Drift.energyDistanceByGroup —
    // Székely's 2E|X−Y| − E|X−X'| − E|Y−Y'|): zero iff the source's
    // length distribution matches the rest, sensitive to spread and
    // shape where KS/AUC mostly see location. All three expectations
    // are exact integral sums over the bounded value-PAIR grid
    // (support², never corpus²), HUGEINT/DECIMAL-summed, three
    // terminal divisions.
    QueryDef(
      "q262_energy_distance",
      Some("""
        WITH dv AS (SELECT source AS g,
                           CAST(len(string_split(text, ' ')) AS BIGINT)
                             AS v
                    FROM documents),
        c AS (SELECT g, v, count(*) AS cnt FROM dv GROUP BY 1, 2),
        ng AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS n_g
               FROM c GROUP BY 1),
        cv AS (SELECT v, CAST(sum(cnt) AS BIGINT) AS c_all
               FROM c GROUP BY 1),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_all FROM c),
        h AS (SELECT ng.g, ng.n_g, cv.v,
                     coalesce(c.cnt, 0) AS c_own,
                     cv.c_all - coalesce(c.cnt, 0) AS c_rest
              FROM ng CROSS JOIN cv
              LEFT JOIN c ON ng.g = c.g AND cv.v = c.v),
        pr AS (SELECT a.g, a.n_g, abs(a.v - b.v) AS dist,
                      a.c_own AS au, a.c_rest AS bu,
                      b.c_own AS av, b.c_rest AS bv
               FROM h a JOIN h b ON a.g = b.g),
        sm AS (SELECT g, n_g,
                      sum(CAST(au AS HUGEINT) * av * dist) AS sa,
                      sum(CAST(bu AS HUGEINT) * bv * dist) AS sb,
                      sum(CAST(au AS HUGEINT) * bv * dist) AS sc
               FROM pr GROUP BY 1, 2)
        SELECT g AS source, n_g AS n_grp, n_all - n_g AS n_rest,
               CAST(2.0 AS DOUBLE) * CAST(sc AS DOUBLE)
                   / (CAST(n_g AS DOUBLE)
                      * CAST(n_all - n_g AS DOUBLE))
                 - CAST(sa AS DOUBLE)
                   / (CAST(n_g AS DOUBLE) * CAST(n_g AS DOUBLE))
                 - CAST(sb AS DOUBLE)
                   / (CAST(n_all - n_g AS DOUBLE)
                      * CAST(n_all - n_g AS DOUBLE)) AS energy
        FROM sm CROSS JOIN tot WHERE n_all - n_g > 0"""),
      (s, d) =>
        Drift.energyDistanceByGroup(
          t(s, d, "documents").select(col("source"),
            size(TextOps.tokens(col("text"))).cast("long").as("v")),
          "source", "v")))
}
