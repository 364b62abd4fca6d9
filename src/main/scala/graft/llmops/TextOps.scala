package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Checkpoints.BarrierOps

/** Text-pipeline operators for large-scale training-data curation:
  * tokenization, shingling, MinHash, SimHash, language ID, quality
  * scoring, fingerprinting.
  *
  * Everything here is pure Catalyst (whole-stage codegen, no UDFs) and
  * cross-engine deterministic: the only hash primitive is `hash60` —
  * the first 15 hex chars of md5 as a non-negative Long — which any
  * SQL engine can reproduce (`('0x'||substr(md5(s),1,15))::BIGINT` in
  * DuckDB), so every operator is oracle-verifiable. At 100 TB each
  * operator is a narrow map stage followed by one hash aggregation or
  * one shuffle join on a well-distributed key (hash/shingle/bucket);
  * nothing collects to the driver.
  */
object TextOps {

  /** 60-bit deterministic string hash: first 15 hex chars of md5 —
    * non-negative, fits a signed Long, reproducible in any engine
    * (`('0x'||substr(md5(s),1,15))::BIGINT` in DuckDB). Runs as the
    * native codegen'd `graft.functions.Md5Prefix60` (digest bytes →
    * Long, no hex-string round trip); `hash60Composed` is the
    * built-in-only equivalent kept for parity testing. */
  def hash60(s: Column): Column = call_function("hash60", s)

  /** The same hash from built-ins only — bit-identical to [[hash60]]
    * (PropertySpec pins the equivalence). */
  def hash60Composed(s: Column): Column =
    conv(substring(md5(s), lit(1), lit(15)), 16, 10).cast("long")

  /** Whitespace tokens (single-space convention of the corpus). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct hash60 values of a document's word n-gram shingles —
    * the map kernel of the whole dedup family (q41/q43/q52/q72/q126).
    * Runs as the native codegen'd `graft.functions.ShingleHash60`:
    * one JVM loop, incremental md5 over token bytes, no intermediate
    * shingle strings, CSE-deduped when an optimizer collapse leaves
    * multiple references. Bit-identical to [[shingleHashesComposed]]
    * (PropertySpec pins the equivalence); the DuckDB oracles keep the
    * same `list_distinct(list_transform(...))` definition. */
  def shingleHashes(text: Column, n: Int = 3): Column =
    call_function("shingle_hash60", tokens(text), lit(n))

  /** The same from built-ins only — kept for the parity pin. */
  def shingleHashesComposed(text: Column, n: Int = 3): Column =
    array_distinct(transform(shingles(text, n), g => hash60(g)))

  /** Positional (non-distinct) shingle hashes: element i = the hash
    * of the n-gram starting at token i — the form the duplicated-span
    * extractor posexplodes. Native `shingle_hash60_all` kernel. */
  def shingleHashesAll(text: Column, n: Int = 3): Column =
    call_function("shingle_hash60_all", tokens(text), lit(n))

  /** Word n-gram shingles (default 3). Empty array when the document is
    * shorter than n.
    *
    * Built as a zip_with fold over shifted copies of the token array —
    * NOT as `transform(sequence(...), i => slice(tokens, i, n))`. In
    * that formulation the lambda body captures the un-bound `split`
    * expression, and higher-order-function lambdas re-evaluate their
    * captured subtrees per element (no subexpression elimination
    * inside the lambda), so each document paid O(tokens) splits ×
    * O(tokens) elements = O(tokens²) — measured 20× slower on the
    * corpus shingle kernel. Here each zip_with lambda touches only its
    * own arguments; `split` is evaluated a constant number of times
    * per row and the whole kernel is O(tokens · n).
    *
    * zip_with pads the shorter (shifted) side with nulls and `concat`
    * null-propagates, so trailing partial grams become null; the final
    * slice to size−(n−1) drops exactly those. Tokens are never null
    * (split output), so concat ≡ concat_ws(" ") here bit-for-bit. */
  def shingles(text: Column, n: Int = 3): Column =
    arrayShingles(tokens(text), n)

  /** N-gram shingles over ANY string-array column (token arrays,
    * event-type sequences, …) — the zip_with fold described above. */
  def arrayShingles(t: Column, n: Int): Column = {
    val grams = (2 to n).foldLeft(t)((acc, k) =>
      zip_with(acc, slice(t, lit(k), size(t)),
        (x, y) => concat(x, lit(" "), y)))
    when(size(t) >= n, slice(grams, lit(1), size(t) - (n - 1)))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact n-gram Jaccard near-duplicate pairs over a document table,
    * built as a shingle inverted index: pairs exist only for docs that
    * SHARE a shingle hash. 100 TB shape — one computation of the
    * shingle md5s and two exchanges total:
    *
    *   explode shingles → exchange on shingle hash → window count
    *   (document frequency; WindowExec spills, so a hot shingle never
    *   OOMs) → drop shingles with df > `maxDf` → self-join on the
    *   shingle key (both sides reuse the window's exchange AND sort —
    *   ReusedExchange + streamed SortMergeJoin, no bucket arrays
    *   materialized, AQE splits any residual hot key) → exchange on
    *   the pair → count common shingles → Jaccard filter. Measured
    *   against a collect_list-bucket + lateral-expansion formulation:
    *   the self-join is faster warm and much faster cold, and its
    *   memory profile is streaming rows instead of O(maxDf) arrays.
    *
    * The df cap is the standard MinHash-era guard: a shingle shared by
    * k docs yields k² pair rows on one shuffle key, and a stopword
    * trigram at corpus scale is a straight quadratic explosion, while
    * carrying ~zero Jaccard signal. Dropping df > maxDf shingles makes
    * the estimate conservative (common count can only shrink); the
    * oracle mirrors the same cap so both engines agree at any scale.
    * Per-doc set size `nsh` still counts ALL shingles and rides along
    * with every exploded row, so no separate per-doc scan or re-join. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      minJac: Double = 0.2, maxDf: Int = 1000): DataFrame = {
    val sh = df
      .select(col(idCol).as("doc"), shingleHashes(col(textCol)).as("arr"))
      .select(col("doc"), size(col("arr")).as("nsh"),
        explode(col("arr")).as("sh"))
    val kept = sh
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("sh"))))
      .filter(col("df") <= maxDf)
      .select(col("doc"), col("nsh"), col("sh"))
    val a = kept.select(col("doc").as("da"), col("nsh").as("na"), col("sh"))
    val b = kept.select(col("doc").as("db"), col("nsh").as("nb"), col("sh"))
    val agg = a.join(b, Seq("sh"))
      .filter(col("da") < col("db"))
      .groupBy(col("da"), col("db"), col("na"), col("nb"))
      .agg(count(lit(1)).as("common"))
    val jac = col("common").cast("double") /
      (col("na") + col("nb") - col("common"))
    agg.filter(jac >= minJac)
      .select(col("da").as("doc_a"), col("db").as("doc_b"), jac.as("jac"))
  }

  /** Incremental-ingestion dedup gate: for each `incoming` doc, decide
    * admission against the existing `base` corpus — dropped on an
    * exact duplicate (md5 of text, the q40 fingerprint) or a
    * near-duplicate (n-gram Jaccard ≥ `minJac` vs ANY base doc).
    * Within-batch duplicates are out of scope by contract (run the
    * self-join family on the batch itself for those).
    *
    * This is the DIRECTED sibling of [[ngramJaccardPairs]]: the
    * inverted-index join is incoming-shingles × base-shingles only,
    * so a daily batch of B docs against a corpus of N never pays the
    * N×N self-join — candidate work is proportional to the batch.
    * The hot-shingle df cap is computed over base ∪ incoming (the
    * corpus as it would look post-ingest), same declared contract as
    * the self-join so an oracle can mirror it. The exact-dup check is
    * a semi join on the md5 fingerprint — hash join on one exchange,
    * no sort. Returns one row per incoming doc:
    * (doc_id, drop_exact, drop_near, is_admitted). */
  def incrementalAdmissions(base: DataFrame, incoming: DataFrame,
      idCol: String, textCol: String,
      minJac: Double = 0.5, maxDf: Int = 1000): DataFrame = {
    def shingleIndex(df: DataFrame) = df
      .select(col(idCol).as("doc"), shingleHashes(col(textCol)).as("arr"))
      .select(col("doc"), size(col("arr")).as("nsh"),
        explode(col("arr")).as("sh"))
    val all = shingleIndex(base).withColumn("inc", lit(false))
      .unionByName(shingleIndex(incoming).withColumn("inc", lit(true)))
    // the capped index feeds BOTH join sides; the lazy checkpoint
    // stops Catalyst re-running the two-table scan + df window per
    // side (the executor-loss recompute trade-off documented on
    // bm25TopK applies)
    val kept = all
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("sh"))))
      .filter(col("df") <= maxDf)
      .barrier()
    val b = kept.filter(!col("inc"))
      .select(col("doc").as("db"), col("nsh").as("nb"), col("sh"))
    val i = kept.filter(col("inc"))
      .select(col("doc").as("di"), col("nsh").as("ni"), col("sh"))
    val jac = col("common").cast("double") /
      (col("ni") + col("nb") - col("common"))
    val near = i.join(b, Seq("sh"))
      .groupBy(col("di"), col("db"), col("ni"), col("nb"))
      .agg(count(lit(1)).as("common"))
      .filter(jac >= minJac)
      .select(col("di").as("doc_id")).distinct()
      .withColumn("dn", lit(true))
    val exact = incoming
      .select(col(idCol).as("doc_id"), md5(col(textCol)).as("fp"))
      .join(base.select(md5(col(textCol)).as("fp")), Seq("fp"),
        "left_semi")
      .select(col("doc_id")).distinct()
      .withColumn("de", lit(true))
    incoming.select(col(idCol).as("doc_id"))
      .join(exact, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("de"), lit(false)).as("drop_exact"),
        coalesce(col("dn"), lit(false)).as("drop_near"),
        (coalesce(col("de"), lit(false)) === lit(false) &&
          coalesce(col("dn"), lit(false)) === lit(false))
          .as("is_admitted"))
  }

  /** Prefix-filtered exact Jaccard self-join (the PPJoin family:
    * Chaudhuri/Ganti/Kaushik SSJoin 2006, Xiao et al. 2008). For a
    * Jaccard threshold t, two shingle sets can only match if they
    * share an element within the first |S| − ⌈t·|S|⌉ + 1 elements
    * under ANY global canonical order — so only that PREFIX enters
    * the inverted index, and the candidate space shrinks by ~t·|S|
    * per doc (5× at t = 0.8) with ZERO false negatives. Candidates
    * are then verified exactly with a sorted-array intersection, so
    * unlike [[ngramJaccardPairs]]'s df-cap contract the result is
    * EXACTLY the true Jaccard-≥-t pair set and the oracle needs no
    * cap mirroring.
    *
    * The canonical order is (document frequency ASC, hash) — rarest
    * first, the classic choice, and at 100 TB also the skew guard:
    * a stopword shingle has huge df, sorts to the END of every doc,
    * and never enters any prefix, so the hot keys that force q41's
    * df cap structurally cannot appear in this index. Costs one df
    * aggregation + one join on the shingle hash (both on the same
    * exchange). Stages: explode distinct hashes (per-doc size rides
    * along) → df agg + annotate → per-doc sort by (df, hash) +
    * prefix slice → self-join prefix index (da < db, pair-distinct)
    * → verify via array_intersect on the full per-doc arrays
    * (candidate-bounded, codegen'd). */
  def prefixJaccardJoin(df: DataFrame, idCol: String, textCol: String,
      minJac: Double = 0.8): DataFrame = {
    // docArr feeds THREE consumers (the prefix index and both sides
    // of the verification join); without the lazy localCheckpoint
    // Catalyst inlines the corpus scan + md5 shingle kernel — the
    // heaviest stage — into each one (Retrieval.bm25TopK precedent).
    val docArr = df
      .select(col(idCol).as("doc"), shingleHashes(col(textCol)).as("arr"))
      .filter(size(col("arr")) > 0)
      .barrier()
    val sh = docArr
      .select(col("doc"), size(col("arr")).as("nsh"),
        explode(col("arr")).as("sh"))
    val dfTab = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val prefix = sh.join(dfTab, "sh")
      .groupBy(col("doc"), col("nsh"))
      .agg(sort_array(collect_list(struct(col("df"), col("sh"))))
        .as("ord"))
      // prefix length |S| − ⌈t·|S|⌉ + 1. The −1e-9 inside ceil biases
      // only DOWNWARD at an exact-integer boundary, which can only
      // LENGTHEN the prefix — extra candidates, never a missed pair
      // (verification is exact, so correctness is one-sided here)
      .select(col("doc"), col("nsh"),
        explode(expr(
          s"""transform(
             |  slice(ord, 1,
             |    nsh - cast(ceil(nsh * $minJac - 1e-9) as int) + 1),
             |  x -> x.sh)""".stripMargin)).as("sh"))
    val cands = prefix.select(col("doc").as("da"), col("sh"))
      .join(prefix.select(col("doc").as("db"), col("sh")), Seq("sh"))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db")).distinct()
    val verified = cands
      .join(docArr.select(col("doc").as("da"), col("arr").as("aa")), "da")
      .join(docArr.select(col("doc").as("db"), col("arr").as("ab")), "db")
      .select(col("da"), col("db"),
        size(array_intersect(col("aa"), col("ab"))).as("common"),
        size(col("aa")).as("na"), size(col("ab")).as("nb"))
    val jac = col("common").cast("double") /
      (col("na") + col("nb") - col("common"))
    verified.filter(jac >= minJac)
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        jac.as("jac"))
  }

  /** Directed near-containment pairs: `(contained, container)` where
    * containment(A ⊆ B) = |shingles(A) ∩ shingles(B)| / |shingles(A)|
    * ≥ `minContain`. The asymmetric complement of [[ngramJaccardPairs]]:
    * a quote, excerpt, or page wrapped in boilerplate has HIGH
    * containment in its source but LOW Jaccard (the union is dominated
    * by the larger doc), so symmetric dedup never sees it — this is the
    * operator that catches subset duplication in a training corpus.
    *
    * Same 100 TB shape as the Jaccard pair join (one shingle-hash
    * exchange reused by both join sides, window df count with the
    * df > `maxDf` hot-shingle cap, pair-key exchange) — see the
    * [[ngramJaccardPairs]] scaladoc for why each stage holds at scale.
    * Differences: the OUTPUT is directional (both directions of each
    * unordered pair, with their own denominators), and docs with fewer
    * than `minShingles` distinct shingles are dropped before the join —
    * a 3-shingle doc is "contained" in anything sharing a phrase, which
    * is noise, and the filter also shrinks the index. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      minContain: Double = 0.5, minShingles: Int = 5,
      maxDf: Int = 1000): DataFrame = {
    val sh = df
      .select(col(idCol).as("doc"), shingleHashes(col(textCol)).as("arr"))
      .select(col("doc"), size(col("arr")).as("nsh"),
        explode(col("arr")).as("sh"))
      .filter(col("nsh") >= minShingles)
    val kept = sh
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("sh"))))
      .filter(col("df") <= maxDf)
      .select(col("doc"), col("nsh"), col("sh"))
    // The JOIN stays on unordered pairs (da < db — half the rows of a
    // da ≠ db join, and both sides reuse one exchange+sort); `common`
    // is symmetric, only the denominator differs per direction, so the
    // two directed rows explode out of each unordered aggregate.
    val a = kept.select(col("doc").as("da"), col("nsh").as("na"), col("sh"))
    val b = kept.select(col("doc").as("db"), col("nsh").as("nb"), col("sh"))
    val agg = a.join(b, Seq("sh"))
      .filter(col("da") < col("db"))
      .groupBy(col("da"), col("db"), col("na"), col("nb"))
      .agg(count(lit(1)).cast("double").as("common"))
    agg
      .select(explode(array(
        struct(col("da").as("contained"), col("db").as("container"),
          (col("common") / col("na")).as("containment")),
        struct(col("db").as("contained"), col("da").as("container"),
          (col("common") / col("nb")).as("containment")))).as("p"))
      .select(col("p.contained").as("contained"),
        col("p.container").as("container"),
        col("p.containment").as("containment"))
      .filter(col("containment") >= minContain)
  }

  /** MinHash permutation parameters (a, b) over the Mersenne prime
    * 2^31-1: h_i(x) = (a_i * (x mod p) + b_i) mod p. a < 2^26 keeps
    * a*x < 2^57 — no Long overflow. */
  val MinHashP: Long = 2147483647L
  val MinHashPerms: Seq[(Long, Long)] =
    Seq((1299721L, 11L), (15485863L, 101L), (32452843L, 1009L),
      (49979687L, 10007L))

  /** One MinHash slot as a NARROW per-row fold: min of the affine map
    * over the document's shingle-hash array. */
  def minhashSlotArray(hashes: Column, a: Long, b: Long): Column =
    array_min(transform(hashes,
      x => (lit(a) * (x % MinHashP) + lit(b)) % MinHashP))

  /** MinHash signatures: one row per doc with sig_0..sig_{k-1}.
    * Computed as a pure projection — per-row array fold, NO shuffle
    * (the min over a document's shingles never needed an aggregation;
    * an explode + groupBy formulation re-shuffles the whole corpus on
    * doc id for nothing). Docs too short to have a shingle produce no
    * row, matching the exploded formulation's semantics. Also the form
    * a streaming pipeline needs: signature available row-by-row with
    * no stateful stage. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    // the shingle-existence filter uses the CHEAP equivalent predicate
    // (token count), not size of the hash array: a predicate on the
    // array would be pushed below the projection and force a second
    // evaluation of the md5 kernel per row. The slots themselves come
    // from ONE native fold (minhash_slots ∘ shingle_hash60) — both
    // codegen'd, so even when CollapseProject inlines the fold into
    // each of the four element_at consumers, whole-stage codegen's
    // subexpression elimination evaluates it once per row (the
    // composed HOF form was CodegenFallback, CSE-exempt, and paid the
    // kernel 4× under the q43 banding explode).
    val slots = call_function("minhash_slots",
      shingleHashes(col(textCol)))
    df.filter(size(tokens(col(textCol))) >= 3)
      .select(col(idCol), slots.as("slots"))
      .select(col(idCol),
        element_at(col("slots"), 1).as("sig_0"),
        element_at(col("slots"), 2).as("sig_1"),
        element_at(col("slots"), 3).as("sig_2"),
        element_at(col("slots"), 4).as("sig_3"))
  }

  /** LSH candidate pairs from MinHash signatures: band the k=4 signature
    * into 4 single-slot bands; docs sharing any (band, value) bucket are
    * candidates. Shaped as ONE shuffle on (band, bucket) + in-bucket
    * pair generation, not a self-join — the signature computation runs
    * once and singleton buckets (the vast majority at any scale) are
    * filtered before any pair exists.
    *
    * Degenerate-bucket bound: a bucket of k docs would emit k²/2 pair
    * rows — quadratic on exact-duplicate mass (billions of identical
    * docs all land in one bucket). Contract: (1) run exact dedup (q40)
    * BEFORE LSH so byte-identical docs are already collapsed —
    * [[exactDedupFirst]] is the structural form, and every registered
    * LSH route (q43/q71/q180, `dedup_audit`) enters through it; (2) as a
    * backstop, all-pairs generation is capped at `maxBucket` docs per
    * bucket (output ≤ maxBucket²/2 rows/bucket) and every doc beyond
    * the cap emits ONE "star" pair to the bucket minimum instead —
    * linear, and connected components downstream (DedupClusters) are
    * unchanged because star edges keep the bucket connected. The
    * aggregation buffer itself stays linear in bucket size, which
    * precondition (1) bounds. */
  /** Default all-pairs cap per LSH bucket — referenced by the q43/q71
    * oracle SQL so both engines apply the identical cap + star rule. */
  val DefaultMaxBucket = 256

  /** Exact-dedup-first: collapse byte-identical text mass to one
    * deterministic keeper (min id per md5 fingerprint) — the
    * STRUCTURAL form of [[lshCandidatePairs]]' precondition (1).
    * Byte-identical docs share every signature, so a flood of them
    * concentrates in single LSH buckets; the maxBucket cap keeps that
    * linear but degrades the candidate set to star pairs. Running the
    * near-dup route over keepers makes the hazard impossible instead
    * of merely bounded: q43/q71/q180 and the `dedup_audit` job all
    * enter LSH through this wrapper (each dropped duplicate is
    * reachable from its keeper via the q40 fingerprint groups, so no
    * information is lost). One hash aggregation over (fingerprint) +
    * a semi join — exactly the q40 shape, linear at any corpus
    * size. */
  def exactDedupFirst(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    df.join(exactKeepers(df, idCol, textCol), Seq(idCol), "left_semi")

  /** The keeper-id relation behind [[exactDedupFirst]] (min id per
    * byte-identical text fingerprint) — exposed for consumers that
    * need the keeper SET without the text columns (one agg, no
    * join). */
  def exactKeepers(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    df.groupBy(md5(col(textCol)).as("__fp"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol))

  /** Uppercase the two hex digits after every `%` escape — RFC 3986
    * §6.2.2.1 case normalization (`%2f` ≡ `%2F`; crawls emit both).
    * Split on `%`, fix each tail's first two chars when they are hex,
    * rejoin — all HOFs, stays in codegen. A `%` not followed by two
    * hex digits (malformed escape) passes through untouched. */
  private def pctUpper(s: Column): Column = {
    val parts = split(s, "%", -1)
    val rest = slice(parts, lit(2), greatest(size(parts) - 1, lit(0)))
    val fixed = transform(rest, p =>
      when(p.rlike("^[0-9a-fA-F]{2}"),
        concat(upper(p.substr(lit(1), lit(2))),
          p.substr(lit(3), length(p)))).otherwise(p))
    // escape-free strings (the overwhelming majority of real URLs)
    // skip the split/transform/rejoin entirely — codegen evaluates
    // `when` branches lazily, so the guard is one instr() per row
    when(instr(s, "%") > 0,
      concat_ws("%", concat(array(element_at(parts, 1)), fixed)))
      .otherwise(s)
  }

  /** Canonical form of a URL for URL-keyed dedup — the normalization
    * a web pipeline runs BEFORE content dedup (two crawls of the same
    * page almost always differ only in URL decoration): strip the
    * scheme, the fragment, every leading `www.` label, a default port
    * (`:80`/`:443` — scheme-blind by design, the scheme is already
    * gone and either default means "the" page), and `utm_*` tracking
    * params; lowercase the HOST (only — paths are case-sensitive);
    * uppercase percent-escape hex (`%2f` → `%2F`, RFC 3986 case
    * normalization) in path and query; collapse duplicate slashes in
    * the PATH (`//a///b` → `/a/b` — never the query, where `//` can
    * be a value); sort the surviving query params (param order is not
    * semantic); normalize an empty path to `/`. Idempotent — every
    * rule is a fixpoint, including the `(www\.)+` strip (a single
    * `www.` strip is NOT idempotent on `www.www.host`). Pure Catalyst
    * string surgery — codegen'd, no UDF — mirrored
    * expression-for-expression in the q286 DuckDB SQL. */
  def canonicalUrl(u: Column): Column = {
    val noFrag = substring_index(u, "#", 1)
    val noScheme =
      regexp_replace(noFrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    // the host ends at the FIRST of '/' or '?' — a pathless
    // `host?query` URL is legal, and treating its query as host
    // would smuggle tracking params through the canonicalization
    // (caught by PropertySpec's idempotence law)
    val si = instr(noScheme, "/")
    val qi = instr(noScheme, "?")
    val cut = when(si > lit(0) && (qi === lit(0) || si < qi), si)
      .when(qi > lit(0), qi).otherwise(lit(0))
    val hostPart = when(cut > lit(0),
      noScheme.substr(lit(1), cut - 1)).otherwise(noScheme)
    val host = regexp_replace(
      regexp_replace(lower(hostPart), "^(www\\.)+", ""),
      ":(80|443)$", "")
    val pathQ = pctUpper(when(cut > lit(0),
      noScheme.substr(cut, length(noScheme))).otherwise(lit("")))
    val path0 =
      regexp_replace(substring_index(pathQ, "?", 1), "/{2,}", "/")
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val qpos = instr(pathQ, "?")
    val query = when(qpos > lit(0),
      pathQ.substr(qpos + 1, length(pathQ))).otherwise(lit(""))
    val params = filter(split(query, "&"),
      p => (p =!= "") && !p.startsWith("utm_"))
    val sortedQ = array_join(array_sort(params), "&")
    concat(host, path,
      when(length(sortedQ) > 0, concat(lit("?"), sortedQ))
        .otherwise(lit("")))
  }

  /** URL-keyed keeper relation: min id per [[canonicalUrl]] group —
    * the URL-first stage a web pipeline composes BEFORE
    * [[exactDedupFirst]] (URL collapse removes recrawl mass without
    * touching content; content dedup then catches same-text pages
    * under different canonical URLs). Same shape as
    * [[exactKeepers]]: one hash aggregation, left-semi join to
    * apply. */
  def urlKeepers(df: DataFrame, idCol: String, urlCol: String)
      : DataFrame =
    df.groupBy(canonicalUrl(col(urlCol)).as("__cu"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol))

  /** URL-first dedup: keep one row (min id) per canonical URL. */
  def urlDedupFirst(df: DataFrame, idCol: String, urlCol: String)
      : DataFrame =
    df.join(urlKeepers(df, idCol, urlCol), Seq(idCol), "left_semi")

  /** The q286 release audit: per canonical URL, how many docs and
    * distinct raw URL decorations collapsed onto it and which id
    * survives — the frame an operator reads to size the URL stage's
    * win before content dedup runs. One aggregation, grouped on a
    * codegen'd scalar; no joins. */
  def urlCanonicalDedup(df: DataFrame, idCol: String, urlCol: String)
      : DataFrame =
    df.select(col(idCol), col(urlCol).as("__url"),
        canonicalUrl(col(urlCol)).as("canonical_url"))
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("__url")).as("n_raw_urls"),
        min(col(idCol)).as("keep_id"))

  def lshCandidatePairs(sigs: DataFrame, idCol: String,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val banded = sigs.select(col(idCol).as("doc"), posexplode(
      array(col("sig_0"), col("sig_1"), col("sig_2"), col("sig_3"))))
      .toDF("doc", "band", "bucket")
    val buckets = banded
      .groupBy(col("band"), col("bucket"))
      .agg(sort_array(collect_set(col("doc"))).as("docs"))
      .filter(size(col("docs")) > 1)
    // all (i < j) pairs among the first maxBucket docs, via HOFs in
    // codegen; overflow docs each pair with the bucket minimum
    val head = slice(col("docs"), 1, maxBucket)
    val allPairs = flatten(
      transform(head, (x, i) =>
        transform(slice(head, i + lit(2), size(head)),
          y => struct(x.as("doc_a"), y.as("doc_b")))))
    val starPairs = transform(
      slice(col("docs"), lit(maxBucket + 1),
        greatest(size(col("docs")) - maxBucket, lit(0))),
      y => struct(element_at(col("docs"), 1).as("doc_a"), y.as("doc_b")))
    val pairs = buckets
      .select(explode(concat(allPairs, starPairs)).as("p"))
    pairs.select(col("p.doc_a"), col("p.doc_b")).distinct()
  }

  /** MinHash Jaccard estimate for candidate pairs: the fraction of
    * agreeing signature slots — the estimator the signatures exist
    * for (E[slots equal] = J(A,B)). Joins the signature table onto
    * both sides of the candidate pairs; with k=4 slots the estimate
    * is coarse by design (banding already filtered to likely-similar
    * pairs; exact verification is q41's job). */
  def minhashJaccardEstimate(pairs: DataFrame, sigs: DataFrame,
      idCol: String): DataFrame = {
    // select the signature columns BY NAME: a reordered or wider sigs
    // frame must not silently mis-label slots (positional toDF would)
    def side(as: String, p: String): DataFrame = sigs.select(
      col(idCol).as(as),
      col("sig_0").as(p + "0"), col("sig_1").as(p + "1"),
      col("sig_2").as(p + "2"), col("sig_3").as(p + "3"))
    val a = side("doc_a", "a")
    val b = side("doc_b", "b")
    pairs.join(a, Seq("doc_a")).join(b, Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        ((when(col("a0") === col("b0"), 1).otherwise(0) +
          when(col("a1") === col("b1"), 1).otherwise(0) +
          when(col("a2") === col("b2"), 1).otherwise(0) +
          when(col("a3") === col("b3"), 1).otherwise(0))
          .cast("double") / 4.0).as("jaccard_est"))
  }

  /** 16-bit SimHash over token frequencies. Per bit j: the sign of
    * sum(freq · ±1) where the sign is bit j of hash60(token); simhash =
    * Σ 2^j · [sum_j > 0]. Computed as a NARROW per-row fold — summing
    * ±1 per token OCCURRENCE equals the frequency-weighted sum over
    * distinct tokens, so no per-(doc, token) aggregation is needed
    * (the exploded formulation cost three corpus shuffles). Token
    * hashes materialize once per row; the 16 bit-folds run over the
    * hash array. Integer sums — order-free, oracle-identical. */
  def simhash16(df: DataFrame, idCol: String, textCol: String): DataFrame =
    simhashN(df, idCol, textCol, 16)

  /** 60-bit SimHash — same construction over all 60 bits of hash60.
    * This is the SCALE variant: 16 bits give only 512 (band, block)
    * buckets, so bucket population — and the quadratic in-bucket pair
    * expansion — grows linearly with the corpus; 60 bits give 2^31
    * buckets and near-dup-only collisions at any corpus size
    * (Manku et al.'s production setting is 64-bit for the same
    * reason). */
  def simhash60(df: DataFrame, idCol: String, textCol: String): DataFrame =
    simhashN(df, idCol, textCol, 60)

  private def simhashN(df: DataFrame, idCol: String, textCol: String,
      nBits: Int): DataFrame =
    df.select(col(idCol),
      // native single-pass fold (graft.functions.SimhashFold): ONE
      // traversal of the hash array instead of nBits interpreted HOF
      // aggregates — the 60-bit variant pays 60 traversals composed
      call_function("simhash_fold",
        transform(tokens(col(textCol)), t => hash60(t)), lit(nBits))
        .as("simhash"))

  /** Deterministic background-pair sample: each id is hashed into one
    * of `buckets` buckets (`hash60(id ∥ salt) % buckets`) and a pair
    * survives iff both ends share a bucket — expected n²/buckets
    * pairs via one EQUI-join, reproducible in an oracle, never a
    * filtered cross join (which would still evaluate all n² pairs;
    * `Similarity.bucketPairHistogram` is the vector-space twin).
    *
    * `buckets` is the scale knob and MUST grow with the corpus:
    * fixed buckets ⇒ in-bucket pairs grow ~n²/buckets, i.e. still
    * quadratic. Pick buckets ≈ n / s for an expected n·s/2 sampled
    * pairs (s = mean bucket size you can afford to pair). Callers
    * that mirror a fixed-modulus oracle (q229 pins 16 at test scale)
    * must treat that value as a calibration-sample setting, not a
    * production one. */
  def backgroundPairSample(df: DataFrame, idCol: String,
      buckets: Long, salt: String = ":shbg"): DataFrame = {
    require(buckets > 0, s"backgroundPairSample: buckets=$buckets")
    val keyed = df.select(col(idCol),
      pmod(hash60(concat(col(idCol).cast("string"), lit(salt))),
        lit(buckets)).as("bk"))
    keyed.as("a")
      .join(keyed.as("b"),
        col("a.bk") === col("b.bk") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_a"),
        col(s"b.$idCol").as("doc_b"))
  }

  /** Attach each pair's two per-doc values and their Hamming distance:
    * `(pairs ⋈ values) ⋈ values` on the two endpoint ids, emitting
    * `bit_count(va ^ vb)` as `hamming`. NO broadcast hint on the
    * value side — at calibration scale AQE broadcasts it on its own,
    * and at corpus scale (10⁸+ docs, where a forced broadcast would
    * OOM the driver) the planner falls back to a shuffled join, which
    * is the right plan there. */
  def hammingForPairs(pairs: DataFrame, values: DataFrame,
      idCol: String, valueCol: String): DataFrame =
    pairs
      .join(values.select(col(idCol).as("doc_a"),
        col(valueCol).as("__va")), Seq("doc_a"))
      .join(values.select(col(idCol).as("doc_b"),
        col(valueCol).as("__vb")), Seq("doc_b"))
      .withColumn("hamming",
        expr("CAST(bit_count(__va ^ __vb) AS INT)"))
      .drop("__va", "__vb")

  /** The built-ins-only per-bit HOF form, kept for parity testing
    * (PropertySpec pins native == composed bit-for-bit, the same
    * contract as [[hash60Composed]]). */
  def simhashNComposed(df: DataFrame, idCol: String, textCol: String,
      nBits: Int): DataFrame = {
    val withHashes = df.select(col(idCol),
      transform(tokens(col(textCol)), t => hash60(t)).as("hs"))
    val bits = (0 until nBits).map { j =>
      val s = aggregate(col("hs"), lit(0L), (acc, h) =>
        acc + when(call_function("shiftright", h, lit(j)) % 2 === 1, 1L)
          .otherwise(-1L))
      when(s > 0, lit(1L << j)).otherwise(lit(0L))
    }
    withHashes.select(col(idCol),
      bits.reduce(_ + _).as("simhash"))
  }

  /** Context-window chunking: split a document into fixed-size token
    * windows with overlap — the embedding/training prep step that turns
    * documents into model-sized sequences. Pure per-row HOFs (slice
    * over the token array at stride `chunk - overlap`), exploded to one
    * row per chunk. Narrow map; no shuffle. */
  def chunkWindows(df: DataFrame, idCol: String, textCol: String,
      chunk: Int = 32, overlap: Int = 8): DataFrame = {
    require(chunk > overlap, "chunk must exceed overlap")
    val step = chunk - overlap
    val toks = tokens(col(textCol))
    val chunks = transform(
      sequence(lit(0), floor((size(toks) - 1) / step).cast("int")),
      i => slice(toks, i * step + lit(1), lit(chunk)))
    df.select(col(idCol), posexplode(chunks).as(Seq("chunk_idx", "c")))
      .select(col(idCol), col("chunk_idx"),
        size(col("c")).as("n_chunk_tokens"),
        hash60(concat_ws(" ", col("c"))).as("chunk_fp"))
  }

  /** Content-defined chunking (CDC): chunk boundaries land where the
    * w-gram fingerprint (`shingleHashesAll`) hits 0 mod `modulus`, so
    * boundary POSITIONS are a function of local content, not of
    * absolute offsets — an edit near the start of a document changes
    * only the chunk(s) it touches, while every downstream chunk keeps
    * its identity (expected chunk length ≈ modulus tokens + the gram
    * width). [[chunkWindows]]' fixed-stride form loses ALL chunk
    * identities under a one-token prepend; CDC keeps all but the
    * first — the property that makes chunk-hash dedup work across
    * corpus VERSIONS (incremental re-release: only changed chunks
    * re-embed / re-process; the storage-dedup trick applied to
    * training data, q246 measures it). Pure per-row HOFs over the
    * positional gram hashes — narrow map, no shuffle; at 100 TB the
    * chunk table is the unit of incremental work, keyed by
    * (doc, chunk_hash).
    *
    * Returns (idCol, chunk_idx, n_tokens, chunk_hash) where
    * chunk_hash = hash60 of the space-joined chunk tokens; chunks
    * partition the token array exactly (LlmOpsSpec pins rebuild). */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
      w: Int = 4, modulus: Int = 16): DataFrame = {
    require(w >= 1 && modulus >= 1, s"cdcChunks: w=$w modulus=$modulus")
    val toks = tokens(col(textCol))
    val hs = shingleHashesAll(col(textCol), w)
    // 0-based gram j covers tokens j+1..j+w (1-based); a hit cuts
    // AFTER token j+w. The final boundary is always the doc end.
    val cuts = filter(
      transform(hs, (h, j) =>
        when(pmod(h, lit(modulus.toLong)) === 0L, j + lit(w))),
      x => x.isNotNull)
    val ends = array_distinct(sort_array(concat(cuts, array(size(toks)))))
    val starts = concat(array(lit(0)), slice(ends, lit(1), size(ends) - 1))
    val spans = zip_with(starts, ends,
      (a, b) => struct(a.as("s"), b.as("e")))
    df.select(col(idCol), toks.as("__toks"),
        posexplode(spans).as(Seq("chunk_idx", "sp")))
      .select(col(idCol), col("chunk_idx"),
        (col("sp.e") - col("sp.s")).as("n_tokens"),
        hash60(array_join(
          slice(col("__toks"), col("sp.s") + 1,
            col("sp.e") - col("sp.s")), " ")).as("chunk_hash"))
  }

  /** PII scrub: replace email-shaped tokens and digit runs, count the
    * redactions — the privacy pass of a curation pipeline. Both
    * patterns are deliberately dialect-neutral (no lookarounds), so
    * any RE2/Java engine agrees. One codegen'd projection. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val NumberPattern = "[0-9]+"

  def piiScrub(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      size(regexp_extract_all(col(textCol), lit(EmailPattern), lit(0)))
        .as("n_emails"),
      size(regexp_extract_all(col(textCol), lit(NumberPattern), lit(0)))
        .as("n_numbers"),
      length(
        regexp_replace(
          regexp_replace(col(textCol), EmailPattern, "<EMAIL>"),
          NumberPattern, "<NUM>")).as("redacted_len"))

  /** SimHash near-duplicate pairs: hamming distance ≤ `maxHamming`
    * over the 16-bit simhash, found via banding (pigeonhole: with the
    * hash split into maxHamming+1 blocks, any pair within distance
    * maxHamming agrees on SOME block) — one shuffle on (band, block
    * value) + in-bucket pairs, then the exact bit_count filter. The
    * simhash computation itself is the narrow [[simhash16]] map, so
    * the whole operator is one exchange + one distinct. */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 1, nBits: Int = 16): DataFrame = {
    require(maxHamming == 1, "banding below implements 2 blocks = maxHamming 1")
    require(nBits % 2 == 0, "2-block banding needs an even bit width")
    val half = 1L << (nBits / 2)
    val sh = simhashN(df, idCol, textCol, nBits)
      .select(col(idCol).as("doc"), col("simhash"))
    // high block via shiftright — EXACT integer floor-div by 2^(n/2).
    // `floor(simhash / half)` would evaluate in DOUBLE: above 2^53 the
    // quotient can round across a block boundary and diverge from the
    // oracle's integer `//` (the same libm/double-boundary class the
    // q78 bucket comment calls out).
    val banded = sh.select(col("doc"), col("simhash"),
      posexplode(array(
        shiftright(col("simhash"), nBits / 2), col("simhash") % half)))
      .toDF("doc", "simhash", "band", "block")
    val buckets = banded
      .groupBy(col("band"), col("block"))
      .agg(sort_array(collect_list(struct(col("doc"), col("simhash"))))
        .as("ds"))
      .filter(size(col("ds")) > 1)
    val pairs = buckets
      .select(posexplode(col("ds")).as(Seq("i", "a")), col("ds"))
      .select(col("a"),
        explode(slice(col("ds"), col("i") + lit(2),
          size(col("ds")) - col("i") - lit(1))).as("b"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
    pairs
  }

  /** Repetition metrics — the Gopher-style quality rules: fraction of
    * duplicated tokens and the share of the most-frequent bigram.
    * Per-row HOFs (the bigram mode is an O(n²) fold over the row's own
    * bigrams — documents are bounded, corpora are not; keeping it
    * narrow beats a per-(doc, bigram) shuffle at any corpus size).
    * Single IEEE divisions of integers — oracle-exact. */
  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val toks = tokens(col(textCol))
    val bigrams = shingles(col(textCol), 2)
    val nt = size(toks)
    val nDist = size(array_distinct(toks))
    val nbg = size(bigrams)
    val topBg = coalesce(
      array_max(transform(array_distinct(bigrams),
        x => size(filter(bigrams, y => y === x)))),
      lit(0))
    df.select(col(idCol),
      ((nt - nDist).cast("double") / nt.cast("double"))
        .as("dup_token_frac"),
      when(nbg === 0, lit(0.0))
        .otherwise(topBg.cast("double") / nbg.cast("double"))
        .as("top_bigram_frac"))
  }

  /** Stopword lists for the heuristic language classifier. */
  val StopEn = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  val StopEs = Seq("el", "la", "de", "y", "en", "es", "que", "un")
  val StopDe = Seq("der", "die", "das", "und", "ist", "ein", "zu", "mit")
  val StopFr = Seq("le", "les", "et", "est", "dans", "pour", "sur", "une")

  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*)))

  /** Within-doc longest repeated n-gram (the Gopher/RefinedWeb
    * repetition-rule family): per document, the largest n ≤ maxN for
    * which some n-gram occurs ≥ 2 times (overlapping occurrences
    * count) and the occurrence count of the most-repeated gram at
    * that n; (0, 0) when nothing repeats. Runs as the native
    * codegen'd `graft.functions.RepeatGram` — a pure per-row
    * projection, because shipping every token of a 100 TB corpus
    * through a groupBy(doc, n, gram) shuffle to compute a per-row
    * number is the canonical scale mistake this engine avoids. */
  def repeatGramMax(df: DataFrame, idCol: String, textCol: String,
      maxN: Int = 8): DataFrame = {
    val rg = call_function("repeat_gram", tokens(col(textCol)),
      lit(maxN))
    df.select(col(idCol), rg.as("rg"))
      .select(col(idCol),
        element_at(col("rg"), 1).as("max_rep_n"),
        element_at(col("rg"), 2).as("n_reps"))
  }

  /** Curation-rule waterfall: apply a FIXED ordered rule set and
    * report, per rule, how many documents fail there first and how
    * many survive rules 1..k — the attrition funnel a curation
    * engineer reads to see which gate eats the corpus. Rules (all
    * integer-rational comparisons, so any engine agrees exactly):
    *
    *   1 min_len         — ≥ 30 tokens;
    *   2 char_per_token  — mean token length in [4.2, 4.9]
    *                       (42·nt ≤ 10·chars ≤ 49·nt);
    *   3 stopword        — stopword-token ratio ≥ 1/32;
    *   4 dup_tokens      — duplicate-token fraction ≤ 13/20;
    *   5 shared_shingles — fraction of the doc's distinct 3-shingles
    *                       shared with ANY other doc ≤ 4/5 (docs with
    *                       no shingle pass — no evidence).
    *
    * Rules 1–4 are per-row projections (narrow at any scale); rule 5
    * is the near-dup-mass statistic: ONE explode + window count on
    * the shingle hash (WindowExec spills; same shape as q73) and one
    * key join back. The funnel itself is a single global aggregation
    * of first-failure indices — ten map-side-combined counters, then
    * `stack` to one row per rule. */
  def filterWaterfall(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    waterfallByGroup(df, idCol, textCol, groupCol = None)

  /** [[filterWaterfall]] sliced per group (e.g. per source): the same
    * ordered rules and first-failure fold, keyed by `groupCol` — the
    * grid that shows WHICH feed dies at WHICH gate. Grouped
    * aggregation instead of the global one; everything else
    * identical. */
  def filterWaterfallBy(df: DataFrame, idCol: String, textCol: String,
      groupCol: String): DataFrame =
    waterfallByGroup(df, idCol, textCol, Some(groupCol))

  /** Per-document first-failing rule index of the waterfall (1-5, or
    * 6 = survives every gate) — the reusable core of the funnel and
    * of any pipeline that needs the gate DECISION per doc
    * (CorpusRelease). Same rules as [[filterWaterfall]]'s scaladoc. */
  def waterfallFirstFail(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val stops = Seq("the", "a", "of", "and", "to", "in", "is", "it")
    val toks = tokens(col(textCol))
    val base = df.select(col(idCol),
      size(toks).cast("long").as("nt"),
      length(regexp_replace(col(textCol), " ", "")).cast("long")
        .as("nc"),
      size(array_distinct(toks)).cast("long").as("nd"),
      size(filter(toks, x => x.isInCollection(stops))).cast("long")
        .as("he"))
    val sh = df.select(col(idCol),
      explode(shingleHashes(col(textCol))).as("sh"))
    val mass = sh
      .withColumn("cdf",
        count(lit(1)).over(Window.partitionBy(col("sh"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("nsh"),
        sum(when(col("cdf") > 1, 1L).otherwise(0L)).as("ndup"))
    base.join(mass, Seq(idCol), "left")
      .select(col(idCol),
        when(col("nt") < 30, 1)
          .when(col("nc") * 10 < col("nt") * 42 ||
            col("nc") * 10 > col("nt") * 49, 2)
          .when(col("he") * 32 < col("nt"), 3)
          .when((col("nt") - col("nd")) * 20 > col("nt") * 13, 4)
          .when(coalesce(col("ndup"), lit(0L)) * 5 >
            coalesce(col("nsh"), lit(0L)) * 4, 5)
          .otherwise(6).as("ff"))
  }

  private def waterfallByGroup(df: DataFrame, idCol: String,
      textCol: String, groupCol: Option[String]): DataFrame = {
    val gcols = groupCol.toSeq
    val ff = df.select((col(idCol) +: gcols.map(col)): _*)
      .join(waterfallFirstFail(df, idCol, textCol), Seq(idCol))
      .select((gcols.map(col) :+ col("ff")): _*)
    def dropped(k: Int) = sum(when(col("ff") === k, 1L).otherwise(0L))
    def surviving(k: Int) = sum(when(col("ff") > k, 1L).otherwise(0L))
    val counters = Seq(
      dropped(1).as("d1"), surviving(1).as("s1"),
      dropped(2).as("d2"), surviving(2).as("s2"),
      dropped(3).as("d3"), surviving(3).as("s3"),
      dropped(4).as("d4"), surviving(4).as("s4"),
      dropped(5).as("d5"), surviving(5).as("s5"))
    val agged = groupCol match {
      case Some(g) => ff.groupBy(col(g))
        .agg(counters.head, counters.tail: _*)
      case None => ff.agg(counters.head, counters.tail: _*)
    }
    val stacked =
      """stack(5,
        |  1, 'min_len',         d1, s1,
        |  2, 'char_per_token',  d2, s2,
        |  3, 'stopword',        d3, s3,
        |  4, 'dup_tokens',      d4, s4,
        |  5, 'shared_shingles', d5, s5)
        |AS (rule_idx, rule_name, n_dropped, n_surviving)""".stripMargin
    agged.selectExpr(gcols ++ Seq(stacked): _*)
  }

  /** Cross-document duplicated-span extraction — the positional form
    * of exact substring dedup (the operator a "dedup the repeated
    * passages, not whole documents" pipeline needs; q73 measures the
    * duplicated MASS, this one finds WHERE it sits). Per document:
    * every token position whose k-gram also occurs in ANOTHER
    * document marks tokens [p, p+k−1] as duplicated; overlapping or
    * adjacent marked intervals merge into maximal spans (the classic
    * gaps-and-islands fold). Output per doc: token count, number of
    * maximal duplicated spans, tokens covered by them, and the
    * covered fraction; docs with no cross-doc gram keep zeros.
    *
    * 100 TB shape: one positional explode → one distinct + hash
    * aggregation for per-gram doc counts (partial-aggregated; no
    * window over the gram key) → one shuffle join back on the gram
    * hash → per-doc window for the island fold (partitioned by doc —
    * never global). The gram-hash join key is uniform by
    * construction; a boilerplate gram shared by millions of docs
    * multiplies only its own positions, linear in true duplication
    * mass. */
  def dupSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val base = df.select(col(idCol),
      size(tokens(col(textCol))).cast("long").as("nt"),
      shingleHashesAll(col(textCol), n).as("hs"))
    val pos = base.select(col(idCol), col("nt"),
      posexplode(col("hs")).as(Seq("p", "gh")))
    val docGram = pos.select(col(idCol), col("gh")).distinct()
    val shared = docGram
      .groupBy(col("gh")).agg(count(lit(1)).as("gdf"))
      .filter(col("gdf") > 1)
      .select(col("gh"))
    val rep = pos.join(shared, Seq("gh"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("p"))
    val islands = rep
      .withColumn("newi",
        when(col("p") > coalesce(lag(col("p"), 1).over(w),
          lit(Long.MinValue)) + n, 1L).otherwise(0L))
      .withColumn("island",
        sum(col("newi")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("nt"), col("island"))
      .agg((max(col("p")) - min(col("p")) + n).as("covered"))
      .groupBy(col(idCol), col("nt"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("covered")).as("covered_tokens"))
    df.select(col(idCol), size(tokens(col(textCol))).cast("long")
        .as("n_tokens"))
      .join(islands.select(col(idCol), col("n_spans"),
        col("covered_tokens")), Seq(idCol), "left")
      .select(col(idCol),
        col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        (coalesce(col("covered_tokens"), lit(0L)).cast("double") /
          col("n_tokens").cast("double")).as("dup_span_frac"))
  }

  /** Passage-level dedup REWRITE — the acting half of [[dupSpans]]:
    * tokens covered by any cross-document duplicated span are removed
    * and the survivors re-joined in order, giving the deduplicated
    * text a training run consumes. Contract: symmetric removal (every
    * doc sharing a gram loses the span — the conservative "boilerplate
    * scrub" policy; an ownership-keeping variant needs a global
    * keeper election, which is [[ngramJaccardPairs]]+DedupClusters
    * territory). Per doc the covered-position set rides back as ONE
    * array (collect_set, bounded by doc length) and the rewrite is a
    * per-row indexed filter — no token-level shuffle beyond the span
    * detection itself. */
  def removeDupSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val pos = df.select(col(idCol),
      posexplode(shingleHashesAll(col(textCol), n)).as(Seq("p", "gh")))
    val shared = pos.select(col(idCol), col("gh")).distinct()
      .groupBy(col("gh")).agg(count(lit(1)).as("gdf"))
      .filter(col("gdf") > 1)
      .select(col("gh"))
    val covered = pos.join(shared, Seq("gh"))
      .select(col(idCol),
        explode(sequence(col("p"), col("p") + (n - 1))).as("ci"))
      .distinct()
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("ci"))).as("cov"))
    df.select(col(idCol), tokens(col(textCol)).as("toks"))
      .join(covered, Seq(idCol), "left")
      // null-safe BEFORE any use: cov is NULL for uncovered docs
      .withColumn("cov", coalesce(col("cov"), array().cast("array<int>")))
      .select(col(idCol), col("toks"), col("cov"),
        // gap extraction off the SORTED covered list: between
        // consecutive covered positions a < b the kept run is
        // a+1..b-1, with sentinels -1 and n_tokens closing the ends.
        // O(n_tokens + n_covered) per row — an indexed
        // `filter(toks, i => !array_contains(cov, i))` is
        // O(n_tokens · n_covered), the same per-row quadratic shape
        // the shingle-kernel fix removed (heavily-duplicated long
        // docs are exactly where this operator does the most work)
        concat(array(lit(-1)), col("cov"),
          array(size(col("toks")))).as("bounds"))
      .select(col(idCol),
        size(col("toks")).cast("long").as("n_tokens"),
        size(col("cov")).cast("long").as("n_removed"),
        concat_ws(" ", flatten(zip_with(
          slice(col("bounds"), lit(1), size(col("bounds")) - 1),
          slice(col("bounds"), lit(2), size(col("bounds")) - 1),
          (a, b) => slice(col("toks"), a + lit(2), b - a - 1))))
          .as("text_deduped"))
  }

  /** Heuristic language ID: stopword-hit argmax with a fixed tie-break
    * (de < en < es < fr), 'und' when no list matches. One narrow map. */
  def langId(text: Column): Column = {
    val t = tokens(text)
    val (en, es, de, fr) =
      (hits(t, StopEn), hits(t, StopEs), hits(t, StopDe), hits(t, StopFr))
    val best = greatest(en, es, de, fr)
    when(best === 0, "und")
      .when(de === best, "de")
      .when(en === best, "en")
      .when(es === best, "es")
      .otherwise("fr")
  }

  /** Quality metrics: token count, average token length, stopword ratio
    * and a bounded composite score — the length/stopword heuristics of
    * training-data filtering, all in one codegen'd projection.
    *
    * Determinism: every metric is ONE IEEE division of integers —
    * bit-exact in any engine. No rounding: `round(x, n)` on a value
    * whose exact decimal expansion ends in 5 at position n+1 (e.g.
    * 0.2878125 at n=6) is a half-tie that engines break differently.
    * The composite is the integer rational
    * (800·stop + 6·nt·min(nt,100) + 75·min(chars,8·nt)) / (2000·nt),
    * algebraically 0.4·stopRatio + 0.3·min(nt/100,1) + 0.3·min(avg/8,1). */
  def qualityColumns(text: Column): Seq[Column] = {
    val t = tokens(text)
    val nTok = size(t).cast("long")
    val charNoSpace = length(regexp_replace(text, " ", "")).cast("long")
    val stop = hits(t, StopEn).cast("long")
    val avgLen = charNoSpace.cast("double") / nTok.cast("double")
    val stopRatio = stop.cast("double") / nTok.cast("double")
    val scoreNum = lit(800L) * stop +
      lit(6L) * nTok * least(nTok, lit(100L)) +
      lit(75L) * least(charNoSpace, lit(8L) * nTok)
    val score = scoreNum.cast("double") / (lit(2000.0) * nTok.cast("double"))
    Seq(size(t).as("n_tokens"), avgLen.as("avg_token_len"),
      stopRatio.as("stopword_ratio"), score.as("quality_score"))
  }

  /** BPE-ish subword token count: runs of letters, runs of digits, and
    * single other non-space chars. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("([A-Za-z]+|[0-9]+|[^A-Za-z0-9 ])"),
      lit(1)))

  /** Rolling-hash document fingerprint: min of hash60 over all char
    * 5-grams (winnowing with window = whole doc). Narrow map stage. */
  def fingerprint(text: Column, gram: Int = 5): Column = {
    val grams = transform(
      sequence(lit(1), greatest(length(text) - (gram - 1), lit(1))),
      i => substring(text, i, lit(gram)))
    array_min(transform(grams, g => hash60(g)))
  }

  /** Benchmark decontamination: per training doc, how many of its
    * distinct n-gram shingles appear ANYWHERE in the eval set — the
    * pre-training hygiene check that keeps eval data out of the
    * training corpus (run before every data release).
    *
    * 100 TB shape: eval sets are benchmark-sized (thousands of docs,
    * ≤ millions of distinct shingles) while the training corpus is the
    * 100 TB side — so the eval shingle set is distinct-ed and
    * BROADCAST, and the training side never shuffles for the probe
    * (explode → broadcast-hash lookup). The only exchange is the
    * re-aggregation to one row per training doc. `explode_outer`
    * keeps shingle-less (short) docs in the output with zero counts —
    * a doc too short to shingle is trivially uncontaminated, not
    * missing. */
  def decontaminate(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val evalSh = eval
      .select(explode(transform(shingles(col(textCol)),
        g => hash60(g))).as("esh"))
      .distinct()
    val trainSh = train
      .select(col(idCol), shingleHashes(col(textCol)).as("arr"))
      .select(col(idCol), size(col("arr")).cast("long").as("n_shingles"),
        explode_outer(col("arr")).as("sh"))
    trainSh
      .join(broadcast(evalSh), col("sh") === col("esh"), "left")
      .groupBy(col(idCol), col("n_shingles"))
      .agg(count(col("esh")).as("n_hit"))
      .select(col(idCol), col("n_shingles"), col("n_hit"),
        (col("n_hit") > 0).as("contaminated"))
  }

  /** Bloom-filter decontamination — the sketch form of
    * [[decontaminate]] for eval suites whose distinct shingle set is
    * too large to broadcast exactly: at 1% fpp a Bloom filter costs
    * ~1.2 bytes per eval shingle versus ~16+ for the exact broadcast
    * relation, so a 100M-shingle benchmark union fits in ~120 MB of
    * executor memory instead of ~2 GB. The filter is built once over
    * the (benchmark-sized) eval side with `DataFrameStatFunctions
    * .bloomFilter`, broadcast, and probed per training shingle in a
    * narrow map — the 100 TB training side never shuffles for the
    * probe at all (one exchange fewer than [[decontaminate]]: even
    * the per-doc re-aggregation disappears because the probe counts
    * inside the row's shingle array).
    *
    * Error contract: NO false negatives (a contaminated doc is always
    * flagged — the hygiene-critical direction); clean shingles
    * false-positive at ≈ fpp, so `n_hit` is an upper bound on the
    * true count and `contaminated` over-flags at most fpp per
    * shingle. Sketch contents are engine-specific → spec-verified
    * against the exact operator (q55 rows-only precedent for the
    * gate).
    *
    * The probe stays entirely in Catalyst: Spark's own
    * `BloomFilterMightContain` expression (implemented for the
    * runtime-filter planner, absent from the SQL registry) is exposed
    * via the session extensions as `graft_might_contain`, and the
    * per-row hit count is `size(filter(arr, might_contain))` — a
    * higher-order fold over the serialized filter shipped as one
    * binary literal in the plan. Identical bit layout to the
    * driver-built sketch (`stat.bloomFilter` and the expression share
    * `util.sketch.BloomFilter`), so the switch from the old Scala-UDF
    * probe is behavior-preserving (the parity spec pins it). */
  def bloomDecontaminate(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, fpp: Double = 0.01): DataFrame = {
    val evalSh = eval
      .select(explode(shingleHashes(col(textCol))).as("esh"))
      .distinct()
    // two driver-coordinated jobs over the BENCHMARK-sized side only
    // (count sizes the filter honestly; build aggregates the sketch)
    val n = evalSh.count()
    val base = train
      .select(col(idCol), shingleHashes(col(textCol)).as("arr"))
    if (n == 0L) {
      // shingle-less eval suite: nothing can be contaminated, and a
      // zero-item BloomFilter's bit buffer is null (probing it NPEs)
      return base.select(col(idCol),
        size(col("arr")).cast("long").as("n_shingles"),
        lit(0L).as("n_hit"))
        .withColumn("contaminated", lit(false))
    }
    val bloom = evalSh.stat.bloomFilter("esh", n, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    val hits = size(filter(col("arr"),
      x => call_function("graft_might_contain", lit(bos.toByteArray), x)))
    base.select(col(idCol),
        size(col("arr")).cast("long").as("n_shingles"),
        coalesce(hits.cast("long"), lit(0L)).as("n_hit"))
      .withColumn("contaminated", col("n_hit") > 0)
  }

  /** Multi-n contamination curve: [[decontaminate]]'s summary swept
    * over several shingle widths in ONE corpus pass. A single-n
    * overlap check is a point estimate — short n over-flags (common
    * phrases), long n under-flags (paraphrased leakage slips through);
    * the curve of contamination fraction vs n is the report an eval
    * suite's hygiene review actually reads (hits that persist to long
    * n are verbatim leakage; hits that die at n=5 are phrase noise).
    *
    * Scale shape: each side is scanned ONCE — the per-n shingle arrays
    * fan out row-locally from the one token split (explode of an
    * n-tagged struct array, no re-scan per n); the eval side's
    * distinct (n, shingle) set is benchmark-sized and broadcasts; the
    * training side probes it with a broadcast semi-join, so the corpus
    * never shuffles. Contaminated docs (the only rows that survive the
    * probe) pay one distinct; the three per-n summaries are class
    * tables joined at size |ns|. */
  def contaminationCurve(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String,
      ns: Seq[Int] = Seq(3, 5, 8, 13)): DataFrame = {
    def tagged(df: DataFrame): DataFrame = df
      .select(col(idCol), explode(array(ns.map(n =>
        struct(lit(n).as("n"),
          shingleHashes(col(textCol), n).as("arr"))): _*)).as("s"))
      .select(col(idCol), col("s.n").as("n"), col("s.arr").as("arr"))
    // benchmark-sized; barrier'd — consumed by the count AND the
    // probe, and the checkpoint keeps the eval scan + distinct out
    // of both consumers' plans
    val evalSh = {
      import graft.core.Checkpoints.BarrierOps
      tagged(eval)
        .select(col("n").as("en"), explode(col("arr")).as("esh"))
        .distinct()
        .barrier()
    }
    val evalCounts = evalSh.groupBy(col("en").as("n"))
      .agg(count(lit(1)).as("n_eval_shingles"))
    val trainTagged = tagged(train).filter(size(col("arr")) > 0)
    val trainDocs = trainTagged.groupBy(col("n"))
      .agg(count(lit(1)).as("n_train_docs"))
    val contaminated = trainTagged
      .select(col(idCol), col("n"), explode(col("arr")).as("sh"))
      .join(broadcast(evalSh),
        col("n") === col("en") && col("sh") === col("esh"), "left_semi")
      .select(col(idCol), col("n")).distinct()
      .groupBy(col("n")).agg(count(lit(1)).as("n_contaminated"))
    // the three summaries are |ns|-row class tables — broadcast the
    // join sides so the report assembly adds zero exchanges
    trainDocs
      .join(broadcast(evalCounts), Seq("n"), "left")
      .join(broadcast(contaminated), Seq("n"), "left")
      .select(col("n"),
        coalesce(col("n_eval_shingles"), lit(0L)).as("n_eval_shingles"),
        col("n_train_docs"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        when(col("n_train_docs") > 0,
          coalesce(col("n_contaminated"), lit(0L)).cast("double")
            / col("n_train_docs").cast("double"))
          .otherwise(lit(0.0)).as("frac_contaminated"))
  }

  /** MinHash containment estimates over the LSH candidate pairs —
    * the asymmetric "A inside B" reading of a near-dup candidate:
    * containment is recovered from the signature-level Jaccard
    * estimate plus the two exact set sizes (which every doc carries
    * anyway): C(A⊆B) = Ĵ·(|A|+|B|) / ((1+Ĵ)·|A|) — the algebraic
    * inversion of J = ∩/(∪). The exact candidate-restricted
    * intersection rides along as the audit columns (candidates are
    * LSH-bounded, so the exact verify never goes quadratic; same
    * est-vs-exact calibration shape as q224).
    *
    * Candidate recall caveat: the banding recalls by JACCARD, so a
    * short quote buried in a much longer doc (high containment, low
    * J) is often NOT a candidate here — quote-detection decisions
    * belong to [[containmentPairs]]' exact inverted index and
    * [[containedDropList]] (q99/q279); this view calibrates the
    * sketch estimator on the pairs the near-dup engine surfaces.
    *
    * Scale shape: [[exactDedupFirst]] → signatures (narrow projection)
    * → capped LSH banding → per-pair joins against the signature and
    * size tables. Every relation after banding is candidate-sized. */
  def minhashContainment(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    containmentOverDeduped(exactDedupFirst(df, idCol, textCol), idCol,
      textCol)

  /** [[minhashContainment]]'s core over an ALREADY exact-deduped
    * corpus. `dd` is deliberately NOT barriered even though both the
    * signature and the size side read it: each side prunes to
    * (id, text) at the scan, so re-computing the dedup agg twice
    * against columnar storage beats checkpointing the full corpus
    * text once (the barrier would write every byte of text to
    * checkpoint storage). */
  private def containmentOverDeduped(dd: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    import graft.core.Checkpoints.BarrierOps
    // sigs feed the banding AND both estimate sides; sz both exact
    // sides — barrier each so the shingle kernel runs once
    val sigs = minhashSignatures(dd, idCol, textCol).barrier()
    val pairs = lshCandidatePairs(sigs, idCol)
    val est = minhashJaccardEstimate(pairs, sigs, idCol)
    val sz = dd
      .select(col(idCol), shingleHashes(col(textCol)).as("arr"))
      .filter(size(col("arr")) > 0)
      .barrier()
    def side(as: String, arr: String, n: String): DataFrame = sz.select(
      col(idCol).as(as), col("arr").as(arr),
      size(col("arr")).cast("long").as(n))
    est
      .join(side("doc_a", "arr_a", "na"), Seq("doc_a"))
      .join(side("doc_b", "arr_b", "nb"), Seq("doc_b"))
      .withColumn("common",
        size(array_intersect(col("arr_a"), col("arr_b"))).cast("long"))
      .select(col("doc_a"), col("doc_b"), col("jaccard_est"),
        col("na"), col("nb"), col("common"),
        contEst(col("na")).as("cont_a_in_b_est"),
        contEst(col("nb")).as("cont_b_in_a_est"),
        (col("common").cast("double") / col("na").cast("double"))
          .as("cont_a_in_b"),
        (col("common").cast("double") / col("nb").cast("double"))
          .as("cont_b_in_a"))
  }

  /** Ĉ = Ĵ·(na+nb) / ((1+Ĵ)·denom): containment from the Jaccard
    * estimate + exact sizes ([[minhashContainment]]). */
  private def contEst(denom: Column): Column =
    (col("jaccard_est") * (col("na") + col("nb")).cast("double")) /
      ((lit(1.0) + col("jaccard_est")) * denom.cast("double"))

  /** Quoted-document drop list — the release decision the containment
    * family exists for: over the exact-deduped corpus, drop every doc
    * ≥ `minContainment` contained in another (a doc that is mostly a
    * quote of a longer doc adds no novel text, but symmetric near-dup
    * Jaccard never flags it). Candidates come from
    * [[containmentPairs]]' exact df-capped inverted index, NOT the
    * MinHash banding: LSH recalls by JACCARD, and the quote pairs
    * this operator targets are precisely the low-Jaccard ones the
    * banding misses ([[minhashContainment]] is the estimator-
    * calibration view over the near-dup candidates, a different
    * question). Mutual ≥τ containment (near-identical sets) keeps the
    * lower id; one-directional containment implies the container has
    * the strictly larger shingle set, so no size column is needed.
    * Drop decisions are per-pair and independent (a quote chain
    * A⊂B⊂C drops A and B; C carries the text). Returns one row per
    * exact-dedup keeper: (doc_id, n_containers, is_kept).
    *
    * Scale shape: one inverted-index pass (df-capped, window-spilled)
    * + a pair-table self-join for mutual detection (pairs barrier'd —
    * read twice) + one join against keeper ids. */
  def containedDropList(df: DataFrame, idCol: String, textCol: String,
      minContainment: Double = 0.9, minShingles: Int = 5,
      maxDf: Int = 1000): DataFrame = {
    import graft.core.Checkpoints.BarrierOps
    val dd = exactDedupFirst(df, idCol, textCol)
    val p = containmentPairs(dd, idCol, textCol, minContainment,
      minShingles, maxDf)
      .select(col("contained").as("x"), col("container").as("y"))
      .barrier()
    val rev = p.select(col("x").as("ry"), col("y").as("rx"))
    val drops = p
      .join(rev, col("x") === col("rx") && col("y") === col("ry"),
        "left")
      .filter(col("rx").isNull || col("x") > col("y"))
      .groupBy(col("x").as("doc"))
      .agg(count(lit(1)).as("n_containers"))
    exactKeepers(df, idCol, textCol)
      .select(col(idCol).as("doc"))
      .join(drops, Seq("doc"), "left")
      .select(col("doc").as(idCol),
        coalesce(col("n_containers"), lit(0L)).as("n_containers"),
        col("n_containers").isNull.as("is_kept"))
  }

  /** Longest common token run per candidate pair — the substring-level
    * diagnostic behind "deduplicate exact spans, not whole documents"
    * (cf. training-data dedup at the 50-token granularity): for each
    * near-dup candidate pair, the length in TOKENS of the longest
    * contiguous span both docs share. Same-hash shingles of the two
    * docs join on value; equal-diagonal (pa − pb) matches that sit at
    * consecutive positions form islands (grp = pa − row_number), and
    * the longest island + (n−1) is the shared token span.
    *
    * Scale shape: every relation is bounded by the CANDIDATE PAIR set
    * (the caller passes q41/q126-style bounded pairs, so the match
    * join is |pairs| × shared-shingles, never corpus²); the island
    * window partitions by (pair, diagonal) — millions of tiny
    * partitions, the shape window sorts handle best. Repeated
    * shingles inside a doc produce all alignments, which LCS
    * requires. */
  def longestCommonRun(df: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      n: Int = 3): DataFrame = {
    // both the position index (A and B sides of the match join) and
    // the candidate pairs (whose generating pipeline is itself deep)
    // feed two consumers — checkpoint each once (q126 docArr
    // precedent) so the shingle kernel and the pair pipeline are not
    // inlined per consumer
    val pos = df.select(col(idCol).as("doc"),
        posexplode(shingles(col(textCol), n)).as(Seq("p", "g")))
      .select(col("doc"), col("p"), hash60(col("g")).as("sh"))
      .barrier()
    val m = pairs.select(col(aCol).as("da"), col(bCol).as("db"))
      .barrier()
      .join(pos.select(col("doc").as("da"), col("p").as("pa"),
        col("sh")), Seq("da"))
      .join(pos.select(col("doc").as("db"), col("p").as("pb"),
        col("sh")), Seq("db", "sh"))
    m.select(col("da"), col("db"), (col("pa") - col("pb")).as("diag"),
        col("pa"), (col("pa") - row_number().over(
          Window.partitionBy(col("da"), col("db"), col("pa") - col("pb"))
            .orderBy(col("pa")))).as("grp"))
      .groupBy(col("da"), col("db"), col("diag"), col("grp"))
      .agg(count(lit(1)).as("run"))
      .groupBy(col("da"), col("db"))
      .agg((max(col("run")) + (n - 1)).as("lcs_tokens"))
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        col("lcs_tokens"))
  }

  /** Chi-square keyness: the terms that most distinguish a focus
    * corpus from a reference corpus (keyword extraction / domain-drift
    * detection for training mixes). For each term with document
    * frequency a in focus and b in reference (c, d the complements):
    *
    *   χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d)),  N = Nf + Nr
    *
    * All terms of the formula are exact DECIMAL(38,0) integers — the
    * single IEEE division at the end makes the score (and therefore
    * the top-N cut, tie-broken by term) bit-identical across engines.
    * No log-likelihood variant on purpose: G² needs ln(), and libm
    * rounding differs across engines (q57/q87 precedent).
    *
    * Shape: per-corpus distinct (doc, term) explode → ONE hash agg per
    * term over the flagged union; corpus sizes arrive as a one-row
    * broadcast (never a driver-side count()); top-N cut is
    * TakeOrderedAndProject. Vocabulary-sized intermediate, no joins on
    * the corpus side. */
  def chiSquareKeyness(focus: DataFrame, reference: DataFrame,
      idCol: String, textCol: String, topN: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def docTerms(df: DataFrame, flag: Int) = df
      .select(col(idCol),
        explode(array_distinct(tokens(col(textCol)))).as("term"))
      .select(col("term"), lit(flag).as("is_focus"))
    val perTerm = docTerms(focus, 1).unionAll(docTerms(reference, 0))
      .groupBy(col("term"))
      .agg(sum(col("is_focus")).cast("long").as("df_focus"),
        sum(lit(1) - col("is_focus")).cast("long").as("df_ref"))
    val totals = focus.agg(count(lit(1)).as("_nf"))
      .crossJoin(reference.agg(count(lit(1)).as("_nr")))
    val d38 = DecimalType(38, 0)
    val a = col("df_focus").cast(d38)
    val b = col("df_ref").cast(d38)
    val c = col("_nf").cast(d38) - a
    val dd = col("_nr").cast(d38) - b
    val n = (col("_nf") + col("_nr")).cast(d38)
    val num = n * (a * dd - b * c) * (a * dd - b * c)
    val den = (a + b) * (c + dd) * (a + c) * (b + dd)
    perTerm.crossJoin(broadcast(totals))
      .select(col("term"), col("df_focus"), col("df_ref"),
        when(den === 0, lit(null).cast("double"))
          .otherwise(num.cast("double") / den.cast("double"))
          .as("chi2"))
      .orderBy(col("chi2").desc_nulls_last, col("term"))
      .limit(topN)
  }

  /** Bigram language-model counts: for every adjacent token pair, the
    * pair count, the first-token continuation mass, and the
    * conditional probability c(w1 w2)/c(w1 ·) — the n-gram LM
    * estimation step (and the repeated-collocation miner when sorted
    * by count). Bigrams come from a position-indexed `transform` over
    * the token array — no self-join, no window over raw rows. The
    * denominator is a window sum over the AGGREGATED bigram table
    * partitioned by w1 (vocabulary-sized, spillable — q57's df
    * precedent), so the raw corpus is touched exactly once. minCount
    * bounds the output (counts are exact, so the cut is total). */
  def bigramCounts(df: DataFrame, textCol: String,
      minCount: Long): DataFrame = {
    val toks = tokens(col(textCol))
    val pairs = df
      .select(toks.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        """transform(slice(toks, 1, size(toks) - 1),
          |  (w, i) -> struct(w AS w1, toks[i + 1] AS w2))"""
          .stripMargin)).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val counted = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    counted
      .withColumn("c1",
        sum(col("c12")).over(Window.partitionBy(col("w1"))))
      .filter(col("c12") >= minCount)
      .select(col("w1"), col("w2"), col("c12"), col("c1"),
        (col("c12").cast("double") / col("c1").cast("double"))
          .as("p_cond"))
  }

  /** Cross-document duplicate n-gram fraction: per doc, the share of
    * its distinct shingles that occur in MORE THAN ONE document
    * corpus-wide — the cross-doc repetition signal quality filters
    * threshold on (a doc made of boilerplate shared across the corpus
    * scores ~1 even when no single near-duplicate partner exists, so
    * pairwise dedup never catches it).
    *
    * Shape: explode distinct per-doc shingle hashes (per-doc size
    * rides along), document frequency via a window over the shingle
    * key (WindowExec spills — a corpus-wide stopword shingle cannot
    * OOM an aggregation buffer), then one re-aggregation per doc. Two
    * exchanges total, both on well-distributed keys; no pair
    * generation anywhere, so unlike Jaccard pipelines there is no
    * quadratic term to cap. */
  def dupNgramFraction(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val sh = df
      .select(col(idCol), shingleHashes(col(textCol)).as("arr"))
      .select(col(idCol), size(col("arr")).cast("long").as("n_ngrams"),
        explode_outer(col("arr")).as("sh"))
    val withDf = sh.withColumn("df",
      count(col("sh")).over(Window.partitionBy(col("sh"))))
    withDf
      .groupBy(col(idCol), col("n_ngrams"))
      .agg(sum(when(col("df") > 1, 1L).otherwise(0L)).as("n_dup"))
      .select(col(idCol), col("n_ngrams"), col("n_dup"),
        when(col("n_ngrams") > 0,
          col("n_dup").cast("double") / col("n_ngrams").cast("double"))
          .otherwise(lit(0.0)).as("dup_fraction"))
  }

  /** Percentile-based quality gate: within each `groupCol` (language,
    * domain, source…), keep rows whose `scoreCol` sits at or above the
    * `minPercentile`-th percentile of the group — "drop the worst 20%
    * of every language" without choosing per-language absolute
    * thresholds. `pr` = percent_rank over a TOTAL order (tieCol breaks
    * score ties), so the kept set is deterministic and the fraction
    * dropped is exact. One exchange on the group key; WindowExec
    * sorts/spills per group — no driver-side quantile estimation, and
    * unlike approxQuantile the cut is exact and reproducible.
    *
    * A single-row group's row has pr = 0 (percent_rank's 0/0 case), so
    * a naive `pr >= q` gate would drop a tail language's ONLY document
    * — singleton groups are therefore always kept. */
  def percentileGate(df: DataFrame, groupCol: String, scoreCol: String,
      tieCol: String, minPercentile: Double): DataFrame = {
    val byGroup = Window.partitionBy(col(groupCol))
    val w = byGroup.orderBy(col(scoreCol), col(tieCol))
    df.withColumn("pr", percent_rank().over(w))
      .withColumn("__n", count(lit(1)).over(byGroup))
      .filter(col("pr") >= minPercentile || col("__n") === 1)
      .drop("__n")
  }

  /** Global segment-level dedup with reassembly — the C4/RefinedWeb
    * "remove boilerplate lines across the corpus" pass. Documents are
    * cut into consecutive `segTokens`-token segments; a segment
    * survives only at its FIRST corpus occurrence (min (doc, pos)
    * order); each document is reassembled from its surviving segments
    * in original order. Output per doc: segment counts and the
    * rebuilt text's length + md5 (the digest keeps the verifiable
    * surface small — callers wanting the text itself take
    * `rebuilt`).
    *
    * Shape: narrow per-row segmentation (no shuffle), ONE exchange on
    * the segment value for the first-occurrence window, one hash agg
    * back on the doc id for reassembly. The window partitions by the
    * raw segment string here; at 100 TB you'd key by `hash60(seg)`
    * instead (same plan, 8-byte keys) — the string key keeps the
    * DuckDB oracle byte-identical. Duplicate-heavy segments are ONE
    * window partition each — a corpus-constant boilerplate line is a
    * hot key, but the window only sorts it, never pairs it
    * (WindowExec spills; no quadratic blowup). */
  def segmentDedup(df: DataFrame, idCol: String, textCol: String,
      segTokens: Int = 16): DataFrame = {
    val toks = tokens(col(textCol))
    // ceil(n/seg) positions; guard n=0 (sequence(0,-1) would DESCEND)
    val nseg = expr(s"(size(split(`$textCol`, ' ')) + ${segTokens - 1})" +
      s" div $segTokens").cast("long")
    val segs = df.select(col(idCol), toks.as("toks"), nseg.as("nseg"))
      .select(col(idCol),
        when(col("nseg") > 0, sequence(lit(0L), col("nseg") - 1))
          .otherwise(array().cast("array<long>")).as("ps"),
        col("toks"))
      .select(col(idCol), explode_outer(col("ps")).as("pos"), col("toks"))
      .select(col(idCol), col("pos"),
        when(col("pos").isNotNull,
          array_join(slice(col("toks"),
            (col("pos") * segTokens + 1).cast("int"), lit(segTokens)),
            " "))
          .as("seg"))
    val firstSeen = Window.partitionBy(col("seg"))
      .orderBy(col(idCol), col("pos"))
    val kept = segs.withColumn("keep",
      col("pos").isNotNull && row_number().over(firstSeen) === 1)
    kept.groupBy(col(idCol))
      .agg(
        sum(when(col("pos").isNotNull, 1L).otherwise(0L))
          .as("n_segments"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(
          sort_array(collect_list(when(col("keep"),
            struct(col("pos"), col("seg"))))),
          x => x.getField("seg")), " ").as("rebuilt"))
      .select(col(idCol), col("n_segments"), col("n_kept"),
        length(col("rebuilt")).cast("long").as("kept_chars"),
        md5(col("rebuilt")).as("kept_md5"))
  }

  /** Boilerplate chunk-frequency filter (the CCNet/Gopher "common
    * lines" rule): non-overlapping `segTokens`-token chunks, and EVERY
    * copy of a chunk appearing in more than `maxDf` distinct documents
    * is dropped — headers, navigation, license banners. The complement
    * of [[segmentDedup]]: first-occurrence dedup keeps one copy of a
    * repeated segment; the frequency filter removes the segment
    * entirely once it is corpus-common.
    *
    * Shape: segment explode (same scaffold as [[segmentDedup]]), then
    * document frequency per chunk via a distinct (seg, doc) hash
    * aggregation — NOT a `collect_set` window, whose per-chunk buffer
    * would hold every doc id of a universal boilerplate chunk in one
    * aggregation buffer at 100 TB — joined back on the chunk key (both
    * sides arrive hash-partitioned on `seg`, so AQE plans the join
    * without a third exchange), and in-order reassembly per doc. */
  def chunkFrequencyFilter(df: DataFrame, idCol: String, textCol: String,
      segTokens: Int = 4, maxDf: Long = 2): DataFrame = {
    val toks = tokens(col(textCol))
    val nseg = expr(s"(size(split(`$textCol`, ' ')) + ${segTokens - 1})" +
      s" div $segTokens").cast("long")
    val segs = df.select(col(idCol), toks.as("toks"), nseg.as("nseg"))
      .select(col(idCol),
        when(col("nseg") > 0, sequence(lit(0L), col("nseg") - 1))
          .otherwise(array().cast("array<long>")).as("ps"),
        col("toks"))
      .select(col(idCol), explode_outer(col("ps")).as("pos"), col("toks"))
      .select(col(idCol), col("pos"),
        when(col("pos").isNotNull,
          array_join(slice(col("toks"),
            (col("pos") * segTokens + 1).cast("int"), lit(segTokens)),
            " "))
          .as("seg"))
    val docFreq = segs.filter(col("pos").isNotNull)
      .select(col("seg"), col(idCol)).distinct()
      .groupBy(col("seg")).agg(count(lit(1)).as("df"))
    // left join: the pos-null placeholder of an empty doc has seg =
    // null, never matches, and survives with df = null (kept = false)
    val kept = segs.join(docFreq, Seq("seg"), "left")
      .withColumn("keep", col("pos").isNotNull && col("df") <= maxDf)
    kept.groupBy(col(idCol))
      .agg(
        sum(when(col("pos").isNotNull, 1L).otherwise(0L))
          .as("n_segments"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(
          sort_array(collect_list(when(col("keep"),
            struct(col("pos"), col("seg"))))),
          x => x.getField("seg")), " ").as("rebuilt"))
      .select(col(idCol), col("n_segments"), col("n_kept"),
        when(col("n_segments") > 0,
          col("n_kept").cast("double") / col("n_segments").cast("double"))
          .otherwise(lit(0.0)).as("kept_fraction"),
        md5(col("rebuilt")).as("kept_md5"))
  }

  /** Vocabulary construction + out-of-vocabulary rate: the top
    * `vocabSize` corpus terms by (count desc, term asc) — a TOTAL
    * order, so the cut at the boundary is deterministic — then each
    * document's fraction of tokens outside that vocabulary. High OOV
    * is the standard "not the target language / not natural text"
    * curation signal, and the vocab list itself is the tokenizer-
    * training input.
    *
    * Shape: one token explode feeds BOTH sides — a corpus-wide count
    * aggregation cut to `vocabSize` rows (TakeOrdered, driver-free)
    * that re-enters as a BROADCAST probe list, and a per-doc
    * aggregation counting probe misses. The corpus side shuffles once
    * (the per-doc agg); the vocab side is dimension-table small by
    * construction at any corpus size. */
  def vocabOovRate(df: DataFrame, idCol: String, textCol: String,
      vocabSize: Int = 50): DataFrame = {
    val words = df.select(col(idCol),
      explode(tokens(col(textCol))).as("term"))
    val vocab = words.groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(vocabSize)
    words
      .join(broadcast(vocab.select(col("term"), lit(1L).as("__in_v"))),
        Seq("term"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
  }

  /** Learn the first `k` byte-pair-encoding merges from the corpus —
    * the training loop of a BPE tokenizer, distributed.
    *
    * Shape at 100 TB: ONE corpus-scale aggregation (token → frequency)
    * up front; every iteration after that runs on the VOCABULARY table
    * (unique words — millions of rows when the corpus is billions), so
    * the loop cost is independent of corpus size. Per iteration:
    *   1. adjacent-symbol pair counts weighted by word frequency
    *      (explode over word length — vocab × avg-word-len rows);
    *   2. argmax pair via TakeOrdered(1) with a total (count DESC,
    *      lhs, rhs) tie-break — no driver collect; the winner re-enters
    *      as a one-row broadcast;
    *   3. greedy left-to-right merge of that pair inside every word —
    *      a single `aggregate` fold per word (narrow, codegen'd), the
    *      exact semantics of the classic BPE merge pass ([a,a,a,a,a]
    *      with merge (a,a) → [aa,aa,a]).
    * Each iteration's vocab frame sits behind a [[graft.core.Checkpoints]]
    * barrier: the frame feeds both the next pair count and the next
    * merge, and without the barrier the diamond re-computes the whole
    * loop prefix per branch (2^k blowup).
    *
    * Returns the merge table (merge_rank, lhs, rhs, pair_count) — k
    * rows, fully deterministic, engine-exact (q196 pins it against a
    * windowed gaps-and-islands formulation of the same greedy pass in
    * DuckDB — two independent constructions of the merge semantics
    * agreeing on the hash).
    *
    * Scale limit is k, not corpus size: one Spark job per merge is the
    * right harness for the corpus-side statistics (small k, huge
    * corpus), not for a production 30k-merge tokenizer — there, run
    * THIS operator for the corpus pass, then finish the merge loop
    * driver-side over the collected vocabulary once it fits (vocab ≪
    * corpus by Heaps' law). */
  def learnBpeMerges(df: DataFrame, textCol: String, k: Int): DataFrame =
    bpeLoop(df, textCol, k)._1

  /** The BPE iteration shared by [[learnBpeMerges]] and
    * [[bpeCompressionBySource]]: returns (merge table, encoded vocab
    * `(w, toks, cnt)` after all k merges). */
  private def bpeLoop(df: DataFrame, textCol: String, k: Int)
      : (DataFrame, DataFrame) = {
    require(k >= 1, "bpeLoop wants k >= 1")
    val vocab = df
      .select(explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w"),
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
          .as("toks"),
        col("cnt"))
    var cur = vocab.barrier()
    val merges = (1 to k).map { r =>
      val best = cur
        .filter(size(col("toks")) >= 2)
        .select(explode(expr(
          """transform(sequence(1, size(toks) - 1),
            |  i -> struct(element_at(toks, i) AS lhs,
            |              element_at(toks, i + 1) AS rhs))"""
            .stripMargin)).as("p"), col("cnt"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("cnt")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("lhs"), col("rhs"))
        .limit(1)
        .withColumn("merge_rank", lit(r).cast("int"))
        .barrier()
      cur = cur
        .crossJoin(broadcast(
          best.select(col("lhs").as("_a"), col("rhs").as("_b"))))
        .select(col("w"), expr(
          """aggregate(toks, CAST(array() AS ARRAY<STRING>),
            |  (acc, x) -> CASE WHEN size(acc) > 0
            |                    AND element_at(acc, -1) = _a AND x = _b
            |              THEN concat(slice(acc, 1, size(acc) - 1),
            |                          array(concat(_a, _b)))
            |              ELSE concat(acc, array(x)) END)"""
            .stripMargin).as("toks"), col("cnt"))
        .barrier()
      best
    }
    (merges.reduce(_ unionByName _)
      .select(col("merge_rank"), col("lhs"), col("rhs"), col("pair_count")),
      cur)
  }

  /** Apply the k learned merges back to the corpus and report per-source
    * token compression — the acceptance metric of a tokenizer-training
    * run (how many symbols per word the vocabulary buys each source).
    *
    * No second corpus pass for the encode: words are encoded once in
    * the VOCABULARY (the [[bpeLoop]] output), and per-source word
    * counts (one corpus aggregation) join against it — corpus tokens
    * are never re-processed per merge. Output per source: word count,
    * symbol counts before (characters) and after the merges, and the
    * compression ratio (exact integer sums, one final double
    * division). */
  def bpeCompressionBySource(df: DataFrame, textCol: String,
      sourceCol: String, k: Int): DataFrame = {
    val enc = bpeLoop(df, textCol, k)._2
      .select(col("w"), size(col("toks")).as("n_after_w"))
    val perSource = df
      .select(col(sourceCol).as("source"),
        explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("scnt"))
    perSource.join(enc, "w")
      .groupBy(col("source"))
      .agg(
        sum(col("scnt")).as("n_words"),
        sum(col("scnt") * length(col("w"))).as("n_tokens_before"),
        sum(col("scnt") * col("n_after_w")).as("n_tokens_after"))
      .withColumn("compression",
        col("n_tokens_before").cast("double") /
          col("n_tokens_after").cast("double"))
  }

  /** Winnowing fingerprint statistics (the MOSS scheme: Schleimer,
    * Wilkerson & Aiken, SIGMOD'03): slide a window of `w` consecutive
    * k-gram hashes over each document and select each window's minimum
    * hash, rightmost position on ties — the selection that guarantees
    * any shared substring of ≥ w+k−1 tokens yields at least one shared
    * selected fingerprint, at an expected density of 2/(w+1). Output
    * per doc: gram/window counts, number of selected (hash, position)
    * fingerprints, the achieved density (one division), and the
    * minimum selected hash (a compact doc signature).
    *
    * 100 TB shape: the positional hashes come from the codegen'd
    * shingle kernel; the window minimum is a per-document bounded
    * sliding frame (rowsBetween(0, w−1)) — partitioned by doc, never
    * global — and the tie-break rides inside ONE struct-min (no
    * second pass): min(struct(hash, −pos)) = min hash, rightmost
    * position. Selected pairs dedup with a per-doc distinct, bounded
    * by doc length. Docs shorter than w+k−1 tokens report zero
    * windows (never a null density). */
  def winnowingStats(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4): DataFrame = {
    val base = df.select(col(idCol),
      shingleHashesAll(col(textCol), k).as("hs"))
    val pos = base.select(col(idCol),
      size(col("hs")).cast("long").as("ng"),
      posexplode(col("hs")).as(Seq("p", "h")))
    val win = Window.partitionBy(col(idCol)).orderBy(col("p"))
      .rowsBetween(Window.currentRow, w - 1)
    val sel = pos
      .withColumn("m",
        min(struct(col("h"), (-col("p")).as("np"))).over(win))
      .filter(col("p") <= col("ng") - w)   // full windows only
      .select(col(idCol), col("ng"), col("m.h").as("fh"),
        col("m.np").as("fnp"))
      .distinct()
      .groupBy(col(idCol), col("ng"))
      .agg(count(lit(1)).as("n_selected"), min(col("fh")).as("min_fp"))
    // n_grams from the doc itself (sel loses docs with 0 < ng < w,
    // whose gram count must still be reported)
    df.select(col(idCol),
        greatest(size(tokens(col(textCol))).cast("long") - (k - 1),
          lit(0L)).as("n_grams"))
      .join(sel.drop("ng"), Seq(idCol), "left")
      .select(col(idCol),
        col("n_grams"),
        greatest(col("n_grams") - (w - 1), lit(0L)).as("n_windows"),
        coalesce(col("n_selected"), lit(0L)).as("n_selected"),
        when(col("n_grams") - (w - 1) > 0,
          coalesce(col("n_selected"), lit(0L)).cast("double") /
            (col("n_grams") - (w - 1)).cast("double"))
          .otherwise(lit(0.0)).as("density"),
        col("min_fp"))
  }

  /** Boilerplate-position profile: WHERE in documents does cross-doc
    * duplicated text sit — per relative-position decile (0 = doc
    * head, 9 = tail), the exact count of gram positions whose k-gram
    * occurs in another document, and their share of all gram
    * positions in that decile. Headers/footers/navigation chrome show
    * up as elevated head/tail deciles; body-text plagiarism is flat —
    * the diagnostic that decides between positional trimming and
    * [[removeDupSpans]].
    *
    * Decile is integer arithmetic ((p·10) div n_grams, 0-based — no
    * doubles until the single share division). Same scale shape as
    * [[dupSpans]]: positional kernel explode → distinct+agg for gram
    * doc-counts → one join back; the decile rollup is 10 rows. */
  def boilerplatePosition(df: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    val pos = df
      .select(col(idCol), shingleHashesAll(col(textCol), n).as("hs"))
      .select(col(idCol), size(col("hs")).cast("long").as("ng"),
        posexplode(col("hs")).as(Seq("p", "gh")))
    val shared = pos.select(col(idCol), col("gh")).distinct()
      .groupBy(col("gh")).agg(count(lit(1)).as("gdf"))
      .filter(col("gdf") > 1)
      .select(col("gh"), lit(1).as("__dup"))
    val flagged = pos
      .join(shared, Seq("gh"), "left")
      .select(expr("(p * 10) div ng").as("decile"),
        coalesce(col("__dup"), lit(0)).as("dup"))
    val hist = flagged.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_grams"),
        sum(col("dup")).cast("long").as("n_dup"))
    df.sparkSession.range(0, 10).select(col("id").as("decile"))
      .join(hist, Seq("decile"), "left")
      .select(col("decile"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        when(coalesce(col("n_grams"), lit(0L)) > 0,
          coalesce(col("n_dup"), lit(0L)).cast("double") /
            col("n_grams").cast("double"))
          .otherwise(lit(0.0)).as("dup_share"))
  }

  /** The MATCH step of winnowing ([[winnowingStats]] measures the
    * selection; this one uses it): document pairs sharing at least
    * `minShared` selected fingerprints — the MOSS plagiarism-detector
    * join. Because selection guarantees any shared token run of
    * ≥ w+k−1 yields a shared fingerprint, this finds passage-level
    * overlap at ~2/(w+1) of the q41 index size.
    *
    * Same inverted-index discipline as the Jaccard family: distinct
    * (doc, fingerprint) rows, a document-frequency cap on the
    * fingerprint key (boilerplate fingerprints shared by thousands of
    * docs are exactly the hot join keys — and carry no plagiarism
    * signal), then the capped self-join and a pair-count filter. */
  def winnowingMatches(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4, minShared: Int = 2, maxDf: Int = 1000)
      : DataFrame = {
    val pos = df
      .select(col(idCol), shingleHashesAll(col(textCol), k).as("hs"))
      .select(col(idCol), size(col("hs")).cast("long").as("ng"),
        posexplode(col("hs")).as(Seq("p", "h")))
    val win = Window.partitionBy(col(idCol)).orderBy(col("p"))
      .rowsBetween(Window.currentRow, w - 1)
    // sel feeds the df cap AND both sides of the pair join — barrier
    // once so the window pipeline isn't re-planned per consumer
    val sel = pos
      .withColumn("m",
        min(struct(col("h"), (-col("p")).as("np"))).over(win))
      .filter(col("p") <= col("ng") - w)
      .select(col(idCol), col("m.h").as("fh"))
      .distinct()
      .barrier()
    val kept = sel.groupBy(col("fh"))
      .agg(count(lit(1)).as("fdf"))
      .filter(col("fdf") <= maxDf)
      .select(col("fh"))
    val capped = sel.join(kept, Seq("fh")).barrier()
    capped.select(col("fh"), col(idCol).as("doc_a"))
      .join(capped.select(col("fh"), col(idCol).as("doc_b")), Seq("fh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** The four-slot elementwise-min reduction shared by build and
    * merge — the one place to touch if the signature widens. */
  private def slotMins(df: DataFrame, groupCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(min(col("sig_0")).as("sig_0"),
        min(col("sig_1")).as("sig_1"),
        min(col("sig_2")).as("sig_2"),
        min(col("sig_3")).as("sig_3"))

  /** Group-level MinHash signature: per group, the elementwise MIN of
    * its documents' [[minhashSignatures]] slots — which IS the MinHash
    * signature of the union of the documents' shingle sets (min is
    * associative/commutative/idempotent), so group signatures MERGE:
    * shard-local group signatures combine by another elementwise min,
    * and a group's signature never needs its documents co-located.
    * That mergeability is the whole point — source-vs-source
    * similarity at 100 TB from a k-longs-per-group frame. Estimate
    * quality is the standard MinHash ±1/√k; k = 4 here (the engine's
    * signature width), so downstream estimates are coarse screens,
    * refined by q168's KMV or q41's exact path. Docs below 3 tokens
    * carry no signature and drop out, exactly as in the per-doc op. */
  def groupMinhash(df: DataFrame, idCol: String, textCol: String,
      groupCol: String): DataFrame =
    slotMins(
      minhashSignatures(df, idCol, textCol)
        // second scan of df is a 2-column pruned parquet read; the
        // join keys it back to the signature frame on the doc id
        .join(df.select(col(idCol), col(groupCol)), Seq(idCol)),
      groupCol)

  /** Merge two [[groupMinhash]] frames: elementwise min per group —
    * the shard/stream combiner the merge law licenses (groups present
    * on one side only carry through). */
  def groupMinhashMerge(a: DataFrame, b: DataFrame, groupCol: String)
      : DataFrame =
    slotMins(a.unionByName(b), groupCol)

  // substring(Column, Column, Column) has no functions._ overload
  private def substring(str: Column, pos: Column, len: Column): Column =
    call_function("substring", str, pos, len)
}
