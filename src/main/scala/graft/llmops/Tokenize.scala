package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tokenizer APPLICATION at corpus scale: greedy longest-match
  * (WordPiece-style max-munch) encoding of every document against a
  * fixed piece vocabulary. [[TextOps.learnBpeMerges]] learns a merge
  * table (q196) and q197 scores its compression; this is the missing
  * third stage — the encode pass a training pipeline runs over 100 TB
  * to produce token counts and sequence lengths.
  *
  * Everything is RELATIONAL, by design:
  *
  *  - the encode runs once per DISTINCT word token (a vocabulary-sized
  *    dimension table, not the corpus), and per-doc stats come from
  *    joining the encoded dimension back to token occurrences — the
  *    classic dimension-side trick that makes the cost independent of
  *    corpus duplication;
  *  - longest-match at a position is an EQUI-join: fan each (token,
  *    position) out over the distinct piece LENGTHS and join
  *    `substr(token, pos, len) = piece` — no prefix-scan loop, no UDF;
  *    the argmax over lengths is one aggregation;
  *  - the greedy left-to-right walk is a single `aggregate` fold over
  *    character positions with the state packed into ONE BIGINT
  *    (pos·10^6 + pieces·10^3 + unks) — integer arithmetic only, so
  *    the DuckDB oracle replays it bit-for-bit with `list_reduce`.
  *
  * UNK convention: a position where no piece (not even a single
  * character) matches consumes one character and counts as one UNK
  * piece — the lossless-alignment convention, so
  * `n_pieces = matched + unk` always partitions the token's chars.
  */
object Tokenize {

  private def chars1(t: Column): Column =
    transform(sequence(lit(1), length(t)), i => t.substr(i, lit(1)))

  /** Deterministic piece vocabulary from the corpus itself: the
    * `topWords` most frequent word tokens (count desc, token asc —
    * total order) capped at `maxPieceLen` chars, UNION the single
    * characters appearing in the top `charWords` tokens (rarer
    * characters fall to UNK — exercising the UNK path is the point of
    * not taking every character). Returns (piece, piece_len).
    * Vocabulary-sized: safe to broadcast anywhere. */
  def vocab(df: DataFrame, textCol: String, topWords: Int = 256,
      charWords: Int = 1000, maxPieceLen: Int = 20): DataFrame = {
    import graft.core.Checkpoints.BarrierOps
    // vocabulary-sized after the agg; barrier'd because both top-K
    // reads consume it. Top-K via orderBy+limit — planned as
    // TakeOrderedAndProject (distributed partial top-K), never a
    // global-order window
    val counts = df
      .select(explode(split(col(textCol), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .barrier()
    val words = counts
      .orderBy(col("c").desc, col("tok")).limit(topWords)
      .filter(length(col("tok")) <= maxPieceLen)
      .select(col("tok").as("piece"))
    val chars = counts
      .orderBy(col("c").desc, col("tok")).limit(charWords)
      .select(explode(chars1(col("tok"))).as("piece"))
    words.unionByName(chars).distinct()
      .select(col("piece"), length(col("piece")).as("piece_len"))
  }

  /** Greedy longest-match encode of every DISTINCT token against
    * `vocabDf` (piece, piece_len): returns
    * (tok, tok_len, n_pieces, n_unk).
    *
    * Plan shape: distinct tokens × their positions × distinct piece
    * lengths → substr equi-join against the (broadcast) vocab →
    * argmax(len) per position → per-token best-match array → ONE
    * integer fold. All corpus-independent after the distinct. */
  def encodeTokens(tokens: DataFrame, vocabDf: DataFrame): DataFrame = {
    val lens = vocabDf.select(col("piece_len")).distinct()
    // (tok, pos) × piece lengths, keyed by the substring at pos
    val probes = tokens
      .select(col("tok"), length(col("tok")).as("tok_len"))
      .select(col("tok"), col("tok_len"),
        explode(sequence(lit(1), col("tok_len"))).as("pos"))
      .crossJoin(broadcast(lens))
      .filter(col("pos") + col("piece_len") - 1 <= col("tok_len"))
      .select(col("tok"), col("tok_len"), col("pos"),
        col("piece_len"),
        col("tok").substr(col("pos"), col("piece_len")).as("sub"))
    val best = probes
      .join(broadcast(vocabDf.select(col("piece"))),
        col("sub") === col("piece"), "left_semi")
      .groupBy(col("tok"), col("pos"))
      .agg(max(col("piece_len")).as("bl"))
    // best-match array indexed by position (0 where nothing matched —
    // including single chars outside the vocab)
    val arrs = tokens
      .select(col("tok"), length(col("tok")).as("tok_len"))
      .join(best.groupBy(col("tok"))
          .agg(sort_array(collect_list(struct(col("pos"), col("bl"))))
            .as("bests")),
        Seq("tok"), "left")
    // dense bl array: bl[i] = best length at position i, 0 if absent
    val dense = arrs.select(col("tok"), col("tok_len"),
      transform(sequence(lit(1), col("tok_len")), i =>
        coalesce(
          element_at(
            map_from_entries(coalesce(col("bests"),
              array().cast("array<struct<pos:int,bl:int>>"))), i),
          lit(0))).as("bl"))
    // the greedy walk: ONE fold over the best-match array with the
    // state packed into a BIGINT as skip·10^6 + pieces·10^3 + unks —
    // skip counts characters consumed by the last matched piece, so
    // the lambda touches only its own element (no outer-column
    // indexing inside the lambda: DuckDB 1.0 miscompiles captured
    // list indexing under parallel list_reduce — observed
    // nondeterminism — and Spark HOFs re-evaluate captured subtrees
    // per element anyway)
    val folded = dense.select(col("tok"), col("tok_len"),
      aggregate(col("bl"), lit(0L), (s, b) =>
        when(s >= 1000000L, s - 1000000L)
          .when(b > 0, s + (b.cast("long") - 1L) * 1000000L + 1000L)
          .otherwise(s + 1001L)).as("st"))
    folded.select(col("tok"), col("tok_len"),
      ((col("st") % 1000000L) / 1000L).cast("long").as("n_pieces"),
      (col("st") % 1000L).cast("long").as("n_unk"))
  }

  /** Per-document encode statistics: join the encoded distinct-token
    * dimension back to token occurrences and sum — (doc_id, n_tokens,
    * n_chars, n_pieces, n_unk). Integer-only output. */
  def encodeStats(df: DataFrame, idCol: String, textCol: String,
      vocabDf: DataFrame): DataFrame = {
    // the 900-char token cap protects the BIGINT state packing
    // (pieces/unks ≤ 900 < 1000 per token); a "token" longer than
    // 900 chars is not natural language and is excluded from the
    // stats rather than silently mis-packed (cap mirrored in the
    // oracle)
    val occ = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .filter(length(col("tok")) > 0 && length(col("tok")) <= 900)
    val encoded = encodeTokens(occ.select(col("tok")).distinct(),
      vocabDf)
    occ.join(encoded, Seq("tok"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("tok_len")).as("n_chars"),
        sum(col("n_pieces")).as("n_pieces"),
        sum(col("n_unk")).as("n_unk"))
  }

  /** Greedy left-to-right application of ONE merge pair (a, b) to a
    * piece array — the exact fold [[TextOps.learnBpeMerges]] runs per
    * training round ([a,a,a,a,a] with merge (a,a) → [aa,aa,a]), with
    * the pair inlined as literals. */
  private def mergeFold(pieces: Column, a: String, b: String): Column =
    aggregate(pieces, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** TRUE BPE encode of every DISTINCT token: split to characters,
    * then apply the learned merge table **in merge-priority order** —
    * rank 1 first, each merge the same greedy left-to-right fold the
    * training loop ran — so the apply stage reproduces the training
    * segmentation exactly (on the training corpus, token piece counts
    * equal the final training vocab's; BpeSpec pins the composition
    * law). This is NOT [[encodeTokens]]'s longest-match max-munch:
    * max-munch consults only the piece SET, BPE consults merge ORDER,
    * and the two disagree whenever the vocabulary holds a piece the
    * merge ladder can't build left-to-right (BpeSpec pins a fixture).
    *
    * Returns (tok, tok_len, pieces, n_pieces, n_unk) — n_unk is
    * always 0 (BPE's base alphabet is every character, so encoding is
    * total), carried for schema parity with the max-munch dimension.
    *
    * Scale shape: |merges| narrow folds over the distinct-token
    * DIMENSION table (vocabulary-sized, corpus-independent), barrier
    * per round — lazy for plan hygiene, EAGER every 16 rounds to
    * bound closure depth (all-lazy chains serialize O(k²) across the
    * ladder; see the loop comment). Rounds are bounded by the merge
    * count, and each round costs a fixed floor regardless of whether
    * the merge applies — measured with `graft.ScaleBpe` at sf0.1 on
    * local[32]: k = 1000 applies in ~13 s (~0.013 s/round), so the
    * practical ceiling for a production 32k-merge frozen-ladder
    * apply is ~7 min of SEQUENTIAL rounds (SCALE.md documents the
    * measurement next to the q284 rows). Fine for frozen-ladder
    * fixtures and tokenizer QA; a production 30k-merge bulk encode
    * still prefers the max-munch final-vocab path (q280
    * `encodeStats` — one pass, no per-merge rounds) or collects the
    * vocab driver-side first (see learnBpeMerges' scale-limit
    * note). */
  def bpeEncodeTokens(tokens: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    import graft.core.Checkpoints.BarrierOps
    var cur = tokens.select(col("tok"),
      chars1(col("tok")).as("pieces"))
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      // eager barrier every 16 rounds: a LAZY barrier only truncates
      // lineage once something materializes it, so a k-round all-lazy
      // chain ships round k's task with a k-deep nested closure —
      // O(k²) serialization across the ladder (measured: k=1000 at
      // sf0.1 ran >60 min all-lazy vs minutes chunked). Bounding the
      // lazy depth at 16 keeps per-round plans jobless in the common
      // case and caps closure depth; values are unaffected (barriers
      // are identity).
      cur = cur
        .select(col("tok"), mergeFold(col("pieces"), a, b).as("pieces"))
        .barrier(eager = i % 16 == 15)
    }
    cur.select(col("tok"), length(col("tok")).as("tok_len"),
      col("pieces"), size(col("pieces")).cast("long").as("n_pieces"),
      lit(0L).as("n_unk"))
  }

  /** [[bpeEncodeTokens]] from a merge-table FRAME (merge_rank, lhs,
    * rhs) — the form [[TextOps.learnBpeMerges]] returns and the form
    * a frozen tokenizer artifact is stored in. The table is collected
    * driver-side: it is k rows BY CONSTRUCTION (one per learned
    * merge — the artifact a tokenizer ships as merges.txt), never
    * corpus-shaped, so this is a bounded metadata read, not a data
    * path. */
  def bpeEncodeTokens(tokens: DataFrame, merges: DataFrame): DataFrame =
    bpeEncodeTokens(tokens,
      merges.select(col("merge_rank"), col("lhs"), col("rhs"))
        .orderBy(col("merge_rank")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq)

  /** Per-document TRUE-BPE encode statistics — the apply-stage
    * counterpart of [[encodeStats]] under the learned merge table
    * instead of the max-munch vocab: (doc_id, n_tokens, n_chars,
    * n_pieces). No n_unk column (BPE encoding is total) and no token
    * length cap (piece counts come from the array size, not a packed
    * integer). Same dimension-side shape: the corpus contributes one
    * occurrence scan + the final join-aggregate. */
  def bpeEncodeStats(df: DataFrame, idCol: String, textCol: String,
      merges: DataFrame): DataFrame = {
    val occ = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val encoded =
      bpeEncodeTokens(occ.select(col("tok")).distinct(), merges)
    occ.join(encoded, Seq("tok"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("tok_len")).as("n_chars"),
        sum(col("n_pieces")).as("n_pieces"))
  }

  /** [[fertilityByGroup]] under the TRUE-BPE encoder — the same
    * acceptance report computed with the merge table actually applied
    * in priority order, so a BPE vocab's fertility is measured under
    * the algorithm that produced it (max-munch fertility of a BPE
    * vocab systematically flatters whole-word pieces the ladder
    * can't build). Output (groupCol, n_docs, n_tokens, n_chars,
    * n_pieces, fertility, chars_per_piece). */
  def bpeFertilityByGroup(df: DataFrame, idCol: String,
      textCol: String, groupCol: String, merges: DataFrame)
      : DataFrame = {
    val occ = df
      .select(col(idCol), col(groupCol),
        explode(split(col(textCol), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val encoded =
      bpeEncodeTokens(occ.select(col("tok")).distinct(), merges)
    occ.join(encoded, Seq("tok"))
      .groupBy(col(groupCol))
      .agg(countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_tokens"),
        sum(col("tok_len")).as("n_chars"),
        sum(col("n_pieces")).as("n_pieces"))
      .select(col(groupCol), col("n_docs"), col("n_tokens"),
        col("n_chars"), col("n_pieces"),
        (col("n_pieces").cast("double") /
          col("n_tokens").cast("double")).as("fertility"),
        (col("n_chars").cast("double") /
          col("n_pieces").cast("double")).as("chars_per_piece"))
  }

  /** Per-group tokenizer fertility: pieces per word and chars per
    * piece aggregated by `groupCol` (typically language) — the
    * acceptance metric a vocab is judged on (a vocab learned on a
    * skewed corpus fragments the minority groups; fertility is where
    * that shows). Same encode dimension as [[encodeStats]],
    * re-aggregated; n_pieces ≥ n_tokens ≥ 1 per emitted group, so
    * the divisions are total. */
  def fertilityByGroup(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, vocabDf: DataFrame): DataFrame = {
    val occ = df
      .select(col(idCol), col(groupCol),
        explode(split(col(textCol), " ")).as("tok"))
      .filter(length(col("tok")) > 0 && length(col("tok")) <= 900)
    val encoded = encodeTokens(occ.select(col("tok")).distinct(),
      vocabDf)
    occ.join(encoded, Seq("tok"))
      .groupBy(col(groupCol))
      .agg(countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_tokens"),
        sum(col("tok_len")).as("n_chars"),
        sum(col("n_pieces")).as("n_pieces"),
        sum(col("n_unk")).as("n_unk"))
      .select(col(groupCol), col("n_docs"), col("n_tokens"),
        col("n_chars"), col("n_pieces"), col("n_unk"),
        (col("n_pieces").cast("double") /
          col("n_tokens").cast("double")).as("fertility"),
        (col("n_chars").cast("double") /
          col("n_pieces").cast("double")).as("chars_per_piece"))
  }
}
