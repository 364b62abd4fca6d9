package graft.llmops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads travel as opaque `binary`
  * columns with typed metadata; decode/feature-extraction runs as a
  * typed `mapPartitions` so a heavyweight codec can be opened once per
  * partition and amortized over the batch.
  *
  * The header parser is a real pure-JVM implementation for the three
  * container formats whose headers need no codec library — PNG, BMP,
  * WAV (magic bytes + dimension/frame fields straight from the spec'd
  * fixed offsets). Payloads that match no magic fall back to a
  * deterministic function of the byte length, which keeps the
  * text-backed fixture corpus oracle-verifiable (q53) while exercising
  * the exact partition/schema/batch plumbing a real media lake needs.
  * At 100 TB the payloads stay columnar-compressed in parquet, the
  * decode stage is a narrow map (no shuffle), and feature rows are a
  * tiny projection of the input bytes.
  */
object Multimodal {

  /** A media row: opaque payload + provenance metadata. */
  final case class MediaRecord(
      doc_id: Long, payload: Array[Byte], source: String, n_chars: Long)

  /** Extracted features. `source` rides along from [[MediaRecord]] so
    * downstream aggregation never re-joins the input. */
  final case class MediaFeatures(
      doc_id: Long, source: String, n_bytes: Long, width: Int,
      height: Int, n_frames: Int, media_kind: String)

  /** Pack a text table into media-shaped rows: payload = UTF-8 bytes.
    * Stands in for reading `binary` columns of a real media lake. */
  def packAsMedia(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"),
      col("source"), col("n_chars")).as[MediaRecord]
  }

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def beShort(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** JPEG dimensions: walk the marker chain from offset 2, skipping
    * each segment by its big-endian length, until a start-of-frame
    * marker (0xC0-0xCF minus the DHT/JPG/DAC exceptions C4/C8/CC);
    * height/width are big-endian shorts at SOF payload offset 3/5.
    * Bounded walk — malformed chains return None, never loop. */
  private def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
    var i = 2
    var guard = 0
    while (i + 3 < b.length && guard < 1024) {
      guard += 1
      if ((b(i) & 0xff) != 0xff) return None
      // per the spec, any number of 0xFF fill bytes may precede the
      // marker byte — consume them all before reading the marker
      var mi = i + 1
      while (mi < b.length && (b(mi) & 0xff) == 0xff) mi += 1
      if (mi >= b.length) return None
      val marker = b(mi) & 0xff
      if (marker >= 0xc0 && marker <= 0xcf &&
        marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        if (mi + 7 < b.length)
          return Some((beShort(b, mi + 6), beShort(b, mi + 4)))
        return None
      }
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) i = mi + 1
      else if (marker == 0xda || marker == 0xd9) return None
      else if (mi + 2 < b.length) i = mi + 1 + beShort(b, mi + 1)
      else return None
    }
    None
  }

  /** Parse a media container header: magic bytes + fixed-offset
    * dimension fields. Returns (kind, width, height, n_frames); None
    * when no known magic matches. Offsets per the public format specs:
    * PNG IHDR width/height at bytes 16/20 (big-endian), BMP
    * BITMAPINFOHEADER width/height at 18/22 (little-endian), GIF
    * logical-screen width/height at 6/8 (little-endian), JPEG via the
    * SOF marker walk, WAV channels/blockAlign at 22/32 with the
    * 44-byte canonical header. */
  def parseHeader(b: Array[Byte]): Option[(String, Int, Int, Int)] = {
    if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff)
      return jpegDims(b).map { case (w, h) => ("image", w, h, 1) }
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return Some(("image", leShort(b, 6), leShort(b, 8), 1))
    if (b.length >= 24 &&
      (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      (b(4) & 0xff) == 0x0d && (b(5) & 0xff) == 0x0a &&
      (b(6) & 0xff) == 0x1a && (b(7) & 0xff) == 0x0a)
      Some(("image", beInt(b, 16), beInt(b, 20), 1))
    else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
      Some(("image", leInt(b, 18), leInt(b, 22), 1))
    else if (b.length >= 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
      b(11) == 'E') {
      val channels = leShort(b, 22)
      val blockAlign = leShort(b, 32)
      val frames =
        if (blockAlign > 0) (b.length - 44) / blockAlign else 0
      Some(("audio", channels, 1, frames))
    } else None
  }

  /** Deterministic fallback for unknown payloads: features derive only
    * from the byte length, so a SQL oracle reproduces them exactly. */
  private def fallbackFeatures(r: MediaRecord): MediaFeatures = {
    val n = r.payload.length.toLong
    MediaFeatures(
      doc_id = r.doc_id,
      source = r.source,
      n_bytes = n,
      width = (n % 640L).toInt + 16,
      height = ((n * 7L) % 480L).toInt + 16,
      n_frames = (n % 24L).toInt + 1,
      media_kind = if (n % 2L == 0L) "image" else "audio")
  }

  /** Header-parse every payload in the partition; unknown containers
    * take the deterministic fallback. Partition-wise so a real decoder
    * (beyond headers) can amortize codec init across the batch. */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // a heavyweight codec handle would be opened HERE, once
      it.map { r =>
        parseHeader(r.payload) match {
          case Some((kind, w, h, frames)) =>
            MediaFeatures(r.doc_id, r.source, r.payload.length.toLong,
              w, h, frames, kind)
          case None => fallbackFeatures(r)
        }
      }
    }
  }

  /** A media row reduced to what the frame sampler needs: the payload,
    * its frame count, and where the frame data starts (44 for WAV's
    * canonical header, 0 otherwise). */
  final case class FrameBase(
      doc_id: Long, payload: Array[Byte], n_frames: Int, data_off: Int)

  /** Deterministic evenly-spaced frame sampling: s = min(k, n_frames)
    * frames per media row, frame j at index ⌊j·n_frames/s⌋ — the
    * standard keyframe grid. Each sampled frame carries `frame_fp`,
    * the 60-bit hash of the frame's ACTUAL BYTES: the payload's data
    * section (after the container header the parser understands —
    * offset 44 for WAV, 0 otherwise) is split into n_frames
    * equal-floor chunks and the sampled chunk is hashed via its hex
    * encoding (hex ∘ substring stays pure-Catalyst AND replays in the
    * oracle, which has no blob md5). For canonical WAV the chunks ARE
    * the blockAlign frames; for images (1 frame) the whole payload;
    * for unknown containers the fallback grid over the raw bytes.
    * Scan → narrow map → explode bounded by k; no shuffle, so at
    * 100 TB the sampler runs at input bandwidth. Media whose parsed
    * frame count is zero produce no sample rows.
    *
    * `parseContainers = false` forces EVERY payload onto the fallback
    * `len%24+1` grid, header magic or not. q160 pins the sampler this
    * way: its DuckDB oracle replays only the fallback formula, and a
    * text document that happens to start with a printable container
    * magic ("GIF87a", "RIFF....WAVE" — plain ASCII can parse as a
    * canonical WAV header) would otherwise take the parsed branch in
    * Spark while the oracle replays the grid — a latent hash mismatch
    * gated only by fixture content. The parsed branch keeps its own
    * spec coverage (WAV offset/blockAlign, zero-frame clips). */
  def sampleFrames(spark: SparkSession, docs: DataFrame,
      k: Int, parseContainers: Boolean = true): DataFrame = {
    import spark.implicits._
    val bases = packAsMedia(docs).mapPartitions { it =>
      it.map { r =>
        val parsed = if (parseContainers) parseHeader(r.payload) else None
        val (nf, off) = parsed match {
          case Some(("audio", _, _, frames)) => (frames, 44)
          case Some((_, _, _, frames)) => (frames, 0)
          case None => ((r.payload.length % 24) + 1, 0)
        }
        FrameBase(r.doc_id, r.payload, nf, off)
      }
    }.toDF()
    bases
      .select(col("doc_id"), col("payload"), col("n_frames"),
        col("data_off"), least(lit(k), col("n_frames")).as("s"))
      .select(col("doc_id"), col("payload"), col("n_frames"),
        col("data_off"), col("s"),
        explode(when(col("s") > 0,
          sequence(lit(0), col("s") - 1))).as("sample_j"))
      .select(col("doc_id"), col("payload"), col("n_frames"),
        col("data_off"),
        col("sample_j").cast("int").as("sample_j"),
        expr("CAST((sample_j * n_frames) DIV s AS INT)").as("frame_idx"))
      .withColumn("__len",
        (length(col("payload")) - col("data_off")).cast("long"))
      .withColumn("__off", col("data_off") +
        expr("(frame_idx * __len) DIV n_frames"))
      .withColumn("__end", col("data_off") +
        expr("((frame_idx + 1) * __len) DIV n_frames"))
      .withColumn("frame_fp", TextOps.hash60(
        hex(expr("substring(payload, CAST(__off + 1 AS INT), " +
          "CAST(__end - __off AS INT))"))))
      .select(col("doc_id"), col("n_frames"), col("sample_j"),
        col("frame_idx"), col("frame_fp"))
  }

  /** Synthetic fixed-frame "video" corpus: per doc, 8 frames of 16
    * ASCII bytes each, frame j's content = `fr:%013d` of the pool id
    * `(doc_id % families)·16 + (doc_id % starts) + j`. Clips in the
    * same family at different starts share 8−|Δstart| of 8 frames —
    * the controlled near-dup fixture (clip vs its trimmed/shifted
    * re-cut); different families share nothing. `starts` must stay
    * coprime to `families` so every family spans all offsets (the
    * defaults: gcd(96, 5) = 1; with starts = 3 every id in a family
    * would share ONE start — id%3 is a function of id%96 — and the
    * corpus would hold only exact dups). `starts·1 + 7 < 16` keeps
    * pools disjoint across families. Narrow
    * map, no shuffle. */
  def syntheticVideos(docs: DataFrame, families: Long = 96L,
      starts: Long = 5L): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("source"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, src) =>
          val fam = id % families
          val st = id % starts
          val payload = (0 until 8).flatMap { j =>
            "fr:%013d".format(fam * 16L + st + j).getBytes("UTF-8")
          }.toArray
          MediaRecord(id, payload, src, 8L)
        }
      }
  }

  /** Every fixed-size frame of a payload with its content hash —
    * pure Catalyst (substring/hex over the binary column, no decode
    * pass): (doc_id, frame_idx, frame_fp). Payloads shorter than one
    * frame emit no rows. The hex∘substring route replays in the
    * oracle exactly like [[sampleFrames]]' grid. */
  def frameFingerprints(media: Dataset[MediaRecord], frameBytes: Int)
      : DataFrame = {
    require(frameBytes >= 1, s"frameFingerprints: frameBytes=$frameBytes")
    media.toDF()
      .select(col("doc_id"), col("payload"),
        (length(col("payload")) / frameBytes).cast("int").as("__nf"))
      .select(col("doc_id"), col("payload"),
        explode(when(col("__nf") > 0,
          sequence(lit(0), col("__nf") - 1))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx").cast("int").as("frame_idx"),
        TextOps.hash60(hex(expr(
          s"substring(payload, frame_idx * $frameBytes + 1, " +
            s"$frameBytes)"))).as("frame_fp"))
  }

  /** Clip-level near-dup by shared frame CONTENT: inverted index on
    * the frame fingerprint (df-capped, the q41 discipline — a frame
    * in more than `maxDf` clips is intro/outro boilerplate and joins
    * nothing), count shared distinct frames per candidate pair,
    * keep containment = shared/min(|A|,|B|) ≥ `minContainment`. The
    * containment direction (vs Jaccard) is what catches a TRIMMED
    * re-cut: a 6-frame cut of an 8-frame clip scores 1.0, not 0.75.
    * Pair volume is bounded by the df cap exactly as in the text
    * route. */
  def sharedFrameNearDupPairs(frames: DataFrame,
      minContainment: Double, maxDf: Int = 1000): DataFrame = {
    require(minContainment > 0 && minContainment <= 1.0,
      s"sharedFrameNearDupPairs: minContainment=$minContainment")
    import graft.core.Checkpoints.BarrierOps
    // the distinct frame set feeds FOUR consumers (sizes, df cap,
    // both self-join sides): barrier it so the frame-hash kernel runs
    // once instead of being re-inlined per consumer (q162 precedent)
    val d = frames.select(col("doc_id"), col("frame_fp")).distinct()
      .barrier()
    val n = d.groupBy(col("doc_id")).agg(count(lit(1)).as("nf"))
    val kept = d.groupBy(col("frame_fp"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select(col("frame_fp"))
    val dk = d.join(kept, Seq("frame_fp"), "left_semi")
    val shared = dk.select(col("frame_fp"), col("doc_id").as("doc_a"))
      .join(dk.select(col("frame_fp"), col("doc_id").as("doc_b")),
        Seq("frame_fp"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(n.select(col("doc_id").as("doc_a"), col("nf").as("__na")),
        Seq("doc_a"))
      .join(n.select(col("doc_id").as("doc_b"), col("nf").as("__nb")),
        Seq("doc_b"))
      .withColumn("containment",
        col("shared").cast("double") / least(col("__na"), col("__nb")))
      .filter(col("containment") >= minContainment)
      .select(col("doc_a"), col("doc_b"), col("shared"),
        col("containment"))
  }

  /** The SCALE route for video near-dup (q269 is the exact
    * verification-grade path, the q41/q43 relationship): frames are
    * the clip's shingles, so the text LSH machinery applies
    * unchanged —
    *
    *  1. exact-dedup-first on the clip's frame-SET fingerprint
    *     (hash of the sorted distinct frame fps — content-identical
    *     re-containered clips collapse to the min-id keeper before
    *     any banding, the [[TextOps.exactDedupFirst]] discipline);
    *  2. MinHash signatures over the frame-fp set (the
    *     [[TextOps.MinHashPerms]] permutations, fp already 60-bit);
    *  3. capped (band, bucket) candidates
    *     ([[TextOps.lshCandidatePairs]] — 256-cap + star fallback
    *     bounds pair volume linearly in corpus size however many
    *     re-cuts a family has);
    *  4. exact containment verify restricted to CANDIDATES (the join
    *     is |cand|×frames-per-clip, never all-pairs).
    *
    * Returns (doc_a, doc_b, shared, containment ≥ minContainment). */
  def videoLshNearDupPairs(frames: DataFrame, minContainment: Double,
      maxBucket: Int = TextOps.DefaultMaxBucket): DataFrame = {
    import graft.core.Checkpoints.BarrierOps
    videoLshNearDupPairsFrom(
      frames.select(col("doc_id"), col("frame_fp")).distinct()
        .barrier(),
      minContainment, maxBucket)
  }

  /** Clip → 60-bit fingerprint of its distinct-frame SET (sorted
    * frame fps joined and hashed): content-identical clips — same
    * frames in any order, with any frame repeated — share one
    * `set_fp`. The exact rail of the video routes (q269–q271 and the
    * streaming video corpus store). Input is the distinct
    * (doc_id, frame_fp) relation; output (doc_id, set_fp). */
  def frameSetFingerprints(d0: DataFrame): DataFrame =
    d0.groupBy(col("doc_id"))
      .agg(TextOps.hash60(expr(
        "array_join(transform(sort_array(collect_list(frame_fp)), " +
          "x -> CAST(x AS STRING)), ':')")).as("set_fp"))

  /** doc → min-id representative of its identical distinct-frame SET
    * (the exact rail of the video route, q266's envelope-group shape):
    * input is the distinct (doc_id, frame_fp) relation; output
    * (doc_id, rep). A clip is its own rep iff it survives exact
    * dedup. */
  def frameSetReps(d0: DataFrame): DataFrame =
    frameSetProfile(d0).select(col("doc_id"), col("rep"))

  /** The whole per-clip profile of the video dedup routes from ONE
    * aggregation over the distinct (doc_id, frame_fp) relation —
    * set fingerprint (exact rail), the 4 set-MinHash signatures
    * (near-rail banding), distinct-frame count (containment
    * denominator) — plus the min-id exact representative via one
    * window over the set_fp exchange (no groupBy + join-back).
    * Output (doc_id, set_fp, rep, sig_0..sig_3, nf). The q271
    * keep-list barriers this once and feeds its exact rail, pair
    * stage and expansion map from it: at any scale the frame
    * relation is scanned once per consumer instead of re-aggregated
    * three ways. */
  def frameSetProfile(d0: DataFrame): DataFrame = {
    val p = TextOps.MinHashP
    val xm = col("frame_fp") % p
    d0.groupBy(col("doc_id"))
      .agg(
        TextOps.hash60(expr(
          "array_join(transform(sort_array(collect_list(frame_fp)), " +
            "x -> CAST(x AS STRING)), ':')")).as("set_fp"),
        min((xm * TextOps.MinHashPerms(0)._1
          + TextOps.MinHashPerms(0)._2) % p).as("sig_0"),
        min((xm * TextOps.MinHashPerms(1)._1
          + TextOps.MinHashPerms(1)._2) % p).as("sig_1"),
        min((xm * TextOps.MinHashPerms(2)._1
          + TextOps.MinHashPerms(2)._2) % p).as("sig_2"),
        min((xm * TextOps.MinHashPerms(3)._1
          + TextOps.MinHashPerms(3)._2) % p).as("sig_3"),
        count(lit(1)).as("nf"))
      .withColumn("rep",
        min(col("doc_id")).over(org.apache.spark.sql.expressions
          .Window.partitionBy(col("set_fp"))))
  }

  /** [[videoLshNearDupPairs]] over a precomputed (barriered) distinct
    * (doc_id, frame_fp) relation — lets a composed pipeline (e.g. the
    * q271 keep-list) share one frame scan between the pair stage and
    * the expansion map. */
  def videoLshNearDupPairsFrom(d0: DataFrame, minContainment: Double,
      maxBucket: Int = TextOps.DefaultMaxBucket,
      profile: Option[DataFrame] = None): DataFrame = {
    import graft.core.Checkpoints.BarrierOps
    // 1+2. exact rail AND signatures from the one-pass per-clip
    // profile ([[frameSetProfile]]); a caller that already
    // materialized it (the q271 keep-list shares it with its
    // expansion map) passes it in.
    val prof = profile.getOrElse(frameSetProfile(d0).barrier())
    val keepers = prof.filter(col("doc_id") === col("rep"))
    val sigs = keepers.select(col("doc_id"), col("sig_0"),
      col("sig_1"), col("sig_2"), col("sig_3"), col("nf"))
    val d = d0.join(keepers.select(col("doc_id")),
      Seq("doc_id"), "left_semi").barrier()
    // 3. capped banding; 4. containment verify on candidates only
    val cand = TextOps.lshCandidatePairs(sigs, "doc_id", maxBucket)
    cand
      .join(d.select(col("doc_id").as("doc_a"), col("frame_fp")),
        Seq("doc_a"))
      .join(d.select(col("doc_id").as("doc_b"), col("frame_fp")),
        Seq("doc_b", "frame_fp"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .join(sigs.select(col("doc_id").as("doc_a"),
        col("nf").as("__na")), Seq("doc_a"))
      .join(sigs.select(col("doc_id").as("doc_b"),
        col("nf").as("__nb")), Seq("doc_b"))
      .withColumn("containment",
        col("shared").cast("double") / least(col("__na"), col("__nb")))
      .filter(col("containment") >= minContainment)
      .select(col("doc_a"), col("doc_b"), col("shared"),
        col("containment"))
  }

  // ===== Pixel-level image operators (q263) =====================
  //
  // Real decoded pixels, not header fields: payloads are decoded with
  // javax.imageio (PNG/BMP/GIF/JPEG — the JDK's standard plugins, no
  // external codec), average-pooled to a 9×8 grayscale grid, and
  // hashed to the 64-bit dHash. Near-dup pairs come from 4×16-bit
  // Hamming banding — the q70/q77 pigeonhole machinery, reused via
  // the LSH bucket engine. The synthetic corpus makes the WHOLE chain
  // oracle-checkable: pixel values are a pure integer function of
  // (doc_id, x, y), both lossless containers round-trip them exactly,
  // so DuckDB recomputes the identical dHash from the formula while
  // Spark derives it from genuinely decoded bytes.

  /** One decoded image hash row; `dhash` is None when the payload does
    * not decode. */
  final case class ImageHash(doc_id: Long, source: String, width: Int,
      height: Int, dhash: Option[Long])

  /** Deterministic synthetic pixel: grayscale value of (x, y) for a
    * document. Families share `doc_id % 32` (base pattern); the
    * variant index moves a +60 bump to one pooling cell (a localized
    * edit → Hamming ≤ 4); brightness (doc_id % 5)·8 adds a constant
    * the dHash is invariant to. All terms non-negative integer mod —
    * bit-identical in SQL — and the total stays ≤ 241 < 256, so no
    * clamping ever fires. */
  def synthPixel(docId: Long, x: Int, y: Int): Int = {
    val g = (docId % 32L).toInt
    val v = ((docId / 32L) % 72L).toInt
    val br = ((docId % 5L) * 8L).toInt
    val base = ((g + 3) * x + (2 * g + 5) * y +
      ((x * y * (g + 1)) % 31)) % 150
    val bump = if (x / 4 == v % 9 && y / 4 == (v / 9) % 8) 60 else 0
    base + br + bump
  }

  /** 24-bit BMP encoding of a grayscale grid (pix(y)(x) ∈ 0..255):
    * 54-byte BITMAPINFOHEADER layout, rows bottom-up, BGR, 4-byte row
    * padding — the same fixed offsets [[parseHeader]] reads. */
  def encodeBmp(pix: Array[Array[Int]], w: Int, h: Int): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val dataSize = rowSize * h
    val out = new Array[Byte](54 + dataSize)
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    le32(2, 54 + dataSize); le32(10, 54)
    le32(14, 40); le32(18, w); le32(22, h)
    out(26) = 1; out(28) = 24
    le32(34, dataSize)
    var y = 0
    while (y < h) {
      val rowOff = 54 + (h - 1 - y) * rowSize // bottom-up
      var x = 0
      while (x < w) {
        val p = (pix(y)(x) & 0xff).toByte
        out(rowOff + x * 3) = p
        out(rowOff + x * 3 + 1) = p
        out(rowOff + x * 3 + 2) = p
        x += 1
      }
      y += 1
    }
    out
  }

  /** PNG encoding of a grayscale grid via the JDK encoder (lossless —
    * decode returns the exact pixels). */
  def encodePng(pix: Array[Array[Int]], w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = pix(y)(x) & 0xff
        img.setRGB(x, y, (p << 16) | (p << 8) | p)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** The deterministic synthetic image corpus over a documents table:
    * one w×h grayscale image per doc from [[synthPixel]], encoded as
    * BMP for even ids and PNG for odd ids — so the decode path is
    * exercised across two real containers whose DECODED pixels (and
    * therefore dHashes) are identical for the same formula.
    * `patternPeriod` folds the id before the pixel formula (pid =
    * doc_id mod period) so many documents share EXACT pixels while
    * the container still follows the REAL id's parity — the fixture
    * shape for re-encode-invariant exact dedup (q265: same pixels,
    * different bytes). Narrow map, no shuffle. */
  def syntheticImages(docs: DataFrame, w: Int = 36, h: Int = 32,
      patternPeriod: Long = Long.MaxValue): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("source"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, src) =>
          val pid = id % patternPeriod
          val pix = Array.tabulate(h, w)((y, x) => synthPixel(pid, x, y))
          val bytes =
            if (id % 2 == 0) encodeBmp(pix, w, h) else encodePng(pix, w, h)
          MediaRecord(id, bytes, src, (w.toLong * h))
        }
      }
  }

  /** 64-bit difference hash of a decoded image: integer luma
    * (299r + 587g + 114b) / 1000 per pixel, average-pooled onto a 9×8
    * grid (pixel (x, y) → cell (x·9 div w, y·8 div h)), bit r·8+c set
    * iff cell (r, c+1)'s mean exceeds cell (r, c)'s — compared by
    * exact integer cross-multiplication (sum·count), so unequal cell
    * sizes at arbitrary dimensions stay exact and SQL-replayable. */
  def dHash64(im: java.awt.image.BufferedImage): Long = {
    val w = im.getWidth
    val h = im.getHeight
    val sums = Array.ofDim[Long](8, 9)
    val cnts = Array.ofDim[Long](8, 9)
    var y = 0
    while (y < h) {
      val r = ((y.toLong * 8) / h).toInt
      var x = 0
      while (x < w) {
        val c = ((x.toLong * 9) / w).toInt
        val rgb = im.getRGB(x, y)
        val luma = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff)
          + 114 * (rgb & 0xff)) / 1000
        sums(r)(c) += luma
        cnts(r)(c) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (sums(r)(c + 1) * cnts(r)(c) > sums(r)(c) * cnts(r)(c + 1))
          hash |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    hash
  }

  /** Decode every payload (javax.imageio — opened once per partition
    * the same way [[decodeFeatures]] amortizes) and emit its dHash;
    * undecodable payloads surface with a null hash instead of
    * vanishing. Narrow map — at 100 TB this runs at scan bandwidth,
    * and only the 8-byte hashes ever shuffle. */
  def imageDHash(media: Dataset[MediaRecord]): Dataset[ImageHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val img =
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload)))
          catch { case scala.util.control.NonFatal(_) => None }
        img match {
          case Some(im) => ImageHash(r.doc_id, r.source, im.getWidth,
            im.getHeight, Some(dHash64(im)))
          case None => ImageHash(r.doc_id, r.source, 0, 0, None)
        }
      }
    }
  }

  /** One decoded pixel-identity row: `pix_fp` is the 60-bit hash of
    * the UPPERCASE row-major luma-byte hex of the decoded image —
    * None when the payload does not decode. */
  final case class PixelFingerprint(doc_id: Long, source: String,
      width: Int, height: Int, pix_fp: Option[Long])

  /** Re-encode-invariant EXACT image identity: decode, serialize the
    * integer luma grid row-major as uppercase hex, hash60 it. Two
    * payloads with byte-different containers (a PNG and a BMP, two
    * compression levels) but identical decoded pixels get the SAME
    * fingerprint — the exact-dup rail for images, where a byte-level
    * md5 (q40's text rail) sees only distinct files. Narrow map;
    * only (id, 8-byte fp) ever shuffles. Canonical form = luma hex
    * rather than raw RGB so the fingerprint is color-model-agnostic
    * and SQL-replayable. */
  def imagePixelFingerprint(media: Dataset[MediaRecord])
      : Dataset[PixelFingerprint] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val img =
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload)))
          catch { case scala.util.control.NonFatal(_) => None }
        img match {
          case Some(im) =>
            val w = im.getWidth
            val h = im.getHeight
            val sb = new java.lang.StringBuilder(w * h * 2)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = im.getRGB(x, y)
                val luma = (299 * ((rgb >> 16) & 0xff)
                  + 587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
                sb.append(f"$luma%02X")
                x += 1
              }
              y += 1
            }
            md.reset()
            val hex = md.digest(sb.toString.getBytes("UTF-8"))
              .map(b => f"${b & 0xff}%02x").mkString.take(15)
            PixelFingerprint(r.doc_id, r.source, w, h,
              Some(java.lang.Long.parseLong(hex, 16)))
          case None => PixelFingerprint(r.doc_id, r.source, 0, 0, None)
        }
      }
    }
  }

  /** Integer image-quality statistics from one decoded pass — the
    * image analog of the text quality gates (q50): luma sum and
    * square-sum (variance), total absolute neighbor difference in x
    * and y (edge energy — a blur/blank proxy: sharp images have high
    * per-pixel gradient, blurred or flat ones low), and the count of
    * the single most frequent luma value (near-constant "blank"
    * detector). All Long, so any downstream aggregation is exact and
    * the derived ratios are one IEEE division with identical operands
    * in both engines. None-row (not emitted) when the payload does
    * not decode. */
  final case class ImageQuality(doc_id: Long, source: String,
      n_px: Long, luma_sum: Long, luma_sq_sum: Long,
      edge_energy: Long, n_dominant: Long)

  def imageQualityStats(media: Dataset[MediaRecord])
      : Dataset[ImageQuality] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val img =
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload)))
          catch { case scala.util.control.NonFatal(_) => None }
        img.map { im =>
          val w = im.getWidth
          val h = im.getHeight
          val luma = Array.ofDim[Int](h, w)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = im.getRGB(x, y)
              luma(y)(x) = (299 * ((rgb >> 16) & 0xff)
                + 587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
              x += 1
            }
            y += 1
          }
          var s = 0L; var s2 = 0L; var edge = 0L
          val hist = new Array[Long](256)
          y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = luma(y)(x)
              s += p; s2 += p.toLong * p; hist(p) += 1
              if (x + 1 < w) edge += math.abs(luma(y)(x + 1) - p)
              if (y + 1 < h) edge += math.abs(luma(y + 1)(x) - p)
              x += 1
            }
            y += 1
          }
          ImageQuality(r.doc_id, r.source, w.toLong * h, s, s2, edge,
            hist.max)
        }
      }
    }
  }

  /** Integer audio-quality statistics from one decoded pass — the
    * audio analog of q50's gates: clipped-sample count (|s−128| ≥
    * `clipLevel`), silent analysis windows (integer energy below
    * `silenceEnergy`), and the min/max sample (dynamic range). All
    * exact integers; non-audio payloads emit no row. */
  final case class AudioQuality(doc_id: Long, source: String,
      n_samples: Long, n_clipped: Long, n_windows: Long,
      n_silent_windows: Long, sample_min: Int, sample_max: Int)

  def audioQualityStats(media: Dataset[MediaRecord], window: Int = 32,
      clipLevel: Int = 120, silenceEnergy: Long = 1000L)
      : Dataset[AudioQuality] = {
    require(window >= 1 && clipLevel >= 0,
      s"audioQualityStats: window=$window clipLevel=$clipLevel")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        parseHeader(r.payload) match {
          case Some(("audio", _, _, frames)) if frames > 0 =>
            val data = r.payload.drop(44)
            val n = data.length
            var clipped = 0L
            var mn = Int.MaxValue
            var mx = Int.MinValue
            var silent = 0L
            val nw = (n + window - 1) / window
            var wi = 0
            while (wi < nw) {
              val lo = wi * window
              val hi = math.min(lo + window, n)
              var e = 0L
              var t = lo
              while (t < hi) {
                val s = (data(t) & 0xff) - 128
                e += s.toLong * s
                if (math.abs(s) >= clipLevel) clipped += 1
                if (s < mn) mn = s
                if (s > mx) mx = s
                t += 1
              }
              if (e < silenceEnergy) silent += 1
              wi += 1
            }
            Some(AudioQuality(r.doc_id, r.source, n.toLong, clipped,
              nw.toLong, silent, mn, mx))
          case _ => None
        }
      }
    }
  }

  /** Both image signatures from ONE decode: the exact pixel-identity
    * fingerprint ([[imagePixelFingerprint]]) and the near-dup dHash
    * ([[dHash64]]) — what an ingest gate needs per payload without
    * paying the codec twice. None/None when the payload does not
    * decode. */
  final case class ImageSig(doc_id: Long, source: String, width: Int,
      height: Int, pix_fp: Option[Long], dhash: Option[Long])

  def imageSignatures(media: Dataset[MediaRecord]): Dataset[ImageSig] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val img =
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload)))
          catch { case scala.util.control.NonFatal(_) => None }
        img match {
          case Some(im) =>
            val w = im.getWidth
            val h = im.getHeight
            val sb = new java.lang.StringBuilder(w * h * 2)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = im.getRGB(x, y)
                val luma = (299 * ((rgb >> 16) & 0xff)
                  + 587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
                sb.append(f"$luma%02X")
                x += 1
              }
              y += 1
            }
            md.reset()
            val hex = md.digest(sb.toString.getBytes("UTF-8"))
              .map(b => f"${b & 0xff}%02x").mkString.take(15)
            ImageSig(r.doc_id, r.source, w, h,
              Some(java.lang.Long.parseLong(hex, 16)),
              Some(dHash64(im)))
          case None => ImageSig(r.doc_id, r.source, 0, 0, None, None)
        }
      }
    }
  }

  /** The 4×16-bit bands of a 64-bit hash as an LSH-style signature
    * frame — [[TextOps.lshCandidatePairs]]' input shape, so Hamming
    * banding reuses the capped bucket engine (and its oracle
    * fragment) unchanged. Pigeonhole: Hamming ≤ 3 GUARANTEES a shared
    * band; ≤ maxHamming above that is best-effort recall, exactly as
    * in q70/q77. */
  def dhashBands(hashes: DataFrame, idCol: String, hashCol: String)
      : DataFrame =
    hashes.filter(col(hashCol).isNotNull).select(
      col(idCol) +: (0 until 4).map(b =>
        shiftright(col(hashCol), b * 16).bitwiseAND(lit(0xffffL))
          .as(s"sig_$b")): _*)

  /** Image near-dup pairs: banded candidates verified by exact
    * bit_count Hamming distance ≤ maxHamming. Candidate generation is
    * bucket-capped (star-pair fallback) like every LSH route; the
    * verify join touches only the 8-byte hashes. Returns
    * (doc_a, doc_b, hamming). */
  def hammingNearDupPairs(hashes: DataFrame, idCol: String,
      hashCol: String, maxHamming: Int): DataFrame = {
    val cand = TextOps.lshCandidatePairs(
      dhashBands(hashes, idCol, hashCol), idCol)
    val a = hashes.select(col(idCol).as("doc_a"), col(hashCol).as("__ha"))
    val b = hashes.select(col(idCol).as("doc_b"), col(hashCol).as("__hb"))
    cand.join(a, Seq("doc_a")).join(b, Seq("doc_b"))
      .withColumn("hamming",
        bit_count(col("__ha").bitwiseXOR(col("__hb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Cross-modal PAIRED near-dup — the keep decision a captioned
    * image corpus actually needs: a pair of (image, caption) docs is
    * a duplicate only when BOTH rails agree — the captions are
    * near-dup text (`captionPairs`, e.g.
    * [[TextOps.ngramJaccardPairs]]' verified (doc_a, doc_b, jac))
    * AND the images are visually near (dHash Hamming ≤ `maxHamming`
    * over `hashes` (doc_id, dhash)). A re-encoded image under a
    * paraphrased caption collapses; the same image under a genuinely
    * different caption survives (the caption carries information),
    * and a re-used caption on a different image survives too.
    *
    * Scale shape: the caption rail PROPOSES (its inverted index is
    * df-capped, so pair volume is bounded linearly in corpus size)
    * and the image rail VERIFIES — two hash lookups and one XOR per
    * candidate pair, no image banding pass at all. The text rail is
    * orders of magnitude more selective than visual banding on a
    * captioned corpus (captions are near-unique; decorative images
    * repeat), so proposing from text keeps the intermediate the
    * small one. Output (doc_a, doc_b, jac, hamming). */
  def pairedCaptionNearDupPairs(captionPairs: DataFrame,
      hashes: DataFrame, maxHamming: Int): DataFrame =
    captionPairs
      .join(hashes.select(col("doc_id").as("doc_a"),
        col("dhash").as("__ha")), Seq("doc_a"))
      .join(hashes.select(col("doc_id").as("doc_b"),
        col("dhash").as("__hb")), Seq("doc_b"))
      .withColumn("hamming",
        bit_count(col("__ha").bitwiseXOR(col("__hb"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("jac"), col("hamming"))

  /** The SLOT verify of the paired-video route: text-proposed pairs
    * survive when the two 64-bit near hashes — four 16-bit MinHash
    * slots packed side by side (`PairedRelease.videoMinhashPack`) —
    * agree on at least `minSharedSlots` ALIGNED slots. Bitwise
    * Hamming is the wrong metric for packed MinHash (a differing
    * slot contributes 0–16 random bits; three slots of a genuine
    * trim can differ while two slots of unrelated clips rarely even
    * share one), so the verify counts slot equalities, the
    * estimator banding is built on. Same two-hash-lookups-per-
    * candidate shape as the Hamming verify. */
  def pairedSlotNearDupPairs(captionPairs: DataFrame,
      hashes: DataFrame, minSharedSlots: Int = 1,
      slots: Int = 4, slotBits: Int = 16): DataFrame = {
    require(minSharedSlots >= 1 && minSharedSlots <= slots,
      s"pairedSlotNearDupPairs: minSharedSlots=$minSharedSlots")
    val mask = (1L << slotBits) - 1L
    val shared = (0 until slots).map(i =>
      when(shiftright(col("__ha"), i * slotBits)
          .bitwiseAND(lit(mask)) ===
        shiftright(col("__hb"), i * slotBits)
          .bitwiseAND(lit(mask)), 1).otherwise(0))
      .reduce(_ + _)
    captionPairs
      .join(hashes.select(col("doc_id").as("doc_a"),
        col("dhash").as("__ha")), Seq("doc_a"))
      .join(hashes.select(col("doc_id").as("doc_b"),
        col("dhash").as("__hb")), Seq("doc_b"))
      .withColumn("shared_slots", shared)
      .filter(col("shared_slots") >= minSharedSlots)
      .select(col("doc_a"), col("doc_b"), col("jac"),
        col("shared_slots"))
  }

  // ===== PCM audio window features (q264) =======================
  //
  // The audio analog of the q263 pixel path: synthetic 8-bit mono WAV
  // payloads (canonical 44-byte header + raw PCM — no codec needed,
  // PCM IS the samples) are REALLY parsed — header fields first, then
  // the data section bytes — and folded into per-window integer
  // energy and zero-crossing counts, the standard VAD/segmentation
  // features. The oracle replays the sample formula; parity holds
  // because raw PCM round-trips bytes exactly.

  /** One analysis window of a decoded audio payload. */
  final case class AudioWindow(doc_id: Long, source: String,
      window_idx: Int, n_samples: Int, energy: Long,
      zero_crossings: Int)

  /** Deterministic synthetic 8-bit PCM sample t of a document —
    * non-negative integer mod arithmetic, bit-identical in SQL. */
  def synthSample(docId: Long, t: Int): Int = {
    val a = ((docId % 13L) + 1L).toInt
    val b = (docId % 97L).toInt
    val c = (docId % 256L).toInt
    (a * t * t + b * t + c) % 256
  }

  /** Canonical 44-byte WAV container around 8-bit mono PCM samples —
    * the exact layout [[parseHeader]] reads (channels at 22,
    * blockAlign at 32). */
  def encodeWav(samples: Array[Int]): Array[Byte] = {
    val n = samples.length
    val out = new Array[Byte](44 + n)
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    "RIFF".getBytes.copyToArray(out, 0)
    le32(4, 36 + n)
    "WAVEfmt ".getBytes.copyToArray(out, 8)
    le32(16, 16)
    out(20) = 1 // PCM
    out(22) = 1 // mono
    le32(24, 8000) // sample rate
    le32(28, 8000) // byte rate
    out(32) = 1 // blockAlign
    out(34) = 8 // bits per sample
    "data".getBytes.copyToArray(out, 36)
    le32(40, n)
    var t = 0
    while (t < n) {
      out(44 + t) = (samples(t) & 0xff).toByte
      t += 1
    }
    out
  }

  /** Synthetic WAV corpus over a documents table: one nSamples-long
    * 8-bit mono PCM payload per doc from [[synthSample]]. Like
    * [[syntheticImages]], `patternPeriod` folds the id before the
    * sample formula so documents share a base signal, and `jitterMod`
    * adds a per-document DC offset (clamped at 255) — the
    * near-duplicate fixture: same clip, slightly different gain,
    * byte-DIFFERENT payloads. Narrow map, no shuffle. */
  def syntheticWavs(docs: DataFrame, nSamples: Int = 256,
      patternPeriod: Long = Long.MaxValue, jitterMod: Long = 1L)
      : Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("source"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, src) =>
          val pid = id % patternPeriod
          val jit = (id % jitterMod).toInt
          MediaRecord(id,
            encodeWav(Array.tabulate(nSamples)(t =>
              math.min(synthSample(pid, t) + jit, 255))),
            src, nSamples.toLong)
        }
      }
  }

  /** Per-window PCM features from REAL payload bytes: parse the WAV
    * header, read the 8-bit data section, and per `window` samples
    * emit exact integer energy (Σ(s−128)²) and the within-window
    * zero-crossing count ((s_t−128)·(s_{t−1}−128) < 0). Non-audio or
    * zero-frame payloads yield no rows. Narrow flatMap bounded by
    * n/window rows per payload — scan-bandwidth at 100 TB, only the
    * feature rows shuffle (if the consumer aggregates at all). */
  def audioWindowFeatures(media: Dataset[MediaRecord], window: Int)
      : Dataset[AudioWindow] = {
    require(window >= 1, s"audioWindowFeatures: window=$window")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        parseHeader(r.payload) match {
          case Some(("audio", _, _, frames)) if frames > 0 =>
            val data = r.payload.drop(44)
            val n = data.length
            (0 until (n + window - 1) / window).map { wi =>
              val lo = wi * window
              val hi = math.min(lo + window, n)
              var energy = 0L
              var zc = 0
              var t = lo
              while (t < hi) {
                val s = (data(t) & 0xff) - 128
                energy += s.toLong * s
                if (t > lo) {
                  val p = (data(t - 1) & 0xff) - 128
                  if (p * s < 0) zc += 1
                }
                t += 1
              }
              AudioWindow(r.doc_id, r.source, wi, hi - lo, energy, zc)
            }
          case _ => Nil
        }
      }
    }
  }

  /** 63-bit acoustic fingerprint of a decoded clip, or None for
    * non-audio payloads. */
  final case class AudioHash(doc_id: Long, source: String,
      env_hash: Option[Long])

  /** Chromaprint-style acoustic fingerprint: bit i is the SIGN of the
    * energy delta between consecutive analysis windows i and i+1
    * (E(i+1) > E(i)), over the first 64 windows — 63 bits in a
    * non-negative Long (so the oracle needs no sign gymnastics).
    * Delta SIGNS are what survive gain changes: a DC offset shifts
    * every window's energy in the same direction, so only
    * near-equal-energy neighbors can flip — the audio analog of
    * [[dHash64]]'s neighbor-luma comparisons (measured on the
    * synthetic corpus: same-signal gain variants ≤ 4 bits apart,
    * different signals ≥ 10). Feed to [[hammingNearDupPairs]] with
    * the same 4×16-bit banding as images. One narrow map per clip,
    * no shuffle. */
  def audioEnvelopeHash(media: Dataset[MediaRecord], window: Int)
      : Dataset[AudioHash] = {
    require(window >= 1, s"audioEnvelopeHash: window=$window")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        parseHeader(r.payload) match {
          case Some(("audio", _, _, frames)) if frames > 0 =>
            val data = r.payload.drop(44)
            val n = data.length
            val nw = (n + window - 1) / window
            val energies = Array.tabulate(nw) { wi =>
              val lo = wi * window
              val hi = math.min(lo + window, n)
              var e = 0L
              var t = lo
              while (t < hi) {
                val s = (data(t) & 0xff) - 128
                e += s.toLong * s
                t += 1
              }
              e
            }
            var h = 0L
            var i = 0
            while (i < math.min(nw - 1, 63)) {
              if (energies(i + 1) > energies(i)) h |= 1L << i
              i += 1
            }
            AudioHash(r.doc_id, r.source, Some(h))
          case _ => AudioHash(r.doc_id, r.source, None)
        }
      }
    }
  }

  /** Full pipeline: pack → decode → per-source feature aggregate.
    * `source` is carried through the decode, so this is scan → narrow
    * map → one hash aggregation — no join anywhere. */
  def featureStats(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeFeatures(packAsMedia(docs)).toDF()
      .groupBy(col("source"), col("media_kind"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        // avg over INT sums exactly in Long first, then one IEEE
        // division — order-independent AND engine-exact unrounded
        avg(col("width")).as("avg_width"),
        max(col("n_frames")).as("max_frames"))
}
