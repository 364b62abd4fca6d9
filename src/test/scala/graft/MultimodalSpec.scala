package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llmops.Multimodal

/** Pixel-level image operator invariants (q263 machinery): the parts
  * an SQL oracle cannot see — that the hash really comes from DECODED
  * bytes. Cross-engine value parity of the full chain is enforced by
  * the q263 DuckDB gate; these specs pin the decode path itself:
  * container round-trips, dHash invariances, known dup/non-dup pairs,
  * partition invariance, and undecodable-payload behavior. */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark = graft.core.Sessions.local(4, "graft-multimodal-test")
  import spark.implicits._

  private val W = 36
  private val H = 32

  private def decode(b: Array[Byte]) =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))

  private def pixOf(id: Long) =
    Array.tabulate(H, W)((y, x) => Multimodal.synthPixel(id, x, y))

  test("re-encode invariance: the same pixels through BMP and PNG " +
    "decode to the SAME dHash (lossless containers)") {
    val pix = pixOf(42L)
    val viaBmp = Multimodal.dHash64(decode(
      Multimodal.encodeBmp(pix, W, H)))
    val viaPng = Multimodal.dHash64(decode(
      Multimodal.encodePng(pix, W, H)))
    assert(viaBmp == viaPng)
    // and decoded pixels are exactly the encoded grid (both formats)
    for (bytes <- Seq(Multimodal.encodeBmp(pix, W, H),
        Multimodal.encodePng(pix, W, H))) {
      val im = decode(bytes)
      assert(im.getWidth == W && im.getHeight == H)
      assert((im.getRGB(5, 7) & 0xff) == pix(7)(5))
    }
  }

  test("brightness invariance: adding a constant to every pixel " +
    "leaves the difference hash unchanged") {
    val pix = pixOf(3L) // values ≤ 241
    val brighter = pix.map(_.map(p => math.min(p + 14, 255)))
    val h0 = Multimodal.dHash64(decode(Multimodal.encodeBmp(pix, W, H)))
    val h1 = Multimodal.dHash64(decode(
      Multimodal.encodeBmp(brighter, W, H)))
    assert(h0 == h1)
  }

  test("localized edit moves few bits; a different base pattern " +
    "moves many") {
    val pix = pixOf(5L)
    // bump one 4×4 pooling cell — at most the two comparisons
    // adjacent to that cell in its row can flip
    val edited = pix.map(_.clone())
    for (y <- 12 until 16; x <- 20 until 24)
      edited(y)(x) = math.min(edited(y)(x) + 60, 255)
    val h0 = Multimodal.dHash64(decode(Multimodal.encodeBmp(pix, W, H)))
    val h1 = Multimodal.dHash64(decode(
      Multimodal.encodeBmp(edited, W, H)))
    assert(java.lang.Long.bitCount(h0 ^ h1) <= 2)
    // different family (different g): far apart in Hamming space
    val hOther = Multimodal.dHash64(decode(
      Multimodal.encodeBmp(pixOf(6L), W, H)))
    assert(java.lang.Long.bitCount(h0 ^ hOther) > 4)
  }

  test("dHash survives LOSSY JPEG re-encoding within the near-dup " +
    "threshold — the perceptual-hash robustness claim") {
    for (id <- Seq(1L, 17L, 42L, 99L)) {
      val pix = pixOf(id)
      val lossless = Multimodal.dHash64(decode(
        Multimodal.encodeBmp(pix, W, H)))
      // JPEG round-trip: pixels change, the difference hash shouldn't
      val img = new java.awt.image.BufferedImage(W, H,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until H; x <- 0 until W) {
        val p = pix(y)(x)
        img.setRGB(x, y, (p << 16) | (p << 8) | p)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      val viaJpeg = Multimodal.dHash64(decode(bos.toByteArray))
      val ham = java.lang.Long.bitCount(lossless ^ viaJpeg)
      assert(ham <= 4,
        s"id=$id: JPEG re-encode moved the dHash by $ham bits")
    }
  }

  test("property: dHash brightness + re-encode invariance over " +
    "random pixel grids") {
    val rnd = new scala.util.Random(20260815L)
    for (_ <- 0 until 25) {
      val pix = Array.fill(H, W)(rnd.nextInt(230))
      val viaBmp = Multimodal.dHash64(decode(
        Multimodal.encodeBmp(pix, W, H)))
      val viaPng = Multimodal.dHash64(decode(
        Multimodal.encodePng(pix, W, H)))
      assert(viaBmp == viaPng) // container-independent
      val shift = 1 + rnd.nextInt(25)
      val brighter = pix.map(_.map(_ + shift)) // ≤ 254, no clamp
      assert(Multimodal.dHash64(decode(
        Multimodal.encodeBmp(brighter, W, H))) == viaBmp)
      // pixel-identity fingerprint: equal across containers too
      val media = Seq(
        Multimodal.MediaRecord(1L, Multimodal.encodeBmp(pix, W, H),
          "s", 0L),
        Multimodal.MediaRecord(2L, Multimodal.encodePng(pix, W, H),
          "s", 0L)).toDS()
      val fps = Multimodal.imagePixelFingerprint(media).collect()
        .map(_.pix_fp).toSeq
      assert(fps.forall(_.isDefined) && fps.distinct.size == 1)
    }
  }

  test("imageDHash decodes every synthetic payload; result is " +
    "partition-invariant") {
    val docs = (0L until 80L).map(i => (i, s"s${i % 3}"))
      .toDF("doc_id", "source")
    def hashes(parts: Int) = Multimodal.imageDHash(
        Multimodal.syntheticImages(docs.repartition(parts)))
      .collect()
      .map(h => h.doc_id -> h.dhash)
      .toMap
    val h1 = hashes(1)
    assert(h1.size == 80 && h1.values.forall(_.isDefined))
    assert(hashes(7) == h1)
    // dims survive the decode
    val dims = Multimodal.imageDHash(
        Multimodal.syntheticImages(docs.limit(1)))
      .collect().head
    assert(dims.width == 36 && dims.height == 32)
  }

  test("undecodable payloads surface with a NULL hash and are " +
    "excluded from pairing, not dropped silently") {
    val media = Seq(
      Multimodal.MediaRecord(1L, Multimodal.encodeBmp(pixOf(1L), W, H),
        "s", 0L),
      Multimodal.MediaRecord(2L, Array[Byte](1, 2, 3, 4), "s", 0L))
      .toDS()
    val got = Multimodal.imageDHash(media).collect()
      .map(h => h.doc_id -> h.dhash).toMap
    assert(got(1L).isDefined && got(2L).isEmpty)
    val pairs = Multimodal.hammingNearDupPairs(
      Multimodal.imageDHash(media).toDF(), "doc_id", "dhash", 64)
    assert(pairs.count() == 0L) // the null row never pairs
  }

  test("hammingNearDupPairs: banded candidates verified by exact " +
    "bit_count, threshold respected") {
    val hashes = Seq(
      (1L, java.lang.Long.valueOf(0L)),
      (2L, java.lang.Long.valueOf(1L)), // hamming 1 vs doc 1
      (3L, java.lang.Long.valueOf(0xffff000000000000L)), // band 3 off
      (4L, null.asInstanceOf[java.lang.Long]))
      .toDF("doc_id", "dhash")
    val got = Multimodal.hammingNearDupPairs(hashes, "doc_id", "dhash",
        maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // (1,2) share bands and sit at hamming 1; (1,3)/(2,3) share bands
    // 0-2 but verify at 16/17 bits → dropped; 4 is null → absent
    assert(got.toSeq == Seq((1L, 2L, 1)))
  }

  test("audioWindowFeatures: hand-computed energy and zero-crossings " +
    "from real WAV bytes; non-audio payloads yield no rows") {
    // window 0: constant 200 → energy 32·72², zc 0
    // window 1: alternating 100/156 → energy 32·28², zc 31
    val samples = Array.fill(32)(200) ++
      Array.tabulate(32)(t => if (t % 2 == 0) 100 else 156)
    val media = Seq(
      Multimodal.MediaRecord(1L, Multimodal.encodeWav(samples), "s", 64L),
      Multimodal.MediaRecord(2L, Array[Byte](9, 9, 9), "s", 3L))
      .toDS()
    val got = Multimodal.audioWindowFeatures(media, window = 32)
      .collect().sortBy(_.window_idx)
    assert(got.length == 2 && got.forall(_.doc_id == 1L))
    assert(got(0).n_samples == 32 &&
      got(0).energy == 32L * 72 * 72 && got(0).zero_crossings == 0)
    assert(got(1).n_samples == 32 &&
      got(1).energy == 32L * 28 * 28 && got(1).zero_crossings == 31)
    // the WAV header the encoder writes is the one the parser reads
    assert(Multimodal.parseHeader(Multimodal.encodeWav(samples))
      .contains(("audio", 1, 1, 64)))
  }

  test("imagePixelFingerprint: same pixels through different " +
    "containers share the fingerprint; different pixels don't; " +
    "undecodable is None") {
    val pix = pixOf(11L)
    val media = Seq(
      Multimodal.MediaRecord(1L, Multimodal.encodeBmp(pix, W, H), "s", 0L),
      Multimodal.MediaRecord(2L, Multimodal.encodePng(pix, W, H), "s", 0L),
      Multimodal.MediaRecord(3L,
        Multimodal.encodeBmp(pixOf(12L), W, H), "s", 0L),
      Multimodal.MediaRecord(4L, Array[Byte](0, 1, 2), "s", 0L))
      .toDS()
    val got = Multimodal.imagePixelFingerprint(media).collect()
      .map(f => f.doc_id -> f.pix_fp).toMap
    assert(got(1L).isDefined && got(1L) == got(2L)) // re-encode dup
    assert(got(3L).isDefined && got(3L) != got(1L))
    assert(got(4L).isEmpty)
  }

  test("audio envelope quantization absorbs a small clamped DC " +
    "offset (near-dup rail), separates a different signal") {
    // loud alternating signal (energy ≈ 320k per window, eq = 4) vs
    // a quiet constant one (eq = 0); +2 DC shifts energy by ~128,
    // far inside one 65536 quantization step
    def alt(jit: Int) = Multimodal.encodeWav(
      Array.tabulate(64)(t => (if (t % 2 == 0) 28 else 228) + jit))
    val quiet = Multimodal.encodeWav(Array.fill(64)(148))
    val media = Seq(
      Multimodal.MediaRecord(1L, alt(0), "s", 64L),
      Multimodal.MediaRecord(2L, alt(2), "s", 64L), // +2 DC gain
      Multimodal.MediaRecord(3L, quiet, "s", 64L)) // other signal
      .toDS()
    def env(id: Long) = Multimodal
      .audioWindowFeatures(media.filter(_.doc_id == id), window = 32)
      .collect().sortBy(_.window_idx).map(_.energy / 65536L).toSeq
    assert(env(1L) == env(2L)) // quantized envelopes collapse
    assert(env(1L) != env(3L))
  }

  test("audioEnvelopeHash: gain variants land within Hamming 4, a " +
    "different signal is far; non-audio payloads hash to None") {
    def wav(pid: Long, jit: Int) = Multimodal.encodeWav(
      Array.tabulate(256)(t =>
        math.min(Multimodal.synthSample(pid, t) + jit, 255)))
    val media = Seq(
      Multimodal.MediaRecord(1L, wav(7L, 0), "s", 256L),
      Multimodal.MediaRecord(2L, wav(7L, 2), "s", 256L), // gain twin
      Multimodal.MediaRecord(3L, wav(19L, 0), "s", 256L), // other clip
      Multimodal.MediaRecord(4L, Array[Byte](1, 2, 3), "s", 3L))
      .toDS()
    val got = Multimodal.audioEnvelopeHash(media, window = 4)
      .collect().map(h => h.doc_id -> h.env_hash).toMap
    assert(got(4L).isEmpty)
    val Seq(h1, h2, h3) = Seq(1L, 2L, 3L).map(got(_).get)
    assert(h1 >= 0L && h2 >= 0L && h3 >= 0L) // 63-bit, oracle-safe
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 4)
    assert(java.lang.Long.bitCount(h1 ^ h3) >= 10)
    // and the banded pair engine sees exactly the twin pair
    val pairs = Multimodal.hammingNearDupPairs(
        Multimodal.audioEnvelopeHash(media, window = 4).toDF(),
        "doc_id", "env_hash", maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("sharedFrameNearDupPairs: shifted re-cut at 8-|delta| shared " +
    "frames, TRIMMED re-cut at containment 1.0, cross-family none, " +
    "sub-frame payloads emit no rows") {
    def frame(fid: Long) = "fr:%013d".format(fid).getBytes("UTF-8")
    def clip(id: Long, fids: Seq[Long]) =
      Multimodal.MediaRecord(id, fids.flatMap(frame).toArray, "s",
        fids.size.toLong)
    val media = Seq(
      clip(1L, 0L to 7L), // the original
      clip(2L, 2L to 9L), // shifted re-cut: shares {2..7} = 6/8
      clip(3L, 0L to 5L), // trimmed re-cut: 6 frames, ALL in clip 1
      clip(4L, 100L to 107L), // different family
      Multimodal.MediaRecord(5L, Array[Byte](1, 2), "s", 0L))
      .toDS()
    val frames = Multimodal.frameFingerprints(media, frameBytes = 16)
    assert(frames.filter(col("doc_id") === 5L).count() == 0L)
    val got = Multimodal
      .sharedFrameNearDupPairs(frames, minContainment = 0.75)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got((1L, 2L)) == ((6L, 0.75))) // 6/min(8,8)
    assert(got((1L, 3L)) == ((6L, 1.0))) // 6/min(8,6): trim caught
    assert(!got.contains((2L, 3L))) // 4/min(8,6) = 0.667 < 0.75
    assert(!got.keys.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("imageQualityStats: flat image scores blank (variance 0, " +
    "dominant 1.0, zero edge), checkerboard scores sharp; " +
    "undecodable emits no row") {
    val flat = Array.fill(H, W)(77)
    val checker = Array.tabulate(H, W)((y, x) =>
      if ((x + y) % 2 == 0) 0 else 200)
    val media = Seq(
      Multimodal.MediaRecord(1L, Multimodal.encodeBmp(flat, W, H),
        "s", 0L),
      Multimodal.MediaRecord(2L, Multimodal.encodePng(checker, W, H),
        "s", 0L),
      Multimodal.MediaRecord(3L, Array[Byte](1, 2), "s", 2L)).toDS()
    val got = Multimodal.imageQualityStats(media).collect()
      .map(q => q.doc_id -> q).toMap
    assert(!got.contains(3L))
    val f = got(1L)
    assert(f.n_px == W.toLong * H && f.luma_sum == 77L * W * H)
    assert(f.luma_sq_sum == 77L * 77 * W * H)
    assert(f.edge_energy == 0L && f.n_dominant == W.toLong * H)
    val c = got(2L)
    // every interior neighbor pair differs by 200: (W-1)*H + (H-1)*W
    assert(c.edge_energy == 200L * ((W - 1) * H + (H - 1) * W))
    assert(c.n_dominant == W.toLong * H / 2)
  }

  test("audioQualityStats: silence counts silent windows, a loud " +
    "alternating clip counts clipped samples and full range; " +
    "non-audio emits no row") {
    val silence = Multimodal.encodeWav(Array.fill(64)(128)) // sv = 0
    val loud = Multimodal.encodeWav(
      Array.tabulate(64)(t => if (t % 2 == 0) 0 else 255)) // -128/127
    val media = Seq(
      Multimodal.MediaRecord(1L, silence, "s", 64L),
      Multimodal.MediaRecord(2L, loud, "s", 64L),
      Multimodal.MediaRecord(3L, Array[Byte](9), "s", 1L)).toDS()
    val got = Multimodal.audioQualityStats(media, window = 32)
      .collect().map(q => q.doc_id -> q).toMap
    assert(!got.contains(3L))
    val s = got(1L)
    assert(s.n_windows == 2L && s.n_silent_windows == 2L)
    assert(s.n_clipped == 0L && s.sample_min == 0 && s.sample_max == 0)
    val l = got(2L)
    assert(l.n_clipped == 64L) // |−128| and |127| both ≥ 120
    assert(l.n_silent_windows == 0L)
    assert(l.sample_min == -128 && l.sample_max == 127)
  }

  test("property: sharedFrameNearDupPairs equals brute-force " +
    "containment over random frame sets") {
    def frame(fid: Long) = "fr:%013d".format(fid).getBytes("UTF-8")
    val rnd = new scala.util.Random(20260815L)
    for (_ <- 0 until 8) {
      val nDocs = 10 + rnd.nextInt(8)
      val sets: Map[Long, Set[Long]] = (1L to nDocs).map { id =>
        id -> Seq.fill(2 + rnd.nextInt(7))(rnd.nextInt(20).toLong)
          .toSet
      }.toMap
      val media = sets.toSeq.map { case (id, fids) =>
        Multimodal.MediaRecord(id,
          fids.toSeq.sorted.flatMap(frame).toArray, "s",
          fids.size.toLong)
      }.toDS()
      val got = Multimodal.sharedFrameNearDupPairs(
          Multimodal.frameFingerprints(media, frameBytes = 16),
          minContainment = 0.6)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      val want = (for {
        a <- sets.keys; b <- sets.keys if a < b
        shared = (sets(a) & sets(b)).size
        cont = shared.toDouble / math.min(sets(a).size, sets(b).size)
        if cont >= 0.6
      } yield (a, b) -> ((shared.toLong, cont))).toMap
      assert(got == want)
    }
  }

  test("videoLshNearDupPairs: exact set-dups collapse to one keeper " +
    "before banding; the shifted re-cut still surfaces via LSH " +
    "candidates with exact containment") {
    def frame(fid: Long) = "fr:%013d".format(fid).getBytes("UTF-8")
    def clip(id: Long, fids: Seq[Long]) =
      Multimodal.MediaRecord(id, fids.flatMap(frame).toArray, "s",
        fids.size.toLong)
    val media = Seq(
      clip(1L, 0L to 7L),
      clip(2L, 0L to 7L), // identical SET: collapses to keeper 1
      clip(3L, 1L to 8L), // shifted re-cut: 7/8 shared with 1
      clip(4L, 100L to 107L)) // different family
      .toDS()
    val got = Multimodal.videoLshNearDupPairs(
        Multimodal.frameFingerprints(media, frameBytes = 16),
        minContainment = 0.75)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // clip 2 was exact-dedup-first'd away: no pair mentions it
    assert(!got.keys.exists(p => p._1 == 2L || p._2 == 2L))
    assert(got((1L, 3L)) == ((7L, 7.0 / 8.0)))
    assert(!got.keys.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("pairedCaptionNearDupPairs: a re-encoded image under a " +
    "paraphrased caption collapses; same image under a different " +
    "caption — and same caption over a different image — survive") {
    import graft.llmops.{DedupClusters, TextOps}
    val pix = pixOf(42L)
    val other = pixOf(7L) // different base pattern → far dHash
    val capA = "the quick brown fox jumps over the lazy dog"
    val capB = "the quick brown fox jumps over a sleepy dog" // ~0.4 jac
    val capC = "completely unrelated words describing another scene"
    val docs = Seq(
      (1L, Multimodal.encodeBmp(pix, W, H), capA),
      (2L, Multimodal.encodePng(pix, W, H), capB), // both rails fire
      (3L, Multimodal.encodeBmp(pix, W, H), capC), // image-only
      (4L, Multimodal.encodeBmp(other, W, H), capA)) // caption-only
      .toDF("doc_id", "payload", "text")
    val captionPairs = TextOps.ngramJaccardPairs(
      docs, "doc_id", "text", minJac = 0.2, maxDf = 1000)
    val hashes = Multimodal.imageDHash(
      docs.select(col("doc_id"), col("payload"),
          lit("s").as("source"), lit(0L).as("n_chars"))
        .as[Multimodal.MediaRecord]).toDF()
    val pairs = Multimodal.pairedCaptionNearDupPairs(
      captionPairs, hashes, maxHamming = 4)
    val got = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L))) // only the both-rails pair
    val kept = DedupClusters.keepList(docs.select(col("doc_id")),
        "doc_id", pairs, "doc_a", "doc_b")
      .filter(col("is_kept")).collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L)) // 2 collapses into 1
  }

  test("known dup/non-dup pairs through the full q263 chain") {
    // ids 10 and 170 share the base pattern (g = 10) with different
    // variant/brightness; id 11 is a different family
    val docs = Seq((10L, "a"), (170L, "a"), (11L, "a"))
      .toDF("doc_id", "source")
    val pairs = Multimodal.hammingNearDupPairs(
        Multimodal.imageDHash(Multimodal.syntheticImages(docs)).toDF(),
        "doc_id", "dhash", maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((10L, 170L)))
    assert(!pairs.exists(p => p._1 == 11L || p._2 == 11L))
  }
}
