package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, TextOps, TrainPrep}

/** Gates for the round-10 additions beyond the crawl-transport codecs:
  * span dedup (q137), the MP3 frame walker (q138), and the Z-order
  * layout audit (q139).
  */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  // ----------------------------------------------------------- spanDedup

  test("spanDedup keeps the first (doc_id, span_idx) occurrence corpus-wide") {
    val docs = Seq(
      (1L, "a b c d e f"),        // spans: "a b c", "d e f"
      (2L, "a b c x y z"),        // "a b c" dup of doc 1; "x y z" fresh
      (3L, "x y z x y z d e f"),  // "x y z" dup, "x y z" dup, "d e f" dup
      (4L, "a b")                 // < 3 tokens → no row
    ).toDF("doc_id", "text")
    val out = TextOps.spanDedup(docs, "doc_id", "text", 3)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val byId = out.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byId(1L) == ((2L, 2L, 0L)))
    assert(byId(2L) == ((2L, 1L, 1L)))
    assert(byId(3L) == ((3L, 0L, 3L)))
  }

  test("spanDedup within-doc repeats: first span wins, later ones are dups") {
    val docs = Seq((5L, "p q r p q r p q r")).toDF("doc_id", "text")
    val r = TextOps.spanDedup(docs, "doc_id", "text", 3).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((3L, 1L, 2L)))
  }

  // ----------------------------------------------------------------- MP3

  private def badMp3(f: => Any): String =
    intercept[IllegalArgumentException](f).getMessage

  test("MP3 VBR walk: every frame's bitrate and padding counted exactly") {
    val frames = Seq((1, 0), (14, 1), (5, 0)) // 32, 320, 64 kbps
    val enc = Multimodal.Mp3.encode(srIdx = 1, mono = false, frames,
      id3Payload = Some(20), fill = (_, _) => 0x55)
    val m = Multimodal.Mp3.decode(9L, enc)
    assert(m.has_id3 && m.id3_size == 20)
    assert(m.sample_rate == 48000 && m.channels == 2 && m.n_frames == 3)
    assert(m.sum_bitrate_kbps == 32 + 320 + 64)
    val expBytes = frames.map { case (br, pad) =>
      Multimodal.Mp3.frameLen(br, 1, pad) }.sum
    assert(m.total_bytes == expBytes)
    assert(m.duration_ms == 3L * 1152 * 1000 / 48000)
  }

  test("MP3 rejects desync, free/bad bitrate, reserved rate, truncation") {
    val ok = Multimodal.synthMp3(1L)
    // flip a sync byte mid-stream: the walk must fail, not resync blindly
    val desync = ok.clone()
    val firstLen = {
      val m = Multimodal.Mp3.decode(1L, ok)
      (m.total_bytes / m.n_frames).toInt // frames vary; just grab offset 0
    }
    desync(0) = 0x00
    assert(badMp3(Multimodal.Mp3.decode(1L, desync)).contains("sync"))
    assert(badMp3(Multimodal.Mp3.decode(1L, ok.dropRight(3))).contains("doc 1"))
    // bitrate index 0 (free) and 15 (bad) both rejected
    val free = ok.clone(); free(2) = (free(2) & 0x0f).toByte
    assert(badMp3(Multimodal.Mp3.decode(1L, free)).contains("bitrate"))
    assert(firstLen > 0)
  }

  test("MP3 sniffs into the media dispatcher as a real decode") {
    val df = Seq((8L, Multimodal.synthMp3(8L)), (3L, "plain text".getBytes))
      .toDF("doc_id", "bin")
    val out = Multimodal.decodeMedia(df, "doc_id", "bin").collect()
      .map(r => r.doc_id -> r).toMap
    assert(out(8L).format == "mp3" && out(8L).decode_ok)
    assert(out(8L).n_frames == 20 + 8 % 30)
    assert(out(3L).format == "unknown" && !out(3L).decode_ok)
  }

  // ---------------------------------------------------------------- TIFF

  test("TIFF decodes identically under II and MM byte orders") {
    def px(x: Int, y: Int) = (x * 10 + y, 100 + x, 200 - y)
    val le = Multimodal.Tiff.decode(1L,
      Multimodal.Tiff.encode(littleEndian = true, Seq((3, 2, px _))))
    val be = Multimodal.Tiff.decode(2L,
      Multimodal.Tiff.encode(littleEndian = false, Seq((3, 2, px _))))
    assert(le.byte_order == "II" && be.byte_order == "MM")
    assert((le.width, le.height, le.sum_r, le.sum_g, le.sum_b, le.px00) ==
      (be.width, be.height, be.sum_r, be.sum_g, be.sum_b, be.px00))
    assert(le.width == 3 && le.height == 2)
    assert(le.px00 == (0 << 16) + (100 << 8) + 200)
  }

  test("TIFF multi-page chain and malformed inputs") {
    val two = Multimodal.Tiff.encode(littleEndian = false,
      Seq((2, 2, (_, _) => (1, 2, 3)), (4, 1, (_, _) => (9, 9, 9))))
    val m = Multimodal.Tiff.decode(3L, two)
    assert(m.n_pages == 2 && m.width == 2 && m.height == 2) // page-1 dims
    assert(m.sum_r == 4 && m.sum_g == 8 && m.sum_b == 12)
    val junk = "XX".getBytes ++ two.drop(2)
    assert(intercept[IllegalArgumentException](
      Multimodal.Tiff.decode(3L, junk)).getMessage.contains("byte-order"))
    assert(intercept[IllegalArgumentException](
      Multimodal.Tiff.decode(3L, two.take(20))).getMessage.contains("doc 3"))
  }

  test("TIFF sniffs into the media dispatcher under both orders") {
    val df = Seq((2L, Multimodal.synthTiff(2L)), (3L, Multimodal.synthTiff(3L)))
      .toDF("doc_id", "bin")
    val out = Multimodal.decodeMedia(df, "doc_id", "bin").collect()
      .map(r => r.doc_id -> r).toMap
    assert(out(2L).format == "tiff" && out(2L).decode_ok) // II
    assert(out(3L).format == "tiff" && out(3L).decode_ok) // MM
    assert(out(3L).n_frames == 2) // 3 % 3 == 0 → two pages
  }

  // ---------------------------------------------------------------- UTF-8

  test("UTF-8 repair replaces each malformed EVENT with one U+FFFD") {
    import graft.operators.CrawlFormats
    val clean = "héllo wörld".getBytes("UTF-8")
    assert(CrawlFormats.Utf8.repair(clean) == (("héllo wörld", 0)))
    // lone continuation mid-stream + truncated lead at EOF = 2 events
    val bad = "ab".getBytes ++ Array(0x80.toByte) ++ "cd".getBytes ++ Array(0xc3.toByte)
    val (txt, n) = CrawlFormats.Utf8.repair(bad)
    assert(txt == "ab�cd�" && n == 2)
    // a 3-byte sequence truncated to 2 bytes: ONE event, not two
    val trunc = "x".getBytes ++ Array(0xe2.toByte, 0x82.toByte)
    assert(CrawlFormats.Utf8.repair(trunc) == (("x�", 1)))
    // pre-existing U+FFFD in valid text is NOT counted as an event
    val legit = "a�b".getBytes("UTF-8")
    assert(CrawlFormats.Utf8.repair(legit) == (("a�b", 0)))
  }

  // --------------------------------------------------- Gopher filter

  test("gopherFilter sets the right failure bits") {
    val docs = Seq(
      // passes everything: 10+ tokens, sane word length, stopwords, no symbols
      (1L, "the quick brown fox jumps over and over the lazy sleeping dog"),
      // too few tokens (bit 0) + too few stopwords (bit 2)
      (2L, "short doc"),
      // symbol soup: bit 3 (plus whatever else trips)
      (3L, "the £$%^ &*(@ !!%% ^^&* (((( )))) @@@@ #### $$$$ %%%% and extra words here")
    ).toDF("doc_id", "text")
    val out = TextOps.gopherFilter(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("fail_mask") == 0L && out(1L).getAs[Boolean]("keep"))
    val m2 = out(2L).getAs[Long]("fail_mask")
    assert((m2 & 1L) != 0 && (m2 & 4L) != 0 && !out(2L).getAs[Boolean]("keep"))
    assert((out(3L).getAs[Long]("fail_mask") & 8L) != 0)
  }

  // --------------------------------------------------- inverted index

  test("invertedIndex postings digest is doc-ordered and tf-exact") {
    val docs = Seq(
      (7L, "apple banana apple"),
      (2L, "banana cherry"),
      (11L, "apple")
    ).toDF("doc_id", "text")
    val out = TextOps.invertedIndex(docs, "doc_id", "text").collect()
      .map(r => r.getAs[String]("term") -> r).toMap
    assert(out("apple").getAs[Long]("df") == 2 &&
      out("apple").getAs[Long]("total_tf") == 3)
    assert(out("banana").getAs[Long]("df") == 2 &&
      out("banana").getAs[Long]("total_tf") == 2)
    assert(out("cherry").getAs[Long]("df") == 1)
    // digest = md5 of zero-padded doc:tf entries in doc order
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    assert(out("apple").getAs[String]("postings_md5") ==
      md5("0000000007:2,0000000011:1"))
  }

  // -------------------------------------------------------------- SemDeDup

  test("semDedup keeps the centroid-closest representative per near-dup group") {
    import graft.operators.VectorOps
    // centroids: cell 0 ≈ +x, cell 1 ≈ +y (quantized-int units)
    val cents: Array[Seq[Double]] = Array(
      Seq(1000.0, 0.0, 0.0), Seq(0.0, 1000.0, 0.0))
    // ids 1,2,3: near-identical +x vectors (cosine ≈ 1), id 2 closest to
    // the centroid → 2 kept, 1 and 3 dropped. id 4: +y, alone in cell 1.
    val vecs = Seq(
      (1L, Seq(0.9f, 0.1f, 0.0f)),
      (2L, Seq(1.0f, 0.0f, 0.0f)),
      (3L, Seq(0.95f, 0.05f, 0.0f)),
      (4L, Seq(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = VectorOps.semDedup(vecs, "vec_id", "embedding", cents, tau = 0.9)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("n_dup"), r.getAs[Boolean]("kept")))).toMap
    assert(out(2L) == ((0L, true)))  // rank 1 in cell 0
    assert(out(1L)._2 == false && out(3L)._2 == false)
    assert(out(4L) == ((0L, true)))  // sole occupant of cell 1
    // id 3 outranks id 1 (closer to centroid) → 1 sees 2 earlier similars
    assert(out(1L)._1 == 2L && out(3L)._1 == 1L)
  }

  // -------------------------------------------------------------- Z-order

  test("mortonKey interleaves bits exactly") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 255L))
      .toDF("x", "y")
    val keys = df.select(TrainPrep.mortonKey(col("x"), col("y"), 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    def ref(x: Long, y: Long): Long =
      (0 until 8).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    assert(keys == Seq(ref(0, 0), ref(1, 0), ref(0, 1), ref(3, 5), ref(255, 255)))
    assert(keys(1) == 1L && keys(2) == 2L && keys(4) == 65535L)
  }

  test("zorderLayout bounding boxes are tighter than a one-dimension sort") {
    // uniform grid: a z-order layout bounds BOTH dims per file; a layout
    // sorted by x alone leaves max_y - min_y at full range in every file
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val z = TrainPrep.zorderLayout(grid, col("x"), col("y"), bits = 6, files = 16)
      .collect()
    assert(z.map(_.getAs[Long]("n_rows")).sum == 64L * 64)
    // 16 files over a 12-bit keyspace → each file is a 16x16 z-block
    assert(z.forall(_.getAs[Long]("bbox_area") <= 16L * 16))
    val xSorted = grid.withColumn("file_id", (col("x") / 4).cast("long"))
      .groupBy("file_id")
      .agg((max("y") - min("y") + 1).as("yspan"))
      .collect()
    assert(xSorted.forall(_.getAs[Long]("yspan") == 64L)) // unpruned dim
  }
}
