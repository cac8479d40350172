package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder prompt): image/audio/video as
  * opaque BINARY columns with typed metadata, decoded per-partition.
  *
  * The container has no image/audio libraries, so for library-bound
  * formats (JPEG/MP4) the decode is a clearly-marked DETERMINISTIC
  * FAKE (arithmetic over byte length + head bytes) while the Spark-side
  * plumbing — binary column, typed Dataset, `mapPartitions` batch shape,
  * schema of the decoded output — is real and oracle-checked. WAV, BMP
  * and PNG, however, need no library beyond the JDK — PNG's only
  * compressed part is zlib, which `java.util.zip` provides — so their
  * codecs below (`Wav`, `Bmp`, `Png`) are REAL byte-level
  * implementations: RIFF chunk walking, BITMAPINFOHEADER parsing with
  * bottom-up padded pixel rows, CRC-verified PNG chunk streams with all
  * five scanline filters — round-tripped end to end by q118/q119/q120
  * against exact-integer DuckDB oracles.
  */
object Multimodal {

  /** Decoded-media metadata record (the schema a real decoder would emit). */
  case class MediaMeta(doc_id: Long, byte_len: Long, width: Long, height: Long,
      n_frames: Long, head_hex: String)

  /** STUB decode — a real implementation would call an image/audio codec
    * here (per-partition, so codec init amortizes across a batch, the same
    * shape `mapInPandas` gives PySpark). Deterministic fake:
    * width/height/frames derived from byte length, feature = first 8
    * bytes hex.
    */
  def decodeMedia(df: DataFrame, idCol: String, binCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init site (codec handle, model weights, ...)
        it.map { case (id, bytes) =>
          val len = bytes.length.toLong
          MediaMeta(
            doc_id = id,
            byte_len = len,
            width = len % 640,
            height = (len * 7) % 480,
            n_frames = len % 30,
            head_hex = bytes.take(8).map(b => f"${b & 0xff}%02x").mkString)
        }
      }
  }

  /** Resized-media record: real schema, stubbed resample. */
  case class ResizedMedia(doc_id: Long, out_w: Int, out_h: Int, bytes: Array[Byte])

  /** STUB resize — a real codec would resample pixels; the fake keeps a
    * deterministic strided sample of the payload so output size tracks
    * the requested dims. Partitioning/batching shape is the real thing.
    */
  def resize(df: DataFrame, idCol: String, binCol: String,
      outW: Int, outH: Int): Dataset[ResizedMedia] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val target = math.max(1, math.min(outW * outH, bytes.length))
          val stride = math.max(1, bytes.length / target)
          ResizedMedia(id, outW, outH, bytes.grouped(stride).map(_.head).toArray)
        }
      }
  }

  /** One sampled frame: offset into the payload + a scalar feature. */
  case class FrameSample(doc_id: Long, frame_idx: Int, offset: Long, feature: Double)

  /** STUB frame sampling — every `everyN` bytes stands in for every Nth
    * video frame; emits one row per frame (the explode shape a real
    * frame sampler produces).
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
      everyN: Int): Dataset[FrameSample] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        Iterator.range(0, bytes.length, everyN).zipWithIndex.map { case (off, idx) =>
          FrameSample(id, idx, off.toLong, (bytes(off) & 0xff) / 255.0)
        }
      }
  }

  // ==========================================================================
  // REAL codecs (round 8): WAV and BMP need no external libraries — the
  // formats are header + raw samples/pixels — so for these two the decode
  // step is NOT a stub: byte-level RIFF chunk walking and BITMAPINFOHEADER
  // parsing with bottom-up rows and 4-byte row padding. The stubbed
  // decodeMedia above remains the shape for formats that DO need a codec
  // library (JPEG/PNG/MP4).
  // ==========================================================================

  /** Decoded WAV metadata. All aggregates are exact integers (sum of
    * squares over int16 fits int64 for any realistic clip), so results
    * are partitioning-independent and DuckDB-oracle-checkable. first/last
    * sample values pin the decoder's data offset and sample order.
    */
  case class WavMeta(doc_id: Long, sample_rate: Long, n_channels: Long,
      bits_per_sample: Long, n_samples: Long, duration_ms: Long,
      sum_sq: Long, peak: Long, first_sample: Long, last_sample: Long)

  /** Minimal REAL RIFF/WAVE PCM16 codec (mono). Public format:
    * RIFF container, "fmt " + "data" chunks, little-endian, odd-size
    * chunks pad to even offsets.
    */
  object Wav {
    def encode(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val dataLen = samples.length * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(1) // mono
        .putInt(sampleRate)
        .putInt(sampleRate * 2) // byte rate
        .putShort(2) // block align
        .putShort(16) // bits per sample
      buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(buf.putShort)
      buf.array()
    }

    def decode(id: Long, bytes: Array[Byte]): WavMeta = {
      val buf = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def ascii(off: Int, n: Int) = new String(bytes, off, n, "US-ASCII")
      require(ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE",
        s"not a RIFF/WAVE payload (doc $id)")
      // walk chunks: [id:4][size:4LE][data:size][pad to even]
      var off = 12
      var rate, channels, bits = -1L
      var dataOff, dataLen = -1
      while (off + 8 <= bytes.length) {
        val cid = ascii(off, 4)
        val sz = buf.getInt(off + 4)
        if (cid == "fmt ") {
          require(buf.getShort(off + 8) == 1, s"not PCM (doc $id)")
          channels = buf.getShort(off + 10).toLong
          rate = buf.getInt(off + 12).toLong
          bits = buf.getShort(off + 22).toLong
        } else if (cid == "data") { dataOff = off + 8; dataLen = sz }
        off += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
      }
      require(rate > 0 && dataOff >= 0, s"missing fmt /data chunk (doc $id)")
      require(bits == 16, s"only PCM16 supported (doc $id)")
      val n = dataLen / (2 * channels.toInt)
      var sumSq = 0L
      var peak = 0L
      var i = 0
      var first, last = 0L
      while (i < n * channels.toInt) {
        val s = buf.getShort(dataOff + 2 * i).toLong
        if (i == 0) first = s
        last = s
        sumSq += s * s
        val a = math.abs(s); if (a > peak) peak = a
        i += 1
      }
      WavMeta(id, rate, channels, bits, n, n * 1000L / rate, sumSq, peak,
        first, last)
    }
  }

  /** Decoded BMP metadata. Channel sums are exact integers; px00 packs
    * the TOP-LEFT pixel (r·65536 + g·256 + b) — BMP stores rows
    * bottom-up, so px00 is wrong unless the decoder really re-orders.
    */
  case class BmpMeta(doc_id: Long, width: Long, height: Long,
      bits_per_pixel: Long, sum_r: Long, sum_g: Long, sum_b: Long,
      px00: Long)

  /** Minimal REAL BMP (BITMAPINFOHEADER, 24bpp BI_RGB) codec. Rows are
    * stored bottom-up in BGR order, each padded to a 4-byte boundary —
    * the two details that make round-tripping a genuine parse.
    */
  object Bmp {
    /** `px(x, y)` returns (r, g, b) for the TOP-LEFT-origin pixel grid. */
    def encode(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
      val stride = ((w * 3) + 3) / 4 * 4
      val imgLen = stride * h
      val buf = java.nio.ByteBuffer.allocate(54 + imgLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put('B'.toByte).put('M'.toByte).putInt(54 + imgLen)
        .putInt(0).putInt(54) // reserved, pixel-data offset
      buf.putInt(40).putInt(w).putInt(h) // positive height = bottom-up
        .putShort(1).putShort(24).putInt(0) // planes, bpp, BI_RGB
        .putInt(imgLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
      for (row <- 0 until h) {
        val y = h - 1 - row // bottom-up: last image row first
        for (x <- 0 until w) {
          val (r, g, b) = px(x, y)
          buf.put(b.toByte).put(g.toByte).put(r.toByte) // BGR on disk
        }
        var pad = stride - w * 3
        while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      }
      buf.array()
    }

    def decode(id: Long, bytes: Array[Byte]): BmpMeta = {
      val buf = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      require(bytes(0) == 'B' && bytes(1) == 'M', s"not a BMP payload (doc $id)")
      val pixOff = buf.getInt(10)
      val w = buf.getInt(18)
      val hRaw = buf.getInt(22)
      val bpp = buf.getShort(28).toInt
      require(buf.getInt(30) == 0, s"compressed BMP unsupported (doc $id)")
      require(bpp == 24, s"only 24bpp supported (doc $id)")
      val h = math.abs(hRaw)
      val bottomUp = hRaw > 0
      val stride = ((w * 3) + 3) / 4 * 4
      var sumR, sumG, sumB = 0L
      var px00 = 0L
      for (y <- 0 until h) {
        val row = if (bottomUp) h - 1 - y else y // y = top-left-origin row
        val base = pixOff + row * stride
        for (x <- 0 until w) {
          val b = bytes(base + x * 3) & 0xff
          val g = bytes(base + x * 3 + 1) & 0xff
          val r = bytes(base + x * 3 + 2) & 0xff
          if (x == 0 && y == 0) px00 = r * 65536L + g * 256L + b
          sumR += r; sumG += g; sumB += b
        }
      }
      BmpMeta(id, w, h, bpp, sumR, sumG, sumB, px00)
    }
  }

  /** Decoded PNG metadata. Mirrors [[BmpMeta]]'s exact-integer shape so
    * the DuckDB oracle recomputes every field from the synth formula;
    * `n_idat` pins the multi-IDAT concatenation path (the synth encoder
    * always splits the zlib stream across two IDAT chunks, which the
    * spec asserts — a decoder that reads only the first chunk fails
    * inflation, one that guesses from byte counts gets n_idat wrong).
    */
  case class PngMeta(doc_id: Long, width: Long, height: Long,
      bit_depth: Long, color_type: Long, sum_r: Long, sum_g: Long,
      sum_b: Long, px00: Long, n_idat: Long)

  /** Minimal REAL PNG codec (8-bit truecolor RGB, non-interlaced). PNG
    * is public-spec (RFC 2083): length-prefixed chunks with CRC-32
    * trailers, IHDR big-endian dims, pixel data = zlib-deflated
    * scanlines, each prefixed by a filter byte (0 None / 1 Sub / 2 Up /
    * 3 Average / 4 Paeth). The JDK supplies the only nontrivial parts
    * (`java.util.zip.{Deflater, Inflater, CRC32}`), so no external
    * library is needed — this is a genuine parse, not a stub.
    *
    * The encoder deliberately cycles the filter type per row (y mod 5)
    * and splits the compressed stream across two IDAT chunks, so a
    * decoder only round-trips if it implements ALL five unfilters
    * (including Paeth's nearest-predictor tie-breaking) and chunk
    * reassembly. CRCs are verified on decode — bit rot fails loudly.
    */
  object Png {
    private val Signature = Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

    private def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }

    private def chunk(out: java.io.ByteArrayOutputStream, typ: String,
        data: Array[Byte]): Unit = {
      val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
      out.write(len)
      val t = typ.getBytes("US-ASCII")
      out.write(t); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    }

    /** `px(x, y)` returns (r, g, b) for the top-left-origin pixel grid
      * (PNG rows are stored top-down, unlike BMP).
      */
    def encode(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
      val bpp = 3
      val raw = new Array[Byte](h * (1 + w * bpp))
      val prior = new Array[Byte](w * bpp) // zero row above the image
      val cur = new Array[Byte](w * bpp)
      var off = 0
      for (y <- 0 until h) {
        for (x <- 0 until w) {
          val (r, g, b) = px(x, y)
          cur(x * bpp) = r.toByte; cur(x * bpp + 1) = g.toByte; cur(x * bpp + 2) = b.toByte
        }
        val f = y % 5 // cycle every filter type — decode must undo each
        raw(off) = f.toByte; off += 1
        for (i <- 0 until w * bpp) {
          val x = cur(i) & 0xff
          val a = if (i >= bpp) cur(i - bpp) & 0xff else 0
          val b = prior(i) & 0xff
          val c = if (i >= bpp) prior(i - bpp) & 0xff else 0
          val filtered = f match {
            case 0 => x
            case 1 => x - a
            case 2 => x - b
            case 3 => x - (a + b) / 2
            case 4 => x - paeth(a, b, c)
          }
          raw(off) = filtered.toByte; off += 1
        }
        System.arraycopy(cur, 0, prior, 0, w * bpp)
      }
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw); deflater.finish()
      val zBuf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](4096)
      while (!deflater.finished()) zBuf.write(tmp, 0, deflater.deflate(tmp))
      deflater.end()
      val z = zBuf.toByteArray

      val out = new java.io.ByteArrayOutputStream()
      out.write(Signature)
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(w).putInt(h)
        .put(8.toByte)  // bit depth
        .put(2.toByte)  // color type: truecolor RGB
        .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
        .array()
      chunk(out, "IHDR", ihdr)
      // always TWO IDAT chunks: decoders must concatenate before inflating
      val mid = math.max(1, z.length / 2)
      chunk(out, "IDAT", z.take(mid))
      chunk(out, "IDAT", z.drop(mid))
      chunk(out, "IEND", Array.emptyByteArray)
      out.toByteArray
    }

    def decode(id: Long, bytes: Array[Byte]): PngMeta = {
      require(bytes.length >= 8 && Signature.indices.forall(i => bytes(i) == Signature(i)),
        s"not a PNG payload (doc $id)")
      val buf = java.nio.ByteBuffer.wrap(bytes) // PNG ints are big-endian
      var off = 8
      var w, h = -1
      var bitDepth, colorType = -1
      var nIdat = 0L
      val zAll = new java.io.ByteArrayOutputStream()
      var sawEnd = false
      while (!sawEnd && off + 12 <= bytes.length) {
        val len = buf.getInt(off)
        val typ = new String(bytes, off + 4, 4, "US-ASCII")
        require(len >= 0 && off + 12 + len <= bytes.length,
          s"truncated $typ chunk (doc $id)")
        val crc = new java.util.zip.CRC32()
        crc.update(bytes, off + 4, 4 + len)
        require(crc.getValue.toInt == buf.getInt(off + 8 + len),
          s"CRC mismatch in $typ chunk (doc $id)")
        typ match {
          case "IHDR" =>
            w = buf.getInt(off + 8); h = buf.getInt(off + 12)
            bitDepth = bytes(off + 16) & 0xff
            colorType = bytes(off + 17) & 0xff
            require(bytes(off + 20) == 0, s"interlaced PNG unsupported (doc $id)")
            require(bitDepth == 8 && colorType == 2,
              s"only 8-bit truecolor supported, got depth=$bitDepth type=$colorType (doc $id)")
          case "IDAT" => zAll.write(bytes, off + 8, len); nIdat += 1
          case "IEND" => sawEnd = true
          case _ => // ancillary chunks skipped
        }
        off += 12 + len
      }
      require(w > 0 && h > 0 && sawEnd && nIdat > 0, s"missing IHDR/IDAT/IEND (doc $id)")

      val inflater = new java.util.zip.Inflater()
      inflater.setInput(zAll.toByteArray)
      val bpp = 3
      val raw = new Array[Byte](h * (1 + w * bpp))
      var got = 0
      while (got < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, got, raw.length - got)
        require(n > 0 || inflater.finished(), s"bad zlib stream (doc $id)")
        got += n
      }
      inflater.end()
      require(got == raw.length, s"short pixel stream: $got of ${raw.length} (doc $id)")

      val prior = new Array[Byte](w * bpp)
      val cur = new Array[Byte](w * bpp)
      var sumR, sumG, sumB = 0L
      var px00 = 0L
      for (y <- 0 until h) {
        val base = y * (1 + w * bpp)
        val f = raw(base) & 0xff
        for (i <- 0 until w * bpp) {
          val x = raw(base + 1 + i) & 0xff
          val a = if (i >= bpp) cur(i - bpp) & 0xff else 0
          val b = prior(i) & 0xff
          val c = if (i >= bpp) prior(i - bpp) & 0xff else 0
          val v = f match {
            case 0 => x
            case 1 => x + a
            case 2 => x + b
            case 3 => x + (a + b) / 2
            case 4 => x + paeth(a, b, c)
            case other => throw new IllegalArgumentException(
              s"unknown filter type $other (doc $id)")
          }
          cur(i) = v.toByte
        }
        for (x <- 0 until w) {
          val r = cur(x * bpp) & 0xff
          val g = cur(x * bpp + 1) & 0xff
          val b = cur(x * bpp + 2) & 0xff
          if (x == 0 && y == 0) px00 = r * 65536L + g * 256L + b
          sumR += r; sumG += g; sumB += b
        }
        System.arraycopy(cur, 0, prior, 0, w * bpp)
      }
      PngMeta(id, w, h, bitDepth, colorType, sumR, sumG, sumB, px00, nIdat)
    }
  }

  /** REAL WAV decimation (the frame-sample op for audio): keep every
    * `everyN`th sample and divide the declared rate to match, so
    * duration is preserved (±1 sample) — a genuine parse → resample →
    * re-encode pass, not a byte stride.
    */
  def wavDecimate(id: Long, bytes: Array[Byte], everyN: Int): Array[Byte] = {
    require(everyN > 0, s"everyN must be positive (doc $id)")
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val meta = Wav.decode(id, bytes)
    // re-walk to the data chunk (decode validated the container)
    var off = 12
    var dataOff = -1
    while (off + 8 <= bytes.length && dataOff < 0) {
      val cid = new String(bytes, off, 4, "US-ASCII")
      val sz = buf.getInt(off + 4)
      if (cid == "data") dataOff = off + 8 else off += 8 + sz + (sz & 1)
    }
    val kept = Array.tabulate((meta.n_samples.toInt + everyN - 1) / everyN)(j =>
      buf.getShort(dataOff + 2 * j * everyN))
    Wav.encode(kept, math.max(1, meta.sample_rate.toInt / everyN))
  }

  /** REAL BMP nearest-neighbor resize: decode pixels (bottom-up rows,
    * padding), sample the source grid at scaled coordinates, re-encode
    * a valid BMP at (outW, outH).
    */
  def bmpResize(id: Long, bytes: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
    require(outW > 0 && outH > 0, s"resize dims must be positive (doc $id)")
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val m = Bmp.decode(id, bytes) // validates container, gives dims
    val w = m.width.toInt
    val h = m.height.toInt
    val pixOff = buf.getInt(10)
    val bottomUp = buf.getInt(22) > 0
    val stride = ((w * 3) + 3) / 4 * 4
    def src(x: Int, y: Int): (Int, Int, Int) = {
      val row = if (bottomUp) h - 1 - y else y
      val base = pixOff + row * stride + x * 3
      ((bytes(base + 2) & 0xff), (bytes(base + 1) & 0xff), (bytes(base) & 0xff))
    }
    Bmp.encode(outW, outH, (x, y) => src(x * w / outW, y * h / outH))
  }

  /** Per-doc deterministic PCM16 synth (what a crawler's audio column
    * would hold): n and rate vary with doc_id so duration/padding paths
    * all get exercised; sample i = ((id·31 + i·7) mod 2¹⁶) − 2¹⁵.
    */
  def synthWav(docId: Long): Array[Byte] = {
    val n = (800 + docId % 400).toInt
    val rate = (8000 + (docId % 3) * 4000).toInt
    Wav.encode(Array.tabulate(n)(i =>
      (((docId * 31 + i.toLong * 7) % 65536) - 32768).toShort), rate)
  }

  /** Per-doc deterministic RGB synth; w spans strides with every padding
    * remainder (0..3), pixel channels are distinct affine functions of
    * (id, x, y) so any axis/channel swap in the decoder is caught.
    */
  def synthBmp(docId: Long): Array[Byte] = {
    val w = (3 + docId % 6).toInt
    val h = (2 + docId % 4).toInt
    Bmp.encode(w, h, (x, y) => (
      ((docId + 3 * x + 5 * y) % 256).toInt,
      ((2 * docId + x + 7 * y) % 256).toInt,
      ((5 * docId + 11 * x + y) % 256).toInt))
  }

  /** Per-doc deterministic RGB synth for PNG; h reaches 6 so the per-row
    * filter cycle (y mod 5) exercises all five filter types within one
    * image, and the channel affines differ from [[synthBmp]]'s so a
    * crossed decode path can't accidentally match.
    */
  def synthPng(docId: Long): Array[Byte] = {
    val w = (3 + docId % 7).toInt
    val h = (2 + docId % 5).toInt
    Png.encode(w, h, (x, y) => (
      ((docId + 7 * x + 3 * y) % 256).toInt,
      ((3 * docId + 5 * x + y) % 256).toInt,
      ((9 * docId + x + 13 * y) % 256).toInt))
  }

  /** documents → real WAV binary column → REAL decode → exact metadata.
    * The encode and decode run in the SAME per-partition pass a
    * production pipeline would use (binary column in, typed row out).
    */
  def wavRoundTrip(ids: DataFrame, idCol: String): Dataset[WavMeta] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => Wav.decode(id, synthWav(id))))
  }

  /** documents → real BMP binary column → REAL decode → exact metadata. */
  def bmpRoundTrip(ids: DataFrame, idCol: String): Dataset[BmpMeta] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => Bmp.decode(id, synthBmp(id))))
  }

  /** documents → real PNG binary column → REAL decode → exact metadata. */
  def pngRoundTrip(ids: DataFrame, idCol: String): Dataset[PngMeta] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => Png.decode(id, synthPng(id))))
  }

  /** STUB feature extraction — an 8-bucket byte histogram as the
    * "embedding" (a real extractor would run a vision/audio model per
    * partition). Output plugs directly into VectorOps ANN: the
    * multimodal → embedding → similarity-search pipeline end to end.
    */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val hist = new Array[Float](8)
        bytes.foreach(b => hist((b & 0xff) / 32) += 1f)
        val n = math.max(1, bytes.length).toFloat
        (id, hist.map(_ / n).toSeq)
      }
      .toDF(idCol, "embedding")
  }
}
