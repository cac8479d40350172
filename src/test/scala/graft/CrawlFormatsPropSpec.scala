package graft

import graft.operators.{CrawlFormats, Multimodal}
import graft.operators.CrawlFormats.{Gzip, Tar, Zip}

/** Property tests for the crawl-transport codecs: seeded-random
  * round-trips over adversarial payload shapes (empty, binary,
  * block-boundary sizes), plus a mutation-fuzz gate on the media
  * dispatcher's total-decode contract — random corruption may flip
  * decode_ok but must never escape as a task failure.
  */
class CrawlFormatsPropSpec extends SparkSpec {
  import spark.implicits._

  private def md5(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(b).map(x => f"${x & 0xff}%02x").mkString

  test("gzip round-trips random binary payloads under all flag combos") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 40) {
      val n = Seq(0, 1, rnd.nextInt(5000), 8192)(trial % 4)
      val payload = Array.fill(n)(rnd.nextInt(256).toByte)
      val enc = Gzip.encode(payload, mtime = rnd.nextInt(1 << 30).toLong,
        os = rnd.nextInt(256),
        fname = if (trial % 3 == 0) Some(s"f$trial.bin") else None,
        extra = if (trial % 5 == 0) Some(Array.fill(rnd.nextInt(30))(7.toByte)) else None,
        withHcrc = trial % 2 == 0)
      val m = Gzip.decode(trial.toLong, enc)
      assert(m.n_bytes == n && m.crc_ok && m.text_md5 == md5(payload),
        s"trial $trial")
    }
  }

  test("tar round-trips block-boundary payload sizes exactly") {
    val rnd = new scala.util.Random(13)
    val sizes = Seq(0, 1, 511, 512, 513, 1024, rnd.nextInt(4000))
    val members = sizes.zipWithIndex.map { case (n, i) =>
      (i.toLong, Array.fill(n)(rnd.nextInt(256).toByte))
    }
    val archive = members.flatMap { case (i, p) =>
      Tar.encodeMember(s"d/doc_$i.bin", '0', p)
    }.toArray ++ Tar.Terminator
    val out = Tar.parseArchive(0L, archive)
    assert(out.length == members.length)
    members.foreach { case (i, p) =>
      val r = out.find(_.doc_id == i).get
      assert(r.size == p.length && r.checksum_ok && r.payload_md5 == md5(p),
        s"member $i size ${p.length}")
    }
  }

  test("zip round-trips random entries, stored and deflated alike") {
    val rnd = new scala.util.Random(17)
    val entries = (0 until 12).map { i =>
      val p = Array.fill(Seq(0, 1, rnd.nextInt(3000))(i % 3))(rnd.nextInt(256).toByte)
      (s"doc_$i.bin", p, i % 2 == 1)
    }
    val out = Zip.decode(0L, Zip.encode(entries)).sortBy(_.doc_id)
    assert(out.length == entries.length)
    entries.zipWithIndex.foreach { case ((_, p, deflate), i) =>
      val r = out(i)
      assert(r.uncomp_size == p.length && r.crc_ok &&
        r.method == (if (deflate) 8 else 0) && r.payload_md5 == md5(p), s"entry $i")
    }
  }

  test("utf8 repair is idempotent on arbitrary byte soup") {
    val rnd = new scala.util.Random(19)
    for (trial <- 0 until 60) {
      val bytes = Array.fill(rnd.nextInt(400))(rnd.nextInt(256).toByte)
      val (repaired, _) = CrawlFormats.Utf8.repair(bytes)
      val (again, events2) = CrawlFormats.Utf8.repair(repaired.getBytes("UTF-8"))
      assert(events2 == 0 && again == repaired, s"trial $trial not idempotent")
    }
  }

  test("Exif.parse under mutation: parses or throws a doc-tagged error, never anything else") {
    val rnd = new scala.util.Random(29)
    var parsed = 0
    var rejected = 0
    for (i <- 0 until 150) {
      val base = Multimodal.synthExifJpeg(i.toLong)
      val b = rnd.nextInt(3) match {
        case 0 => base.take(rnd.nextInt(base.length + 1))
        case 1 =>
          val c = base.clone()
          (0 until 1 + rnd.nextInt(4)).foreach { _ =>
            val p = rnd.nextInt(c.length); c(p) = (c(p) ^ (1 + rnd.nextInt(255))).toByte
          }
          c
        case _ => base
      }
      try { Multimodal.Exif.parse(i.toLong, b); parsed += 1 }
      catch {
        case e: IllegalArgumentException =>
          assert(e.getMessage.contains(s"doc $i"),
            s"error not doc-tagged: ${e.getMessage}")
          rejected += 1
        // any other throwable fails the test: the total-decode contract
        // allows exactly parse-or-tagged-reject
      }
    }
    // the untouched controls (~1/3) must all parse
    assert(parsed >= 40, s"suspiciously few parses: $parsed")
    assert(rejected > 0, "mutations should reject sometimes")
  }

  test("decodeMedia total-decode: random mutations never fail the batch") {
    val rnd = new scala.util.Random(23)
    val mutated = (0 until 120).map { i =>
      val base = (i % 10) match {
        case 0 => Multimodal.synthWav(i.toLong)
        case 1 => Multimodal.synthBmp(i.toLong)
        case 2 => Multimodal.synthPng(i.toLong)
        case 3 => Multimodal.synthJpeg(i.toLong)
        case 4 => Multimodal.synthMp4(i.toLong)
        case 5 => Multimodal.synthGif(i.toLong)
        case 6 => Multimodal.synthFlac(i.toLong)
        case 7 => Multimodal.synthMp3(i.toLong)
        case 8 => Multimodal.synthTiff(i.toLong)
        case _ => Multimodal.synthWebp(i.toLong)
      }
      val b = rnd.nextInt(3) match {
        case 0 => base.take(rnd.nextInt(base.length + 1)) // truncate
        case 1 => // flip 1-4 random bytes
          val c = base.clone()
          (0 until 1 + rnd.nextInt(4)).foreach { _ =>
            if (c.nonEmpty) {
              val p = rnd.nextInt(c.length); c(p) = (c(p) ^ (1 + rnd.nextInt(255))).toByte
            }
          }
          c
        case _ => base // untouched control
      }
      (i.toLong, b)
    }
    val out = Multimodal.decodeMedia(
      mutated.toDF("doc_id", "bin"), "doc_id", "bin").collect()
    // every input produced exactly one row — corruption downgrades to the
    // labeled fallback (decode_ok=false), never a task failure
    assert(out.length == mutated.length)
    assert(out.count(_.decode_ok) >= mutated.count { case (i, b) =>
      java.util.Arrays.equals(b, (i % 10) match {
        case 0 => Multimodal.synthWav(i)
        case 1 => Multimodal.synthBmp(i)
        case 2 => Multimodal.synthPng(i)
        case 3 => Multimodal.synthJpeg(i)
        case 4 => Multimodal.synthMp4(i)
        case 5 => Multimodal.synthGif(i)
        case 6 => Multimodal.synthFlac(i)
        case 7 => Multimodal.synthMp3(i)
        case 8 => Multimodal.synthTiff(i)
        case _ => Multimodal.synthWebp(i)
      })
    }) // untouched payloads all decode
  }
}
