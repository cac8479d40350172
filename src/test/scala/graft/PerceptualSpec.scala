package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, Perceptual}

/** Gates for the round-11 perceptual-fingerprint family (q165–q168):
  * the PCM accessor round-trips the real codec, the banded dHash pair
  * plan is byte-identical to the quadratic scan it replaces, the planted
  * image/audio duplicates are found (and nothing else at the tested
  * range), and the compaction planner conserves mass and key order.
  */
class PerceptualSpec extends SparkSpec {

  import spark.implicits._

  private def idsDf(n: Int) = (0L until n.toLong).toDF("doc_id")

  test("Wav.samples round-trips the real encoder (rate + every sample)") {
    val pcm = Array.tabulate(1000)(i => ((i * 977 % 65536) - 32768).toShort)
    val (rate, out) = Multimodal.Wav.samples(7L, Multimodal.Wav.encode(pcm, 16000))
    assert(rate == 16000L)
    assert(out.toSeq == pcm.toSeq)
  }

  test("dHash: planted neighbor pairs stay within 3 bits of their base") {
    val hashes = Perceptual.imageDhash(idsDf(200), "doc_id")
      .collect().map(h => h.doc_id -> h).toMap
    (0L until 200L).filter(_ % 4 == 3).foreach { id =>
      val a = hashes(id - 1); val b = hashes(id)
      val d = java.lang.Long.bitCount(a.dhash_hi ^ b.dhash_hi) +
        java.lang.Long.bitCount(a.dhash_lo ^ b.dhash_lo)
      assert(d <= 3, s"planted pair (${id - 1}, $id) drifted to hamming $d")
    }
  }

  test("dHash banded pair plan equals the quadratic scan (recall AND precision)") {
    val df = idsDf(300)
    val banded = Perceptual.imageDhashPairs(df, "doc_id", maxDist = 3)
      .select("id1", "id2", "hamming").as[(Long, Long, Long)]
      .collect().toSet
    val hs = Perceptual.imageDhash(df, "doc_id").collect()
    val brute = (for {
      a <- hs; b <- hs if a.doc_id < b.doc_id
      d = java.lang.Long.bitCount(a.dhash_hi ^ b.dhash_hi) +
        java.lang.Long.bitCount(a.dhash_lo ^ b.dhash_lo)
      if d <= 3
    } yield (a.doc_id, b.doc_id, d.toLong)).toSet
    assert(banded == brute)
    // the planted 4k+2/4k+3 pairs are all among them
    val planted = (0L until 300L).filter(_ % 4 == 3).map(id => (id - 1, id)).toSet
    assert(planted.subsetOf(brute.map(p => (p._1, p._2))))
  }

  test("audio fingerprint flags exactly the planted duplicate clips") {
    val rows = Perceptual.audioFingerprint(idsDf(200), "doc_id", nFrames = 16)
      .select("doc_id", "dup_of", "is_dup").as[(Long, Long, Boolean)]
      .collect().sortBy(_._1)
    rows.foreach { case (id, dupOf, isDup) =>
      if (id % 5 == 4) {
        assert(isDup && dupOf == id - 1, s"doc $id should dup doc ${id - 1}")
      } else assert(!isDup && dupOf == id, s"doc $id falsely deduped to $dupOf")
    }
  }

  test("audio fingerprint distinguishes clips beyond exact aggregates") {
    // two clips with IDENTICAL n/sum_sq/first/last but different energy
    // ORDER must produce different fingerprints (the fp bit pattern is
    // doing work the scalar aggregates can't)
    val quiet = Array.fill(64)(10.toShort)
    val loudEnd = quiet.clone(); loudEnd(40) = 100; loudEnd(41) = 100
    val loudStart = quiet.clone(); loudStart(8) = 100; loudStart(9) = 100
    def fp(samples: Array[Short]): Long = {
      val n = samples.length; val nFrames = 16
      val e = Array.tabulate(nFrames) { k =>
        (k * n / nFrames until (k + 1) * n / nFrames)
          .map(i => samples(i).toLong * samples(i)).sum
      }
      (0 until nFrames - 1).map(k => if (e(k + 1) > e(k)) 1L << k else 0L).sum
    }
    assert(fp(loudEnd) != fp(loudStart))
  }

  test("video dedup: planted pairs match on every frame; banded == quadratic") {
    val df = idsDf(120)
    // frame hashes: 3 per video, sliced out of the REAL mdat
    val fh = Perceptual.videoFrameDhash(df, "doc_id").collect()
    assert(fh.length == 120 * Perceptual.VideoFrames)
    val byKey = fh.map(h => (h.doc_id, h.frame_idx) -> h).toMap
    // planted 3k+1/3k+2: frames 1.. identical, frame 0 within 1 bit
    (0L until 120L).filter(_ % 3 == 2).foreach { id =>
      (0 until Perceptual.VideoFrames).foreach { f =>
        val a = byKey((id - 1, f.toLong)); val b = byKey((id, f.toLong))
        val d = java.lang.Long.bitCount(a.dhash_hi ^ b.dhash_hi) +
          java.lang.Long.bitCount(a.dhash_lo ^ b.dhash_lo)
        if (f == 0) assert(d <= 1, s"nudged frame 0 of ($id) drifted to $d")
        else assert(d == 0, s"unperturbed frame $f of ($id) differs by $d")
      }
    }
    // banded video pairs == quadratic frame scan rolled up to video level
    val banded = Perceptual.videoDhashPairs(df, "doc_id", maxDist = 3)
      .select("id1", "id2", "n_frame_pairs", "min_hamming")
      .as[(Long, Long, Long, Long)].collect().toSet
    val brute = (for {
      a <- fh; b <- fh if a.doc_id < b.doc_id
      d = java.lang.Long.bitCount(a.dhash_hi ^ b.dhash_hi) +
        java.lang.Long.bitCount(a.dhash_lo ^ b.dhash_lo)
      if d <= 3
    } yield (a.doc_id, b.doc_id, d.toLong))
      .groupBy(p => (p._1, p._2))
      .map { case ((i, j), ps) => (i, j, ps.length.toLong, ps.map(_._3).min) }
      .toSet
    assert(banded == brute)
    val planted = (0L until 120L).filter(_ % 3 == 2).map(id => (id - 1, id)).toSet
    assert(planted.subsetOf(banded.map(p => (p._1, p._2))),
      "every planted video pair must be recovered")
    banded.filter(p => planted((p._1, p._2))).foreach { p =>
      assert(p._3 == Perceptual.VideoFrames.toLong && p._4 == 0L,
        s"planted pair $p should match on all frames with min hamming 0")
    }
  }

  test("compactionPlan conserves mass, preserves key order, bounds groups") {
    import graft.sources.ParquetFooters
    val inputs = Seq((0L, 90L), (1L, 10L), (2L, 10L), (3L, 200L), (4L, 5L),
      (5L, 45L), (6L, 40L)).toDF("input_id", "n_rows")
    val plan = ParquetFooters.compactionPlan(inputs, nGroups = 4)
      .orderBy("group_id")
      .select("group_id", "n_inputs", "total_rows", "min_input", "max_input")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(plan.map(_._3).sum == 400L) // every row lands in exactly one group
    assert(plan.map(_._2).sum == 7L)
    // contiguous, ascending, non-overlapping key ranges
    plan.sliding(2).foreach {
      case Array(a, b) => assert(b._4 == a._5 + 1)
      case _ =>
    }
    // group ids live in [0, nGroups): cumBefore < total <= nGroups*target
    assert(plan.forall(g => g._1 >= 0 && g._1 < 4))
  }
}
