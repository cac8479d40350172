package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-shape) tokenizer — the OTHER public
  * tokenizer family next to BPE (`TrainPrep.bpeTrain`/`bpeApply`):
  * instead of a merge list, a VOCABULARY of pieces with log-
  * probabilities, applied by Viterbi-segmenting each word into the
  * maximum-likelihood piece sequence (Kudo 2018). The published
  * trainer seeds the vocabulary with frequent substrings and refines
  * it with EM; this implementation keeps every probability an exact
  * rational — counts are exact integers, each piece's score is ONE
  * `ln(count/total)` quantized to integer micros (the q134/q171
  * cross-engine contract) — so segmentation is an INTEGER DP and the
  * DuckDB oracle replays training (q191) and application (q192)
  * hash-exact; the q192 oracle checks the DP against an EXHAUSTIVE
  * enumeration of every segmentation per word.
  *
  * Hard-EM refinement ([[emRound]]) is the Viterbi-EM variant: E-step
  * segments the corpus with the current scores, M-step recounts pieces
  * from the chosen segmentations — counts stay integers, so every
  * refined model keeps the same exactness contract. UnigramSpec gates
  * the trainer against a single-machine reference and pins the
  * corpus-likelihood monotonicity hard-EM guarantees.
  *
  * Scale shape (100 TB): the corpus is touched once per stage —
  * word-frequency table first (vocab-sized, like `bpeTrain`), seed
  * counting and EM recounting are partial-aggregating groupBys over
  * exploded substrings, and application segments DISTINCT words only
  * (one DP per word, joined back to documents on the word — an
  * AQE-splittable equi-join, never a per-occurrence DP). The vocab is
  * a bounded driver artifact (`vocabSize` rows), broadcast to the DP.
  */
object UnigramLm {

  /** One vocabulary entry: piece text, corpus count, integer-micro
    * log-probability round(ln(cnt/total)·1e6).
    *
    * Cross-engine determinism note (round 17, alongside the ADVICE
    * that replaced the logreg classifier's exp-sigmoid with a pinned
    * rational): these scores keep the transcendental. The risk budgets
    * differ by nine orders of magnitude — a 1-ulp libm disagreement
    * flips a round() only when the true value sits within ~1e-10
    * (relative) of a half-boundary, and the unigram trainers evaluate
    * ln ONCE per vocabulary entry per training run (≤ a few hundred
    * rolls of that die), where the classifier evaluated exp once per
    * (round, document) — ~1e9 rolls at sf10, with every flip cascading
    * through the remaining GD rounds. A vocab-score flip would also be
    * caught at commit time by the q221/q226/q230 artifact digests
    * rather than silently skewing downstream weights. If a platform
    * pair ever disagrees here, the same pinned-rational treatment
    * applies; it has not been worth the oracle churn for ≤ 10⁻⁷
    * per-run odds.
    */
  case class Piece(piece: String, cnt: Long, lp_micro: Long)

  /** Lowercase-whitespace word frequency table — the same word model
    * as `bpeTrain` (tokenizers segment words independently).
    */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))

  /** Seed vocabulary as a DataFrame (the q191 surface): every
    * single-character piece (kept unconditionally — they guarantee
    * every word stays segmentable) plus the `vocabSize − #chars` most
    * frequent multi-character substrings of length ≤ `maxPieceLen`,
    * ranked (count desc, piece asc). Counts weight OVERLAPPING
    * occurrences by word frequency. Output: piece, cnt, is_char,
    * lp_micro — with lp over the SELECTED vocab's total mass.
    */
  def seedVocab(docs: DataFrame, textCol: String, maxPieceLen: Int,
      vocabSize: Int): DataFrame = {
    require(maxPieceLen >= 2 && maxPieceLen <= 8,
      s"seedVocab: maxPieceLen must be in [2, 8], got $maxPieceLen")
    require(vocabSize >= 2, s"seedVocab: vocabSize must be >= 2, got $vocabSize")
    val words = wordFreqs(docs, textCol)
    // all substrings of length 1..maxPieceLen, one row per occurrence
    val occs = words.select(col("f"), explode(flatten(
        transform(sequence(lit(1), length(col("w"))), i =>
          transform(sequence(lit(1),
              least(lit(maxPieceLen), length(col("w")) - i + 1)), l =>
            col("w").substr(i, l)))))
      .as("piece"))
    val counts = occs.groupBy(col("piece")).agg(sum(col("f")).as("cnt"))
      .withColumn("is_char", length(col("piece")) === 1)
    val nChars = counts.filter(col("is_char")).count()
    require(vocabSize > nChars,
      s"seedVocab: vocabSize $vocabSize must exceed the $nChars single chars")
    val multis = counts.filter(!col("is_char"))
      .orderBy(col("cnt").desc, col("piece"))
      .limit(vocabSize - nChars.toInt)
    val selected = counts.filter(col("is_char")).unionByName(multis)
    val total = selected.agg(sum(col("cnt")).as("total"))
    selected.crossJoin(broadcast(total))
      .select(col("piece"), col("cnt"), col("is_char"),
        round(log(col("cnt").cast("double") / col("total").cast("double"))
          * lit(1000000.0)).cast("long").as("lp_micro"))
  }

  /** Collect a vocab DataFrame (piece, cnt, lp_micro) to the bounded
    * driver artifact the DP broadcasts. */
  def collectVocab(vocab: DataFrame): Seq[Piece] =
    vocab.select(col("piece"), col("cnt").cast("long"),
        col("lp_micro").cast("long"))
      .collect().map(r => Piece(r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq

  /** Viterbi segmentation of one word under integer-micro piece scores:
    * maximize the score sum; ties prefer FEWER pieces, then the
    * smallest predecessor at every position (equivalently: the
    * lexicographically smallest REVERSED piece-start list — the total
    * order the q192 oracle's exhaustive enumeration sorts by).
    * Returns (pieces, score). Single-char coverage makes every word
    * segmentable by construction; a character absent from the vocab
    * (can only happen when segmenting words unseen at train time)
    * falls back to itself at `unkLp`.
    */
  def viterbiWord(word: String, lp: Map[String, Long], maxPieceLen: Int,
      unkLp: Long = -25000000L): (Seq[String], Long) = {
    val cps = word.codePoints.toArray
    val n = cps.length
    if (n == 0) return (Seq.empty, 0L)
    def sub(i: Int, j: Int): String = new String(cps, i, j - i)
    val score = new Array[Long](n + 1)
    val npieces = new Array[Int](n + 1)
    val prev = new Array[Int](n + 1)
    java.util.Arrays.fill(score, Long.MinValue)
    score(0) = 0L; npieces(0) = 0; prev(0) = -1
    var j = 1
    while (j <= n) {
      var bs = Long.MinValue; var bn = Int.MaxValue; var bi = -1
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        if (score(i) != Long.MinValue) {
          val piece = sub(i, j)
          val l = lp.get(piece) match {
            case Some(v) => Some(v)
            case None if j - i == 1 => Some(unkLp) // unseen char fallback
            case None => None
          }
          l.foreach { v =>
            val s = score(i) + v
            val np = npieces(i) + 1
            // strict improvement on (score, -npieces); first (smallest) i
            // wins ties because i ascends
            if (s > bs || (s == bs && np < bn)) { bs = s; bn = np; bi = i }
          }
        }
        i += 1
      }
      score(j) = bs; npieces(j) = bn; prev(j) = bi
      j += 1
    }
    val parts = Seq.newBuilder[String]
    var k = n
    val stack = scala.collection.mutable.ArrayBuffer.empty[String]
    while (k > 0) { stack += sub(prev(k), k); k = prev(k) }
    parts ++= stack.reverseIterator
    (parts.result(), score(n))
  }

  /** Code-point length. Spark SQL `length`/`substr` (UTF8String
    * semantics) and DuckDB `len`/`substr` both count CODE POINTS; the
    * JVM-side lattices must index the same way or a 16-code-point word
    * containing an astral-plane char (17 UTF-16 units) falls on
    * different sides of `maxWordLen` in the engine and the oracle. All
    * word-length caps and lattice positions below use this, matching
    * [[viterbiWordBytes]]. */
  private[graft] def cpLen(w: String): Int = w.codePointCount(0, w.length)

  /** Corpus contract for the tokenize faces (round 16 — verdict item
    * 2; tightened round 17 — ADVICE): words longer than this many CODE
    * POINTS are excluded from tokenization statistics (they drop out of
    * n_pieces / pieces_md5 / nll_micro / n_fallback; n_words still
    * counts them — it is the raw token count). The engine DPs are
    * linear and could segment any length, but the cross-engine oracles
    * verify them by EXHAUSTIVE enumeration — `2^(n-1)` boundary masks
    * per distinct word. The fence must satisfy BOTH constraints the
    * oracle imposes: DuckDB's BIGINT left shift hard-errors already at
    * n = 64 (`1 << 63` is out of range — verified empirically, so a
    * fence of 64 admits a word the oracle cannot even START on), and
    * the enumeration cost explodes far earlier. 24 caps the oracle at
    * 2^23 masks per distinct word and is still 3× the longest
    * natural-language token (the corpora this engine targets top out
    * near 20; every test corpus here tops out at 8). Mirrored as
    * `WHERE len(w) <= 24` in every paired oracle, so engine and oracle
    * agree on ANY corpus instead of only on corpora with short words. A
    * corpus where >24-cp "words" carry signal (DNA, minified JS) needs
    * a domain tokenizer, not this word model.
    */
  val MaxTokenizeWordLen = 24

  /** The oracle-mirrored word-length fence ([[MaxTokenizeWordLen]]);
    * Spark SQL `length` counts code points, like DuckDB `len`. */
  private def fenceWords(words: DataFrame): DataFrame =
    words.filter(length(col("w")) <= MaxTokenizeWordLen)

  /** Segment DISTINCT words under a broadcast vocab: (w, pieces,
    * n_pieces, score_micro). One DP per distinct word — the join back
    * to documents is the caller's (equi-join on the word).
    */
  def segmentWords(words: DataFrame, vocab: Seq[Piece],
      maxPieceLen: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val lpB = spark.sparkContext.broadcast(
      vocab.map(p => p.piece -> p.lp_micro).toMap)
    words.select(col("w").cast("string")).as[String]
      .mapPartitions { it =>
        val lp = lpB.value
        it.map { w =>
          val (pieces, s) = viterbiWord(w, lp, maxPieceLen)
          (w, pieces, pieces.length.toLong, s)
        }
      }
      .toDF("w", "pieces", "n_pieces", "score_micro")
  }

  /** One hard-EM (Viterbi-EM) round: segment the weighted word table
    * with the current vocab, recount pieces from the CHOSEN
    * segmentations (count = Σ word_freq × uses), drop multi-char
    * pieces that went unused, keep every single char (floor count 1 so
    * ln stays finite), re-score against the new total. Returns the
    * refined vocab. Each round touches the corpus-derived word table
    * once; the vocab stays a bounded driver artifact.
    */
  def emRound(words: DataFrame, vocab: Seq[Piece],
      maxPieceLen: Int): Seq[Piece] = {
    val seg = segmentWords(fenceWords(words), vocab, maxPieceLen)
      .join(words, "w")
      .select(col("f"), explode(col("pieces")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("f")).as("cnt"))
    val used = seg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val chars = vocab.filter(p => cpLen(p.piece) == 1)
      .map(p => p.piece -> math.max(used.getOrElse(p.piece, 0L), 1L))
    val multis = vocab.filter(p => cpLen(p.piece) > 1)
      .flatMap(p => used.get(p.piece).map(p.piece -> _))
    val entries = (chars ++ multis).sortBy(_._1)
    val total = entries.map(_._2).sum
    entries.map { case (piece, cnt) =>
      Piece(piece, cnt,
        math.round(math.log(cnt.toDouble / total.toDouble) * 1e6))
    }
  }

  /** Full trainer: seed → `emRounds` hard-EM refinements. */
  def train(docs: DataFrame, textCol: String, maxPieceLen: Int,
      vocabSize: Int, emRounds: Int): Seq[Piece] = {
    require(emRounds >= 0 && emRounds <= 16, s"bad emRounds $emRounds")
    val words = wordFreqs(docs, textCol).localCheckpoint()
    var vocab = collectVocab(seedVocab(docs, textCol, maxPieceLen, vocabSize))
    var r = 0
    while (r < emRounds) {
      vocab = emRound(words, vocab, maxPieceLen)
      r += 1
    }
    vocab
  }

  /** Corpus tokenization under a trained vocab (the q192 surface):
    * per document — word count, piece count, an order-sensitive md5 of
    * the piece stream (pieces contain no spaces: words are
    * whitespace-split), and the document's total segmentation score
    * (its unigram-LM log-likelihood in micros). Distinct words are
    * segmented once and joined back on the word.
    */
  def apply(docs: DataFrame, idCol: String, textCol: String,
      vocab: Seq[Piece], maxPieceLen: Int): DataFrame = {
    val words = fenceWords(wordFreqs(docs, textCol))
    val seg = segmentWords(words, vocab, maxPieceLen)
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      TextOps.tokens(col(textCol)).as("__w"))
    val stats = base.select(col("doc_id"),
      size(col("__w")).cast("long").as("n_words"))
    val perWord = base
      .select(col("doc_id"), posexplode(col("__w")).as(Seq("__p", "w")))
      .join(seg, "w")
      .groupBy(col("doc_id"))
      .agg(sum(col("n_pieces")).cast("long").as("n_pieces"),
        md5(concat_ws(" ", flatten(orderedPieces))).as("pieces_md5"),
        sum(col("score_micro")).cast("long").as("nll_micro"))
    stats.join(perWord, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        coalesce(col("pieces_md5"), md5(lit(""))).as("pieces_md5"),
        coalesce(col("nll_micro"), lit(0L)).as("nll_micro"))
  }

  /** Aggregated piece arrays restored to document word order — isolated
    * so [[apply]] reads declaratively. */
  private def orderedPieces: Column =
    expr("transform(array_sort(collect_list(struct(__p, pieces))), x -> x.pieces)")

  // ==========================================================================
  // Byte fallback (round 15) — the published SentencePiece
  // `byte_fallback` semantics, closing the one behavior gap the verdict
  // ranked first: a word containing a character OUTSIDE the vocab's
  // alphabet previously had no segmentation at all (clean skip in
  // training statistics, [[viterbiWord]]'s self-at-unkLp hack when
  // segmenting). On a multilingual corpus the char long tail (emoji,
  // rare CJK, accents) hits constantly; published semantics decompose an
  // uncovered character into its UTF-8 BYTES, each a reserved piece
  // `<0xNN>`, so NOTHING is ever unsegmentable and no [UNK] mass exists.
  // Deterministic (a char's UTF-8 bytes are fixed) → oracle-replayable:
  // q219 hash-checks the whole face against a DuckDB enumeration replay.
  //
  // Everything here works on CODE POINTS, not UTF-16 chars: an emoji is
  // one lattice position (two Java chars), exactly as DuckDB's
  // codepoint-based substr/len see it — char-indexed DP would misalign
  // the two engines on every astral-plane symbol.
  // ==========================================================================

  /** The reserved byte pieces `<0x00>`..`<0xFF>` in byte order. */
  val bytePieceTable: IndexedSeq[String] =
    (0 until 256).map(b => f"<0x$b%02X>")

  /** Is `p` a reserved byte piece? Byte pieces are UNPRUNABLE — like
    * single chars, they exist to guarantee segmentability, not because
    * the corpus earned them mass (they never match raw text, so every
    * expectation/loss pass sees them at zero) — and the pruning faces
    * below exempt them the way they exempt chars. The published
    * composition order is train → [[byteFallbackVocab]] → export: byte
    * pieces join the FINAL artifact verbatim (cnt 0, flat floor score),
    * untouched by re-estimation.
    */
  private val bytePieceSet: Set[String] = bytePieceTable.toSet

  def isBytePiece(p: String): Boolean = bytePieceSet.contains(p)

  /** Byte pieces of ONE code point: its UTF-8 bytes as `<0xNN>` tokens. */
  private[graft] def bytePiecesOf(cp: Int): Seq[String] =
    new String(Character.toChars(cp))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .toSeq.map(b => bytePieceTable(b & 0xff))

  /** Extend a trained vocab with the 256 reserved byte pieces at a flat
    * floor score — the published seed shape: byte pieces are unprunable
    * (they guarantee segmentability the way single chars do) and carry
    * no corpus count. Idempotent; `byteLpMicro` should sit well below
    * every real char score so bytes only ever win when nothing else
    * segments the character.
    */
  def byteFallbackVocab(vocab: Seq[Piece],
      byteLpMicro: Long = -20000000L): Seq[Piece] = {
    val have = vocab.map(_.piece).toSet
    vocab ++ bytePieceTable.filterNot(have).map(Piece(_, 0L, byteLpMicro))
  }

  /** Viterbi segmentation with byte fallback, over CODE POINTS:
    * maximize the score sum where a candidate piece is either a vocab
    * piece (score lp, ONE emitted token) or a single uncovered code
    * point (score nBytes·byteLpMicro, nBytes emitted `<0xNN>` tokens).
    * Ties prefer fewer EMITTED tokens, then the smallest predecessor at
    * every position — the [[viterbiWord]] total order with the piece
    * count measured post-expansion (the count the training consumer
    * sees). Returns (emitted tokens, score, n_fallback byte tokens).
    * Every word segments by construction.
    */
  private[graft] def viterbiWordBytes(word: String, lp: Map[String, Long],
      maxPieceLen: Int, byteLpMicro: Long): (Seq[String], Long, Long) = {
    val cps = word.codePoints.toArray
    val n = cps.length
    if (n == 0) return (Seq.empty, 0L, 0L)
    def sub(i: Int, j: Int): String = new String(cps, i, j - i)
    val score = new Array[Long](n + 1)
    val ntoks = new Array[Int](n + 1)
    val prev = new Array[Int](n + 1)
    java.util.Arrays.fill(score, Long.MinValue)
    score(0) = 0L; ntoks(0) = 0; prev(0) = -1
    var j = 1
    while (j <= n) {
      var bs = Long.MinValue; var bn = Int.MaxValue; var bi = -1
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        if (score(i) != Long.MinValue) {
          val piece = sub(i, j)
          // (score, emitted-token count) of this candidate, or None
          val cand: Option[(Long, Int)] = lp.get(piece) match {
            case Some(v) => Some((v, 1))
            case None if j - i == 1 =>
              val nb = bytePiecesOf(cps(i)).size
              Some((nb.toLong * byteLpMicro, nb))
            case None => None
          }
          cand.foreach { case (v, k) =>
            val s = score(i) + v
            val np = ntoks(i) + k
            // strict improvement on (score, -ntoks); first (smallest) i
            // wins ties because i ascends
            if (s > bs || (s == bs && np < bn)) { bs = s; bn = np; bi = i }
          }
        }
        i += 1
      }
      score(j) = bs; ntoks(j) = bn; prev(j) = bi
      j += 1
    }
    val out = Seq.newBuilder[String]
    var nFallback = 0L
    val stack = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    var k = n
    while (k > 0) {
      val piece = sub(prev(k), k)
      if (lp.contains(piece)) stack += Seq(piece)
      else { val bp = bytePiecesOf(cps(prev(k))); nFallback += bp.size; stack += bp }
      k = prev(k)
    }
    stack.reverseIterator.foreach(out ++= _)
    (out.result(), score(n), nFallback)
  }

  /** [[segmentWords]] with byte fallback: DISTINCT words → (w, pieces,
    * n_pieces, score_micro, n_fallback). Never empty, never [UNK]. */
  def segmentWordsBytes(words: DataFrame, vocab: Seq[Piece],
      maxPieceLen: Int, byteLpMicro: Long = -20000000L): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val lpB = spark.sparkContext.broadcast(
      vocab.map(p => p.piece -> p.lp_micro).toMap)
    words.select(col("w").cast("string")).as[String]
      .mapPartitions { it =>
        val lp = lpB.value
        it.map { w =>
          val (pieces, s, nf) = viterbiWordBytes(w, lp, maxPieceLen, byteLpMicro)
          (w, pieces, pieces.length.toLong, s, nf)
        }
      }
      .toDF("w", "pieces", "n_pieces", "score_micro", "n_fallback")
  }

  /** [[apply]] with byte fallback (the q219 surface): per document —
    * word count, emitted piece count, order-sensitive md5 of the piece
    * stream (byte pieces `<0xNN>` included, none of which contain a
    * space), total segmentation score, and how many byte-fallback
    * tokens were emitted (the signal that the vocab's char coverage no
    * longer fits the corpus). Distinct words segment once and join back
    * on the word — the corpus never shuffles to be segmented.
    */
  def applyBytes(docs: DataFrame, idCol: String, textCol: String,
      vocab: Seq[Piece], maxPieceLen: Int,
      byteLpMicro: Long = -20000000L): DataFrame = {
    val words = fenceWords(wordFreqs(docs, textCol))
    val seg = segmentWordsBytes(words, vocab, maxPieceLen, byteLpMicro)
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      TextOps.tokens(col(textCol)).as("__w"))
    val stats = base.select(col("doc_id"),
      size(col("__w")).cast("long").as("n_words"))
    val perWord = base
      .select(col("doc_id"), posexplode(col("__w")).as(Seq("__p", "w")))
      .join(seg, "w")
      .groupBy(col("doc_id"))
      .agg(sum(col("n_pieces")).cast("long").as("n_pieces"),
        md5(concat_ws(" ", flatten(orderedPieces))).as("pieces_md5"),
        sum(col("score_micro")).cast("long").as("nll_micro"),
        sum(col("n_fallback")).cast("long").as("n_fallback"))
    stats.join(perWord, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        coalesce(col("pieces_md5"), md5(lit(""))).as("pieces_md5"),
        coalesce(col("nll_micro"), lit(0L)).as("nll_micro"),
        coalesce(col("n_fallback"), lit(0L)).as("n_fallback"))
  }

  // ==========================================================================
  // Soft-EM training with loss-based vocabulary pruning (round 13) — the
  // published SentencePiece schedule: seed OVERSIZED, re-estimate piece
  // mass from EXPECTED counts over ALL segmentations (not just the Viterbi
  // one), prune the pieces whose removal costs the corpus likelihood
  // least, repeat to a target size.
  //
  // Exactness contract. The expectation is computed as the EXACT lattice
  // sum by enumerating every segmentation of each DISTINCT word (the q192
  // oracle pattern): forward–backward is the O(n·maxPieceLen)
  // factorization of this very sum, but its per-step log-sum-exp would
  // have to quantize at every DP cell, and a per-cell transcendental
  // round-trip is not replayable across engines. Enumerating instead lets
  // both engines quantize ONCE per segmentation — weight(seg) =
  // round(exp((score−max)/1e6)·1e6), an integer — after which every
  // derived number (normalizers, expected counts, losses) is exact
  // integer arithmetic: per-word expected counts are rationals
  // f·U/D rounded half-up to micros with big-integer intermediates, the
  // same formula DuckDB replays in HUGEINT. The 1-ulp libm risk is
  // confined to exp/ln calls whose *rounded-micro* output moves only if
  // the true value sits within ~1e-10 of a rounding boundary.
  //
  // Scale shape. Enumeration is bounded per DISTINCT word: words longer
  // than `maxWordLen` (default 16 → ≤ 2^15 segmentations) are excluded
  // from the training statistics, the same pragmatic length filter the
  // published trainer applies to its seed/sentence inputs; distinct words
  // grow Heaps-sublinearly (measured 0.41 on this corpus), and each
  // word's lattice is independent — one mapPartitions pass per round,
  // partial-aggregating groupBy on the piece. The vocab stays a bounded
  // driver artifact, broadcast to the pass.
  // ==========================================================================

  /** All valid segmentations of `word` under vocabulary scores `lp`:
    * (pieces, scoreMicro, weightMicro) with weight =
    * round(exp((score − maxScore)/1e6) · 1e6) — the single quantization
    * point of the soft-EM expectation. Enumeration order is mask-
    * ascending (the q192 oracle's order); weights are order-free.
    */
  private[graft] def enumerateSegs(word: String, lp: Map[String, Long])
      : Seq[(Seq[String], Long)] = {
    val cps = word.codePoints.toArray
    val n = cps.length
    val out = Seq.newBuilder[(Seq[String], Long)]
    var mask = 0L
    val lim = 1L << (n - 1)
    while (mask < lim) {
      // bit p−1 set ⇔ a piece boundary before position p (1-based,
      // code-point positions — the oracle's substr space)
      val pieces = Seq.newBuilder[String]
      var ok = true
      var score = 0L
      var start = 0
      var p = 1
      while (p <= n && ok) {
        val boundary = p == n || ((mask >> (p - 1)) & 1L) == 1L
        if (boundary) {
          val piece = new String(cps, start, p - start)
          lp.get(piece) match {
            case Some(v) => score += v; pieces += piece; start = p
            case None => ok = false
          }
        }
        p += 1
      }
      if (ok) out += ((pieces.result(), score))
      mask += 1L
    }
    out.result()
  }

  private def segWeights(segs: Seq[(Seq[String], Long)])
      : (Seq[(Seq[String], Long)], Long) = {
    // a word containing a char absent from the vocab has NO valid
    // segmentation — surface as weight-sum 0 so every caller's d <= 0
    // guard skips the word instead of .max throwing in an executor
    if (segs.isEmpty) return (Seq.empty, 0L)
    val m = segs.iterator.map(_._2).max
    val ws = segs.map { case (ps, s) =>
      (ps, math.round(math.exp((s - m).toDouble / 1e6) * 1e6))
    }
    (ws, m)
  }

  /** One soft-EM round: expected piece counts over ALL segmentations of
    * the weighted word table, in integer micros. Per distinct word w
    * (freq f): enumerate valid segmentations, weight each
    * `round(exp((score−max)/1e6)·1e6)`, and credit each piece
    * `round_half_up(f · U_p · 1e6 / D)` micros, where U_p sums the
    * weights of segmentations by their uses of p and D sums all weights
    * (big-integer intermediates — exact). Single-char pieces are floored
    * at 1 micro (ln must stay finite; chars guarantee segmentability);
    * multi-char pieces whose expected mass quantizes to zero drop, the
    * soft analogue of hard-EM's drop-unused. Returns (piece, ec_micro,
    * lp_micro) with lp = round(ln(ec/Σec)·1e6).
    */
  def softEmRound(words: DataFrame, vocab: Seq[Piece], maxPieceLen: Int,
      maxWordLen: Int = 16): DataFrame = {
    require(maxWordLen >= 2 && maxWordLen <= 20,
      s"softEmRound: maxWordLen must be in [2, 20], got $maxWordLen")
    val spark = words.sparkSession
    import spark.implicits._
    val lpB = spark.sparkContext.broadcast(
      vocab.map(p => p.piece -> p.lp_micro).toMap)
    val contrib = words.select(col("w").cast("string"), col("f").cast("long"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val lp = lpB.value
        it.flatMap { case (w, f) =>
          if (w.isEmpty || cpLen(w) > maxWordLen) Iterator.empty
          else {
            val (ws, _) = segWeights(enumerateSegs(w, lp))
            val d = ws.iterator.map(_._2).sum
            if (d <= 0L) Iterator.empty
            else {
              val u = scala.collection.mutable.LinkedHashMap.empty[String, Long]
              ws.foreach { case (ps, wt) =>
                if (wt > 0L) ps.foreach(p => u.update(p, u.getOrElse(p, 0L) + wt))
              }
              u.iterator.map { case (p, num) =>
                val ec = ((BigInt(f) * BigInt(num) * BigInt(2000000) + BigInt(d)) /
                  (BigInt(d) * BigInt(2))).toLong
                (p, ec)
              }
            }
          }
        }
      }
      .toDF("piece", "ec")
      .groupBy(col("piece")).agg(sum(col("ec")).as("ec_raw"))
    val chars = vocab.filter(p => cpLen(p.piece) == 1).map(_.piece).toDF("piece")
    val ec = chars.join(contrib, Seq("piece"), "left")
      .select(col("piece"),
        greatest(coalesce(col("ec_raw"), lit(0L)), lit(1L)).as("ec_micro"))
      .unionByName(contrib.join(chars, Seq("piece"), "left_anti")
        .filter(col("ec_raw") > 0L)
        .select(col("piece"), col("ec_raw").as("ec_micro")))
    val total = ec.agg(sum(col("ec_micro")).as("__t"))
    ec.crossJoin(broadcast(total))
      .select(col("piece"), col("ec_micro"),
        round(log(col("ec_micro").cast("double") / col("__t").cast("double"))
          * lit(1000000.0)).cast("long").as("lp_micro"))
  }

  /** Collect a soft-EM round to the bounded driver artifact (cnt carries
    * the micro expected count). */
  def collectSoftRound(words: DataFrame, vocab: Seq[Piece], maxPieceLen: Int,
      maxWordLen: Int = 16): Seq[Piece] =
    collectVocab(softEmRound(words, vocab, maxPieceLen, maxWordLen)
      .select(col("piece"), col("ec_micro").as("cnt"), col("lp_micro")))

  /** Likelihood loss of removing each multi-char piece, the pruning
    * criterion: loss(p) = Σ_w f_w · (Z_w − Z_w^{−p}) in micros, where
    * Z_w = max + round(ln(D_w/1e6)·1e6) is the word's quantized
    * log-partition and Z_w^{−p} the SAME quantized contract applied to
    * the lattice without p — max and weights recomputed over the
    * surviving segmentations (never empty: single chars are never
    * pruned, so the char-only path always survives, and the surviving
    * max always carries weight exactly 1e6). This makes loss(p)
    * IDENTICALLY corpusLogZ(vocab) − corpusLogZ(vocab − p) — the exact
    * leave-one-out loss with the rest of the model fixed, which the
    * published recipe approximates and the enumeration makes affordable
    * (UnigramSpec pins the identity). Returns (piece, loss_micro) for
    * every multi-char vocab piece (0 where the piece never carries
    * quantized mass).
    */
  def pruneLosses(words: DataFrame, vocab: Seq[Piece], maxPieceLen: Int,
      maxWordLen: Int = 16): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val lpB = spark.sparkContext.broadcast(
      vocab.map(p => p.piece -> p.lp_micro).toMap)
    val contrib = words.select(col("w").cast("string"), col("f").cast("long"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val lp = lpB.value
        it.flatMap { case (w, f) =>
          if (w.isEmpty || cpLen(w) > maxWordLen) Iterator.empty
          else {
            val segs = enumerateSegs(w, lp)
            val (ws, m) = segWeights(segs)
            val d = ws.iterator.map(_._2).sum
            if (d <= 0L) Iterator.empty
            else {
              val zw = m + math.round(math.log(d.toDouble / 1e6) * 1e6)
              val multis = segs.iterator
                .flatMap(_._1.iterator.filter(_.length > 1)).toSet
              multis.iterator.map { p =>
                // Z without p: recompute max AND weights over the reduced
                // lattice — the same quantized contract as corpusLogZ, so
                // loss(p) == Z(vocab) − Z(vocab − p) identically
                val reduced = segs.filter(!_._1.contains(p))
                val (rws, rm) = segWeights(reduced)
                val rd = rws.iterator.map(_._2).sum
                val zwp = rm + math.round(math.log(rd.toDouble / 1e6) * 1e6)
                (p, f * (zw - zwp))
              }
            }
          }
        }
      }
      .toDF("piece", "loss")
      .groupBy(col("piece")).agg(sum(col("loss")).as("loss_micro"))
    vocab.filter(p => cpLen(p.piece) > 1).map(_.piece).toDF("piece")
      .join(contrib, Seq("piece"), "left")
      .select(col("piece"),
        coalesce(col("loss_micro"), lit(0L)).as("loss_micro"))
  }

  /** Keep the `targetMultis` highest-loss multi-char pieces (ties piece
    * asc) plus every single char; scores are NOT refreshed — the caller
    * re-estimates with [[softEmRound]], as the published schedule does.
    */
  def pruneVocab(words: DataFrame, vocab: Seq[Piece], maxPieceLen: Int,
      targetMultis: Int, maxWordLen: Int = 16): Seq[Piece] = {
    require(targetMultis >= 0, s"pruneVocab: bad targetMultis $targetMultis")
    // keep-rank stays DISTRIBUTED (round 14): orderBy+limit plans as a
    // TakeOrderedAndProject top-k, so the driver reads only the
    // `targetMultis` keep rows — never the full loss table
    val keep = keepSet(pruneLosses(words, vocab, maxPieceLen, maxWordLen),
      targetMultis)
    vocab.filter(p => cpLen(p.piece) == 1 || isBytePiece(p.piece) || keep(p.piece))
  }

  /** Distributed keep-rank over a (piece, loss_micro) loss table: the
    * `targetMultis` highest-loss pieces (ties piece asc) via a top-k
    * plan; only the keep rows reach the driver. */
  private def keepSet(losses: DataFrame, targetMultis: Int): Set[String] =
    losses.orderBy(col("loss_micro").desc, col("piece"))
      .limit(targetMultis)
      .select(col("piece")).collect().map(_.getString(0)).toSet

  /** Corpus marginal log-likelihood Σ_w f_w · Z_w in micros under the
    * quantized-lattice contract — the quantity the pruning loss is
    * defined against (UnigramSpec's monotonicity gates read it). Words
    * longer than `maxWordLen` are excluded, consistently with training.
    */
  def corpusLogZ(words: DataFrame, vocab: Seq[Piece], maxPieceLen: Int,
      maxWordLen: Int = 16): Long = {
    val spark = words.sparkSession
    import spark.implicits._
    val lpB = spark.sparkContext.broadcast(
      vocab.map(p => p.piece -> p.lp_micro).toMap)
    words.select(col("w").cast("string"), col("f").cast("long"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val lp = lpB.value
        it.map { case (w, f) =>
          if (w.isEmpty || cpLen(w) > maxWordLen) 0L
          else {
            val segs = enumerateSegs(w, lp)
            val (ws, m) = segWeights(segs)
            val d = ws.iterator.map(_._2).sum
            if (d <= 0L) 0L
            else f * (m + math.round(math.log(d.toDouble / 1e6) * 1e6))
          }
        }
      }
      .reduce(_ + _)
  }

  /** The O(n·maxPieceLen) forward–backward soft-EM expectation — the
    * 100-TB SCALE PATH next to [[softEmRound]]'s SQL-replayable
    * enumeration: identical semantics (expected piece counts over the
    * full segmentation lattice), computed in unquantized double
    * log-space with log-sum-exp, so there is NO word-length cap — the
    * lattice never materializes. Not cross-engine-replayable (per-cell
    * transcendentals don't round-trip), hence no oracle face; instead
    * UnigramSpec pins agreement with the enumeration path on in-cap
    * words (the two compute the same sum, differing only by the
    * enumeration's single micro-quantization per segmentation) and
    * coverage of words BEYOND the enumeration cap. Returns
    * (piece, ec) with ec in expected-count units (doubles).
    */
  def softEmRoundFB(words: DataFrame, vocab: Seq[Piece],
      maxPieceLen: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val lpB = spark.sparkContext.broadcast(
      vocab.map(p => p.piece -> p.lp_micro).toMap)
    words.select(col("w").cast("string"), col("f").cast("long"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val lp = lpB.value
        it.flatMap { case (w, f) =>
          val n = w.length
          if (n == 0) Iterator.empty
          else {
            def lse(a: Double, b: Double): Double =
              if (a == Double.NegativeInfinity) b
              else if (b == Double.NegativeInfinity) a
              else { val m = math.max(a, b); m + math.log1p(math.exp(math.min(a, b) - m)) }
            val fa = Array.fill(n + 1)(Double.NegativeInfinity)
            val fb = Array.fill(n + 1)(Double.NegativeInfinity)
            fa(0) = 0.0; fb(n) = 0.0
            var j = 1
            while (j <= n) {
              var i = math.max(0, j - maxPieceLen)
              while (i < j) {
                lp.get(w.substring(i, j)).foreach { v =>
                  fa(j) = lse(fa(j), fa(i) + v / 1e6)
                }
                i += 1
              }
              j += 1
            }
            var i2 = n - 1
            while (i2 >= 0) {
              var j2 = math.min(n, i2 + maxPieceLen)
              while (j2 > i2) {
                lp.get(w.substring(i2, j2)).foreach { v =>
                  fb(i2) = lse(fb(i2), v / 1e6 + fb(j2))
                }
                j2 -= 1
              }
              i2 -= 1
            }
            val z = fa(n)
            if (z == Double.NegativeInfinity) Iterator.empty
            else {
              val acc = scala.collection.mutable.LinkedHashMap.empty[String, Double]
              var a = 0
              while (a < n) {
                var b = a + 1
                val bMax = math.min(n, a + maxPieceLen)
                while (b <= bMax) {
                  val piece = w.substring(a, b)
                  lp.get(piece).foreach { v =>
                    val post = math.exp(fa(a) + v / 1e6 + fb(b) - z)
                    if (post > 0.0) acc.update(piece, acc.getOrElse(piece, 0.0) + post)
                  }
                  b += 1
                }
                a += 1
              }
              acc.iterator.map { case (p, e) => (p, f * e) }
            }
          }
        }
      }
      .toDF("piece", "e")
      .groupBy(col("piece")).agg(sum(col("e")).as("ec"))
  }

  /** Cap-free leave-one-out pruning loss via forward DPs in double
    * log-space (round 14 — the 100-TB face of [[pruneLosses]], which
    * still enumerates under the `maxWordLen` cap): per distinct word,
    * one O(n·maxPieceLen) forward pass gives logZ_w; for each
    * multi-char vocab piece whose occurrence is on a live lattice path
    * (forward(a) and backward(b) both finite around an occurrence),
    * one more forward pass over the lattice with that piece BANNED
    * gives logZ_w^{−p} — banning kills every occurrence at once, the
    * exact leave-one-out semantics. loss(p) = Σ_w f_w·(logZ_w −
    * logZ_w^{−p}), the same quantity [[pruneLosses]] computes exactly,
    * here unquantized (per-cell log-sum-exp does not replay
    * cross-engine — hence no oracle face; UnigramSpec gates keep-set
    * agreement with the enumeration loss on in-cap fixtures and
    * coverage of words beyond the cap). Per-word cost is
    * O(n²·maxPieceLen²) — polynomial, NO length cap, so the pruning
    * schedule no longer drops long words from its statistics. Output:
    * (piece, loss_micro DOUBLE) for every multi-char vocab piece. A
    * piece that is some word's ONLY bridge over a char the vocab lacks
    * (possible on externally-supplied vocabs; trained vocabs keep full
    * char coverage) gets loss +Infinity — irreplaceable, and the top-k
    * keep-rank retains it by construction (UnigramSpec pins this).
    */
  def pruneLossesFB(words: DataFrame, vocab: Seq[Piece],
      maxPieceLen: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val lpB = spark.sparkContext.broadcast(
      vocab.map(p => p.piece -> p.lp_micro).toMap)
    val contrib = words.select(col("w").cast("string"), col("f").cast("long"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val lp = lpB.value
        def lse(a: Double, b: Double): Double =
          if (a == Double.NegativeInfinity) b
          else if (b == Double.NegativeInfinity) a
          else { val m = math.max(a, b); m + math.log1p(math.exp(math.min(a, b) - m)) }
        def forward(w: String, banned: String): Array[Double] = {
          val n = w.length
          val fa = Array.fill(n + 1)(Double.NegativeInfinity)
          fa(0) = 0.0
          var j = 1
          while (j <= n) {
            var i = math.max(0, j - maxPieceLen)
            while (i < j) {
              if (fa(i) != Double.NegativeInfinity) {
                val piece = w.substring(i, j)
                if (piece != banned)
                  lp.get(piece).foreach(v => fa(j) = lse(fa(j), fa(i) + v / 1e6))
              }
              i += 1
            }
            j += 1
          }
          fa
        }
        it.flatMap { case (w, f) =>
          val n = w.length
          if (n == 0) Iterator.empty
          else {
            val fa = forward(w, null)
            val z = fa(n)
            if (z == Double.NegativeInfinity) Iterator.empty
            else {
              // backward reachability for candidate pruning (values are
              // the suffix log-partitions; only finiteness is used)
              val fb = Array.fill(n + 1)(Double.NegativeInfinity)
              fb(n) = 0.0
              var i2 = n - 1
              while (i2 >= 0) {
                var j2 = math.min(n, i2 + maxPieceLen)
                while (j2 > i2) {
                  if (fb(j2) != Double.NegativeInfinity)
                    lp.get(w.substring(i2, j2)).foreach(v =>
                      fb(i2) = lse(fb(i2), v / 1e6 + fb(j2)))
                  j2 -= 1
                }
                i2 -= 1
              }
              val cands = scala.collection.mutable.LinkedHashSet.empty[String]
              var a = 0
              while (a < n) {
                if (fa(a) != Double.NegativeInfinity) {
                  var b = math.min(n, a + maxPieceLen)
                  while (b > a + 1) { // multi-char only
                    if (fb(b) != Double.NegativeInfinity) {
                      val piece = w.substring(a, b)
                      if (lp.contains(piece)) cands += piece
                    }
                    b -= 1
                  }
                }
                a += 1
              }
              cands.iterator.map { p =>
                val zm = forward(w, p)(n)
                // With full char coverage the char-only path survives every
                // ban, so zm is finite. When the vocab MISSES a char of `w`
                // (possible on externally-supplied vocabs), a banned piece
                // can be the only bridge over that char: zm = -Inf. That
                // piece is IRREPLACEABLE — its leave-one-out loss is
                // +Infinity by definition, emitted explicitly so the top-k
                // keep-rank (loss desc) always retains it. +Inf sums with
                // any finite word contribution to +Inf — never NaN, since
                // z >= zm makes every contribution non-negative.
                if (zm == Double.NegativeInfinity)
                  (p, Double.PositiveInfinity)
                else
                  (p, f.toDouble * (z - zm) * 1e6)
              }
            }
          }
        }
      }
      .toDF("piece", "loss")
      .groupBy(col("piece")).agg(sum(col("loss")).as("loss_micro"))
    vocab.filter(p => cpLen(p.piece) > 1).map(_.piece).toDF("piece")
      .join(contrib, Seq("piece"), "left")
      .select(col("piece"),
        coalesce(col("loss_micro"), lit(0.0)).as("loss_micro"))
  }

  /** [[pruneVocab]] on the cap-free FB loss — keep-rank distributed the
    * same way (top-k; only the keep rows reach the driver). */
  def pruneVocabFB(words: DataFrame, vocab: Seq[Piece], maxPieceLen: Int,
      targetMultis: Int): Seq[Piece] = {
    require(targetMultis >= 0, s"pruneVocabFB: bad targetMultis $targetMultis")
    val keep = keepSet(pruneLossesFB(words, vocab, maxPieceLen), targetMultis)
    vocab.filter(p => cpLen(p.piece) == 1 || isBytePiece(p.piece) || keep(p.piece))
  }

  /** Collect a forward–backward re-estimate to the driver vocab
    * artifact: chars floored at a tiny positive mass (ln must stay
    * finite; chars guarantee segmentability), multi-char pieces with
    * no expectation mass dropped, lp = round(ln(ec/Σec)·1e6). The
    * `cnt` field carries round(ec·1e6) for interop with [[Piece]].
    */
  def collectSoftRoundFB(words: DataFrame, vocab: Seq[Piece],
      maxPieceLen: Int): Seq[Piece] = {
    val ec = softEmRoundFB(words, vocab, maxPieceLen)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val floorMass = 1e-6
    val entries = vocab.flatMap { p =>
      if (cpLen(p.piece) == 1)
        Some(p.piece -> math.max(ec.getOrElse(p.piece, 0.0), floorMass))
      else ec.get(p.piece).filter(_ > 0.0).map(p.piece -> _)
    }.sortBy(_._1)
    val total = entries.map(_._2).sum
    entries.map { case (piece, e) =>
      Piece(piece, math.round(e * 1e6),
        math.round(math.log(e / total) * 1e6))
    }
  }

  /** The CAP-FREE composed trainer (round 14 — the 100-TB face of
    * [[trainSoft]], closing the scale story [[softEmRoundFB]] and
    * [[pruneLossesFB]] opened piecewise): the identical published
    * schedule — seed oversized, re-estimate, prune the lowest-loss
    * multis by keepFrac, repeat, final re-estimate — with every
    * lattice pass forward–backward in double log-space, so NO word
    * ever drops out of the statistics for being long. Not
    * cross-engine-replayable (per-cell transcendentals), hence no
    * oracle face; UnigramSpec gates vocabulary agreement with
    * [[trainSoft]] on an in-cap fixture and end-to-end training on a
    * corpus whose words exceed the enumeration cap.
    */
  def trainSoftFB(docs: DataFrame, textCol: String, maxPieceLen: Int,
      seedSize: Int, vocabSize: Int, keepFrac: Double = 0.75): Seq[Piece] = {
    require(seedSize >= vocabSize,
      s"trainSoftFB: seedSize $seedSize must be >= vocabSize $vocabSize")
    require(keepFrac > 0 && keepFrac < 1, s"trainSoftFB: bad keepFrac $keepFrac")
    val words = wordFreqs(docs, textCol).localCheckpoint()
    var vocab = collectVocab(seedVocab(docs, textCol, maxPieceLen, seedSize))
    val nChars = vocab.count(p => cpLen(p.piece) == 1)
    val targetMultis = math.max(vocabSize - nChars, 0)
    var guard = 0
    while (vocab.count(p => cpLen(p.piece) > 1) > targetMultis && guard < 64) {
      vocab = collectSoftRoundFB(words, vocab, maxPieceLen)
      val multis = vocab.count(p => cpLen(p.piece) > 1)
      val next = math.max(targetMultis,
        math.min(multis - 1, math.ceil(multis * keepFrac).toInt))
      if (next < multis)
        vocab = pruneVocabFB(words, vocab, maxPieceLen, next)
      guard += 1
    }
    collectSoftRoundFB(words, vocab, maxPieceLen)
  }

  /** Subword-regularization SAMPLING (round 14 — the published
    * unigram-LM training-time feature the Viterbi [[apply]] face
    * deliberately lacks: instead of always emitting the best
    * segmentation, sample one per word OCCURRENCE with probability ∝
    * P(seg)^α, so the model sees segmentation diversity). Deterministic
    * and cross-engine-replayable by construction:
    *
    *  - per DISTINCT word, every valid segmentation enumerates in mask
    *    order with weight round(exp(α·(score−max)/1e6)·1e6) — the
    *    soft-EM single-quantization contract with α folded in (α = 0.5
    *    default scales the double exactly);
    *  - per occurrence, the draw is u = md5(seed:doc:pos) mod 1e6 —
    *    reproducible across runs, engines and retries (no RNG state,
    *    the stratifiedSample philosophy applied to segmentation);
    *  - the pick is the smallest mask whose cumulative weight clears
    *    the draw: min mask with cum·1e6 > u·D — exact integers.
    *
    * Scale shape: lattices enumerate once per DISTINCT word (bounded
    * by `maxWordLen`, the training-statistics cap); occurrences join
    * the CDF table on the word — an AQE-splittable equi-join; the
    * per-occurrence work is one hash and one bounded min. Words with
    * no valid segmentation (a char outside the vocab) are excluded —
    * the corpus faces keep full char coverage by construction. Output
    * per doc: n_words, n_pieces, pieces_md5 (the SAMPLED stream),
    * n_resampled (occurrences whose sample differs from the Viterbi
    * choice — how often regularization actually bites).
    */
  def sampleSegments(docs: DataFrame, idCol: String, textCol: String,
      vocab: Seq[Piece], maxPieceLen: Int, seed: String,
      alpha: Double = 0.5, maxWordLen: Int = 16): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"sampleSegments: bad alpha $alpha")
    val spark = docs.sparkSession
    import spark.implicits._
    val lpB = spark.sparkContext.broadcast(
      vocab.map(p => p.piece -> p.lp_micro).toMap)
    val words = docs
      .select(explode(TextOps.tokens(col(textCol))).as("w")).distinct()
    // CDF table: one row per (word, valid segmentation), mask order
    val cdf = words.select(col("w").cast("string")).as[String]
      .mapPartitions { it =>
        val lp = lpB.value
        it.flatMap { w =>
          val cps = w.codePoints.toArray
          val n = cps.length
          if (n == 0 || n > maxWordLen) Iterator.empty
          else {
            // enumerate in mask order, keeping starts for the Viterbi
            // total order (score desc, fewer pieces, smallest reversed
            // start list — the q192 contract); positions are CODE
            // POINTS, the oracle's substr space
            val segs = Seq.newBuilder[(Long, Seq[String], Long, Seq[Int])]
            var mask = 0L
            val lim = 1L << (n - 1)
            while (mask < lim) {
              val pieces = Seq.newBuilder[String]
              val starts = Seq.newBuilder[Int]
              var ok = true
              var score = 0L
              var start = 0
              var p = 1
              while (p <= n && ok) {
                val boundary = p == n || ((mask >> (p - 1)) & 1L) == 1L
                if (boundary) {
                  lp.get(new String(cps, start, p - start)) match {
                    case Some(v) =>
                      score += v; pieces += new String(cps, start, p - start)
                      starts += start + 1; start = p
                    case None => ok = false
                  }
                }
                p += 1
              }
              if (ok) segs += ((mask, pieces.result(), score, starts.result()))
              mask += 1L
            }
            val all = segs.result()
            if (all.isEmpty) Iterator.empty
            else {
              val m = all.iterator.map(_._3).max
              val weighted = all.map { case (mk, ps, s, st) =>
                (mk, ps, s, st,
                  math.round(math.exp(alpha * (s - m) / 1e6) * 1e6))
              }
              val d = weighted.iterator.map(_._5).sum
              val bestMask = weighted.minBy { case (mk, ps, s, st, _) =>
                (-s, ps.length, st.reverse.map(x => f"$x%05d").mkString(","))
              }._1
              var cum = 0L
              weighted.iterator.map { case (mk, ps, _, _, wt) =>
                cum += wt
                (w, mk, ps, cum, d, mk == bestMask)
              }
            }
          }
        }
      }
      .toDF("w", "mask", "pieces", "cum", "d", "is_best")
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      TextOps.tokens(col(textCol)).as("__w"))
    val stats = base.select(col("doc_id"),
      size(col("__w")).cast("long").as("n_words"))
    val occ = base
      .select(col("doc_id"), posexplode(col("__w")).as(Seq("__p0", "w")))
      .select(col("doc_id"), (col("__p0") + 1).as("p"), col("w"))
      .withColumn("u", pmod(
        conv(substring(md5(concat_ws(":", lit(seed), col("doc_id"),
          col("p"))), 1, 15), 16, 10).cast("long"),
        lit(1000000L)))
    val picked = occ.join(cdf, "w")
      .filter(col("cum") * lit(1000000L) > col("u") * col("d"))
      .groupBy(col("doc_id"), col("p"))
      .agg(min_by(struct(col("pieces"), col("is_best")), col("mask"))
        .as("__s"))
      .select(col("doc_id"), col("p"), col("__s.pieces").as("pieces"),
        col("__s.is_best").as("is_best"))
    val perDoc = picked.groupBy(col("doc_id"))
      .agg(sum(size(col("pieces"))).cast("long").as("n_pieces"),
        md5(concat_ws(" ", flatten(expr(
          "transform(array_sort(collect_list(struct(p, pieces))), x -> x.pieces)"
        )))).as("pieces_md5"),
        sum(when(!col("is_best"), 1L).otherwise(0L)).as("n_resampled"))
    stats.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        coalesce(col("pieces_md5"), md5(lit(""))).as("pieces_md5"),
        coalesce(col("n_resampled"), lit(0L)).as("n_resampled"))
  }

  /** Full soft-EM trainer with the published pruning schedule: seed at
    * `seedSize` (oversized), then per round — one soft-EM re-estimate,
    * then prune the lowest-loss multi-char pieces down to
    * max(target, ⌈keep·current⌉) — until the vocab reaches
    * `vocabSize`, finishing with one final re-estimate so scores match
    * the surviving vocabulary. `keepFrac` 0.75 mirrors the published
    * shrinking factor.
    */
  def trainSoft(docs: DataFrame, textCol: String, maxPieceLen: Int,
      seedSize: Int, vocabSize: Int, keepFrac: Double = 0.75,
      maxWordLen: Int = 16): Seq[Piece] = {
    require(seedSize >= vocabSize,
      s"trainSoft: seedSize $seedSize must be >= vocabSize $vocabSize")
    require(keepFrac > 0 && keepFrac < 1, s"trainSoft: bad keepFrac $keepFrac")
    val words = wordFreqs(docs, textCol).localCheckpoint()
    var vocab = collectVocab(seedVocab(docs, textCol, maxPieceLen, seedSize))
    val nChars = vocab.count(p => cpLen(p.piece) == 1)
    val targetMultis = math.max(vocabSize - nChars, 0)
    var guard = 0
    while (vocab.count(p => cpLen(p.piece) > 1) > targetMultis && guard < 64) {
      vocab = collectSoftRound(words, vocab, maxPieceLen, maxWordLen)
      val multis = vocab.count(p => cpLen(p.piece) > 1)
      // clamp to guarantee progress: ceil(multis·keepFrac) == multis for
      // tiny multis (1..3 at 0.75), which would spin the loop without
      // ever pruning — always step down at least one piece
      val next = math.max(targetMultis,
        math.min(multis - 1, math.ceil(multis * keepFrac).toInt))
      if (next < multis)
        vocab = pruneVocab(words, vocab, maxPieceLen, next, maxWordLen)
      guard += 1
    }
    collectSoftRound(words, vocab, maxPieceLen, maxWordLen)
  }
}
