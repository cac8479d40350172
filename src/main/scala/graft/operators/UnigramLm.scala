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
    val n = word.length
    if (n == 0) return (Seq.empty, 0L)
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
          val piece = word.substring(i, j)
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
    while (k > 0) { stack += word.substring(prev(k), k); k = prev(k) }
    parts ++= stack.reverseIterator
    (parts.result(), score(n))
  }

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
    val seg = segmentWords(words, vocab, maxPieceLen)
      .join(words, "w")
      .select(col("f"), explode(col("pieces")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("f")).as("cnt"))
    val used = seg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val chars = vocab.filter(_.piece.length == 1)
      .map(p => p.piece -> math.max(used.getOrElse(p.piece, 0L), 1L))
    val multis = vocab.filter(_.piece.length > 1)
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
    val words = wordFreqs(docs, textCol)
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
}
