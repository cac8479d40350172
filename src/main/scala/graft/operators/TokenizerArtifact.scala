package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.streaming.VersionedLedger

/** Versioned, deterministically-serialized tokenizer artifacts (round 15
  * — verdict item 3). Trained vocabularies/merge lists previously existed
  * only as DataFrames inside a query; the interface a production pipeline
  * actually consumes is a WRITTEN artifact: train once, commit a
  * versioned snapshot, and every downstream consumer (tokenize jobs,
  * serving, other engines) applies FROM the artifact. This is the
  * [[graft.streaming.VersionedLedger]] pattern applied to tokenizer state
  * — snapshot dir + atomic pointer swap, so a crash mid-export can never
  * leave a half-written vocabulary where a tokenize fleet can read it —
  * with the payload stored as a RAW TEXT FILE (`v{N}/tokenizer.txt`), the
  * deployed shape: byte-exact, human-diffable, readable without Spark.
  *
  * Serialization `v2` (one format across the three published tokenizer
  * families this repo trains — BPE/byte-BPE merge lists, WordPiece
  * vocabularies, unigram-LM scored vocabularies; `v2` adds the
  * special-token registry to `v1`):
  *
  * {{{
  *   graft-tokenizer\tv2\t<family>\t<n>\t<k>\n // header
  *   special\t<id>\t<role>\t<token>\n          // × k, id ascending 0..k-1
  *   <entry line>\n                            // × n, family-specific:
  *   //   unigram:   piece\tcnt\tlp_micro     (piece ascending by code
  *   //              point == UTF-8 byte order — DuckDB's ORDER BY)
  *   //   bytebpe:   rank\ta\tb               (rank ascending)
  *   //   wordpiece: rank\tpiece              (vocab order: sorted
  *   //              alphabet, then merge outputs in rank order, deduped
  *   //              keeping the first occurrence)
  *   // regular entries take ids k..k+n-1 in file order
  * }}}
  *
  * Every line is LF-terminated (the file ends with one LF); fields are
  * tab-separated. Pieces are whitespace-delimited corpus tokens or
  * byte-char symbols, so they can never contain a tab, LF or space —
  * `require`-fenced anyway, because a piece that broke that would break
  * the format silently. The canonical orders are total, so re-exporting
  * the same vocabulary is BYTE-IDENTICAL (ArtifactSpec pins it), and the
  * artifact digest is one md5 both engines can compute — q221
  * hash-checks the exact serialized bytes of all three families against
  * a DuckDB replay of their trainers, and q222 applies FROM a committed
  * artifact and must match the train-and-apply-in-one-plan oracle.
  */
object TokenizerArtifact {

  val Header = "graft-tokenizer"
  val Version = "v2"

  /** The special-token registry (round 16 — verdict item 4): a real
    * deployment pins [PAD]/[UNK]/[BOS]/[EOS] IDS in the artifact — the
    * first thing a consumer of `tokenizer.txt` asks — instead of
    * leaving them family-implicit. `v2` writes one `special` line per
    * registered token, id-ascending, BEFORE the entries; regular
    * entries take the ids `k..k+n-1` in file order, so every piece's
    * id is derivable from the artifact alone. Apply faces consume the
    * registry (q225's WordPiece unk comes FROM the artifact, not a
    * constant). The default registry is the conventional four; ids are
    * explicit in the bytes, never positional convention.
    */
  val DefaultSpecials: Seq[(String, String)] =
    Seq("pad" -> "[PAD]", "unk" -> "[UNK]", "bos" -> "[BOS]", "eos" -> "[EOS]")

  /** The serialized specials block: `special\t<id>\t<role>\t<token>`
    * lines, id ascending — constant across families. */
  def specialsBlock(specials: Seq[(String, String)]): String =
    specials.zipWithIndex.map { case ((role, tok), i) =>
      s"special\t$i\t${fence(role, "special role")}\t${fence(tok, "special token")}"
    }.mkString("\n")

  private def fence(s: String, what: String): String = {
    require(s.nonEmpty &&
        !s.exists(c => c == '\t' || c == '\n' || c == '\r' || c == ' '),
      s"TokenizerArtifact: $what must be non-empty and whitespace-free: '$s'")
    s
  }

  /** Code-point lexicographic order — identical to UTF-8 BYTE order
    * (UTF-8 preserves code-point ordering), which is what DuckDB's
    * `ORDER BY piece` compares. Java `String` natural order compares
    * UTF-16 code UNITS, which diverges for vocabs mixing astral-plane
    * pieces (surrogates sort between U+DFFF and U+E000) with
    * U+E000–U+FFFF pieces — exactly the mix byte fallback enables. The
    * canonical `v2` order is therefore THIS order, pinned cross-engine.
    */
  private[graft] val codePointOrder: Ordering[String] =
    new Ordering[String] {
      def compare(a: String, b: String): Int = {
        var i = 0; var j = 0
        while (i < a.length && j < b.length) {
          val ca = a.codePointAt(i); val cb = b.codePointAt(j)
          if (ca != cb) return Integer.compare(ca, cb)
          i += Character.charCount(ca); j += Character.charCount(cb)
        }
        Integer.compare(a.length - i, b.length - j)
      }
    }

  private def render(family: String, lines: Seq[String],
      specials: Seq[(String, String)]): String = {
    require(specials.map(_._1).distinct.size == specials.size,
      "render: duplicate special roles")
    require(specials.map(_._2).distinct.size == specials.size,
      "render: duplicate special tokens")
    (s"$Header\t$Version\t$family\t${lines.size}\t${specials.size}" +:
      (if (specials.isEmpty) Seq.empty[String]
       else Seq(specialsBlock(specials))) ++:
      lines).mkString("", "\n", "\n")
  }

  /** Refuse trained pieces that collide with a registered special token
    * — an id would become ambiguous. Can't happen for corpus-trained
    * vocabs (brackets never survive the word model), fenced anyway. */
  private def fenceCollisions(pieces: Iterable[String],
      specials: Seq[(String, String)]): Unit = {
    val st = specials.map(_._2).toSet
    pieces.find(st.contains).foreach(p => throw new IllegalArgumentException(
      s"TokenizerArtifact: trained piece '$p' collides with a special token"))
  }

  /** Unigram-LM vocabulary, piece-ascending — the total order the q191
    * seed already exposes, so the artifact is independent of training
    * traversal order. */
  def serializeUnigram(vocab: Seq[UnigramLm.Piece],
      specials: Seq[(String, String)] = DefaultSpecials): String = {
    val sorted = vocab.sortBy(_.piece)(codePointOrder)
    require(sorted.map(_.piece).distinct.size == sorted.size,
      "serializeUnigram: duplicate pieces")
    fenceCollisions(sorted.map(_.piece), specials)
    render("unigram",
      sorted.map(p => s"${fence(p.piece, "piece")}\t${p.cnt}\t${p.lp_micro}"),
      specials)
  }

  /** BPE/byte-BPE merge list in rank order — rank IS the semantics (the
    * apply chain replays merges in training order). */
  def serializeMerges(merges: Seq[(String, String)],
      specials: Seq[(String, String)] = DefaultSpecials): String = {
    fenceCollisions(merges.flatMap(m => Seq(m._1, m._2)), specials)
    render("bytebpe", merges.zipWithIndex.map { case ((a, b), i) =>
      s"$i\t${fence(a, "merge lhs")}\t${fence(b, "merge rhs")}"
    }, specials)
  }

  /** WordPiece vocabulary in its derivation order (sorted alphabet, then
    * merge outputs by rank, first occurrence kept) — the order
    * [[TrainPrep.wordPieceVocabFromTrain]] returns. */
  def serializeWordPiece(vocab: Seq[String],
      specials: Seq[(String, String)] = DefaultSpecials): String = {
    require(vocab.distinct.size == vocab.size, "serializeWordPiece: duplicates")
    fenceCollisions(vocab, specials)
    render("wordpiece", vocab.zipWithIndex.map { case (p, i) =>
      s"$i\t${fence(p, "piece")}"
    }, specials)
  }

  /** Linear-model weight vector (round 16 — the q228 quality classifier
    * as a deployable artifact): `bucket\tw_micro` in bucket order,
    * bucket dense from 0. The trained scorer ships exactly like a
    * trained tokenizer — versioned text, atomic pointer swap — so the
    * scoring fleet (q229) never sees the trainer. */
  def serializeLinear(weights: Seq[Long],
      specials: Seq[(String, String)] = Seq.empty): String =
    render("linear", weights.zipWithIndex.map { case (w, j) => s"$j\t$w" },
      specials)

  def parseLinear(content: String): Seq[Long] =
    entryLines(content, "linear").zipWithIndex.map { case (l, i) =>
      val Array(j, w) = l.split('\t')
      require(j.toInt == i, s"TokenizerArtifact: bucket gap at line $i: $l")
      w.toLong
    }

  /** md5 hex of the artifact's exact UTF-8 bytes — the 1-row digest q221
    * checks cross-engine. */
  def digest(content: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"${b & 0xff}%02x").mkString
  }

  private def headerOf(content: String): (String, Int, Int) = {
    val first = content.takeWhile(_ != '\n')
    val parts = first.split('\t')
    // explicit migration error BEFORE the generic fence (r16 ADVICE): a
    // fleet pointed at a pre-registry artifact must learn the actual
    // remedy, not "bad header" — v1 lacks the specials registry (and
    // the k header field), so consumers that resolve [UNK]/[PAD] ids
    // from the bytes cannot run against it
    if (parts.length == 4 && parts.headOption.contains(Header) &&
        parts(1) == "v1")
      throw new IllegalArgumentException(
        "TokenizerArtifact: unsupported artifact version 'v1' — this " +
        "reader requires the v2 special-token registry; retrain (or " +
        "re-export the same vocabulary) and recommit to migrate")
    require(parts.length == 5 && parts(0) == Header && parts(1) == Version,
      s"TokenizerArtifact: bad header '$first'")
    (parts(2), parts(3).toInt, parts(4).toInt)
  }

  /** The family tag of a serialized artifact. */
  def family(content: String): String = headerOf(content)._1

  /** The special-token registry of a serialized artifact, id-ascending:
    * (id, role, token). Ids are validated dense from 0. */
  def specialTokens(content: String): Seq[(Long, String, String)] = {
    val (_, _, k) = headerOf(content)
    require(content.endsWith("\n"), "TokenizerArtifact: missing final LF")
    content.dropRight(1).split('\n').toSeq.slice(1, 1 + k)
      .zipWithIndex.map { case (l, i) =>
        val Array(tag, id, role, tok) = l.split('\t')
        require(tag == "special" && id.toInt == i,
          s"TokenizerArtifact: bad special line $i: '$l'")
        (id.toLong, role, tok)
      }
  }

  /** The registered token for `role` (e.g. "unk"), or an error — the
    * apply faces consume this instead of family-implicit constants. */
  def specialToken(content: String, role: String): String =
    specialTokens(content).collectFirst { case (_, r, tok) if r == role => tok }
      .getOrElse(throw new IllegalArgumentException(
        s"TokenizerArtifact: no special token for role '$role'"))

  private def entryLines(content: String, wantFamily: String): Seq[String] = {
    val (fam, n, k) = headerOf(content)
    require(fam == wantFamily,
      s"TokenizerArtifact: family '$fam', expected '$wantFamily'")
    require(content.endsWith("\n"), "TokenizerArtifact: missing final LF")
    specialTokens(content) // validates the specials block
    val lines = content.dropRight(1).split('\n').toSeq.drop(1 + k)
    require(lines.size == n,
      s"TokenizerArtifact: header says $n entries, found ${lines.size}")
    lines
  }

  def parseUnigram(content: String): Seq[UnigramLm.Piece] =
    entryLines(content, "unigram").map { l =>
      val Array(p, c, lp) = l.split('\t')
      UnigramLm.Piece(p, c.toLong, lp.toLong)
    }

  def parseMerges(content: String): Seq[(String, String)] =
    entryLines(content, "bytebpe").zipWithIndex.map { case (l, i) =>
      val Array(r, a, b) = l.split('\t')
      require(r.toInt == i, s"TokenizerArtifact: rank gap at line $i: $l")
      (a, b)
    }

  def parseWordPiece(content: String): Seq[String] =
    entryLines(content, "wordpiece").zipWithIndex.map { case (l, i) =>
      val Array(r, p) = l.split('\t')
      require(r.toInt == i, s"TokenizerArtifact: rank gap at line $i: $l")
      p
    }

  private val FileName = "tokenizer.txt"

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Atomic versioned export: write `v{N+1}/tokenizer.txt` (nothing reads
    * it yet), then swap the `CURRENT` pointer — the VersionedLedger
    * two-phase commit on a text payload. Returns the committed version.
    */
  def commit(spark: SparkSession, path: String, content: String): Long = {
    headerOf(content) // fence: only well-formed artifacts get committed
    val next = VersionedLedger.currentVersion(spark, path).map(_ + 1L).getOrElse(0L)
    val file = new Path(s"$path/v$next", FileName)
    val f = fs(spark, file)
    val out = f.create(file, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    VersionedLedger.swapPointer(spark, path, next)
    // best-effort GC: keep current + previous (a reader that resolved the
    // pointer just before the swap may still be reading N-1)
    try {
      val dir = new Path(path)
      val d = fs(spark, dir)
      d.listStatus(dir).foreach { st =>
        val nm = st.getPath.getName
        if (nm.startsWith("v") && nm.drop(1).forall(_.isDigit) &&
            nm.drop(1).toLong < next - 1L)
          d.delete(st.getPath, true)
      }
    } catch { case _: java.io.IOException => () }
    next
  }

  /** Read the CURRENT committed artifact's exact bytes, or None before
    * the first commit. A writer killed between the snapshot write and
    * the pointer swap leaves readers on the previous version. */
  def load(spark: SparkSession, path: String): Option[String] =
    VersionedLedger.currentVersion(spark, path).map { v =>
      val file = new Path(s"$path/v$v", FileName)
      val f = fs(spark, file)
      val in = f.open(file)
      try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      } finally in.close()
    }
}
