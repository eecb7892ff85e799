package graft.functions

/** JVM kernels for the dedup hot path, value-identical to the Catalyst
  * expression chains they replace (and to the DuckDB oracle):
  *
  *   - [[tokens]] mirrors `split(trim(text), "\\s+")` — ASCII-space-only
  *     trim (Spark's `trim` strips spaces, not all whitespace), then
  *     regex split with limit -1 (Spark keeps trailing empty strings).
  *   - shingle hashes and simhash use [[RollingHash.hash]] — the same
  *     (acc*31 + codePoint) % p fold as the codegen'd expression.
  *
  * These run inside typed Dataset ops: per-document n-gram/bit-count
  * work is a tight single-pass loop here, where the equivalent
  * higher-order Catalyst expressions (transform/aggregate/zip_with)
  * are interpreted per element and allocate an array per step —
  * profiled 25-40x slower at sf0.1.
  */
object TextKernels {

  private val P = 1000000007L

  /** Mirror of TextAnalysis.tokens for driver/executor-side Scala. */
  def tokens(text: String): Array[String] = {
    var a = 0
    var b = text.length
    while (a < b && text.charAt(a) == ' ') a += 1
    while (b > a && text.charAt(b - 1) == ' ') b -= 1
    text.substring(a, b).split("\\s+", -1)
  }

  /** BPE-ish subword token count: the GPT-2-family pre-tokenizer shape
    * — a token is an optional leading space plus a maximal run of one
    * character class (letters | digits | other-non-space); bare
    * whitespace is consumed, not counted. Exactly the leftmost-first
    * scan of the RE2/Java regex
    * {{{ ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+}}}
    * (no lookahead — RE2, and therefore the DuckDB oracle, has none),
    * implemented as a single hand-rolled pass: regex engines cost
    * ~10x on a per-document hot path.
    */
  def bpeTokenCount(text: String): Long = {
    val len = text.length
    def isLetter(c: Char) = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
    def isDigit(c: Char) = c >= '0' && c <= '9'
    // RE2's \s exactly ([\t\n\f\r ]) — Java's \s and isWhitespace
    // differ on \v and unicode spaces, and the oracle side is RE2
    def isWs(c: Char) =
      c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'
    var i = 0
    var n = 0L
    while (i < len) {
      var j = i
      val c = text.charAt(j)
      if (c == ' ' && j + 1 < len && !isWs(text.charAt(j + 1))) j += 1
      val d = if (j < len) text.charAt(j) else ' '
      if (isWs(d)) {
        i += 1 // bare whitespace: no alternative matches here
      } else {
        val cls = if (isLetter(d)) 0 else if (isDigit(d)) 1 else 2
        var k = j
        while (k < len && {
          val e = text.charAt(k)
          !isWs(e) && (if (cls == 0) isLetter(e)
            else if (cls == 1) isDigit(e)
            else !isLetter(e) && !isDigit(e))
        }) k += 1
        n += 1
        i = k
      }
    }
    n
  }

  /** Distinct rolling-hash values of the word `n`-gram shingles of
    * `text` (whole text as the single shingle when shorter than n
    * tokens) — one pass, no intermediate shingle strings beyond a
    * reused builder.
    */
  def shingleHashes(text: String, n: Int): Array[Long] = {
    val toks = tokens(text)
    val seen = new java.util.HashSet[Long]()
    if (toks.length >= n) {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var o = 0
        while (o < n) {
          if (o > 0) sb.append(' ')
          sb.append(toks(i + o))
          o += 1
        }
        seen.add(RollingHash.hash(sb.toString, P))
        i += 1
      }
    } else {
      seen.add(RollingHash.hash(toks.mkString(" "), P))
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }

  /** k-permutation MinHash signature of one document — the per-ROW
    * spelling of [[MinHashAgg]]'s distributive aggregate (identical
    * values: min over the distinct shingle hashes of
    * PortableHash.family(i, sh, P)). The aggregate is the scale shape
    * for the Scala API (shingles never materialize per document); this
    * kernel is the SQL surface (`graft_minhash_sig`) and the streaming
    * probe's per-row encode, where a one-pass JVM loop over the
    * document's own shingles is exactly right.
    */
  def minhashSig(text: String, k: Int, n: Int): Array[Long] = {
    val shs = shingleHashes(text, n)
    val out = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < k) {
      var j = 0
      while (j < shs.length) {
        val h = PortableHash.family(i, shs(j), P)
        if (h < out(i)) out(i) = h
        j += 1
      }
      i += 1
    }
    out
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    * SIGMOD'03): hash every character k-gram (code points, same
    * polynomial fold as [[RollingHash]]), slide a window of `w`
    * consecutive k-gram hashes, select each window's minimum (rightmost
    * on ties), dedup selected POSITIONS. The guarantee: any match of
    * length >= w + k - 1 between two documents shares a fingerprint,
    * with ~2/(w+1) of the k-grams kept — position-robust dedup
    * signatures at a fraction of the full shingle set.
    *
    * Returns (n_kgrams, n_fingerprints, fingerprint hash sum) — the
    * deterministic summary the oracle reproduces (hashes < 2^30, docs
    * < 2^10 k-grams: the sum never overflows).
    */
  def winnowFingerprints(text: String, k: Int, w: Int): (Long, Long, Long) = {
    val m = math.max(text.codePointCount(0, text.length) - k + 1, 0)
    val sel = winnowedHashes(text, k, w)
    (m.toLong, sel.length.toLong, sel.sum)
  }

  /** The selected winnowing fingerprint hashes, in position order (one
    * per distinct selected position — selection positions are strictly
    * increasing, so adjacent-dedup IS the distinct set).
    */
  def winnowedHashes(text: String, k: Int, w: Int): Array[Long] = {
    val cps = text.codePoints().toArray
    val m = cps.length - k + 1
    if (m <= 0) return Array.emptyLongArray
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = 0L
      var j = 0
      while (j < k) { acc = (acc * 31L + cps(i + j)) % P; j += 1 }
      hs(i) = acc
      i += 1
    }
    val nWin = math.max(m - w + 1, 1)
    val winLen = math.min(w, m)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var lastSel = -1
    var s = 0
    while (s < nWin) {
      // rightmost minimum of hs[s, s + winLen)
      var best = s
      var j = s + 1
      while (j < s + winLen) {
        if (hs(j) <= hs(best)) best = j
        j += 1
      }
      if (best != lastSel) {
        out += hs(best)
        lastSel = best
      }
      s += 1
    }
    out.toArray
  }

  /** Content-defined chunking (rolling-hash boundaries, the
    * Rabin/FastCDC idea): a chunk ends wherever the rolling hash of the
    * trailing `w` code points is divisible by `mask+1` — boundaries
    * depend only on local content, so an insertion early in a document
    * shifts chunk FRAMES but not the content-identical chunks after it
    * (what makes chunk-level dedup robust, unlike fixed-size blocks).
    * Returns the rolling hash of each chunk's content, in order.
    * Texts shorter than `w` are one chunk.
    */
  def cdcChunkHashes(text: String, w: Int, mask: Long): Array[Long] =
    cdcChunks(text, w, mask).map(_._1)

  /** [[cdcChunkHashes]] with each chunk's LENGTH alongside its hash —
    * the storage-dedup readout (m14) charges duplicates by bytes, so
    * it needs both. Boundaries and hashes are bit-identical to
    * [[cdcChunkHashes]] (which now delegates here).
    */
  def cdcChunks(text: String, w: Int, mask: Long): Array[(Long, Int)] = {
    val n = text.length // ASCII corpus: 1 char = 1 code point (oracle parity)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    var start = 0
    var i = w - 1
    if (n >= w) {
      while (i < n) {
        // windowed hash over text[i-w+1..i] — O(w) per position keeps
        // the arithmetic identical to the oracle's list_reduce slice
        var wh = 0L
        var j = i - w + 1
        while (j <= i) { wh = (wh * 31 + text.codePointAt(j)) % P; j += 1 }
        if (wh % (mask + 1) == 0) {
          out += ((RollingHash.hash(text.substring(start, i + 1), P), i + 1 - start))
          start = i + 1
        }
        i += 1
      }
    }
    if (start < n || n == 0)
      out += ((RollingHash.hash(text.substring(start), P), n - start))
    out.toArray
  }

  /** 32-bit SimHash (Charikar 2002): bit b set iff more token hashes
    * have bit b set than not. Identical to the expression formulation
    * (floor(h / 2^b) % 2 == (h >> b) & 1 for the non-negative h < 2^30
    * the rolling hash produces).
    */
  /** 64-bit SimHash — the width that makes the BANDS scale: 4 x 16-bit
    * bands give 65536 buckets per band (vs 256 for simhash32's 8-bit
    * bands, whose per-bucket population — and so the self-join — grows
    * linearly with the corpus). Bit b's per-token vote is the PARITY of
    * portable-hash family member b applied to the token's rolling hash
    * — 64 decorrelated deterministic bits, each spelled identically in
    * DuckDB (simhash32 uses the raw hash's own bits, which top out
    * below 2^30 — not enough for 64).
    */
  def simhash64(text: String): Long = {
    val toks = tokens(text)
    val counts = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = RollingHash.hash(toks(i), P)
      var b = 0
      while (b < 64) {
        if ((PortableHash.family(b, h, P) & 1L) == 1L) counts(b) += 1
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) {
      if (2 * counts(b) > toks.length) sim |= (1L << b)
      b += 1
    }
    sim
  }

  /** Train BPE merges over a word-frequency table (pure, deterministic,
    * driver-local — the tokenizer-training counterpart of the PQ/IVF
    * codebook trainers). Classic Sennrich BPE without an end-of-word
    * marker: every word starts as its character symbols; each step
    * merges the adjacent symbol pair with the highest corpus frequency
    * (weighted by word frequency), ties broken by the lexicographically
    * smallest (left, right) pair so two trainings bit-agree. Stops
    * early when no pair occurs twice.
    */
  def bpeTrainMerges(wordFreq: Seq[(String, Long)],
      nMerges: Int): Array[(String, String)] = {
    var words: Array[(Array[String], Long)] = wordFreq
      .map { case (w, f) => (w.toCharArray.map(_.toString), f) }.toArray
    val merges = Array.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < nMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      val best = counts.foldLeft(Option.empty[((String, String), Long)]) {
        case (acc, (p, c)) =>
          if (c < 2) acc
          else acc match {
            case Some((bp, bc)) =>
              if (c > bc || (c == bc && (p._1 < bp._1 ||
                  (p._1 == bp._1 && p._2 < bp._2)))) Some((p, c))
              else acc
            case None => Some((p, c))
          }
      }
      best match {
        case None => done = true
        case Some(((a, b), _)) =>
          merges += ((a, b))
          val ab = a + b
          words = words.map { case (syms, f) =>
            if (syms.length < 2) (syms, f)
            else {
              val out = Array.newBuilder[String]
              var i = 0
              while (i < syms.length) {
                if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                  out += ab; i += 2
                } else { out += syms(i); i += 1 }
              }
              (out.result(), f)
            }
          }
          m += 1
      }
    }
    merges.result()
  }

  /** Segment one word with ranked merges — the standard apply loop:
    * repeatedly merge the adjacent pair with the LOWEST training rank
    * until no learned pair remains. Invariants (BpeSpec): segments
    * concatenate back to the word; zero merges = character split.
    */
  def bpeSegment(word: String,
      ranks: collection.Map[(String, String), Int]): Array[String] = {
    if (word.isEmpty) return Array.empty
    var syms = word.toCharArray.map(_.toString)
    var go = true
    while (go && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i + 1 < syms.length) {
        ranks.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestAt = i }
        }
        i += 1
      }
      if (bestAt < 0) go = false
      else {
        val out = new Array[String](syms.length - 1)
        var j = 0
        while (j < bestAt) { out(j) = syms(j); j += 1 }
        out(bestAt) = syms(bestAt) + syms(bestAt + 1)
        j = bestAt + 1
        while (j < out.length) { out(j) = syms(j + 1); j += 1 }
        syms = out
      }
    }
    syms
  }

  def simhash32(text: String): Long = {
    val toks = tokens(text)
    val counts = new Array[Int](32)
    var i = 0
    while (i < toks.length) {
      val h = RollingHash.hash(toks(i), P)
      var b = 0
      while (b < 32) {
        if (((h >> b) & 1L) == 1L) counts(b) += 1
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 32) {
      if (2 * counts(b) > toks.length) sim |= (1L << b)
      b += 1
    }
    sim
  }
}
