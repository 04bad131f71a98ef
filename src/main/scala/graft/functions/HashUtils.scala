package graft.functions

import java.security.MessageDigest

import org.apache.spark.unsafe.types.UTF8String

/** MD5-prefix hashing shared by the signature expressions.
  *
  * Why MD5 and not xxhash64: the signature pipelines (MinHash, SimHash,
  * hyperplane LSH, IVF sampling) must be *cross-engine deterministic* so the
  * DuckDB differential oracle can replay them bit-for-bit. Both engines ship
  * the same `md5()`; DuckDB has no xxhash64. The 32/64-bit prefixes below
  * equal DuckDB's `('0x' || substr(md5(s), 1, 8|16))::BIGINT|UBIGINT` —
  * big-endian prefix of the hex digest. MD5 costs ~2× xxhash64 per token,
  * paid once per corpus pass at signature build time; verifiability across
  * engines is worth it (and at 100 TB the cost center is the candidate
  * join's shuffle, not the per-row hash).
  */
object HashUtils {

  private val md = ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  // Scratch digest buffer, one per thread: `MessageDigest.digest()` allocates
  // a fresh 16-byte array per call, and the signature loops call it once per
  // shingle/token — at corpus scale that is the dominant small-allocation
  // source in the dedup stages (round-17 profile: run−CPU ≈ 0.4 s of GC in
  // the heavy minhash stages). `digest(buf, 0, 16)` writes in place and
  // resets; values are bit-identical.
  private val digBuf = ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](16))

  /** First 4 digest bytes as an unsigned value in [0, 2^32). */
  def md5Prefix32(s: UTF8String): Long = {
    val d = md.get(); d.reset()
    val b = digBuf.get()
    d.update(s.getBytes)
    d.digest(b, 0, 16)
    ((b(0) & 0xFFL) << 24) | ((b(1) & 0xFFL) << 16) | ((b(2) & 0xFFL) << 8) | (b(3) & 0xFFL)
  }

  /** First 8 digest bytes as a signed long (the 64-bit pattern). */
  def md5Prefix64(s: UTF8String): Long = {
    val d = md.get(); d.reset()
    val b = digBuf.get()
    d.update(s.getBytes)
    d.digest(b, 0, 16)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (b(i) & 0xFFL); i += 1 }
    h
  }

  /** Mersenne prime 2^31 - 1: the LCG modulus for MinHash permutations.
    * (base % P) * a + b stays under 2^62 — no overflow in BIGINT on either
    * engine (Spark ANSI mode would throw on long overflow). */
  val P: Long = 2147483647L

  def minhashA(i: Int): Long = (2654435761L * (i + 1)) % P
  def minhashB(i: Int): Long = (40503L * (i + 1) + 1) % P

  /** Memoized (A, B) coefficient arrays per signature width — the per-row
    * loops used to re-tabulate 2·numHashes longs per document. */
  private val coefCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  def minhashCoefs(numHashes: Int): (Array[Long], Array[Long]) =
    coefCache.computeIfAbsent(numHashes,
      n => (Array.tabulate(n)(minhashA), Array.tabulate(n)(minhashB)))

  // ---- whole-document signature loops (called from codegen'd expressions) --
  //
  // Tokenization happens at the byte level on the single-space separator
  // (0x20 never occurs inside a UTF-8 multibyte sequence), which reproduces
  // Spark's split(text, ' ') exactly, including empty tokens from repeated
  // separators. A k-shingle's concat_ws(' ') of consecutive tokens equals
  // the original substring between the first token's start and the last
  // token's end — so shingles are hashed as byte RANGES of the document,
  // with zero string/array allocation. Shingle dedup is skipped on the
  // MinHash path on purpose: duplicates cannot change a minimum, so the
  // DuckDB oracle's DISTINCT yields the identical signature.

  /** Byte offsets of token boundaries: returns starts/ends (end exclusive)
    * of the space-separated tokens of `b`. */
  private def tokenBounds(b: Array[Byte]): (Array[Int], Array[Int]) = {
    var nTok = 1
    var i = 0
    while (i < b.length) { if (b(i) == ' '.toByte) nTok += 1; i += 1 }
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    var start = 0
    i = 0
    while (i < b.length) {
      if (b(i) == ' '.toByte) { starts(t) = start; ends(t) = i; t += 1; start = i + 1 }
      i += 1
    }
    starts(t) = start; ends(t) = b.length
    (starts, ends)
  }

  /** MinHash signature over the k-shingles of `s` — equal to running
    * [[MinHashSignature]] on `array_distinct(shingles(split(s, ' '), k))`
    * but in one allocation-free pass over the document bytes. */
  def minhashTextSignature(s: UTF8String, k: Int, numHashes: Int): Array[Long] = {
    val b = s.getBytes
    val (starts, ends) = tokenBounds(b)
    val nTok = starts.length
    val d = md.get()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val (as, bs) = minhashCoefs(numHashes)
    val dig = digBuf.get()
    val nShingles = math.max(nTok - k, 0) + 1
    var sh = 0
    var i = 0
    while (sh < nShingles) {
      val from = starts(sh)
      val to = ends(math.min(sh + k - 1, nTok - 1))
      d.reset()
      d.update(b, from, to - from)
      d.digest(dig, 0, 16)
      val base = (((dig(0) & 0xFFL) << 24) | ((dig(1) & 0xFFL) << 16) |
        ((dig(2) & 0xFFL) << 8) | (dig(3) & 0xFFL)) % P
      i = 0
      while (i < numHashes) {
        val h = (base * as(i) + bs(i)) % P
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      sh += 1
    }
    mins
  }

  /** 60-bit MD5-prefix hashes of the DISTINCT k-shingles of `s` — equal to
    * `transform(array_distinct(word_ngrams(s, k)), t ->
    *   CAST(CONV(SUBSTRING(MD5(t), 1, 15), 16, 10) AS BIGINT))`
    * (the first 15 hex digits of the digest are its top 60 bits, always
    * non-negative), in one allocation-light pass over the document bytes:
    * shingles are hashed as byte RANGES (see the tokenization note above),
    * so neither the ngram strings nor the hex digest strings are ever
    * materialized. Dedup is by the 60-bit value itself — the
    * [[simhashText]] digest-prefix discipline (two distinct shingles
    * colliding needs 2^-60; the differential oracle hash-checks every
    * consumer) — in first-occurrence order, matching `array_distinct`. */
  def shingleHash60(s: UTF8String, k: Int): Array[Long] = {
    val b = s.getBytes
    val (starts, ends) = tokenBounds(b)
    val nTok = starts.length
    val d = md.get()
    val nShingles = math.max(nTok - k, 0) + 1
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val dig = digBuf.get()
    var sh = 0
    while (sh < nShingles) {
      val from = starts(sh)
      val to = ends(math.min(sh + k - 1, nTok - 1))
      d.reset()
      d.update(b, from, to - from)
      d.digest(dig, 0, 16)
      var h = 0L
      var i = 0
      while (i < 7) { h = (h << 8) | (dig(i) & 0xFFL); i += 1 }
      h = (h << 4) | ((dig(7) & 0xF0L) >>> 4)
      seen.add(h)
      sh += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    out
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken): hash every
    * character k-gram (md5 32-bit prefix — the cross-engine family), slide
    * a w-window over the hash sequence, keep each window's MINIMUM, return
    * the document's distinct kept values sorted. For texts shorter than k
    * the whole text is one gram; for fewer than w grams the single window
    * is the full sequence. Replayable in SQL as a ROWS-frame window MIN
    * over positional k-gram hashes. */
  def winnowFingerprints(s: UTF8String, k: Int, w: Int): Array[Long] = {
    val b = s.getBytes
    val d = md.get()
    val dig = digBuf.get()
    val nGrams = math.max(b.length - k + 1, 1)
    val h = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      d.reset()
      d.update(b, i, math.min(k, b.length - i))
      d.digest(dig, 0, 16)
      h(i) = ((dig(0) & 0xFFL) << 24) | ((dig(1) & 0xFFL) << 16) |
        ((dig(2) & 0xFFL) << 8) | (dig(3) & 0xFFL)
      i += 1
    }
    // distinct sorted kept minima WITHOUT a boxing TreeSet: collect the
    // window minima into a primitive array, sort, dedup in place
    val lastStart = math.max(nGrams - w, 0)
    val kept = new Array[Long](lastStart + 1)
    var p = 0
    while (p <= lastStart) {
      var m = Long.MaxValue
      var j = p
      val end = math.min(p + w, nGrams)
      while (j < end) { if (h(j) < m) m = h(j); j += 1 }
      kept(p) = m
      p += 1
    }
    java.util.Arrays.sort(kept)
    var n = 0
    var r = 0
    while (r < kept.length) {
      if (r == 0 || kept(r) != kept(r - 1)) { kept(n) = kept(r); n += 1 }
      r += 1
    }
    if (n == kept.length) kept else java.util.Arrays.copyOf(kept, n)
  }

  /** SimHash64 over the DISTINCT tokens of `s` — equal to [[SimHash64]] on
    * `array_distinct(split(s, ' '))`, one pass, dedup by 64-bit digest
    * prefix (a collision would need 2^-64; the oracle dedups by token). */
  def simhashText(s: UTF8String): Long = {
    val b = s.getBytes
    val (starts, ends) = tokenBounds(b)
    val d = md.get()
    val dig = digBuf.get()
    val seen = new java.util.HashSet[Long]()
    val votes = new Array[Int](64)
    var t = 0
    while (t < starts.length) {
      d.reset()
      d.update(b, starts(t), ends(t) - starts(t))
      d.digest(dig, 0, 16)
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (dig(i) & 0xFFL); i += 1 }
      if (seen.add(h)) {
        var j = 0
        while (j < 64) {
          votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      t += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  /** Word k-gram array of `s`, bit-identical to the composed
    * `transform(sequence(0, greatest(size(split(s,' ')) - k, 0)),
    *   i -> concat_ws(' ', slice(split(s,' '), i + 1, k)))`
    * formulation (single-space split keeping empty tokens; one truncated
    * window when the text is shorter than k tokens) — but evaluated in one
    * generated-code call instead of Spark's interpreted higher-order
    * lambdas, which measured ~10× slower per corpus scan. */
  /** Non-overlapping k-token lines of `s` (ceil(n/k) lines, the last one
    * truncated) — the [[graft.operators.LineDedup]] line cutting as one
    * generated-code call; `split("")` yields one empty token, so every
    * text carries at least one line, matching the composed formulation. */
  def wordLines(s: UTF8String, k: Int): Array[UTF8String] = {
    val toks = s.toString.split(" ", -1)
    val n = toks.length
    val out = new Array[UTF8String]((n + k - 1) / k)
    var i = 0
    while (i < out.length) {
      val start = i * k
      val end = math.min(start + k, n)
      val sb = new java.lang.StringBuilder
      var j = start
      while (j < end) {
        if (j > start) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    out
  }

  def wordNgrams(s: UTF8String, k: Int): Array[UTF8String] = {
    val str = s.toString
    val toks = str.split(" ", -1)
    val n = toks.length
    val out = new Array[UTF8String](math.max(n - k, 0) + 1)
    var i = 0
    while (i < out.length) {
      val end = math.min(i + k, n)
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    out
  }
}
