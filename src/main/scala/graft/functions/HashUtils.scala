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

  /** First 4 digest bytes as an unsigned value in [0, 2^32). */
  def md5Prefix32(s: UTF8String): Long = {
    val d = md.get(); d.reset()
    val b = d.digest(s.getBytes)
    ((b(0) & 0xFFL) << 24) | ((b(1) & 0xFFL) << 16) | ((b(2) & 0xFFL) << 8) | (b(3) & 0xFFL)
  }

  /** First 8 digest bytes as a signed long (the 64-bit pattern). */
  def md5Prefix64(s: UTF8String): Long = {
    val d = md.get(); d.reset()
    val b = d.digest(s.getBytes)
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
    val as = new Array[Long](numHashes)
    val bs = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) { as(i) = minhashA(i); bs(i) = minhashB(i); i += 1 }
    val nShingles = math.max(nTok - k, 0) + 1
    var sh = 0
    while (sh < nShingles) {
      val from = starts(sh)
      val to = ends(math.min(sh + k - 1, nTok - 1))
      d.reset()
      d.update(b, from, to - from)
      val dig = d.digest()
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
    val nGrams = math.max(b.length - k + 1, 1)
    val h = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      d.reset()
      d.update(b, i, math.min(k, b.length - i))
      val dig = d.digest()
      h(i) = ((dig(0) & 0xFFL) << 24) | ((dig(1) & 0xFFL) << 16) |
        ((dig(2) & 0xFFL) << 8) | (dig(3) & 0xFFL)
      i += 1
    }
    val kept = new java.util.TreeSet[java.lang.Long]()
    val lastStart = math.max(nGrams - w, 0)
    var p = 0
    while (p <= lastStart) {
      var m = Long.MaxValue
      var j = p
      val end = math.min(p + w, nGrams)
      while (j < end) { if (h(j) < m) m = h(j); j += 1 }
      kept.add(m)
      p += 1
    }
    val out = new Array[Long](kept.size)
    val it = kept.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    out
  }

  /** SimHash64 over the DISTINCT tokens of `s` — equal to [[SimHash64]] on
    * `array_distinct(split(s, ' '))`, one pass, dedup by 64-bit digest
    * prefix (a collision would need 2^-64; the oracle dedups by token). */
  def simhashText(s: UTF8String): Long = {
    val b = s.getBytes
    val (starts, ends) = tokenBounds(b)
    val d = md.get()
    val seen = new java.util.HashSet[Long]()
    val votes = new Array[Int](64)
    var t = 0
    while (t < starts.length) {
      d.reset()
      d.update(b, starts(t), ends(t) - starts(t))
      val dig = d.digest()
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
