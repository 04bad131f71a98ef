package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-row signature expressions for dedup pipelines.
  *
  * The composed-operator formulation (explode tokens → 64 vote aggregates /
  * 32 min aggregates → groupBy doc) shuffles one row per token: ~2M rows for
  * the 5k-doc fixture, unbounded at 100 TB. These expressions compute the
  * whole signature inside the row — zero explode, zero shuffle, one tight
  * generated loop — which is the textbook case for a native Expression with
  * `doGenCode` over built-in composition.
  *
  * Hash family: MD5 prefixes + LCG mixing mod 2^31-1 ([[HashUtils]]) — both
  * chosen to be exactly replayable in the DuckDB differential oracle
  * (`('0x'||substr(md5(s),1,8))::BIGINT` etc.), so MinHash/SimHash outputs
  * are fully hash-checked rather than rows-only.
  */
trait TokenArrayExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
}

trait TextExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }
}

/** MinHash signature straight from the document text — one allocation-free
  * pass ([[HashUtils.minhashTextSignature]]): byte-level tokenization +
  * shingles as byte ranges. Semantically identical to [[MinHashSignature]]
  * over `array_distinct(shingles(split(text,' ')))`, but skips the
  * interpreted HOF chain (sequence→transform→slice→concat_ws→
  * array_distinct) that dominated signature build time (~400µs/row). */
case class MinHashTextSignature(child: Expression, k: Int = 3, numHashes: Int = 32)
  extends TextExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_text_signature"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(HashUtils.minhashTextSignature(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, numHashes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val gad = classOf[GenericArrayData].getName
      s"${ev.value} = new $gad(graft.functions.HashUtils.minhashTextSignature($s, $k, $numHashes));"
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashTextSignature =
    copy(child = newChild)
}

/** 60-bit MD5-prefix hashes of the distinct k-shingles of a text column
  * ([[HashUtils.shingleHash60]]) — the containment family's shingle stream
  * head in one generated-code call. Bit-identical to the composed
  * `array_distinct(word_ngrams(text, k))` → explode →
  * `CAST(CONV(SUBSTRING(MD5(s), 1, 15), 16, 10) AS BIGINT)` chain the
  * DuckDB oracle replays, minus the per-shingle ngram/hex string
  * allocations, and the explode downstream carries 8-byte longs instead of
  * shingle strings. */
case class ShingleHash60(child: Expression, k: Int = 3)
  extends TextExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash60"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(HashUtils.shingleHash60(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val gad = classOf[GenericArrayData].getName
      s"${ev.value} = new $gad(graft.functions.HashUtils.shingleHash60($s, $k));"
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHash60 =
    copy(child = newChild)
}

/** Winnowing fingerprint set of a text column ([[HashUtils
  * .winnowFingerprints]]): ascending array of the document's kept k-gram
  * hash minima — the rolling-hash document fingerprint used for
  * plagiarism-style overlap detection. */
case class WinnowFingerprints(child: Expression, k: Int = 8, w: Int = 4)
  extends TextExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(HashUtils.winnowFingerprints(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val gad = classOf[GenericArrayData].getName
      s"${ev.value} = new $gad(graft.functions.HashUtils.winnowFingerprints($s, $k, $w));"
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** Word k-gram array straight from the document text ([[HashUtils
  * .wordNgrams]]): one generated-code call replacing the interpreted
  * higher-order chain `transform(sequence(...), i -> concat_ws(' ',
  * slice(...)))`, which Spark cannot compile (HOF lambdas evaluate
  * interpreted per element — measured ~10× slower per corpus scan).
  * Bit-identical output, including the single truncated window for texts
  * shorter than k tokens, so every DuckDB oracle replays unchanged. */
case class WordNgrams(child: Expression, k: Int) extends TextExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(HashUtils.wordNgrams(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val gad = classOf[GenericArrayData].getName
      s"${ev.value} = new $gad(graft.functions.HashUtils.wordNgrams($s, $k));"
    })

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

/** Non-overlapping k-token lines ([[HashUtils.wordLines]]) — the
  * [[graft.operators.LineDedup]] cutting as a native expression;
  * `posexplode` over the result supplies the 0-based line number. */
case class WordLines(child: Expression, k: Int) extends TextExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_lines"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(HashUtils.wordLines(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val gad = classOf[GenericArrayData].getName
      s"${ev.value} = new $gad(graft.functions.HashUtils.wordLines($s, $k));"
    })

  override protected def withNewChildInternal(newChild: Expression): WordLines =
    copy(child = newChild)
}

/** SimHash64 straight from the document text ([[HashUtils.simhashText]]) —
  * distinct-token votes without materializing the token array. */
case class SimHashText(child: Expression) extends TextExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_text"

  override def nullSafeEval(input: Any): Any =
    HashUtils.simhashText(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.HashUtils.simhashText($s);")

  override protected def withNewChildInternal(newChild: Expression): SimHashText =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array: per-token 64-bit MD5 prefix, per-bit ±1
  * votes, bit j of the result set iff vote_j > 0. */
case class SimHash64(child: Expression) extends TokenArrayExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var t = 0
    val n = arr.numElements()
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val h = HashUtils.md5Prefix64(arr.getUTF8String(t))
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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.freshName("votes")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      // the Scala object's static forwarder class — Janino can't see MODULE$
      val hu = "graft.functions.HashUtils"
      s"""
         |int[] $votes = new int[64];
         |for (int $t = 0; $t < $arr.numElements(); $t++) {
         |  if (!$arr.isNullAt($t)) {
         |    long $h = $hu.md5Prefix64($arr.getUTF8String($t));
         |    for (int $j = 0; $j < 64; $j++) {
         |      $votes[$j] += ((($h >>> $j) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |long $fp = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($votes[$j] > 0) $fp |= (1L << $j);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** MinHash signature of a token/shingle array: `numHashes` slots, slot i =
  * min over tokens of ((md5_32(token) % P) * A_i + B_i) % P — the token is
  * hashed once, permutations are affine maps over the fixed-width value
  * (P = 2^31-1, [[HashUtils.minhashA]]/[[HashUtils.minhashB]]). Returns
  * array<long> with values in [0, P). */
case class MinHashSignature(child: Expression, numHashes: Int = 32)
  extends TokenArrayExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  private lazy val as: Array[Long] = Array.tabulate(numHashes)(HashUtils.minhashA)
  private lazy val bs: Array[Long] = Array.tabulate(numHashes)(HashUtils.minhashB)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var t = 0
    val n = arr.numElements()
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val base = HashUtils.md5Prefix32(arr.getUTF8String(t)) % HashUtils.P
        var i = 0
        while (i < numHashes) {
          val h = (base * as(i) + bs(i)) % HashUtils.P
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val mins = ctx.freshName("mins")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val base = ctx.freshName("base")
      val h = ctx.freshName("h")
      val gad = classOf[GenericArrayData].getName
      val hu = "graft.functions.HashUtils"
      val p = HashUtils.P
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $t = 0; $t < $arr.numElements(); $t++) {
         |  if (!$arr.isNullAt($t)) {
         |    long $base = $hu.md5Prefix32($arr.getUTF8String($t)) % ${p}L;
         |    for (int $i = 0; $i < $numHashes; $i++) {
         |      long $h = ($base * ((2654435761L * ($i + 1)) % ${p}L)
         |        + (40503L * ($i + 1) + 1) % ${p}L) % ${p}L;
         |      if ($h < $mins[$i]) $mins[$i] = $h;
         |    }
         |  }
         |}
         |${ev.value} = new $gad($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
