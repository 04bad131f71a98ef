package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** ANN expressions that carry their constant vector sets (hyperplanes,
  * centroids) as expression-held arrays rather than plan literals.
  *
  * Why: composing these from built-ins embeds bits×dims (LSH: 1024,
  * IVF: 2×16×64) literals into the plan — Janino then compiles seconds of
  * generated code per query, and on a real cluster the bloated plan is
  * serialized to every task. Here the constants ride as codegen reference
  * objects (`ctx.addReferenceObj`): tiny generated loops, tiny plans.
  * Arithmetic matches [[FloatVectorScaledDot]] (floor(x·y·2^shift) longs),
  * so results stay bit-replayable in the DuckDB oracle, which unrolls the
  * same constants as SQL literals at its own (tiny, sf0.01) scale.
  */
trait FloatArrayExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }
}

/** 16-bit (by default) hyperplane-LSH bucket id of a float vector: bit j is
  * set iff the scaled-long dot with [[graft.operators.Similarity.hyperplane]]
  * plane j is > 0. */
case class FvecLshBucket(child: Expression, bits: Int, shift: Int)
  extends FloatArrayExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "fvec_lsh_bucket"

  @transient private lazy val planes: Array[Array[Float]] =
    Array.tabulate(bits)(j =>
      graft.operators.Similarity.hyperplane(j).map(_.toFloat).toArray)

  @transient private lazy val scale: Double = java.lang.Math.scalb(1.0, shift)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var bucket = 0L
    var j = 0
    while (j < bits) {
      val p = planes(j)
      val n = math.min(v.numElements(), p.length)
      var acc = 0L
      var i = 0
      while (i < n) {
        acc += math.floor(v.getFloat(i).toDouble * p(i).toDouble * scale).toLong
        i += 1
      }
      if (acc > 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "float[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val bucket = ctx.freshName("bucket")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val p = ctx.freshName("p")
      s"""
         |long $bucket = 0L;
         |for (int $j = 0; $j < $bits; $j++) {
         |  float[] $p = $planesRef[$j];
         |  int $n = java.lang.Math.min($v.numElements(), $p.length);
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (long) java.lang.Math.floor(
         |      (double) $v.getFloat($i) * (double) $p[$i] * ${scale}D);
         |  }
         |  if ($acc > 0) $bucket |= (1L << $j);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): FvecLshBucket =
    copy(child = newChild)
}

/** Index (0-based) of the centroid maximizing `scaledDot(v, c) - bias_c`;
  * ties resolve to the first index — matching
  * `ROW_NUMBER() OVER (ORDER BY dot DESC, idx)` = 1 in the oracle.
  *
  * With `bias = 0` (IVF assignment/probing) this is max-dot. With
  * `bias_c = scaledDot(c, c) / 2` it is Euclidean argmin (argmin ‖v-c‖² =
  * argmax (v·c - ‖c‖²/2)) — the Lloyd-iteration assignment. */
case class FvecNearestIndex(child: Expression, centroids: Array[Array[Float]], shift: Int,
                            bias: Array[Long]) extends FloatArrayExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "fvec_nearest_index"

  @transient private lazy val scale: Double = java.lang.Math.scalb(1.0, shift)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var best = Long.MinValue
    var bestIdx = 0
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      val n = math.min(v.numElements(), cen.length)
      var acc = -bias(c)
      var i = 0
      while (i < n) {
        acc += math.floor(v.getFloat(i).toDouble * cen(i).toDouble * scale).toLong
        i += 1
      }
      if (acc > best) { best = acc; bestIdx = c }
      c += 1
    }
    bestIdx
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centRef = ctx.addReferenceObj("centroids", centroids, "float[][]")
    val biasRef = ctx.addReferenceObj("bias", bias, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val best = ctx.freshName("best")
      val bestIdx = ctx.freshName("bestIdx")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val cen = ctx.freshName("cen")
      s"""
         |long $best = Long.MIN_VALUE;
         |int $bestIdx = 0;
         |for (int $c = 0; $c < $centRef.length; $c++) {
         |  float[] $cen = $centRef[$c];
         |  int $n = java.lang.Math.min($v.numElements(), $cen.length);
         |  long $acc = -$biasRef[$c];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (long) java.lang.Math.floor(
         |      (double) $v.getFloat($i) * (double) $cen[$i] * ${scale}D);
         |  }
         |  if ($acc > $best) { $best = $acc; $bestIdx = $c; }
         |}
         |${ev.value} = $bestIdx;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): FvecNearestIndex =
    copy(child = newChild)
}

/** The `nProbe` centroid indices with the largest scaled-long dots, ordered
  * by (dot desc, index asc) — the IVF probe set. Evaluated per query row
  * (a handful), so interpreted eval is fine (CodegenFallback). */
case class FvecTopProbes(child: Expression, centroids: Array[Array[Float]],
                         nProbe: Int, shift: Int)
  extends FloatArrayExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "fvec_top_probes"

  @transient private lazy val scale: Double = java.lang.Math.scalb(1.0, shift)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dots = Array.tabulate(centroids.length) { c =>
      val cen = centroids(c)
      val n = math.min(v.numElements(), cen.length)
      var acc = 0L
      var i = 0
      while (i < n) {
        acc += math.floor(v.getFloat(i).toDouble * cen(i).toDouble * scale).toLong
        i += 1
      }
      acc
    }
    val idx = (0 until centroids.length)
      .sortBy(c => (-dots(c), c))
      .take(nProbe)
    new GenericArrayData(idx.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): FvecTopProbes =
    copy(child = newChild)
}

/** PQ asymmetric-distance score: Σ_j scaledDot(query slice j, cb(j)(code_j)).
  * The m×k×sub codebooks ride as ONE reference object — the composed
  * alternative (element_at over nested literal arrays per subspace) embeds
  * m·k·sub float literals in the plan, which is exactly the plan-bloat
  * this file exists to avoid. Arithmetic matches [[FloatVectorScaledDot]]
  * so the score replays in the DuckDB oracle. */
case class PqAdcScore(left: Expression, right: Expression,
                      codebooks: Array[Array[Array[Float]]], shift: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc_score"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<int>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  @transient private lazy val scale: Double = java.lang.Math.scalb(1.0, shift)
  private def sub: Int = codebooks(0)(0).length

  override def nullSafeEval(q: Any, c: Any): Any = {
    val qv = q.asInstanceOf[ArrayData]
    val codes = c.asInstanceOf[ArrayData]
    var acc = 0L
    var j = 0
    val m = codebooks.length
    while (j < m && j < codes.numElements()) {
      val cen = codebooks(j)(codes.getInt(j))
      val off = j * sub
      var i = 0
      while (i < sub && off + i < qv.numElements()) {
        acc += math.floor(qv.getFloat(off + i).toDouble * cen(i).toDouble * scale).toLong
        i += 1
      }
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
    nullSafeCodeGen(ctx, ev, (q, c) => {
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val cen = ctx.freshName("cen")
      val off = ctx.freshName("off")
      s"""
         |long $acc = 0L;
         |for (int $j = 0; $j < $cbRef.length && $j < $c.numElements(); $j++) {
         |  float[] $cen = $cbRef[$j][$c.getInt($j)];
         |  int $off = $j * ${sub};
         |  for (int $i = 0; $i < ${sub} && $off + $i < $q.numElements(); $i++) {
         |    $acc += (long) java.lang.Math.floor(
         |      (double) $q.getFloat($off + $i) * (double) $cen[$i] * ${scale}D);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}
