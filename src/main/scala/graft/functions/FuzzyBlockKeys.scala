package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All `pieces` fuzzy-blocking keys of a string in ONE byte scan per key —
  * the composed form (`pieces` × (`pieces`-1) substr + hash expressions)
  * costs ~µs/row in allocation and expression dispatch, which dominated
  * the fuzzy join's candidate stage. Key `skip` hashes length, `skip`,
  * and every byte OUTSIDE piece `skip` (boundaries by integer division,
  * identical to the SQL form): equal-outside-the-piece strings get equal
  * keys, so blocking completeness is untouched. A hash collision adds
  * candidates the downstream filters remove: the length-equality filter
  * in [[graft.operators.FuzzyJoin]] catches colliding different-length
  * pairs (which could otherwise pass `dist <= 1` via an insert/delete),
  * and the edit-distance filter catches the same-length rest.
  *
  * Join-key-internal only — the differential oracle blocks with its own
  * (result-equivalent) SQL scheme, so this hash never needs cross-engine
  * replay. */
object FuzzyUtils {

  def blockKeys(s: UTF8String, pieces: Int): Array[Long] = {
    val b = s.getBytes
    val n = b.length
    val out = new Array[Long](pieces)
    var skip = 0
    while (skip < pieces) {
      val lo = n * skip / pieces
      val hi = n * (skip + 1) / pieces
      var h = 1125899906842597L + n * 31L + skip
      var i = 0
      while (i < n) {
        if (i < lo || i >= hi) h = h * 31L + (b(i) & 0xffL)
        i += 1
      }
      out(skip) = h
      skip += 1
    }
    out
  }
}

case class FuzzyBlockKeys(child: Expression, pieces: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "fuzzy_block_keys"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(FuzzyUtils.blockKeys(input.asInstanceOf[UTF8String], pieces))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.FuzzyUtils.blockKeys($v, $pieces));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): FuzzyBlockKeys =
    copy(child = newChild)
}
