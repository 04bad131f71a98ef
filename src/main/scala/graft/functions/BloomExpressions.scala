package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Broadcast Bloom membership probe: the bitmap rides as a codegen
  * reference object (128 KB for 2^20 bits — far under task-serialization
  * concern), the per-row probe is one static call, and the whole filter
  * stays inside whole-stage codegen. See [[BloomUtils]] for the hash
  * family and the no-false-negative contract.
  */
case class BloomMightContain(child: Expression, bits: Array[Long],
                             numHashes: Int, mBits: Int)
  extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    BloomUtils.mightContain(bits, input.asInstanceOf[UTF8String], numHashes, mBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.BloomUtils.mightContain($bitsRef, $v, $numHashes, $mBits);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
