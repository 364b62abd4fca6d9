package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType,
  LongType}

/** Native single-pass SimHash fold: given a document's token-hash
  * array, returns the nBits-bit simhash (bit j set iff
  * Σ_tokens ±1 per bit j of hash > 0).
  *
  * Semantically IDENTICAL to the composed per-bit HOF form
  * (`TextOps.simhashNComposed`, pinned bit-for-bit by PropertySpec) —
  * but the composed form evaluates nBits separate `aggregate` lambdas,
  * i.e. nBits interpreted traversals of the hash array per row; this
  * kernel is ONE tight JVM loop with shift/mask ops inside whole-stage
  * codegen. On the 100 TB map stage of the dedup family (every token
  * of every document) that constant matters: the 60-bit scale variant
  * (q77) pays 60 traversals composed vs 1 here. */
case class SimhashFold(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == ArrayType(LongType, containsNull = false) ||
      left.dataType == ArrayType(LongType, containsNull = true))
      if (right.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"simhash_fold nBits must be INT, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_fold requires ARRAY<BIGINT> input, got ${left.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_fold"

  override protected def nullSafeEval(arr: Any, bits: Any): Any =
    SimhashFold.compute(arr.asInstanceOf[ArrayData],
      bits.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SimhashFold.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SimhashFold =
    copy(left = newLeft, right = newRight)
}

object SimhashFold {

  /** Static kernel invoked from generated code: one traversal of the
    * hash array, per-bit counters on the stack, sign fold at the end.
    * Null array elements (impossible for hash60 outputs, tolerated
    * for safety) count as zero-hash tokens. */
  def compute(arr: ArrayData, nBits: Int): Long = {
    val n = arr.numElements()
    val counters = new Array[Int](nBits)
    var i = 0
    while (i < n) {
      val h = if (arr.isNullAt(i)) 0L else arr.getLong(i)
      var j = 0
      while (j < nBits) {
        counters(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var acc = 0L
    var j = 0
    while (j < nBits) {
      if (counters(j) > 0) acc |= (1L << j)
      j += 1
    }
    acc
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SimhashFold].getName, "simhash_fold")

  def builder(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      s"simhash_fold expects 2 arguments, got ${children.length}")
    SimhashFold(children.head, children(1))
  }
}
