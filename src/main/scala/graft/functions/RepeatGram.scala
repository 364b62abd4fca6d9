package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType,
  LongType, StringType}

/** Native within-document repetition probe (the Gopher/RefinedWeb
  * repeated-n-gram rule family): given a token array and a max gram
  * size, returns `[max_rep_n, n_reps]` — the LARGEST n ≤ maxN for
  * which some n-gram occurs at least twice in the document (positions
  * may overlap), and the occurrence count of the most-repeated n-gram
  * at that n. `[0, 0]` when nothing repeats.
  *
  * This is a PER-ROW statistic, so the 100 TB shape is a narrow
  * projection — no explode, no shuffle; the exploded
  * groupBy(doc, n, gram) formulation would shuffle maxN× every token
  * of the corpus to compute a number each row already contains. Grams
  * are counted by their exact string (token run joined by one space,
  * matching the engine-wide shingle convention), so counts are
  * collision-free and any SQL engine reproduces them verbatim.
  * Scans n from maxN down and stops at the first n with a repeat —
  * the spammiest documents (the ones a gate exists for) exit after
  * one pass. */
case class RepeatGram(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != ArrayType(StringType, containsNull = false) &&
      left.dataType != ArrayType(StringType, containsNull = true))
      TypeCheckResult.TypeCheckFailure(
        s"repeat_gram requires ARRAY<STRING>, got ${left.dataType.sql}")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "repeat_gram max gram size must be a literal INT")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def prettyName: String = "repeat_gram"

  override protected def nullSafeEval(tokens: Any, maxN: Any): Any =
    RepeatGram.compute(tokens.asInstanceOf[ArrayData],
      maxN.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, n) => s"graft.functions.RepeatGram.compute($t, $n)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): RepeatGram =
    copy(left = newLeft, right = newRight)
}

object RepeatGram {

  /** Static kernel invoked from generated code. One HashMap pass per
    * gram size, largest size first, early exit on the first size with
    * a repeat. Null tokens (impossible for `split` output) count as
    * empty strings. */
  def compute(tokens: ArrayData, maxN: Int): ArrayData = {
    val m = tokens.numElements()
    val toks = new Array[String](m)
    var i = 0
    while (i < m) {
      toks(i) =
        if (tokens.isNullAt(i)) ""
        else tokens.getUTF8String(i).toString
      i += 1
    }
    var n = math.min(maxN, m)
    while (n >= 1) {
      // a repeat at size n needs at least n+1 tokens only when grams
      // cannot overlap — overlapping occurrences make n == m possible
      // only for... m >= n+1 always, since two distinct start
      // positions are required
      if (m - n >= 1) {
        val counts = new java.util.HashMap[String, Int](2 * (m - n + 1))
        var best = 1
        val sb = new java.lang.StringBuilder
        var p = 0
        while (p <= m - n) {
          sb.setLength(0)
          var k = 0
          while (k < n) {
            if (k > 0) sb.append(' ')
            sb.append(toks(p + k))
            k += 1
          }
          val g = sb.toString
          val c = counts.merge(g, 1, (a, b) => a + b)
          if (c > best) best = c
          p += 1
        }
        if (best >= 2)
          return new GenericArrayData(Array(n.toLong, best.toLong))
      }
      n -= 1
    }
    new GenericArrayData(Array(0L, 0L))
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[RepeatGram].getName, "repeat_gram")

  def builder(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      s"repeat_gram expects 2 arguments, got ${children.length}")
    RepeatGram(children.head, children(1))
  }
}
