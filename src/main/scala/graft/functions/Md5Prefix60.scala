package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst form of the engine's 60-bit hash primitive
  * (`TextOps.hash60`): the first 60 bits of md5 as a non-negative
  * Long. Semantically IDENTICAL to the composed
  * `conv(substring(md5(s), 1, 15), 16, 10)` — the first 15 hex chars
  * are the digest's top 7.5 bytes, i.e. the top 60 bits — so every
  * DuckDB oracle (`('0x'||substr(md5(s),1,15))::BIGINT`) still
  * hash-matches. The native form skips the composed chain's overhead
  * on the hottest map kernel of the llmops family (shingle hashing in
  * q41-q44/q52/q57 touches every n-gram of a 100 TB corpus): no
  * 32-char hex string materialization, no UTF8String allocation, no
  * base-16 string re-parse — digest bytes to Long directly, inside
  * whole-stage codegen.
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hash60 requires STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "hash60"

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix60.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5Prefix60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : Md5Prefix60 = copy(child = newChild)
}

object Md5Prefix60 {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static kernel invoked from generated code: top 60 bits of the
    * 128-bit digest = big-endian bytes 0..7 shifted right 4 (unsigned:
    * the top nibble of the result is always 0, so the Long is
    * non-negative — same range as the hex-prefix parse). */
  def compute(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    acc >>> 4
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[Md5Prefix60].getName, "hash60")

  def builder(children: Seq[Expression]): Expression = {
    require(children.length == 1,
      s"hash60 expects 1 argument, got ${children.length}")
    Md5Prefix60(children.head)
  }
}
