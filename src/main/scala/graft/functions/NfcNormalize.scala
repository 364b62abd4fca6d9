package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression.
  *
  * Web-scraped training corpora mix precomposed ("é", U+00E9) and
  * decomposed ("e" + U+0301) forms of the same visible text; every
  * hash-keyed operator downstream (exact dedup q40, segment dedup
  * q84, shingle hashing q41-q44) treats them as different bytes
  * unless the corpus is canonicalized first, so NFC is the first map
  * of a real curation pipeline. Spark has no built-in for it (the
  * reference pipelines don't need one — their data is ASCII
  * identifiers — but a corpus engine does).
  *
  * Implementation: `java.text.Normalizer` (the JDK's implementation
  * of Unicode Standard Annex #15 — same canonical-composition
  * algorithm DuckDB's utf8proc implements, which is what lets the
  * q88 oracle hash-match cross-engine). A native `UnaryExpression`
  * rather than a Scala UDF keeps it inside whole-stage codegen: null
  * handling is inlined by `defineCodeGen`, the kernel is a static
  * call, no closure serialization or Row boxing. The
  * already-normalized fast path (`Normalizer.isNormalized` — a
  * quick-check table scan, no allocation) returns the input
  * UTF8String untouched, so the common case (ASCII and precomposed
  * text, i.e. almost every byte of a real corpus) never allocates.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : NfcNormalize = copy(child = newChild)
}

object NfcNormalize {

  /** Static kernel invoked from generated code. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[NfcNormalize].getName, "nfc_normalize")

  def builder(children: Seq[Expression]): Expression = {
    require(children.length == 1,
      s"nfc_normalize expects 1 argument, got ${children.length}")
    NfcNormalize(children.head)
  }
}
