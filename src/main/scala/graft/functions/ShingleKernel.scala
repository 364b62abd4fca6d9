package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType,
  LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass shingle-hash kernel: given a document's token
  * array and a gram size n, returns the DISTINCT hash60 values of its
  * word n-grams, in first-occurrence order.
  *
  * Semantically IDENTICAL to the composed chain
  * `array_distinct(transform(arrayShingles(tokens, n), g => hash60(g)))`
  * (PropertySpec pins the equivalence) — the n-gram string is the
  * space-joined token run, hashed with the same md5-prefix primitive
  * ([[Md5Prefix60]]), and `array_distinct` keeps first occurrences in
  * order exactly as the insertion-ordered dedup here does. The composed
  * form pays three interpreted higher-order passes per row (zip_with
  * shingling, transform-md5, array_distinct) and — because HOF
  * expressions are CodegenFallback and excluded from subexpression
  * elimination — gets RE-EVALUATED once per consumer when an optimizer
  * collapse duplicates it (the q43 banding regression: 4 MinHash slots
  * × the full md5 chain). This kernel is one tight JVM loop inside
  * whole-stage codegen, and being codegen-capable it is CSE-eligible,
  * so a collapsed projection evaluates it ONCE however many consumers
  * reference it.
  *
  * The md5 update runs incrementally over token bytes + a single 0x20
  * separator — the shingle string itself is never materialized. On the
  * 100 TB map stage (every n-gram of every document in q41/q43/q52/
  * q72/q126) this constant is the whole game.
  */
case class ShingleHash60(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != ArrayType(StringType, containsNull = false) &&
      left.dataType != ArrayType(StringType, containsNull = true))
      TypeCheckResult.TypeCheckFailure(
        s"shingle_hash60 requires ARRAY<STRING>, got ${left.dataType.sql}")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "shingle_hash60 gram size must be a literal INT")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash60"

  override protected def nullSafeEval(tokens: Any, n: Any): Any =
    ShingleHash60.compute(tokens.asInstanceOf[ArrayData],
      n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, n) => s"graft.functions.ShingleHash60.compute($t, $n)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ShingleHash60 =
    copy(left = newLeft, right = newRight)
}

object ShingleHash60 {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val space = Array[Byte](' ')

  /** Static kernel invoked from generated code: for each n-gram
    * position, feed the token bytes + single-space separators into md5
    * incrementally, fold the digest's top 60 bits to a Long
    * (Md5Prefix60 convention), and dedupe preserving first-occurrence
    * order. Null tokens are impossible for `split` output but hash as
    * empty strings for safety (matches concat's null-propagation only
    * in never-taken paths). Fewer than n tokens → empty array. */
  def compute(tokens: ArrayData, n: Int): ArrayData =
    computeImpl(tokens, n, dedup = true)

  /** [[compute]] without the dedup — one hash PER POSITION, index i
    * of the result = the gram starting at token i (the positional
    * form the duplicated-span extractor consumes). */
  def computeAll(tokens: ArrayData, n: Int): ArrayData =
    computeImpl(tokens, n, dedup = false)

  private def computeImpl(tokens: ArrayData, n: Int,
      dedup: Boolean): ArrayData = {
    val m = tokens.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val md = digests.get()
    val out = new scala.collection.mutable.ArrayBuffer[Long](m - n + 1)
    val seen =
      if (dedup) new java.util.HashSet[java.lang.Long](2 * (m - n + 1))
      else null
    var i = 0
    while (i <= m - n) {
      md.reset()
      var k = 0
      while (k < n) {
        if (k > 0) md.update(space)
        if (!tokens.isNullAt(i + k))
          md.update(tokens.getUTF8String(i + k).getBytes)
        k += 1
      }
      val d = md.digest()
      var acc = 0L
      var b = 0
      while (b < 8) { acc = (acc << 8) | (d(b) & 0xffL); b += 1 }
      val h = acc >>> 4
      if (seen == null || seen.add(h)) out += h
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[ShingleHash60].getName, "shingle_hash60")

  def builder(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      s"shingle_hash60 expects 2 arguments, got ${children.length}")
    ShingleHash60(children.head, children(1))
  }
}

/** Positional sibling of [[ShingleHash60]]: NO dedup — element i is
  * the hash of the n-gram starting at token i, so `posexplode` over
  * the result yields (position, gram-hash) pairs. Same incremental-md5
  * kernel, same codegen/CSE properties. */
case class ShingleHashAll60(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != ArrayType(StringType, containsNull = false) &&
      left.dataType != ArrayType(StringType, containsNull = true))
      TypeCheckResult.TypeCheckFailure(
        s"shingle_hash60_all requires ARRAY<STRING>, got ${left.dataType.sql}")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "shingle_hash60_all gram size must be a literal INT")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash60_all"

  override protected def nullSafeEval(tokens: Any, n: Any): Any =
    ShingleHash60.computeAll(tokens.asInstanceOf[ArrayData],
      n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, n) => s"graft.functions.ShingleHash60.computeAll($t, $n)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ShingleHashAll60 =
    copy(left = newLeft, right = newRight)
}

object ShingleHashAll60 {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[ShingleHashAll60].getName, "shingle_hash60_all")

  def builder(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      s"shingle_hash60_all expects 2 arguments, got ${children.length}")
    ShingleHashAll60(children.head, children(1))
  }
}

/** Native single-pass MinHash fold: given a shingle-hash array,
  * returns ALL k signature slots (min over the affine maps
  * h_i(x) = (a_i·(x mod p) + b_i) mod p for the engine's fixed
  * permutation set, p = 2^31−1) as one ARRAY<BIGINT> — one traversal
  * instead of k interpreted `transform`+`array_min` passes, inside
  * whole-stage codegen and therefore CSE-deduped when a collapsed
  * projection references the signature array once per slot.
  * Empty input yields an all-null array, matching `array_min(empty)`
  * slot-by-slot in the composed form (PropertySpec pins equality). */
case class MinhashSlots(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == ArrayType(LongType, containsNull = false) ||
      child.dataType == ArrayType(LongType, containsNull = true))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_slots requires ARRAY<BIGINT>, got ${child.dataType.sql}")

  override def dataType: DataType =
    ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_slots"

  override protected def nullSafeEval(arr: Any): Any =
    MinhashSlots.compute(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinhashSlots.compute($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : MinhashSlots = copy(child = newChild)
}

object MinhashSlots {

  /** Mirror of TextOps.MinHashPerms/MinHashP — duplicated as plain
    * arrays so generated code touches no Scala collections. The
    * PropertySpec equivalence pin breaks if either side drifts. */
  private val P = 2147483647L
  private val A = Array(1299721L, 15485863L, 32452843L, 49979687L)
  private val B = Array(11L, 101L, 1009L, 10007L)

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val mins = Array(Long.MaxValue, Long.MaxValue, Long.MaxValue,
      Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val xm = arr.getLong(i) % P
        var j = 0
        while (j < 4) {
          val h = (A(j) * xm + B(j)) % P
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    // empty AND all-null inputs both yield all-null slots — array_min
    // ignores null elements and returns null over none, so the
    // composed-form parity holds for every admissible input, not just
    // the containsNull=false arrays shingle_hash60 produces
    if (!any)
      return new GenericArrayData(Array[Any](null, null, null, null))
    new GenericArrayData(mins)
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MinhashSlots].getName, "minhash_slots")

  def builder(children: Seq[Expression]): Expression = {
    require(children.length == 1,
      s"minhash_slots expects 1 argument, got ${children.length}")
    MinhashSlots(children.head)
  }
}
