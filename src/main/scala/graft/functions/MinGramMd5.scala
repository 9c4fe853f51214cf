package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_min_gram_md5(text, n)` — min over the character n-gram md5 hex
  * digests of `text`, i.e. exactly
  *
  *   array_min(transform(sequence(1, greatest(length(text)-n+1, 1)),
  *                       i -> md5(substring(text, i, n))))
  *
  * (t06's rolling fingerprint), as ONE native expression.
  *
  * Why (r20, guide §1.2 per-task work + §1.4): the HOF form is
  * CodegenFallback AND allocates per gram — a substring copy, a fresh
  * MessageDigest, a 32-char hex string — then materializes the whole
  * L-element string array just to take its minimum. Under the bench's
  * count() action the optimizer pruned the column entirely (t06 read
  * 0.05 s); the r20 noop probe exposed the real cost: 3.7 s solo at
  * sf0.1, ~all of it allocation/dispatch around L·md5. This expression
  * walks the UTF-8 bytes once (char-start offsets), reuses one
  * MessageDigest, hashes each gram's byte slice in place, keeps the
  * running minimum as raw 16-byte digests, and hex-encodes ONCE at the
  * end.
  *
  * Exactness: md5 hex strings are equal-length and lowercase-hex is a
  * monotone byte→chars map, so lexicographic order over the hex strings
  * equals unsigned-lexicographic order over the raw digests — the
  * returned value is bit-identical to the HOF form (and the DuckDB
  * oracle). Grams are CHARACTER-based like `substring`: byte slices
  * between UTF-8 char starts. length(text) < n degenerates to one gram
  * of the whole text (greatest(...,1) + substring truncation); "" hashes
  * to md5(""); null text → null. Pinned against the HOF form by
  * MinGramMd5Spec.
  */
case class MinGramMd5Expr(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_min_gram_md5 requires (string, positive int literal), got " +
        s"${child.dataType.catalogString}, n=$n")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_min_gram_md5"

  override def nullSafeEval(input: Any): Any =
    MinGramMd5.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinGramMd5.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): MinGramMd5Expr =
    copy(child = newChild)
}

object MinGramMd5 {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HexDigits = "0123456789abcdef".toCharArray

  /** See [[MinGramMd5Expr]]. Public + static-forwarded: called from
    * generated code. */
  def compute(text: UTF8String, n: Int): UTF8String = {
    val bytes = text.getBytes
    val len = bytes.length
    // char-start byte offsets (UTF-8 continuation bytes are 10xxxxxx)
    var numChars = 0
    var i = 0
    while (i < len) { if ((bytes(i) & 0xc0) != 0x80) numChars += 1; i += 1 }
    val starts = new Array[Int](numChars + 1)
    var c = 0
    i = 0
    while (i < len) {
      if ((bytes(i) & 0xc0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(numChars) = len
    val nGrams = math.max(numChars - n + 1, 1)
    val md = mdLocal.get()
    val cur = new Array[Byte](16)
    val best = new Array[Byte](16)
    var g = 0
    while (g < nGrams) {
      val from = if (numChars == 0) 0 else starts(g)
      val to = starts(math.min(g + n, numChars))
      md.reset()
      md.update(bytes, from, to - from)
      md.digest(cur, 0, 16)
      if (g == 0 || unsignedLess(cur, best)) System.arraycopy(cur, 0, best, 0, 16)
      g += 1
    }
    val hex = new Array[Byte](32)
    i = 0
    while (i < 16) {
      hex(2 * i) = HexDigits((best(i) >> 4) & 0xf).toByte
      hex(2 * i + 1) = HexDigits(best(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(hex)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var k = 0
    while (k < 16) {
      val d = (a(k) & 0xff) - (b(k) & 0xff)
      if (d != 0) return d < 0
      k += 1
    }
    false
  }
}

object TextFunctions {
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_min_gram_md5"),
      new ExpressionInfo(classOf[MinGramMd5Expr].getName, "graft_min_gram_md5"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_min_gram_md5 takes (text, n), got ${children.length} args")
        val n = children(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_min_gram_md5 gram length must be an int literal, got $other")
        }
        MinGramMd5Expr(children(0), n)
      }))

  def register(spark: SparkSession): Unit =
    Registration.register(spark, functions)
}
