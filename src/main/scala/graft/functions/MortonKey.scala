package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, TernaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType}

/** `graft_morton_key(lat, lon, bits)` — native codegen'd Morton (z-order)
  * key: each coordinate quantized to a `bits`-wide cell index, the two
  * indices bit-interleaved (lon in the even bits, lat in the odd).
  *
  * Why a custom Catalyst Expression instead of the Column-composition
  * cascade it replaced (round-14 regression, root-caused in round 15):
  * the spread cascade built from ~30 built-in shift/mask Columns
  * references its quantize subtree six times per axis, which codegen's
  * subexpression elimination normally collapses — but the round-14 null
  * guard (`when(isNull, null).otherwise(cascade)`) moved the whole
  * cascade into a CaseWhen BRANCH, and conditionally-evaluated
  * subexpressions are excluded from CSE, so the generated code expanded
  * the quantize subtree dozens of times per use site: measured +75% wall
  * on p04 (0.46 s → 0.85 s solo, clean window) from janino compile time
  * and per-row re-evaluation. As one native expression the generated code
  * is a single static call, NULL propagation is the standard any-null-
  * child rule (no CaseWhen needed — the exact defect the round-14 guard
  * fixed, now structural), and the optimizer tree shrinks from ~300 nodes
  * to one.
  *
  * The scalar math is bit-identical to the replaced Column cascade (and
  * to [[ZOrder.quantizeScalar]], the driver-side twin the bbox covers are
  * built from): floor on the same double product, clamp to [0, 2^bits-1],
  * mask-shift spread. ZOrderSpec pins it against a bit-by-bit interleave
  * reference, and the p03/p04/p05 gates hash the derived keys' downstream
  * results against DuckDB recomputing the same derivation in SQL.
  */
case class MortonKey(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_morton_key"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (first.dataType != DoubleType || second.dataType != DoubleType ||
        third.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        "graft_morton_key requires (double lat, double lon, int bits), got (" +
          s"${first.dataType.catalogString}, ${second.dataType.catalogString}, " +
          s"${third.dataType.catalogString})")
    else if (!third.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_morton_key requires a literal bits argument")
    else third.eval(null) match {
      case b: Int if b >= 1 && b <= 31 => TypeCheckResult.TypeCheckSuccess
      case b => TypeCheckResult.TypeCheckFailure(
        s"graft_morton_key bits must be in [1, 31], got $b")
    }
  }

  // validated non-null in [1, 31] by checkInputDataTypes
  @transient private lazy val bits: Int = third.eval(null).asInstanceOf[Int]

  override protected def nullSafeEval(latV: Any, lonV: Any, bitsV: Any): Any =
    MortonKey.key(latV.asInstanceOf[Double], lonV.asInstanceOf[Double], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (la, lo, _) =>
      s"graft.functions.MortonKey.key($la, $lo, $bits)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): MortonKey =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object MortonKey {

  /** Spread the low 32 bits of `c` so bit i lands at bit 2i (the classic
    * mask-and-shift doubling cascade) — scalar twin of the Column cascade
    * this expression replaced. */
  def spread(c: Long): Long = {
    var x = c & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    (x | (x << 1)) & 0x5555555555555555L
  }

  /** The full key: quantize each axis with [[ZOrder.quantizeScalar]]
    * (same doubles math both engines compute), spread, interleave.
    * Called from generated code — keep it a static-forwardable method. */
  def key(lat: Double, lon: Double, bits: Int): Long = {
    val y = spread(ZOrder.quantizeScalar(lat, -90.0, 90.0, bits))
    val x = spread(ZOrder.quantizeScalar(lon, -180.0, 180.0, bits))
    (y << 1) | x
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_morton_key"),
      new ExpressionInfo(classOf[MortonKey].getName, "graft_morton_key"),
      // SQL callers may omit bits → the library default
      (children: Seq[Expression]) => children match {
        case Seq(la, lo) => MortonKey(la, lo, Literal(ZOrder.DefaultBits))
        case Seq(la, lo, b) => MortonKey(la, lo, b)
        case _ => throw new IllegalArgumentException(
          s"graft_morton_key expects 2 or 3 arguments, got ${children.size}")
      }))

  /** Per-session registration (sessions created without the extensions
    * config) — unconditional overwrite; see [[Registration]]. */
  def register(spark: SparkSession): Unit =
    Registration.register(spark, functions)
}
