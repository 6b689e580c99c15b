package graft.view

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType}

/** Native bucket-routing expression: binary-search a collation key into
  * the index's bucket bounds. O(log buckets) per row with constant-size
  * generated code (one static call over a referenced bounds array) —
  * a literal when-chain would be O(buckets) comparisons per row AND
  * O(buckets) generated code, which breaks down past a few thousand
  * buckets (the realistic bucket count of a 100 TB index).
  *
  * `ids(i)` is the bucket id whose range starts at `lows(i)`; keys below
  * every bound route to `ids(0)`. Same contract as
  * [[IndexStore.bucketOf]] — spec-pinned equal.
  */
case class RangeBucket(child: Expression, ids: Array[Int],
                       lows: Array[Array[Byte]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "range_bucket"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"range_bucket expects binary, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    RangeBucket.search(ids, lows, input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("rbIds", ids, "int[]")
    val lowsRef = ctx.addReferenceObj("rbLows", lows, "byte[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.view.RangeBucket.search($idsRef, $lowsRef, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): RangeBucket =
    copy(child = newChild)
}

object RangeBucket {
  /** Unsigned-lexicographic binary search: the LAST bound at-or-below
    * `key`, else the first bucket. Called from generated code. */
  def search(ids: Array[Int], lows: Array[Array[Byte]],
             key: Array[Byte]): Int = {
    var lo = 0
    var hi = lows.length - 1
    var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (cmp(lows(mid), key) <= 0) { ans = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    if (ans < 0) ids(0) else ids(ans)
  }

  private def cmp(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < a.length && i < b.length) {
      val d = (a(i) & 0xFF) - (b(i) & 0xFF)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }
}
