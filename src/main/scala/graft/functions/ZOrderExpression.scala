package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) value: interleaves the low `bitsPerCol` bits of the
  * children (non-negative longs, e.g. bucket indexes) into one long, so a
  * range sort on the result clusters rows that are close in EVERY key
  * dimension — the multi-dimensional clustering the reference approximates
  * with two successive full sorts (`usgs-earthquake-data-ingest-dynamic-dev
  * .py:289-292`; intent comment "z order…" `usgs-earthquake-data-ingest.py:281`).
  *
  * Children are expected pre-bucketed (see
  * [[graft.cluster.ClusterWrite.zorder]]); a null child ranks as bucket 0.
  */
case class ZOrderValue(children: Seq[Expression], bitsPerCol: Int)
    extends Expression with Serializable {
  require(children.nonEmpty && bitsPerCol * children.size <= 63,
    s"${children.size} cols × $bitsPerCol bits exceeds 63 bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "zorder"

  override def eval(input: InternalRow): Any = {
    var out = 0L
    var j = 0
    while (j < children.size) {
      val v = children(j).eval(input)
      val x = if (v == null) 0L else v.asInstanceOf[Number].longValue()
      var b = 0
      while (b < bitsPerCol) {
        out |= (((x >>> b) & 1L) << (b * children.size + j))
        b += 1
      }
      j += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val evals = children.map(_.genCode(ctx))
    val n = children.size
    val parts = evals.zipWithIndex.map { case (e, j) =>
      val x = ctx.freshName("zx")
      val b = ctx.freshName("zb")
      code"""
        ${e.code}
        long $x = ${e.isNull} ? 0L : (long) ${e.value};
        for (int $b = 0; $b < $bitsPerCol; $b++) {
          ${ev.value} |= ((($x >>> $b) & 1L) << ($b * $n + $j));
        }
      """
    }.reduce(_ + _)
    ev.copy(
      code = code"""
        long ${ev.value} = 0L;
        $parts
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object ZOrderExpression {
  /** Column wrapper: Morton value of pre-bucketed non-negative columns. */
  def zorderValue(bitsPerCol: Int, cols: Column*): Column =
    ColumnBridge.column(ZOrderValue(cols.map(ColumnBridge.expression), bitsPerCol))
}
