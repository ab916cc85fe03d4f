package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Multi-table random-hyperplane LSH buckets of a float-vector column in one
  * fused pass: for each of `tables` hash tables, `planes` sign-bits of dot
  * products against deterministic ±1 hyperplanes (precomputed sign matrix
  * from a splitmix64 stream — no stored model, reproducible everywhere).
  * Output: array<long>, one bucket id per table.
  *
  * Replaces the composable `transform`+`aggregate` formulation, which
  * evaluated an interpreted lambda per (table × plane × dimension) — ~2k
  * boxed calls per row; this is one primitive loop nest in generated code.
  */
case class LshBuckets(child: Expression, tables: Int, planes: Int, dims: Int)
    extends UnaryExpression with Serializable {
  require(tables > 0 && planes > 0 && planes <= 63 && dims > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_buckets"

  /** signs(t*planes*dims + j*dims + i) ∈ {+1, -1}. */
  @transient private lazy val signs: Array[Byte] = LshBuckets.signMatrix(tables, planes, dims)

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = math.min(vec.numElements(), dims)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var j = 0
      while (j < planes) {
        val base = (t * planes + j) * dims
        var dot = 0.0
        var i = 0
        while (i < n) {
          dot += vec.getFloat(i).toDouble * signs(base + i)
          i += 1
        }
        if (dot > 0) bucket |= (1L << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("lshSigns", signs, "byte[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket")
      val base = ctx.freshName("base")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $dims);
        long[] $out = new long[$tables];
        for (int $t = 0; $t < $tables; $t++) {
          long $bucket = 0L;
          for (int $j = 0; $j < $planes; $j++) {
            int $base = ($t * $planes + $j) * $dims;
            double $dot = 0.0;
            for (int $i = 0; $i < $n; $i++) {
              $dot += (double) $a.getFloat($i) * $signsRef[$base + $i];
            }
            if ($dot > 0) $bucket |= (1L << $j);
          }
          $out[$t] = $bucket;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBuckets {
  /** Deterministic ±1 hyperplane matrix from a splitmix64 stream. */
  def signMatrix(tables: Int, planes: Int, dims: Int): Array[Byte] = {
    val out = new Array[Byte](tables * planes * dims)
    var k = 0
    while (k < out.length) {
      out(k) = if ((MinHashMix.mix(k.toLong) & 1L) == 0L) 1 else -1
      k += 1
    }
    out
  }

  def lshBuckets(vec: Column, tables: Int, planes: Int, dims: Int): Column =
    ColumnBridge.column(LshBuckets(ColumnBridge.expression(vec), tables, planes, dims))
}

/** Shared splitmix64 finalizer (same constants as
  * [[graft.ext.MinHashAggregator.mix]], duplicated here to keep the
  * functions package free of ext dependencies). */
private[functions] object MinHashMix {
  def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
}
