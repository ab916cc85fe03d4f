package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit SimHash of a token array as a native Catalyst expression.
  *
  * Per token: a Murmur3 hash (computed directly on the UTF8String bytes — no
  * copies); each of the 32 hash bits votes ±1; the fingerprint sets bit j
  * where the vote sum is positive. Near-duplicate documents land at small
  * Hamming distance. One fused loop per row replaces the 32
  * `aggregate()` higher-order passes of the composable formulation
  * (measured ~100× faster at bench scale).
  */
case class SimHash(child: Expression) extends UnaryExpression with Serializable {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](32)
    var t = 0
    val n = arr.numElements()
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val s = arr.getUTF8String(t)
        val h = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), SimHash.Seed)
        var j = 0
        while (j < 32) {
          votes(j) += (if (((h >>> j) & 1) == 1) 1 else -1)
          j += 1
        }
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    java.lang.Long.valueOf(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
        int[] $votes = new int[32];
        int $n = $a.numElements();
        for (int $t = 0; $t < $n; $t++) {
          if (!$a.isNullAt($t)) {
            UTF8String $s = $a.getUTF8String($t);
            int $h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
              $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), ${SimHash.Seed});
            for (int $j = 0; $j < 32; $j++) {
              $votes[$j] += ((($h >>> $j) & 1) == 1) ? 1 : -1;
            }
          }
        }
        long $out = 0L;
        for (int $j = 0; $j < 32; $j++) {
          if ($votes[$j] > 0) $out |= (1L << $j);
        }
        ${ev.value} = $out;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash {
  val Seed: Int = 42
}

/** Rabin-Karp rolling hashes of every `k`-byte window of a string — the
  * basis of winnowing-style document fingerprinting. One O(n) pass per row
  * (the naive recompute is O(n·k)); generated code keeps the loop primitive.
  * Output: array<long>, one hash per window start (empty if the text is
  * shorter than k bytes). Arithmetic is 64-bit wraparound with base
  * [[RollingHash.Base]] — deterministic on any JVM.
  */
case class RollingHash(child: Expression, k: Int) extends UnaryExpression with Serializable {
  require(k > 0, s"window size must be positive, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length - k + 1
    if (n <= 0) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val out = new Array[Long](n)
    // B^(k-1) for removing the outgoing byte
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= RollingHash.Base; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * RollingHash.Base + (bytes(i) & 0xffL); i += 1 }
    out(0) = h
    i = 1
    while (i < n) {
      h = (h - (bytes(i - 1) & 0xffL) * pow) * RollingHash.Base + (bytes(i + k - 1) & 0xffL)
      out(i) = h
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val pow = ctx.freshName("pow")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
        byte[] $bytes = $a.getBytes();
        int $n = $bytes.length - $k + 1;
        if ($n <= 0) {
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
        } else {
          long[] $out = new long[$n];
          long $pow = 1L;
          for (int $i = 0; $i < $k - 1; $i++) $pow *= ${RollingHash.Base}L;
          long $h = 0L;
          for (int $i = 0; $i < $k; $i++) $h = $h * ${RollingHash.Base}L + ($bytes[$i] & 0xffL);
          $out[0] = $h;
          for (int $i = 1; $i < $n; $i++) {
            $h = ($h - ($bytes[$i - 1] & 0xffL) * $pow) * ${RollingHash.Base}L + ($bytes[$i + $k - 1] & 0xffL);
            $out[$i] = $h;
          }
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  val Base: Long = 1000003L
}

object TextExpressions {
  /** Column wrapper: 32-bit simhash of an `array<string>` token column. */
  def simhash32(tokens: Column): Column =
    ColumnBridge.column(SimHash(ColumnBridge.expression(tokens)))

  /** Column wrapper: rolling k-byte-window hashes of a string column. */
  def rollingHash(text: Column, k: Int): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(text), k))
}
