package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Distinct 64-bit hashes of every w-token shingle of a token array, in one
  * fused pass — the set-of-shingles representation the n-gram Jaccard
  * pipeline joins and counts on.
  *
  * Replaces transform(slice+array_join) → array_distinct → explode →
  * xxhash64: no shingle STRING is ever built (token bytes fold straight
  * into a polynomial hash with a space separator, finished with a
  * splitmix64 avalanche), and dedup happens on primitive longs. Jaccard
  * values are unchanged as long as distinct shingles of one document pair
  * don't collide in 64 bits (~shingles²/2⁶⁵ — negligible); which 64-bit
  * hash family is used is immaterial since both join sides and both size
  * counts use the same one.
  *
  * Short-document fallback matches [[graft.ext.Dedup.shingles]]: fewer than
  * w tokens hash as ONE whole-text shingle.
  */
case class ShingleHashes(child: Expression, w: Int)
    extends UnaryExpression with Serializable {
  require(w > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($a, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  private val Prime = 0x100000001B3L // FNV-ish odd multiplier for the fold

  def compute(tokens: ArrayData, w: Int): ArrayData = {
    val nTok = tokens.numElements()
    val tokenBytes = new Array[Array[Byte]](nTok)
    var i = 0
    while (i < nTok) { tokenBytes(i) = tokens.getUTF8String(i).getBytes; i += 1 }
    val shingleLen = if (nTok >= w) w else nTok
    val nShingles = if (nTok >= w) nTok - w + 1 else 1
    val out = new Array[Long](nShingles)
    var s = 0
    while (s < nShingles) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < shingleLen) {
        if (j > 0) h = h * Prime + ' '.toByte
        val tb = tokenBytes(s + j)
        var b = 0
        while (b < tb.length) { h = h * Prime + tb(b); b += 1 }
        j += 1
      }
      out(s) = MinHashMix.mix(h) // avalanche: polynomial folds alone cluster
      s += 1
    }
    // distinct on primitives: sort + dedup in place
    java.util.Arrays.sort(out)
    var uniq = 0
    i = 0
    while (i < nShingles) {
      if (i == 0 || out(i) != out(i - 1)) { out(uniq) = out(i); uniq += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, uniq))
  }

  def shingleHashes(tokens: Column, w: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(tokens), w))
}
