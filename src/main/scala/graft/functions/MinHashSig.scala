package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Whole-document MinHash signature in ONE fused pass over the token array:
  * for every w-token shingle, md5 digests `"g:" || shingle` for each digest
  * group g and folds the per-slot 32-bit minimums — emitting the complete
  * `numHashes`-slot signature as `array<long>` per document.
  *
  * Replaces the explode(shingles) → md5-hex projection → 8×substring/parse →
  * groupBy(min×8) pipeline: the shingle ROWS never materialize (a sf0.1 run
  * explodes 250k of them), the hex round-trip disappears (digest bytes are
  * sliced directly), and — the scale win — the signature needs NO shuffle at
  * all: it is a narrow per-row projection, so only LSH banding's candidate
  * self-join exchanges data. Duplicate shingles can't change a minimum, so
  * the explode-path's array_distinct is unnecessary here.
  *
  * Byte-identical to the former formulation (and to the DuckDB oracle SQL):
  * slot s = min over shingles of the s%4-th 8-hex-char slice of
  * md5((s/4) || ":" || shingle), shingles being w consecutive tokens joined
  * by a single space (whole text when fewer than w tokens).
  */
case class MinHashSig(child: Expression, w: Int, numHashes: Int)
    extends UnaryExpression with Serializable {
  require(w > 0 && numHashes > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], w, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinHashSig.compute($a, $w, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  private val Space: Byte = ' '.toByte

  /** Hot-path entry (also called from generated code). One MessageDigest per
    * invocation (= per row), reset across shingles/groups. */
  def compute(tokens: ArrayData, w: Int, numHashes: Int): ArrayData = {
    val nTok = tokens.numElements()
    val nDigests = (numHashes + 3) / 4
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    val tokenBytes = new Array[Array[Byte]](nTok)
    var i = 0
    while (i < nTok) { tokenBytes(i) = tokens.getUTF8String(i).getBytes; i += 1 }
    val prefixes = Array.tabulate(nDigests)(g =>
      (g.toString + ":").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // n >= w: one shingle per start position; else ONE shingle = whole text
    // (matching the explode-path's short-document fallback).
    val shingleLen = if (nTok >= w) w else nTok
    val nShingles = if (nTok >= w) nTok - w + 1 else 1
    var s = 0
    while (s < nShingles) {
      var g = 0
      while (g < nDigests) {
        md.reset()
        md.update(prefixes(g))
        var j = 0
        while (j < shingleLen) {
          if (j > 0) md.update(Space)
          md.update(tokenBytes(s + j))
          j += 1
        }
        val dig = md.digest()
        // 8-hex-char slice k of the digest == unsigned big-endian int of
        // bytes [4k, 4k+4) — no hex string ever built.
        val maxK = math.min(4, numHashes - g * 4)
        var k = 0
        while (k < maxK) {
          val o = k * 4
          val v = ((dig(o) & 0xffL) << 24) | ((dig(o + 1) & 0xffL) << 16) |
            ((dig(o + 2) & 0xffL) << 8) | (dig(o + 3) & 0xffL)
          val slot = g * 4 + k
          if (v < mins(slot)) mins(slot) = v
          k += 1
        }
        g += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }

  def minhashSig(tokens: Column, w: Int, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(tokens), w, numHashes))
}
