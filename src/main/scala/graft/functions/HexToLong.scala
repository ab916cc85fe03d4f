package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Parse a (≤15-char) lowercase-hex string to a long.
  *
  * Replaces `conv(hex, 16, 10).cast("long")` in the MinHash hot path:
  * `Conv` routes through NumberConverter's generic radix machinery with
  * per-call allocations (measured ~40 µs/row across the 8 signature slots);
  * this is a branch-free digit loop in generated code. Invalid digits yield
  * null (matching conv's garbage-in behavior closely enough for digests,
  * which are always clean hex).
  */
case class HexToLong(child: Expression) extends UnaryExpression with Serializable {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // null on malformed hex
  override def prettyName: String = "hex_to_long"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    if (n == 0 || n > 15) return null
    var out = 0L
    var i = 0
    while (i < n) {
      val c = s.getByte(i)
      val d =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else return null
      out = (out << 4) | d
      i += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val bad = ctx.freshName("bad")
      val acc = ctx.freshName("acc")
      s"""
        int $n = $a.numBytes();
        boolean $bad = ($n == 0 || $n > 15);
        long $acc = 0L;
        for (int $i = 0; $i < $n && !$bad; $i++) {
          byte $c = $a.getByte($i);
          int $d;
          if ($c >= '0' && $c <= '9') $d = $c - '0';
          else if ($c >= 'a' && $c <= 'f') $d = $c - 'a' + 10;
          else if ($c >= 'A' && $c <= 'F') $d = $c - 'A' + 10;
          else { $d = 0; $bad = true; }
          $acc = ($acc << 4) | $d;
        }
        if ($bad) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $acc;
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HexToLong {
  def hexToLong(c: Column): Column = ColumnBridge.column(HexToLong(ColumnBridge.expression(c)))
}
