package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string's bytes:
  * h = fold(h * 31 + byte) mod 1e9+7 — the classic Rabin-Karp-style
  * document fingerprint, order-sensitive where the bag-of-words md5
  * fingerprint is order-free.
  *
  * Native codegen expression (one tight byte loop); the modulus keeps
  * every intermediate in [0, 1e9+7) so the fold is expressible in
  * DuckDB (`list_reduce` over `ascii()` codes) for oracle parity —
  * both engines fold left over identical byte sequences (corpus is
  * ASCII; for multi-byte UTF-8, DuckDB's ascii() sees code points
  * while this sees bytes — keep oracle inputs ASCII).
  */
case class RollingHash(child: Expression, mult: Long = 31L)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  private val Mod = 1000000007L

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * mult + (bytes(i) & 0xFFL)) % Mod
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $s.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * ${mult}L + ($bytes[$i] & 0xFFL)) % ${Mod}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : RollingHash = copy(child = newChild)
}

object RollingHash {
  def rolling_hash(c: Column): Column =
    GraftShim.toColumn(RollingHash(GraftShim.toExpression(c)))

  /** Secondary-multiplier variant — the other half of PolyHash's
    * 60-bit packed token hash.
    */
  def rolling_hash(c: Column, mult: Long): Column =
    GraftShim.toColumn(RollingHash(GraftShim.toExpression(c), mult))
}
