package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** X4 document fingerprinting — polynomial rolling hash (Rabin-Karp
  * base-31 over UTF-8 bytes, wrapping 64-bit arithmetic) as a native
  * codegen'd expression. Complements the md5 bag-of-words fingerprint
  * in TextFns: this one is ORDER-SENSITIVE (same bytes, same hash;
  * any reorder changes it) and runs a tight primitive loop per row —
  * the fingerprint you compute over 100 TB of raw documents where
  * even md5's per-call overhead shows up.
  */
case class StringRollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any =
    StringRollingHash.hash(input.asInstanceOf[UTF8String].getBytes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bs = ctx.freshName("bs")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bs = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bs.length; $i++) {
         |  $h = $h * 31L + ($bs[$i] & 0xffL);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): StringRollingHash =
    copy(child = newChild)
}

object StringRollingHash {
  /** Reference implementation (tests compare the expression to this). */
  def hash(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + (bytes(i) & 0xffL); i += 1 }
    h
  }

  def rollingHash(c: Column): Column =
    ColumnBridge.column(StringRollingHash(ColumnBridge.expression(c)))
}
