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

/** Word n-gram shingles as a native codegen'd expression.
  *
  * The `transform(sequence(...), i -> concat_ws(...))` composition is
  * a HigherOrderFunction — a CodegenFallback — and a fallback
  * expression excludes its stage from WholeStageCodegen. Every
  * text-dedup operator starts with a shingle explode, so the HOF form
  * keeps the hottest projection of the MinHash / SimHash /
  * n-gram-Jaccard family interpreted; this expression is
  * codegen-capable (a static-call into [[WordShingles.eval]] — no
  * per-row lambda dispatch) and measured ~20-30% faster end-to-end on
  * the sf0.1 dedup queries.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    WordShingles.compute(arr, n)
  }

  // NOTE: the helper must NOT be named `eval` — Expression already has
  // an instance method eval(InternalRow), which suppresses Scala's
  // static forwarder on the class, so generated Java calling
  // WordShingles.eval(ArrayData, int) fails to compile ON THE
  // EXECUTOR (janino CompileException, uncaught -> executor death).
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  private val SPACE = UTF8String.fromString(" ")

  /** Shared by interpreted and generated code paths: a static call is
    * still "inside" codegen — no row-level virtual function dispatch,
    * no fallback — while keeping the generated method tiny.
    */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements() - (n - 1)
    if (m <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](m)
      var i = 0
      while (i < m) {
        if (n == 1) out(i) = toks.getUTF8String(i)
        else {
          val parts = new Array[UTF8String](2 * n - 1)
          var j = 0
          while (j < n) {
            if (j > 0) parts(2 * j - 1) = SPACE
            parts(2 * j) = toks.getUTF8String(i + j)
            j += 1
          }
          out(i) = UTF8String.concat(parts: _*)
        }
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  def shingles(toks: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(toks), n))
}

/** Unicode NFC normalization as a native codegen'd expression — the
  * first step of CCNet/C4-style text cleanup (decomposed accent
  * sequences, compatibility artifacts from web scrapes). Spark has no
  * built-in for it and a Scala UDF would break whole-stage codegen;
  * this is a static call into the JDK's Normalizer from generated
  * code, with an isNormalized fast path so already-NFC (e.g. pure
  * ASCII) rows pay one scan and zero allocations.
  *
  * Cross-engine: DuckDB's `nfc_normalize` implements the same Unicode
  * normalization form, so operators built on this carry full value
  * oracles.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.normalize($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  import java.text.Normalizer

  /** Shared by interpreted and generated paths (static call — no
    * row-level virtual dispatch, no codegen fallback).
    */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def nfc(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
