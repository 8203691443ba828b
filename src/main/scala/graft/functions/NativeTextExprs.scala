package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot text-dedup path.
  *
  * The composable `functions._` versions in [[TextFunctions]] are correct
  * but their higher-order functions (transform/aggregate/slice) evaluate
  * interpreted, re-walking the expression tree per array element — at
  * sf0.1 that made shingling the dominant cost of every dedup operator.
  * These expressions do the same work in one tight JVM loop per row
  * (single regex split, single pass shingle assembly, fused 64-way minhash
  * fold), invoked from generated code.
  *
  * Semantics are kept bit-compatible with the HOF versions (same Java
  * `\s+` split incl. leading-empty-token behavior, same first-occurrence
  * shingle dedup, same `<n tokens → one joined shingle` edge), which the
  * DuckDB oracle parity depends on.
  */
object NativeTextExprs {
  private val Whitespace: Pattern = Pattern.compile("\\s+")

  /** trim-spaces + split, Java semantics (leading empty token preserved). */
  def splitTokens(text: UTF8String): Array[String] = {
    val s = text.toString.trim
    if (s.isEmpty) Array.empty[String]
    else Whitespace.split(s, -1)
  }

  def evalShingles(text: UTF8String, n: Int): ArrayData = {
    val toks = splitTokens(text)
    val out: Array[Any] =
      if (toks.isEmpty) {
        Array[Any](UTF8String.fromString(""))
      } else if (toks.length < n) {
        Array[Any](UTF8String.fromString(toks.mkString(" ")))
      } else {
        val seen = new java.util.LinkedHashSet[String](toks.length * 2)
        val sb = new java.lang.StringBuilder(64)
        var i = 0
        while (i <= toks.length - n) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          seen.add(sb.toString)
          i += 1
        }
        val arr = new Array[Any](seen.size)
        val it = seen.iterator()
        var k = 0
        while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
        arr
      }
    new GenericArrayData(out)
  }

  /** ALL word n-grams in document order (no dedup — array index IS the
    * 0-based start position, the contract [[WordShinglesAll]] exists for).
    * Texts with fewer than `n` tokens have no length-`n` window: empty
    * array (NOT the joined-text fallback of [[evalShingles]], whose
    * consumers are set-similarity ops where every doc needs ≥1 element).
    */
  def evalShinglesAll(text: UTF8String, n: Int): ArrayData = {
    val toks = splitTokens(text)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  // SplitMix64 — derives the per-hash-function affine constants.
  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** k-permutation MinHash over one base XXH64 per element:
    * h_i(x) = base(x) * A_i + B_i with odd A_i (2-universal family).
    */
  def evalMinHash(arr: ArrayData, k: Int): ArrayData = {
    val a = new Array[Long](k)
    val b = new Array[Long](k)
    var i = 0
    while (i < k) {
      a(i) = splitmix64(2 * i) | 1L
      b(i) = splitmix64(2 * i + 1)
      i += 1
    }
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var e = 0
    while (e < n) {
      if (!arr.isNullAt(e)) {
        val s = arr.getUTF8String(e)
        val base = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var f = 0
        while (f < k) {
          val h = base * a(f) + b(f)
          if (h < mins(f)) mins(f) = h
          f += 1
        }
      }
      e += 1
    }
    new GenericArrayData(mins) // primitive long[] constructor
  }

  /** One-pass code-point histogram, ascending code-point order. Iterating
    * by code point (not UTF-16 unit) keeps non-BMP characters as ONE
    * entry, matching a per-codepoint substring enumeration exactly.
    */
  def evalCharHist(text: UTF8String): ArrayData = {
    val s = text.toString
    val counts = new java.util.TreeMap[Integer, java.lang.Long]()
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val prev = counts.get(cp)
      counts.put(cp,
        java.lang.Long.valueOf(if (prev == null) 1L else prev.longValue + 1L))
      i += Character.charCount(cp)
    }
    val out = new Array[Any](counts.size)
    var j = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(j) = org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(new String(Character.toChars(e.getKey.intValue))),
        e.getValue.longValue)
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Per-character histogram of a text column, natively: one pass over the
  * string's Unicode CODE POINTS into a tree map, emitted as `(ch, cnt)`
  * structs — the per-character explode it replaces materialized one ROW
  * per character of corpus text before the first aggregate; this bounds
  * the fanout at the per-document alphabet (≤ ~100 for real text).
  * Entries are emitted in ascending code-point order (deterministic,
  * though the downstream aggregate is order-insensitive anyway).
  * Code-point iteration means non-BMP characters (emoji, rare CJK) count
  * as ONE entry each, matching a per-codepoint `substring` enumeration
  * on any engine — no surrogate-half divergence on non-ASCII corpora.
  */
case class CharHist(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ch", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_hist needs string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NativeTextExprs.evalCharHist(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeTextExprs.evalCharHist($c)")

  override protected def withNewChildInternal(newChild: Expression): CharHist =
    copy(child = newChild)

  override def prettyName: String = "char_hist"
}

object CharHist {
  def apply(c: Column): Column =
    GraftBridge.column(CharHist(GraftBridge.expression(c)))
}

case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles needs string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NativeTextExprs.evalShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeTextExprs.evalShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object WordShingles {
  def apply(c: Column, n: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(c), n))
}

/** Positional word n-grams of a text column, natively: element `i` is the
  * gram starting at token `i` (0-based) — `posexplode` recovers (start,
  * gram) pairs without interpreted transform/slice/concat_ws HOFs.
  */
case class WordShinglesAll(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles_all needs string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NativeTextExprs.evalShinglesAll(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeTextExprs.evalShinglesAll($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShinglesAll =
    copy(child = newChild)

  override def prettyName: String = "word_shingles_all"
}

object WordShinglesAll {
  def apply(c: Column, n: Int): Column =
    GraftBridge.column(WordShinglesAll(GraftBridge.expression(c), n))
}

/** k-slot MinHash signature of a string array, natively. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1 && k <= 512)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NativeTextExprs.evalMinHash(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeTextExprs.evalMinHash($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  def apply(c: Column, k: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(c), k))
}
