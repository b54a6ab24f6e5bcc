package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `levenshtein_within(a, b, k)` — banded
  * (Ukkonen) edit distance that computes ONLY the 2k+1 diagonal band of the
  * DP matrix, early-exiting with -1 as soon as the whole band exceeds k.
  *
  * This is the hot inner loop of edit-distance blocking: a blocked self-join
  * emits millions of candidate pairs and each costs O(min(n,m)·k) here vs
  * the built-in `levenshtein(a, b, k)`'s heavier general path (measured
  * ~8× on `q_edit_distance`'s 6.9M pairs).
  *
  * Contract: distance over Unicode CODE POINTS — the same unit the built-in
  * `levenshtein` and DuckDB's count, so the oracle equivalence is structural
  * for any input, not just ASCII. Pure-ASCII pairs (byte length = char
  * length, the fixture and most identifier-like data) take a zero-copy
  * byte-band path (`UTF8String.getByte`, no per-row decode); only pairs
  * containing a multi-byte code point decode once into int arrays. Returns
  * -1 when the true distance exceeds k, else the distance — same convention
  * as the built-in's thresholded form. Codegen calls the same static helper
  * the interpreted path uses (monomorphic static call, JIT-compiled tight
  * loop — the two DP paths cannot drift apart).
  */
case class LevenshteinWithin(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"levenshtein_within needs (string, string), got ${l.sql} / ${r.sql}")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    LevenshteinWithin.banded(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.LevenshteinWithin$$.MODULE$$.banded($l, $r, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "levenshtein_within"
}

object LevenshteinWithin {
  /** Shared by the interpreted and generated paths. Dispatches to the
    * zero-copy byte band when both strings are pure ASCII (bytes = chars ⇔
    * every code point is single-byte), else decodes code points once and
    * runs the identical band over int arrays. */
  def banded(sa: UTF8String, sb: UTF8String, k: Int): Int =
    if (sa.numBytes() == sa.numChars() && sb.numBytes() == sb.numChars())
      bandedAscii(sa, sb, k)
    else
      bandedCodePoints(sa.toString.codePoints().toArray,
        sb.toString.codePoints().toArray, k)

  private def bandedAscii(sa: UTF8String, sb: UTF8String, k: Int): Int = {
    var a = sa; var b = sb
    if (a.numBytes() > b.numBytes()) { val t = a; a = b; b = t }
    val la = a.numBytes(); val lb = b.numBytes()
    if (lb - la > k) return -1
    val w = 2 * k + 1
    val INF = k + 1
    var prev = new Array[Int](w)
    var cur = new Array[Int](w)
    var m = 0
    while (m < w) {
      val j = m - k
      prev(m) = if (j >= 0 && j <= lb) j else INF
      m += 1
    }
    var i = 1
    while (i <= la) {
      var rowMin = INF
      m = 0
      while (m < w) {
        val j = i - k + m
        var v = INF
        if (j >= 0 && j <= lb) {
          if (j == 0) v = i
          else {
            val sub = prev(m) + (if (a.getByte(i - 1) == b.getByte(j - 1)) 0 else 1)
            val del = if (m + 1 < w) prev(m + 1) + 1 else INF
            val ins = if (m > 0) cur(m - 1) + 1 else INF
            v = math.min(math.min(sub, del), ins)
            if (v > INF) v = INF
          }
        }
        cur(m) = v
        if (v < rowMin) rowMin = v
        m += 1
      }
      if (rowMin > k) return -1
      val t = prev; prev = cur; cur = t
      i += 1
    }
    val d = prev(lb - la + k)
    if (d > k) -1 else d
  }

  /** Same band DP over pre-decoded code points (the non-ASCII path). */
  private def bandedCodePoints(ca: Array[Int], cb: Array[Int], k: Int): Int = {
    var a = ca; var b = cb
    if (a.length > b.length) { val t = a; a = b; b = t }
    val la = a.length; val lb = b.length
    if (lb - la > k) return -1
    val w = 2 * k + 1
    val INF = k + 1
    var prev = new Array[Int](w)
    var cur = new Array[Int](w)
    var m = 0
    while (m < w) {
      val j = m - k
      prev(m) = if (j >= 0 && j <= lb) j else INF
      m += 1
    }
    var i = 1
    while (i <= la) {
      var rowMin = INF
      m = 0
      while (m < w) {
        val j = i - k + m
        var v = INF
        if (j >= 0 && j <= lb) {
          if (j == 0) v = i
          else {
            val sub = prev(m) + (if (a(i - 1) == b(j - 1)) 0 else 1)
            val del = if (m + 1 < w) prev(m + 1) + 1 else INF
            val ins = if (m > 0) cur(m - 1) + 1 else INF
            v = math.min(math.min(sub, del), ins)
            if (v > INF) v = INF
          }
        }
        cur(m) = v
        if (v < rowMin) rowMin = v
        m += 1
      }
      if (rowMin > k) return -1
      val t = prev; prev = cur; cur = t
      i += 1
    }
    val d = prev(lb - la + k)
    if (d > k) -1 else d
  }
}

object EditDistance {
  private[graft] def kOf(e: Expression): Int = e match {
    case Literal(v, IntegerType) =>
      val i = v.asInstanceOf[Int]
      require(i >= 0 && i <= 16, s"levenshtein_within: k must be in [0,16], got $i")
      i
    case other => throw new IllegalArgumentException(
      s"levenshtein_within: k must be an integer literal, got $other")
  }

  /** Register `levenshtein_within(a, b, k)`. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "levenshtein_within",
      exprs => LevenshteinWithin(exprs(0), exprs(1), kOf(exprs(2))), "built-in")

  /** Column-API wrapper; requires `register(spark)` first. */
  def levenshteinWithin(a: Column, b: Column, k: Int): Column =
    call_function("levenshtein_within", a, b,
      org.apache.spark.sql.functions.lit(k))
}
