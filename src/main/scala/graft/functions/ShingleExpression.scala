package graft.functions

import org.apache.spark.sql.Column

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression producing the distinct word n-gram shingle
  * set of a token array: `n` consecutive tokens joined by a single space;
  * documents with ≤ n tokens yield their whole token string as the one
  * shingle (same contract as [[HashFunctions.wordShingles]], which builds
  * the result from `transform`/`slice`/`concat_ws`/`array_distinct`).
  *
  * Why a custom expression: higher-order functions evaluate their lambda
  * through an interpreted projection per element — for shingling that is
  * O(tokens × shingleSize) interpreted steps per document, and it sits on
  * the hottest scan-side path of every near-dup operator (it dominated the
  * sf0.1 bench profile). This expression runs as one compiled JVM loop over
  * the token array, invoked through [[KernelCodegen]] so the enclosing
  * projection stays inside its WholeStageCodegen span.
  */
case class WordShingleExpr(child: Expression, n: Int)
    extends UnaryExpression with KernelCodegen {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val tokens = input.asInstanceOf[ArrayData]
    val count = tokens.numElements()
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (count <= n) {
      val parts = new Array[UTF8String](count)
      var i = 0
      while (i < count) { parts(i) = tokens.getUTF8String(i); i += 1 }
      out.add(UTF8String.concatWs(space, parts: _*))
    } else {
      val parts = new Array[UTF8String](n)
      var start = 0
      while (start <= count - n) {
        var k = 0
        while (k < n) { parts(k) = tokens.getUTF8String(start + k); k += 1 }
        out.add(UTF8String.concatWs(space, parts: _*))
        start += 1
      }
    }
    val arr = new Array[AnyRef](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingleExpr =
    copy(child = newChild)
}

object WordShingleExpr {
  def apply(tokens: Column, n: Int): Column =
    Bridge.column(WordShingleExpr(Bridge.expression(tokens), n))
}

/** Native character-n-gram shingle set: every `n`-code-point window of the
  * input string, distinct, in first-appearance order; strings of ≤ n chars
  * yield themselves as the one shingle (same contract as
  * [[HashFunctions.charShinglesHof]], the `substring`-transform spec).
  * Same rationale as [[WordShingleExpr]]: the HOF form evaluates an
  * interpreted `substring` lambda per position — O(chars) interpreter
  * steps per document on the hottest scan-side path of char-gram dedup —
  * while this is one compiled loop using the same SQL substring semantics
  * (`UTF8String.substringSQL`, code-point indexed). */
case class CharShingleExpr(child: Expression, n: Int)
    extends UnaryExpression with KernelCodegen {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_shingles"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val len = s.numChars()
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (len <= n) out.add(s)
    else {
      var i = 1
      while (i <= len - n + 1) {
        out.add(s.substringSQL(i, n))
        i += 1
      }
    }
    val arr = new Array[AnyRef](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): CharShingleExpr =
    copy(child = newChild)
}

object CharShingleExpr {
  def apply(text: Column, n: Int): Column =
    Bridge.column(CharShingleExpr(Bridge.expression(text), n))
}

/** Native sliding character n-grams WITH multiplicity — the counting
  * sibling of [[CharShingleExpr]] (which dedups and folds short strings to
  * themselves): every `n`-code-point window in order, duplicates kept,
  * strings shorter than `n` yield an EMPTY array. This is the gram stream
  * LM statistics are computed over ([[graft.operators.CorpusStats
  * .charLmScore]]) — occurrence counts, not presence sets — and matches
  * the `substring`-transform HOF spec exactly while replacing its
  * O(chars) interpreted lambda evaluations with one compiled loop. */
case class CharGramsExpr(child: Expression, n: Int)
    extends UnaryExpression with KernelCodegen {

  require(n >= 1, "gram size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_grams"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val len = s.numChars()
    if (len < n) new GenericArrayData(Array.empty[AnyRef])
    else {
      val m = len - n + 1
      val arr = new Array[AnyRef](m)
      var i = 0
      while (i < m) { arr(i) = s.substringSQL(i + 1, n); i += 1 }
      new GenericArrayData(arr)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): CharGramsExpr =
    copy(child = newChild)
}

object CharGramsExpr {
  def apply(text: Column, n: Int): Column =
    Bridge.column(CharGramsExpr(Bridge.expression(text), n))
}
