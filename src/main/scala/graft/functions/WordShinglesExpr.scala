package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a token array, in one pass.
  *
  * Value-identical to the column formulation
  * `when(size(toks) >= n, array_distinct(transform(sequence(0, size-n),
  * i => array_join(slice(toks, i+1, n), " "))))` (Dedup.wordShinglesHof —
  * the agreement is spec-pinned), including first-occurrence order and the
  * null result for docs shorter than `n` tokens. The HOF form interprets
  * its lambda per element and copies each length-`n` slice — O(tokens x n)
  * allocations per document and the dominant cost of every shingle-based
  * operator (minhash, n-gram dedup, decontamination); this loop builds each
  * shingle with one byte-copy concat and dedups through a hash set.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"word_shingles needs array<string>, got $t")
  }

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) return null // matches the HOF's when(size >= n) guard
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) { toks(i) = arr.getUTF8String(i); i += 1 }
    // LinkedHashSet: dedup preserving first occurrence, like array_distinct
    val out = new java.util.LinkedHashSet[UTF8String](len * 2)
    val window = new Array[UTF8String](2 * n - 1)
    var j = 1
    while (j < 2 * n - 1) { window(j) = sep; j += 2 } // odd slots hold the sep
    i = 0
    while (i <= len - n) {
      var k = 0
      while (k < n) { window(2 * k) = toks(i + k); k += 1 }
      out.add(UTF8String.concat(window: _*))
      i += 1
    }
    val res = new Array[AnyRef](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { res(i) = it.next(); i += 1 }
    new GenericArrayData(res)
  }

  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}
