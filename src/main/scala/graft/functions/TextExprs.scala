package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text-shaping expressions. These replace deep
  * `transform`/`sequence`/`slice` higher-order trees whose generated
  * code is large (slow to janino-compile) and traverses the array once
  * per output element. Each is a single tight loop callable from
  * whole-stage codegen.
  */

/** Distinct word n-grams of a space-separated text, first-occurrence
  * order — same semantics as the former
  * `array_distinct(transform(sequence…, slice…))` column tree. */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNgrams.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  def compute(text: UTF8String, n: Int): ArrayData = {
    val words = text.toString.trim.split(" +", -1)
    val last = math.max(words.length - n, 0)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= last) {
      val end = math.min(i + n, words.length)
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(words(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  def word_ngrams(text: Column, n: Int): Column =
    ColumnBridge.column(WordNgrams(ColumnBridge.expression(text), n))
}

/** k-permutation MinHash signature from an array of 64-bit feature
  * hashes: one pass over the array, k mins kept simultaneously
  * (splitmix64 mixing per permutation). */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def compute(hashes: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var s = 0
      while (s < k) {
        val v = mix(h ^ (s.toLong * 0xD1B54A32D192ED03L))
        if (v < mins(s)) mins(s) = v
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(Long.box).asInstanceOf[Array[Any]])
  }

  def minhash_sig(hashes: Column, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hashes), k))
}

/** Occurrence counts of each stopword set in a space-separated text,
  * one pass over the words (multiplicity counted — same semantics as
  * `size(filter(words, isin(set)))`, which is a CodegenFallback
  * higher-order tree evaluated once per set). Drives language ID and
  * quality scoring. */
case class StopwordVotes(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val lookup: Array[java.util.HashSet[String]] =
    sets.map { s =>
      val h = new java.util.HashSet[String]()
      s.foreach(h.add)
      h
    }.toArray

  def computeVotes(text: UTF8String): ArrayData = {
    val words = text.toString.trim.split(" +", -1)
    val counts = new Array[Int](lookup.length)
    var i = 0
    while (i < words.length) {
      var s = 0
      while (s < lookup.length) {
        if (lookup(s).contains(words(i))) counts(s) += 1
        s += 1
      }
      i += 1
    }
    new GenericArrayData(counts.map(Int.box).asInstanceOf[Array[Any]])
  }

  override def nullSafeEval(input: Any): Any =
    computeVotes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("votes", this,
      classOf[StopwordVotes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.computeVotes($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordVotes =
    copy(child = newChild)
}

object StopwordVotes {
  def stopword_votes(text: Column, sets: Seq[Seq[String]]): Column =
    ColumnBridge.column(StopwordVotes(ColumnBridge.expression(text), sets))
}
