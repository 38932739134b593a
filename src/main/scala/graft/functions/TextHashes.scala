package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hash-sketch hot path
  * (builder-brief preference: custom `Expression` over chained
  * higher-order functions when the built-ins can't express the
  * computation efficiently).
  *
  * The pure-`functions._` formulations of MinHash and SimHash
  * (operators.Dedup) chain nested TransformValues/ArrayAggregate nodes
  * which evaluate interpreted, boxing every element; these expressions
  * do the same arithmetic in one tight JVM loop per row using Spark's
  * own XXH64 kernels (same hash family the `xxhash64` function uses).
  * Both are order-deterministic and seed-stable across runs.
  */
case class MinhashSignatureExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature needs array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        // base hash of the shingle string (seed 42 = xxhash64 default)
        val base = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var j = 0
        while (j < k) {
          // permutation j: re-hash the base long with seed j — matches
          // the operators.Dedup construction (hash strings once)
          val h = XXH64.hashLong(base, j)
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}

/** 64-bit SimHash over a token array: per-token XXH64, bit-wise
  * majority vote. */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 needs array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    // SWAR bit-count: acc(k) holds eight packed 8-bit counters for bit
    // positions k, k+8, …, k+56; each token costs 8 branchless
    // shift-mask-adds instead of a 64-iteration branchy vote loop
    // (~5× on token-heavy docs). Flushed every 255 tokens so the
    // packed bytes can't overflow. Majority vote `votes(b) > 0` is
    // equivalent to `2·ones(b) > nTokens`, ties (==) → bit 0, exactly
    // as the per-bit ±1 formulation.
    val ones = new Array[Int](64)
    val acc = new Array[Long](8)
    var pending = 0
    var nTokens = 0
    def flush(): Unit = {
      var k = 0
      while (k < 8) {
        val a = acc(k)
        var j = 0
        while (j < 8) {
          ones(k + 8 * j) += ((a >>> (8 * j)) & 0xffL).toInt
          j += 1
        }
        acc(k) = 0L
        k += 1
      }
      pending = 0
    }
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var k = 0
        while (k < 8) {
          acc(k) += (h >>> k) & 0x0101010101010101L
          k += 1
        }
        nTokens += 1
        pending += 1
        if (pending == 255) flush()
      }
      i += 1
    }
    flush()
    var out = 0L
    var b = 0
    while (b < 64) {
      if (2 * ones(b) > nTokens) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** Winnowing document fingerprint (Schleimer, Wilkerson, Aiken —
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
  * 2003): hash every k-gram of the token array, slide a window of `w`
  * consecutive k-gram hashes, keep each window's minimum, return the
  * distinct selected hashes sorted. Guarantees any shared token run of
  * length >= k + w - 1 between two documents shares a fingerprint —
  * the partial-overlap detector whole-document hashing can't provide.
  *
  * The k-gram hash is md5 of the space-joined k-gram (engine-portable,
  * so a SQL oracle can replay selection exactly); a production rolling
  * hash (O(1) per position) would slot in here without changing the
  * selection semantics. One tight loop per row — a nested
  * higher-order-function formulation would re-evaluate the k-gram
  * array per window position after CollapseProject. */
case class WinnowFingerprintExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_fingerprint needs array<string>, got ${other.catalogString}")
    }

  private val hexDigits = "0123456789abcdef".toCharArray

  private def hex(b: Array[Byte]): String = {
    val out = new Array[Char](b.length * 2)
    var i = 0
    while (i < b.length) {
      out(2 * i) = hexDigits((b(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(b(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val toks = Array.tabulate(n)(i =>
      if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString)
    val md = java.security.MessageDigest.getInstance("MD5")
    val grams =
      if (n < k) Array(hex(md.digest(toks.mkString(" ").getBytes("UTF-8"))))
      else Array.tabulate(n - k + 1) { i =>
        md.reset()
        hex(md.digest(toks.slice(i, i + k).mkString(" ").getBytes("UTF-8")))
      }
    val selected = new java.util.TreeSet[String]()
    if (grams.length <= w) grams.foreach(selected.add)
    else {
      // monotone deque of candidate indices: O(n) sliding-window
      // minima instead of O(n·w) re-scans; ties pick the same VALUE,
      // so the selected set equals a per-window min() exactly
      val dq = new java.util.ArrayDeque[Int]()
      var j = 0
      while (j < grams.length) {
        while (!dq.isEmpty && grams(dq.peekLast) >= grams(j)) dq.pollLast()
        dq.addLast(j)
        if (dq.peekFirst <= j - w) dq.pollFirst()
        if (j >= w - 1) selected.add(grams(dq.peekFirst))
        j += 1
      }
    }
    val out = new Array[Any](selected.size)
    val it = selected.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "winnow_fingerprint"
}

object TextHashes {
  import org.apache.spark.sql.GraftSqlShim._

  def minhashSignature(tokens: Column, k: Int): Column =
    toColumn(MinhashSignatureExpr(toExpression(tokens), k))

  def simhash64(tokens: Column): Column =
    toColumn(SimHash64Expr(toExpression(tokens)))

  def winnowFingerprint(tokens: Column, k: Int = 4, w: Int = 5): Column =
    toColumn(WinnowFingerprintExpr(toExpression(tokens), k, w))
}
