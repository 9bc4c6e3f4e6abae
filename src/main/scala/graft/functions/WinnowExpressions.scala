package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowed rolling-hash document fingerprints (the MOSS scheme:
  * Schleimer/Wilkerson/Aiken, "Winnowing: Local Algorithms for Document
  * Fingerprinting", SIGMOD 2003).
  *
  * Every position of the canonicalized text gets a Rabin-Karp rolling
  * hash of the k-char gram starting there — O(1) per position after the
  * first gram — and each window of `w` consecutive gram hashes
  * contributes its minimum. The distinct selected values are the
  * document's fingerprint set; any shared substring of length >= w+k-1
  * between two documents is guaranteed to surface as a shared
  * fingerprint, which is what makes an equi-join on fingerprint values a
  * complete candidate generator for substring-overlap dedup.
  *
  * The hash is `h = (h*31 + byte) mod 1e9+7` (0-seeded), chosen because
  * an ANSI SQL oracle can reproduce it exactly with a fold — values stay
  * far below 2^63 so both engines compute identical BIGINTs. The
  * canonical input ([[graft.ops.TextOps.canonText]]) is ASCII by
  * construction, so byte-wise hashing here matches code-point hashing in
  * SQL.
  */
object WinnowHash {

  val Prime = 1000000007L
  val Base = 31L

  /** Rolling k-gram hashes of `s` (one per position; a single
    * whole-string hash when `s` is shorter than k, including empty).
    */
  def gramHashes(s: UTF8String, k: Int): Array[Long] = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n < k) {
      var h = 0L
      var i = 0
      while (i < n) { h = (h * Base + (bytes(i) & 0xFF)) % Prime; i += 1 }
      Array(h)
    } else {
      val m = n - k + 1
      val out = new Array[Long](m)
      var pow = 1L // Base^(k-1) mod Prime, for removing the leading byte
      var i = 0
      while (i < k - 1) { pow = (pow * Base) % Prime; i += 1 }
      var h = 0L
      i = 0
      while (i < k) { h = (h * Base + (bytes(i) & 0xFF)) % Prime; i += 1 }
      out(0) = h
      i = 1
      while (i < m) {
        val lead = (bytes(i - 1) & 0xFF).toLong
        h = (((h - (lead * pow) % Prime + Prime) % Prime) * Base +
          (bytes(i + k - 1) & 0xFF)) % Prime
        out(i) = h
        i += 1
      }
      out
    }
  }

  /** Sorted distinct winnowed fingerprints of `s`: min of each window of
    * `w` consecutive gram hashes (a single global min when fewer than `w`
    * grams exist). Never empty — the empty string fingerprints to [0].
    */
  def fingerprints(s: UTF8String, k: Int, w: Int): UnsafeArrayData = {
    val grams = gramHashes(s, k)
    val m = grams.length
    val wins =
      if (m <= w) {
        var mn = Long.MaxValue
        var i = 0
        while (i < m) { if (grams(i) < mn) mn = grams(i); i += 1 }
        Array(mn)
      } else {
        val nw = m - w + 1
        val out = new Array[Long](nw)
        var i = 0
        while (i < nw) {
          var mn = grams(i)
          var j = 1
          while (j < w) { if (grams(i + j) < mn) mn = grams(i + j); j += 1 }
          out(i) = mn
          i += 1
        }
        out
      }
    java.util.Arrays.sort(wins)
    var d = 1
    var i = 1
    while (i < wins.length) {
      if (wins(i) != wins(d - 1)) { wins(d) = wins(i); d += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(wins, d))
  }
}

/** All winnowed fingerprints of a canonical string as one sorted distinct
  * `array<long>`. Both eval paths call the same [[WinnowHash]] static, so
  * interpreted and codegen results are identical by construction; the
  * generated call site stays a few bytes regardless of text length.
  */
case class WinnowFingerprints(child: Expression, k: Int, window: Int)
    extends UnaryExpression {

  require(k > 0 && window > 0, s"k=$k and window=$window must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.catalogString}")
  }

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    WinnowHash.fingerprints(v.asInstanceOf[UTF8String], k, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.WinnowHash.fingerprints($v, $k, $window);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static merge-scan over two SORTED long arrays — the zero-allocation
  * hot loop behind [[SortedIntersectCount]].
  */
object SortedLongOps {
  def intersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** `|A n B|` of two sorted `array<long>` columns by two-pointer merge —
  * O(|A|+|B|) with ZERO allocation per row, where `array_intersect`
  * builds a hash set and an output array per row. On a near-dup verify
  * of millions of candidate pairs the allocation delta is the
  * difference between a GC-bound stage and a compute-bound one.
  * Inputs MUST be sorted ascending (WinnowFingerprints emits sorted;
  * anything else goes through `sort_array` first).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> columns, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedLongOps.intersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedLongOps.intersectCount($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WinnowFunctions {

  val FingerprintsName = "graft_winnow_fps"
  val IntersectCountName = "graft_sorted_intersect"

  private def litInt(e: Expression, what: String): Int =
    ExprArgs.litInt(e, what)

  /** Idempotent per-session registration (pattern of
    * [[MinHashFunctions.register]]).
    */
  private[functions] def builders
      : Seq[(String, Seq[Expression] => Expression)] = Seq(
    FingerprintsName -> ((exprs: Seq[Expression]) =>
      WinnowFingerprints(exprs(0), litInt(exprs(1), s"$FingerprintsName: k"),
        litInt(exprs(2), s"$FingerprintsName: window"))),
    IntersectCountName -> ((exprs: Seq[Expression]) =>
      SortedIntersectCount(exprs(0), exprs(1))))

  def register(spark: SparkSession): Unit =
    GraftFunctions.registerAll(spark, builders)

  /** Sorted distinct winnowed fingerprints of `canon` as `array<long>`.
    * Caller must have [[register]]ed on the session.
    */
  def fingerprints(canon: Column, k: Int, window: Int): Column =
    call_function(FingerprintsName, canon, lit(k), lit(window))

  /** `|A n B|` of two SORTED array<long> columns (merge scan, no per-row
    * allocation). Caller must have [[register]]ed on the session.
    */
  def sortedIntersectCount(a: Column, b: Column): Column =
    call_function(IntersectCountName, a, b)
}
