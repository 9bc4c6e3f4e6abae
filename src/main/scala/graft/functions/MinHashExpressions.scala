package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Batched MinHash signature / LSH-band-key expressions.
  *
  * [[graft.ops.TextOps.minhashSignatures]] computes the k per-document
  * minima relationally: explode the shingle array, then one groupBy(doc)
  * with k `min` aggregates. That shape is correct and map-side combinable,
  * but it still SHUFFLES every (doc, shingle-hash) pair to rebuild rows
  * that the scan already had — at 100 TB the signature step alone moves
  * the whole exploded corpus across the wire.
  *
  * These expressions compute the identical minima in a single pass over
  * the shingle array, per row, inside whole-stage codegen — no Generate,
  * no shuffle, no state. The permutation family is bit-identical to the
  * relational form (`xxhash64(shingle)` seed 42, then rotate-xor mixes,
  * signed `min`), so candidate buckets — and therefore the exact-verified
  * result set — do not change. Like [[LshSignatures]], each is ONE
  * expression rather than k columns so the generated method stays a few
  * hundred bytes and always JITs (k=128 element_at projections would
  * re-inline the shingle expression after projection collapse).
  *
  * Reference semantics: near-dup candidate generation over document
  * shingles (the pipeline mirrored from the reference's dedup design;
  * see SURVEY.md §2 training-data extensions).
  */
abstract class MinHashExpressionBase extends UnaryExpression {

  def k: Int

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> and k > 0; got " +
        s"${child.dataType.catalogString}, k=$k")
  }

  override def nullIntolerant: Boolean = true

  /** Rotation distances, 1..63 — `(i*13+7) % 63 + 1` as in the relational
    * form; `Long.rotateLeft(h, r)` ≡ `shiftrightunsigned(h, 64-r) |
    * shiftleft(h, r)` for r in that range.
    */
  @transient protected lazy val rots: Array[Int] =
    Array.tabulate(k)(i => (i * 13 + 7) % 63 + 1)

  /** XOR mixes — `(i+1) * golden`, Java wrap-around (bijective in Z/2^64). */
  @transient protected lazy val mixes: Array[Long] =
    Array.tabulate(k)(i => (i + 1) * 0x9E3779B97F4A7C15L)

  /** Minima of the k permuted shingle hashes. A null shingle hashes to the
    * xxhash64 seed (42), matching `xxhash64(null)` in the relational form.
    * An empty array leaves every minimum at Long.MaxValue.
    */
  protected final def minima(arr: ArrayData): Array[Long] = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val h =
        if (arr.isNullAt(j)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
      var i = 0
      while (i < k) {
        val v = java.lang.Long.rotateLeft(h, rots(i)) ^ mixes(i)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    mins
  }

  /** Generated-code equivalent of [[minima]]; leaves `long[] $mins`. */
  protected final def minimaCode(ctx: CodegenContext, v: String,
                                 mins: String): String = {
    val rotRef = ctx.addReferenceObj("minhashRots", rots, "int[]")
    val mixRef = ctx.addReferenceObj("minhashMixes", mixes, "long[]")
    val n = ctx.freshName("n")
    val j = ctx.freshName("j")
    val i = ctx.freshName("i")
    val h = ctx.freshName("h")
    val pv = ctx.freshName("pv")
    val xxh = classOf[XXH64].getName
    s"""
       |long[] $mins = new long[$k];
       |java.util.Arrays.fill($mins, Long.MAX_VALUE);
       |int $n = $v.numElements();
       |for (int $j = 0; $j < $n; $j++) {
       |  long $h = $v.isNullAt($j)
       |    ? 42L : $xxh.hashUTF8String($v.getUTF8String($j), 42L);
       |  for (int $i = 0; $i < $k; $i++) {
       |    long $pv = Long.rotateLeft($h, $rotRef[$i]) ^ $mixRef[$i];
       |    if ($pv < $mins[$i]) $mins[$i] = $pv;
       |  }
       |}
     """.stripMargin
  }
}

/** All k MinHash minima of a shingle array as one `array<long>` — value-
  * identical to the m0..m{k-1} columns of the relational formulation.
  */
case class MinHashSignatures(child: Expression, k: Int)
    extends MinHashExpressionBase {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(minima(v.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val mins = ctx.freshName("mins")
      s"""
         |${minimaCode(ctx, v, mins)}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** LSH band keys straight from the shingle array: `array<long>` of length
  * `bands`, element b = `xxhash64(m_{b*r}, .., m_{b*r+r-1}, b)` over the
  * minima (r = k/bands rows per band) — the same chained-seed composition
  * Spark's multi-arg `xxhash64` uses, with the band index folded in so
  * equal signatures in different bands never collide into one bucket.
  *
  * Banding inside the expression (rather than `element_at` arithmetic over
  * [[MinHashSignatures]]) keeps the minima in a local array: k element_at
  * projections over the signature column would inline the whole signature
  * computation per element after projection collapse.
  */
case class MinHashBandKeys(child: Expression, k: Int, bands: Int)
    extends MinHashExpressionBase {

  require(bands > 0 && k % bands == 0,
    s"k=$k must be a positive multiple of bands=$bands")

  private val rowsPerBand = k / bands

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val mins = minima(v.asInstanceOf[ArrayData])
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 42L
      var r = 0
      while (r < rowsPerBand) {
        h = XXH64.hashLong(mins(b * rowsPerBand + r), h)
        r += 1
      }
      keys(b) = XXH64.hashInt(b, h)
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val mins = ctx.freshName("mins")
      val keys = ctx.freshName("keys")
      val b = ctx.freshName("b")
      val r = ctx.freshName("r")
      val h = ctx.freshName("h")
      val xxh = classOf[XXH64].getName
      s"""
         |${minimaCode(ctx, v, mins)}
         |long[] $keys = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $h = 42L;
         |  for (int $r = 0; $r < $rowsPerBand; $r++) {
         |    $h = $xxh.hashLong($mins[$b * $rowsPerBand + $r], $h);
         |  }
         |  $keys[$b] = $xxh.hashInt($b, $h);
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($keys);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashFunctions {

  val SignaturesName = "graft_minhash_sigs"
  val BandKeysName = "graft_minhash_bands"

  private def litInt(e: Expression, what: String): Int =
    ExprArgs.litInt(e, what)

  /** Idempotent per-session registration (pattern of
    * [[LshFunctions.register]]).
    */
  private[functions] def builders
      : Seq[(String, Seq[Expression] => Expression)] = Seq(
    SignaturesName -> ((exprs: Seq[Expression]) =>
      MinHashSignatures(exprs(0), litInt(exprs(1), s"$SignaturesName: k"))),
    BandKeysName -> ((exprs: Seq[Expression]) =>
      MinHashBandKeys(exprs(0), litInt(exprs(1), s"$BandKeysName: k"),
        litInt(exprs(2), s"$BandKeysName: bands"))))

  def register(spark: SparkSession): Unit =
    GraftFunctions.registerAll(spark, builders)

  /** k MinHash minima of `shingles` as one `array<long>` column. Caller
    * must have [[register]]ed on the session.
    */
  def signatures(shingles: Column, k: Int): Column =
    call_function(SignaturesName, shingles, lit(k))

  /** LSH band keys of `shingles` as one `array<long>` column of length
    * `bands`. Caller must have [[register]]ed on the session.
    */
  def bandKeys(shingles: Column, k: Int, bands: Int): Column =
    call_function(BandKeysName, shingles, lit(k), lit(bands))
}
