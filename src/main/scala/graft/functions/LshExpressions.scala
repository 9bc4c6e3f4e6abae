package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** Deterministic random-hyperplane generation shared by the LSH operators
  * and [[LshSignatures]]: a seeded xorshift per (table, plane) — no global
  * RNG state, every executor and run agrees bit-for-bit.
  */
object LshPlanes {

  def plane(tb: Int, p: Int, dim: Int): Array[Float] = {
    var s = (tb.toLong << 32) ^ (p.toLong * 0x9E3779B97F4A7C15L) ^ 0x5DEECE66DL
    Array.fill(dim) {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      if ((s & 1L) == 0L) 1.0f else -1.0f
    }
  }

  /** Flat [tables x planes x dim] matrix for tables
    * `firstTable until firstTable + tables`: entry (t, p, i) at
    * `(t * planes + p) * dim + i`.
    */
  def matrix(tables: Int, planes: Int, dim: Int,
             firstTable: Int = 0): Array[Float] = {
    val out = new Array[Float](tables * planes * dim)
    var t = 0
    while (t < tables) {
      var p = 0
      while (p < planes) {
        System.arraycopy(plane(firstTable + t, p, dim), 0,
          out, (t * planes + p) * dim, dim)
        p += 1
      }
      t += 1
    }
    out
  }
}

/** ALL hyperplane-LSH table signatures of a vector in ONE expression:
  * returns `array<long>` of length `tables`, where bit p of element t is
  * the sign of the vector's projection onto plane (t, p).
  *
  * Why one expression instead of `tables x planes` [[FloatDotProduct]]
  * columns: a 48-table x 4-plane signature select expands to 192 separate
  * dot products, each with its own 64-float literal array, all fused into
  * one whole-stage-codegen method. Methods that large exceed the JVM's
  * JIT thresholds, and when the JIT declines (or loses the warmup race)
  * the whole fused stage runs in the bytecode interpreter — observed as
  * an intermittent ~10-50x slowdown of the scan stage. Here the generated
  * code is a fixed-size triple loop over one flat plane matrix (a
  * codegen reference object), a few hundred bytes regardless of
  * tables/planes — always JIT-able, always fast, and cheaper to compile.
  *
  * The arithmetic (double accumulation in index order, `>= 0` sign) is
  * bit-identical to the per-plane [[FloatDotProduct]] formulation it
  * replaces, so existing recall tests and rows-only checks see the exact
  * same buckets.
  */
case class LshSignatures(child: Expression, planes: Int, tables: Int, dim: Int,
                         firstTable: Int = 0)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _)
      if planes > 0 && planes <= 63 && tables > 0 && dim > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> and 0 < planes <= 63, tables > 0, " +
        s"dim > 0; got ${child.dataType.catalogString}, planes=$planes, " +
        s"tables=$tables, dim=$dim")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  @transient private lazy val mat: Array[Float] =
    LshPlanes.matrix(tables, planes, dim, firstTable)

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var p = 0
      while (p < planes) {
        val base = (t * planes + p) * dim
        var acc = 0.0
        var i = 0
        while (i < n) {
          acc += x.getFloat(i).toDouble * mat(base + i)
          i += 1
        }
        if (acc >= 0) sig |= 1L << p
        p += 1
      }
      out(t) = sig
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val matRef = ctx.addReferenceObj("lshPlanes", mat, "float[]")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val sig = ctx.freshName("sig")
      val base = ctx.freshName("base")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $sig = 0L;
         |  for (int $p = 0; $p < $planes; $p++) {
         |    int $base = ($t * $planes + $p) * $dim;
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += ((double) $v.getFloat($i)) * $matRef[$base + $i];
         |    }
         |    if ($acc >= 0) $sig |= 1L << $p;
         |  }
         |  $out[$t] = $sig;
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshFunctions {

  val SignaturesName = "graft_lsh_signatures"

  private def litInt(e: Expression, what: String): Int =
    ExprArgs.litInt(e, s"$SignaturesName: $what")

  /** Idempotent per-session registration (same pattern as
    * [[VectorFunctions.register]]).
    */
  private[functions] def builders
      : Seq[(String, Seq[Expression] => Expression)] = Seq(
    SignaturesName -> ((exprs: Seq[Expression]) => LshSignatures(exprs(0),
      litInt(exprs(1), "planes"), litInt(exprs(2), "tables"),
      litInt(exprs(3), "dim"),
      if (exprs.length > 4) litInt(exprs(4), "firstTable") else 0)))

  def register(spark: SparkSession): Unit =
    GraftFunctions.registerAll(spark, builders)

  /** All `tables` LSH signatures of `vec` as one `array<long>` column.
    * Caller must have [[register]]ed on the session.
    */
  def signatures(vec: Column, planes: Int, tables: Int, dim: Int): Column =
    call_function(SignaturesName, vec, lit(planes), lit(tables), lit(dim))

  /** Signatures for tables `firstTable until firstTable + tables` — lets
    * a caller slice out ONE mid-range table at O(planes) cost instead of
    * computing every table before it.
    */
  def signaturesFrom(vec: Column, planes: Int, tables: Int, dim: Int,
                     firstTable: Int): Column =
    call_function(SignaturesName, vec, lit(planes), lit(tables), lit(dim),
      lit(firstTable))
}
