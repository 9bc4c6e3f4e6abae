package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The batched LSH-signature expression: codegen and interpreted paths
  * agree, and every bit matches the reference per-plane dot-product
  * formulation it replaced.
  */
class LshExpressionsSpec extends SparkSpec {

  import spark.implicits._

  private val dim = 16
  private def vec(seed: Int): Array[Float] =
    Array.tabulate(dim)(i => math.sin(seed * 31 + i).toFloat)

  test("signatures match the per-plane dot-product reference bit-for-bit") {
    VectorFunctions.register(spark)
    LshFunctions.register(spark)
    val (planes, tables) = (5, 7)
    val df = (1 to 50).map(vec).toDF("v")
    // reference formulation: sign of FloatDotProduct against each literal plane
    val refCols = (0 until tables).map { tb =>
      (0 until planes).map { p =>
        when(VectorFunctions.dot($"v", typedLit(LshPlanes.plane(tb, p, dim))) >= 0,
          lit(1L << p)).otherwise(lit(0L))
      }.reduce[org.apache.spark.sql.Column](_ + _).as(s"ref$tb")
    }
    val got = df.select(
      LshFunctions.signatures($"v", planes, tables, dim).as("sigs"),
      array(refCols: _*).as("refs"))
    assert(got.filter($"sigs" =!= $"refs").count() == 0)
  }

  test("firstTable slice returns the same signature as the full array") {
    LshFunctions.register(spark)
    val (planes, tables) = (4, 6)
    val df = (1 to 30).map(vec).toDF("v")
    val cols = (0 until tables).map { tb =>
      (element_at(LshFunctions.signaturesFrom($"v", planes, 1, dim, tb), 1)
        === element_at(LshFunctions.signatures($"v", planes, tables, dim), tb + 1))
        .as(s"eq$tb")
    }
    val allEq = df.select(cols.reduce(_ && _).as("ok"))
    assert(allEq.filter(!$"ok").count() == 0)
    // and the SimOps face uses the O(planes) slice
    val one = df.select(graft.ops.SimOps.lshTableSignature($"v", planes, 3, dim).as("s"),
      element_at(LshFunctions.signatures($"v", planes, tables, dim), 4).as("e"))
    assert(one.filter($"s" =!= $"e").count() == 0)
  }

  test("interpreted eval agrees with codegen (forced via filter)") {
    LshFunctions.register(spark)
    val df = (1 to 20).map(vec).toDF("v")
    val sigs = df.select(LshFunctions.signatures($"v", 4, 3, dim).as("s"))
    val viaCodegen = sigs.as[Seq[Long]].collect().toSeq
    // the filter path evaluates the expression interpreted at least in
    // constraint propagation; more directly: eval the expression by hand
    val expr = LshSignatures(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        vec(1), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = false)),
      planes = 4, tables = 3, dim = dim)
    val interp = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray().toSeq
    assert(interp == viaCodegen.head)
  }

  test("true interpreted plan (NO_CODEGEN) matches codegen end-to-end") {
    LshFunctions.register(spark)
    val df = ((1 to 20).map(s => (s, vec(s))) :+ ((99, null: Array[Float])))
      .toDF("id", "v")
      .select($"id", LshFunctions.signatures($"v", 4, 3, dim).as("s"))
    def run() = df.collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val viaCodegen = run()
    val interp = withInterpreted(run())
    assert(interp == viaCodegen)
  }

  test("null input yields null; bad arity/type is rejected") {
    LshFunctions.register(spark)
    val df = Seq((1, null: Array[Float]), (2, vec(2))).toDF("id", "v")
    val out = df.select($"id", LshFunctions.signatures($"v", 4, 3, dim).as("s"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1) && !out(1).isNullAt(1))
    val bad = LshSignatures(
      org.apache.spark.sql.catalyst.expressions.Literal(1),
      planes = 4, tables = 3, dim = dim)
    assert(!bad.checkInputDataTypes().isSuccess)
  }
}
