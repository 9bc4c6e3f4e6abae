package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The batched PQ-codes expression: codegen and interpreted paths agree,
  * and every code matches the relational struct-argmax formulation it
  * replaced (normalize -> slice -> 2·dot − ‖c‖² -> argmax with ties to
  * the higher index).
  */
class PqExpressionsSpec extends SparkSpec {

  import spark.implicits._

  private val dim = 12
  private val (m, ksub) = (3, 4) // dsub = 4
  private def vec(seed: Int): Array[Float] =
    Array.tabulate(dim)(i => math.sin(seed * 31 + i).toFloat)

  private def books: Array[Array[Array[Float]]] =
    Array.tabulate(m, ksub, dim / m)((j, c, i) =>
      math.cos(j * 97 + c * 13 + i).toFloat)

  test("codes match the relational argmax reference exactly") {
    VectorFunctions.register(spark)
    PqFunctions.register(spark)
    val dsub = dim / m
    val df = ((1 to 60).map(vec) :+ Array.fill(dim)(0f)).toDF("v")
    // reference: the struct-argmax formulation over normalized subvectors
    val n = sqrt(VectorFunctions.dot($"v", $"v"))
    val vn = when(n === lit(0.0) || n.isNull, $"v")
      .otherwise(transform($"v", x => (x / n).cast("float")))
    val b = books
    val ref = array((0 until m).map { j =>
      val sub = slice(vn, j * dsub + 1, dsub)
      array_max(array((0 until ksub).map { c =>
        val cb = b(j)(c)
        val csq = cb.map(x => x.toDouble * x).sum
        struct((lit(2.0) * VectorFunctions.dot(sub, typedLit(cb)) - lit(csq)).as("s"),
          lit(c).as("c"))
      }: _*)).getField("c").cast("byte")
    }: _*)
    val got = df.select(PqFunctions.codes($"v", b).as("codes"), ref.as("ref"))
    assert(got.filter($"codes" =!= $"ref").count() == 0)
  }

  test("interpreted eval agrees with the codegen path; nulls stay null") {
    PqFunctions.register(spark)
    val b = books
    val df = Seq((1, vec(5)), (2, null: Array[Float])).toDF("id", "v")
    val rows = df.select($"id", PqFunctions.codes($"v", b).as("c"))
      .orderBy("id").collect()
    val viaCodegen = rows(0).getSeq[Byte](1)
    assert(rows(1).isNullAt(1), "null vector must yield null codes")
    val flat = b.flatten.flatten
    val expr = PqCodes(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        vec(5), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = false)),
      flat, m, ksub, dim / m)
    val interp = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toByteArray().toSeq
    assert(interp == viaCodegen)
  }

  test("adcScore matches the per-query lookup-table formulation exactly") {
    VectorFunctions.register(spark)
    PqFunctions.register(spark)
    val b = books
    val dsub = dim / m
    val df = (1 to 40).map(s => (vec(s), vec(s * 7 + 1))).toDF("q", "cand")
      .select($"q", PqFunctions.codes($"cand", b).as("codes"))
    // reference: the m×ksub ADC table composed relationally, then m
    // lookups summed — the formulation PqAdcScore replaced
    val n = sqrt(VectorFunctions.dot($"q", $"q"))
    val qn = when(n === lit(0.0) || n.isNull, $"q")
      .otherwise(transform($"q", x => (x / n).cast("float")))
    val table = array((0 until m).map { j =>
      val sub = slice(qn, j * dsub + 1, dsub)
      array((0 until ksub).map { c =>
        val cb = b(j)(c)
        val csq = cb.map(x => x.toDouble * x).sum
        lit(2.0) * VectorFunctions.dot(sub, typedLit(cb)) - lit(csq)
      }: _*)
    }: _*)
    val ref = aggregate(
      zip_with($"codes", sequence(lit(0), lit(m - 1)),
        (code, j) => element_at(element_at(table, j + 1), code.cast("int") + 1)),
      lit(0.0), (acc, x) => acc + x)
    val got = df.select(
      PqFunctions.adcScore($"q", $"codes", b).as("direct"), ref.as("ref"))
    assert(got.filter($"direct" =!= $"ref").count() == 0)
  }

  test("adcScore: interpreted agrees with codegen; nulls stay null") {
    VectorFunctions.register(spark)
    PqFunctions.register(spark)
    val b = books
    val flat = b.flatten.flatten
    val df = Seq((1, vec(3), vec(11)), (2, null: Array[Float], vec(12)))
      .toDF("id", "q", "cand")
      .select($"id", $"q", PqFunctions.codes($"cand", b).as("codes"))
    val rows = df.select($"id",
      PqFunctions.adcScore($"q", $"codes", b).as("s")).orderBy("id").collect()
    assert(rows(1).isNullAt(1), "null query must yield null score")
    val codes = df.filter($"id" === 1).select($"codes").as[Seq[Byte]].head()
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, ByteType, FloatType}
    val expr = PqAdcScore(
      Literal.create(vec(3), ArrayType(FloatType, containsNull = false)),
      Literal.create(codes, ArrayType(ByteType, containsNull = false)),
      flat, m, ksub, dim / m)
    assert(expr.eval(null).asInstanceOf[Double] == rows(0).getDouble(1))
  }

  test("true interpreted plan (NO_CODEGEN) matches codegen end-to-end") {
    VectorFunctions.register(spark)
    PqFunctions.register(spark)
    val b = books
    val df = ((1 to 20).map(s => (s, vec(s), vec(s * 7 + 1)))
        :+ ((99, null: Array[Float], vec(2)))).toDF("id", "q", "cand")
      .select($"id",
        PqFunctions.codes($"cand", b).as("codes"),
        PqFunctions.adcScore($"q", PqFunctions.codes($"cand", b), b).as("s"))
    def run() = df.collect().map { r =>
      r.getInt(0) -> (r.getSeq[Byte](1),
        if (r.isNullAt(2)) null else r.getDouble(2))
    }.toMap
    val viaCodegen = run()
    val interp = withInterpreted(run())
    assert(interp == viaCodegen)
  }

  test("ragged (shorter-than-dim) vectors code like zero-padded slices") {
    VectorFunctions.register(spark)
    PqFunctions.register(spark)
    val b = books
    val short = vec(9).take(7) // cuts into subspace 1, subspace 2 empty
    val codes = Seq(Tuple1(short)).toDF("v")
      .select(PqFunctions.codes($"v", b).as("c"))
      .as[Seq[Byte]].head()
    assert(codes.length == m)
    // subspace 2 sees no components: every centroid scores -‖c‖², so the
    // argmax is the centroid with the smallest norm (ties -> higher idx)
    val want = (0 until ksub).maxBy(c =>
      (-b(2)(c).map(x => x.toDouble * x).sum, c))
    assert(codes(2) == want.toByte)
  }
}
