package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChunkExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(arr: Seq[String], size: Int,
                       stride: Int): Seq[Seq[String]] = {
    ChunkFunctions.register(spark)
    Seq(Tuple1(arr)).toDF("a")
      .select(ChunkFunctions.arrayChunks($"a", lit(size), lit(stride))
        .as("c"))
      .as[Seq[Seq[String]]].head()
  }

  test("layout matches the relational slice formulation it replaced") {
    // reference: nchunks = ceil(max(n-size,0)/stride)+1 (n>0),
    // chunk i = slice(arr, i*stride+1, size)
    def ref(arr: Seq[String], size: Int, stride: Int): Seq[Seq[String]] =
      if (arr.isEmpty) Seq.empty
      else {
        val n = arr.length
        val nchunks = math.ceil(math.max(n - size, 0).toDouble / stride).toInt + 1
        (0 until nchunks).map(i => arr.slice(i * stride, i * stride + size))
      }
    val fixtures = Seq(
      (Seq.empty[String], 32, 16),
      (Seq("a"), 32, 16),                       // shorter than one chunk
      ((1 to 32).map("t" + _), 32, 16),         // exactly one chunk
      ((1 to 33).map("t" + _), 32, 16),         // one-token overhang
      ((1 to 100).map("t" + _), 32, 16),        // strided overlap
      ((1 to 50).map("t" + _), 25, 25),         // disjoint segments, exact
      ((1 to 51).map("t" + _), 25, 25))         // disjoint segments, ragged
    fixtures.foreach { case (arr, size, stride) =>
      assert(chunksOf(arr, size, stride) == ref(arr, size, stride),
        s"layout drift for n=${arr.length} size=$size stride=$stride")
    }
  }

  test("interpreted and codegen paths agree; null array yields null") {
    ChunkFunctions.register(spark)
    val df = (1 to 64).map(i => (i.toLong, (1 to i).map("w" + _)))
      .toDF("id", "a")
      .unionByName(Seq((999L, null.asInstanceOf[Seq[String]])).toDF("id", "a"))
    val expr = ChunkFunctions.arrayChunks($"a", lit(8), lit(4))
    val viaCodegen = df.select($"id", expr.as("c"))
      .as[(Long, Seq[Seq[String]])].collect().toMap
    // factoryMode=NO_CODEGEN forces InterpretedUnsafeProjection, which
    // actually runs nullSafeEval — wholeStage=false alone still calls
    // the expression's doGenCode through GenerateUnsafeProjection
    val prev = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = df.select($"id", expr.as("c"))
        .as[(Long, Seq[Seq[String]])].collect().toMap
      assert(viaCodegen == interpreted)
    } finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
    assert(viaCodegen(999L) == null)
    // tokenize-once is the point: the plan carries ONE regex
    val plan = graft.ops.SampleOps.chunkTokens(
      Seq((1L, "a b c d e")).toDF("doc_id", "text"), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.split("regexp_extract_all").length - 1 <= 1,
      s"tokenizer appears more than once in the chunk plan:\n$plan")
  }
}
