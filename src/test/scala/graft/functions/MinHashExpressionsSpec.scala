package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

import graft.SparkSpec
import graft.ops.TextOps

/** The batched MinHash expressions must be bit-identical to the
  * relational explode -> groupBy formulation they replace — same minima,
  * same band composition — so swapping them into q29/q39 and the
  * streaming admission path cannot change any candidate bucket.
  */
class MinHashExpressionsSpec extends SparkSpec {

  import spark.implicits._

  private val k = 32
  private val bands = 8

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different words in this document here"),
    (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (5L, "xy"), // short doc -> single whole-token shingle
    (6L, "numbers 123 and punctuation!!! mixed?")
  ).toDF("doc_id", "text")

  test("signature expression matches the relational minima bit-for-bit") {
    MinHashFunctions.register(spark)
    val relational = TextOps.minhashSignatures(docs, "doc_id", $"text", 3, k)
      .collect().map(r => r.getLong(0) -> (1 to k).map(r.getLong).toSeq).toMap
    val batched = docs.select($"doc_id",
        MinHashFunctions.signatures(TextOps.shingles($"text", 3), k).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(batched.keySet == relational.keySet)
    relational.foreach { case (id, sig) => assert(batched(id) == sig, s"doc $id") }
  }

  test("band keys compose the minima exactly like chained xxhash64") {
    MinHashFunctions.register(spark)
    val rpb = k / bands
    val sigs = TextOps.minhashSignatures(docs, "doc_id", $"text", 3, k)
    val relationalKeys = sigs.select($"doc_id", array((0 until bands).map { b =>
        xxhash64((0 until rpb).map(r => col(s"m${b * rpb + r}")) :+ lit(b): _*)
      }: _*).as("keys"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val batched = docs.select($"doc_id",
        MinHashFunctions.bandKeys(TextOps.shingles($"text", 3), k, bands).as("keys"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    relationalKeys.foreach { case (id, keys) =>
      assert(batched(id) == keys, s"doc $id")
    }
    // distinct docs get distinct key sets; dup docs identical keys
    assert(batched(1L) == batched(4L))
    assert(batched(1L) != batched(3L))
  }

  test("interpreted eval agrees with the codegen path") {
    // the DataFrame runs exercise codegen; call nullSafeEval directly for
    // the interpreted side
    val shingles = ArrayData.toArrayData(Array(
      org.apache.spark.unsafe.types.UTF8String.fromString("a b c"),
      org.apache.spark.unsafe.types.UTF8String.fromString("b c d"),
      null))
    val sigExpr = MinHashSignatures(
      BoundReference(0, ArrayType(StringType), nullable = false), k)
    val interpSig = sigExpr.nullSafeEval(shingles)
      .asInstanceOf[ArrayData].toLongArray.toSeq
    val codegenSig = Seq(Tuple1(Seq("a b c", "b c d", null: String)))
      .toDF("sh").select(MinHashFunctions.signatures($"sh", k))
      .head().getSeq[Long](0).toSeq
    assert(interpSig == codegenSig)
    val bandExpr = MinHashBandKeys(
      BoundReference(0, ArrayType(StringType), nullable = false), k, bands)
    val interpBands = bandExpr.nullSafeEval(shingles)
      .asInstanceOf[ArrayData].toLongArray.toSeq
    val codegenBands = Seq(Tuple1(Seq("a b c", "b c d", null: String)))
      .toDF("sh").select(MinHashFunctions.bandKeys($"sh", k, bands))
      .head().getSeq[Long](0).toSeq
    assert(interpBands == codegenBands)
  }

  test("true interpreted plan (NO_CODEGEN) matches codegen end-to-end") {
    MinHashFunctions.register(spark)
    val df = docs.select($"doc_id",
      MinHashFunctions.signatures(TextOps.shingles($"text", 3), k).as("sig"),
      MinHashFunctions.bandKeys(TextOps.shingles($"text", 3), k, bands)
        .as("keys"))
    val viaCodegen = df.collect()
      .map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getSeq[Long](2))).toMap
    val interp = withInterpreted {
      df.collect()
        .map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getSeq[Long](2))).toMap
    }
    assert(interp == viaCodegen)
  }

  test("null array yields null; type errors are rejected") {
    MinHashFunctions.register(spark)
    val out = Seq(Tuple1(null: Seq[String])).toDF("sh")
      .select(MinHashFunctions.bandKeys($"sh", k, bands).as("keys"))
      .head()
    assert(out.isNullAt(0))
    intercept[Exception] {
      Seq(Tuple1(1L)).toDF("x")
        .select(MinHashFunctions.signatures($"x", k)).collect()
    }
    intercept[IllegalArgumentException] {
      MinHashBandKeys(Literal.create(Seq("a"), ArrayType(StringType)), 10, 3)
    }
  }
}
