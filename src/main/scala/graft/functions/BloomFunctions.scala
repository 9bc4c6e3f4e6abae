package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Column faces for Spark's OWN Bloom-filter expressions — the codegen'd
  * pair (`BloomFilterAggregate`, `BloomFilterMightContain`) that powers
  * Catalyst's runtime row-level filtering, which Spark does not expose
  * through the public functions API. Registering them as named functions
  * lets the engine build a constant-size set-membership sketch with a
  * distributed aggregate (map-side partial blooms, OR-merged) and probe
  * it map-side in whole-stage codegen.
  *
  * Why this matters at 100 TB: a broadcast semi-join against a "small"
  * side stops working when the small side is a few billion keys; a Bloom
  * filter of fixed `numBits` keeps the probe side a pure map-side scan
  * at any build-side cardinality, and an exact join afterwards touches
  * only the (tiny) surviving fraction, so false positives cost work but
  * never correctness.
  */
object BloomFunctions {

  val AggName = "graft_bloom_agg"
  val ProbeName = "graft_bloom_might_contain"

  /** Idempotent per-session registration of both expressions. */
  private[functions] def builders
      : Seq[(String, Seq[Expression] => Expression)] = Seq(
    AggName -> ((exprs: Seq[Expression]) =>
      new BloomFilterAggregate(exprs(0), exprs(1), exprs(2))),
    ProbeName -> ((exprs: Seq[Expression]) =>
      BloomFilterMightContain(exprs(0), exprs(1))))

  def register(spark: SparkSession): Unit =
    GraftFunctions.registerAll(spark, builders)

  /** Aggregate a LONG column into a serialized Bloom filter (binary).
    * Returns null on empty input (Spark's aggregate contract).
    */
  def bloomAgg(c: Column, numItems: Long, numBits: Long): Column =
    call_function(AggName, c, lit(numItems), lit(numBits))

  /** Map-side membership probe of a LONG column against a serialized
    * filter embedded as a foldable literal (deserialized once per task
    * by the expression's codegen). Caller must have [[register]]ed.
    */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    call_function(ProbeName, lit(bloom), c)

  /** Build side: the serialized Bloom filter over a LONG column of `df`,
    * built distributed (partial filters merged by OR). Null iff `df` is
    * empty.
    */
  def build(df: DataFrame, c: Column, numItems: Long,
            numBits: Long): Array[Byte] = {
    register(df.sparkSession)
    df.agg(bloomAgg(c, numItems, numBits)).head().getAs[Array[Byte]](0)
  }
}
