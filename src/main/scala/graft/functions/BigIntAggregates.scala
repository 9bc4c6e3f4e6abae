package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.{Column, Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Exact arbitrary-precision integer aggregation — the answer to the
  * uint256 problem (SURVEY §1.2): DecimalType caps at 38 digits, but EVM
  * uint256 values reach 78. Values wider than the decimal policy travel
  * as decimal strings (the reference's NUMERIC(78,0) column maps to a
  * string-carried column here); this Aggregator sums them exactly on
  * `java.math.BigInteger`.
  *
  * An `Aggregator` (not a UDAF) so Catalyst plans it with partial
  * aggregation: each partition folds locally and only BigInteger buffers
  * cross the shuffle — the same map-side-combine shape as built-in sums.
  */
object BigIntAggregates {

  private val enc: Encoder[String] = Encoders.STRING

  /** Sum of a decimal-string column, exact at any width. Nulls skipped;
    * empty input -> "0".
    */
  val sumString: Aggregator[String, Array[Byte], String] =
    new Aggregator[String, Array[Byte], String] {
      override def zero: Array[Byte] = BigInteger.ZERO.toByteArray
      override def reduce(buf: Array[Byte], v: String): Array[Byte] =
        if (v == null) buf
        else new BigInteger(buf).add(new BigInteger(v)).toByteArray
      override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
        new BigInteger(a).add(new BigInteger(b)).toByteArray
      override def finish(buf: Array[Byte]): String = new BigInteger(buf).toString
      override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
      override def outputEncoder: Encoder[String] = enc
    }

  /** Typed form for a Dataset[String]: `ds.select(sumBigTyped)`. (A
    * Column parameter here would be ignored by the typed Aggregator —
    * for column-addressed aggregation use [[sum]].)
    */
  def sumBigTyped: TypedColumn[String, String] = sumString.toColumn

  /** Untyped usage on a DataFrame: `df.agg(BigIntAggregates.sum(col))`. */
  def sum(c: Column): Column = {
    import org.apache.spark.sql.functions.udaf
    udaf(sumString, enc).apply(c)
  }
}
