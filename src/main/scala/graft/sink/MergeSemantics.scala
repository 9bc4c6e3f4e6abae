package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared upsert conflict semantics: one row per PK, last-write-wins by
  * `versionCol` (ties broken deterministically on the remaining columns)
  * — used identically by the parquet state store and the JDBC writer so
  * the two sinks stay swap-compatible.
  */
private[sink] object MergeSemantics {
  def dedupeLastWins(df: DataFrame, pk: Seq[String],
                     versionCol: Option[String]): DataFrame = {
    val order = versionCol.map(v => Seq(col(v).desc)).getOrElse(Seq.empty) ++
      df.columns.filterNot(pk.contains).map(c => col(c).desc).toSeq
    if (order.isEmpty) df.dropDuplicates(pk)
    else {
      val w = Window.partitionBy(pk.map(col): _*).orderBy(order: _*)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
  }
}
