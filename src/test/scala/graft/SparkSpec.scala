package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for Spark-touching suites: one JVM-wide session (lazy,
  * getOrCreate) so suites don't each pay startup.
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("4").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"

  /** Run `body` with the TRUE interpreted expression path:
    * factoryMode=NO_CODEGEN forces InterpretedUnsafeProjection, which
    * actually runs nullSafeEval — wholeStage=false alone still calls
    * each expression's doGenCode through GenerateUnsafeProjection.
    */
  def withInterpreted[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try body
    finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
  }
}
