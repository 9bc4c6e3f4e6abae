package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The full graft SQL-function surface in one place: every custom
  * Catalyst expression and aggregate the engine ships, as (name ->
  * builder) pairs shared by BOTH registration paths:
  *
  *  - [[GraftExtensions]] — the library deployment shape: set
  *    `spark.sql.extensions=graft.functions.GraftExtensions` on the
  *    cluster and every session (including ones the engine never sees,
  *    e.g. a notebook attaching to the same Thrift server) resolves
  *    `graft_*` functions in SQL text with no per-session code.
  *  - the per-module `register(spark)` calls — lazy per-session
  *    registration for embedded use, kept because operators
  *    self-register exactly what they need when the engine is used as
  *    a plain library without cluster-level config.
  *
  * Both paths bind the SAME builders, so a function behaves
  * identically however it was installed.
  */
object GraftFunctions {

  /** Every graft SQL function. Names are stable API. */
  def all: Seq[(String, Seq[Expression] => Expression)] =
    VectorFunctions.builders ++ PqFunctions.builders ++
      LshFunctions.builders ++ MinHashFunctions.builders ++
      WinnowFunctions.builders ++ NormalizeFunctions.builders ++
      BloomFunctions.builders ++ BpeFunctions.builders ++
      RepetitionFunctions.builders ++ DsirFunctions.builders ++
      MarginFunctions.builders ++ ChunkFunctions.builders ++
      SpanFunctions.builders ++ MarkerFunctions.builders

  /** Idempotent session registration of a module's builders (the shared
    * body of every module's `register`).
    */
  private[functions] def registerAll(
      spark: SparkSession,
      builders: Seq[(String, Seq[Expression] => Expression)]): Unit = {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      if (registry.lookupFunctionBuilder(FunctionIdentifier(name)).isEmpty)
        registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}

/** `spark.sql.extensions` entry point injecting every graft function as
  * a built-in (see [[GraftFunctions]]). Injection happens at session
  * build time, before any query — so unlike temp-function registration
  * it also survives `newSession()` clones.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      extensions.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }
}
