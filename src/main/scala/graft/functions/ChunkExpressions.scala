package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Strided chunking of an array: chunk i = elements
  * [i*stride, i*stride + size) (capped at the array end), with
  * ceil(max(n - size, 0) / stride) + 1 chunks for a non-empty array
  * and zero for an empty one — exactly the layout the relational
  * `transform(sequence(0, nchunks-1), i -> slice(arr, i*stride+1,
  * size))` produced.
  *
  * Native because that relational form had the q91 pathology one
  * level up: the ARRAY (a regex tokenization) was captured inside the
  * index lambda, so CollapseProject inlined the whole tokenize tree
  * per chunk — O(len^2 / stride) interpreted work per document. A
  * 100k-token document under 32/16 windowing re-ran its tokenizer
  * ~6,000 times. Here the array is a CHILD (evaluated once per row)
  * and chunking is one allocation-bounded loop. Element-type-generic:
  * the element DataType rides the generated code as a reference
  * object.
  */
case class ArrayChunks(first: Expression, second: Expression,
                       third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(_, _), IntegerType, IntegerType) =>
        if (!second.foldable || !third.foldable)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires literal size/stride")
        else TypeCheckResult.TypeCheckSuccess
      case (f, s, t) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array, int, int), got " +
          s"(${f.catalogString}, ${s.catalogString}, ${t.catalogString})")
    }

  private def elemType: DataType =
    first.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType =
    ArrayType(first.dataType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(arr: Any, size: Any, stride: Any): Any =
    ArrayChunks.chunks(arr.asInstanceOf[ArrayData],
      size.asInstanceOf[Int], stride.asInstanceOf[Int], elemType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val et = ctx.addReferenceObj("elemType", elemType,
      classOf[DataType].getName)
    nullSafeCodeGen(ctx, ev, (a, sz, st) =>
      s"${ev.value} = graft.functions.ArrayChunks.chunks($a, $sz, $st, $et);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object ArrayChunks {
  /** Shared by both eval paths — identical results by construction. */
  def chunks(arr: ArrayData, size: Int, stride: Int,
             et: DataType): ArrayData = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val nchunks = (math.max(n - size, 0) + stride - 1) / stride + 1
    val out = new Array[Any](nchunks)
    var i = 0
    while (i < nchunks) {
      val start = i * stride
      val end = math.min(start + size, n)
      val c = new Array[Any](end - start)
      var j = start
      while (j < end) {
        c(j - start) = arr.get(j, et)
        j += 1
      }
      out(i) = new GenericArrayData(c)
      i += 1
    }
    new GenericArrayData(out)
  }
}

object ChunkFunctions {

  val ArrayChunksName = "graft_array_chunks"

  private[functions] def builders
      : Seq[(String, Seq[Expression] => Expression)] = Seq(
    ArrayChunksName -> ((exprs: Seq[Expression]) =>
      ArrayChunks(exprs(0), exprs(1), exprs(2))))

  def register(spark: SparkSession): Unit =
    GraftFunctions.registerAll(spark, builders)

  /** Strided chunks of an array column. Caller must have
    * [[register]]ed.
    */
  def arrayChunks(arr: Column, size: Column, stride: Column): Column =
    call_function(ArrayChunksName, arr, size, stride)
}
