package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression

/** Shared literal-argument extraction for the registered expression
  * builders — one definition so the error contract cannot drift across
  * the Lsh/MinHash/Winnow registrars.
  */
private[functions] object ExprArgs {
  def litInt(e: Expression, what: String): Int = e.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  def litString(e: Expression, what: String): String = e.eval() match {
    case s: org.apache.spark.unsafe.types.UTF8String => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  def litStringArray(e: Expression, what: String): Array[String] = {
    require(e.foldable, s"$what must be a foldable string-array literal")
    e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        Array.tabulate(a.numElements()) { i =>
          require(!a.isNullAt(i),
            s"$what must not contain null elements (element $i is null)")
          a.getUTF8String(i).toString
        }
      case other => throw new IllegalArgumentException(
        s"$what must be a string-array literal, got $other")
    }
  }
}
