package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.{bridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** The sparse keyword dot product (reference F8,
  * /root/reference/EuclideanDistance.java:29-43) as a first-class Catalyst
  * expression over two `array<struct<word:string, value:double>>` columns.
  *
  * Being a named expression (not an opaque ScalaUDF) is what makes the
  * plan REWRITABLE: `plans.CrossScoreToInvertedJoin` recognizes it inside a
  * cross-join scoring plan and replaces the whole O(U·N) product with the
  * inverted-index equi-join. Semantics match `sim.Similarities.dot` exactly:
  * left duplicates last-wins, right duplicates each add a term in order.
  * CodegenFallback is fine — on the scale path this expression is rewritten
  * away before execution.
  */
object KeywordExpressions {

  case class KeywordDot(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "keyword_dot"

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val map = new java.util.HashMap[String, java.lang.Double]()
      var i = 0
      val na = a.numElements()
      while (i < na) {
        val row = a.getStruct(i, 2)
        map.put(row.getUTF8String(0).toString, row.getDouble(1)) // last wins
        i += 1
      }
      var acc = 0.0
      var j = 0
      val nb = b.numElements()
      while (j < nb) {
        val row = b.getStruct(j, 2)
        val v = map.get(row.getUTF8String(0).toString)
        if (v != null) acc += v * row.getDouble(1)
        j += 1
      }
      acc
    }

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def keywordDot(a: Column, b: Column): Column =
    ExpressionUtils.column(KeywordDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
