package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the quadkey extent cover — the generator
  * input of the tiler (`explode(cover(...))`) and of the extent-overlap
  * join's cell prep. Stays inside whole-stage codegen and materializes the
  * cell array as an UnsafeArrayData directly from the primitive long[],
  * where the Scala-UDF route boxed every cell id through a WrappedArray and
  * broke the codegen span with serialization glue. Semantics identical to
  * graft.cells.QuadKey.cover (property-tested against it).
  */
case class CellCover(first: Expression, second: Expression,
                     third: Expression, fourth: Expression, zoom: Int)
    extends QuaternaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(minLon: Any, minLat: Any,
                                      maxLon: Any, maxLat: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      graft.cells.QuadKey.coverArray(minLon.asInstanceOf[Double],
        minLat.asInstanceOf[Double], maxLon.asInstanceOf[Double],
        maxLat.asInstanceOf[Double], zoom))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.cells.QuadKey.coverArray($a, $b, $c, $d, $zoom));
         |""".stripMargin)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object CellCover {
  /** cover(minLon, minLat, maxLon, maxLat) at a fixed zoom, as a Column. */
  def apply(minLon: Column, minLat: Column, maxLon: Column, maxLat: Column,
            zoom: Int): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(CellCover(ColumnShim.expression(minLon),
      ColumnShim.expression(minLat), ColumnShim.expression(maxLon),
      ColumnShim.expression(maxLat), zoom))
  }
}
