package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for quadkey cell encoding — stays inside
  * whole-stage codegen (a static call in generated Java), unlike a Scala UDF
  * which breaks the codegen span with serialization glue. Used on the hot path
  * (cell assignment over 10^12 rows); semantics identical to
  * graft.cells.QuadKey.encode (property-tested against it).
  */
case class CellEncode(left: Expression, right: Expression, zoom: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(lat: Any, lon: Any): Any =
    graft.cells.QuadKey.encode(lat.asInstanceOf[Double], lon.asInstanceOf[Double], zoom)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lat, lon) =>
      s"${ev.value} = graft.cells.QuadKey.encode($lat, $lon, $zoom);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CellEncode {
  /** cell_encode(lat, lon) at a fixed zoom, as a Column. */
  def apply(lat: Column, lon: Column, zoom: Int): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(CellEncode(ColumnShim.expression(lat), ColumnShim.expression(lon), zoom))
  }
}
