package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Native Catalyst expression for the point-in-ring test — the residual
  * predicate of the broadcast PIP join (flagship pipeline + q07). Runs the
  * even-odd ray cast directly over the ring's ArrayData (no per-candidate
  * Seq[Double]/toArray copy, no UDF serialization glue); identical booleans
  * to graft.geo.Geo.pointInRing (property-tested, incl. degenerate rings).
  */
case class PipContains(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(lon: Any, lat: Any, ring: Any): Any =
    PipContains.contains(lon.asInstanceOf[Double], lat.asInstanceOf[Double],
      ring.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lon, lat, ring) =>
      s"${ev.value} = graft.functions.PipContains.contains($lon, $lat, $ring);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PipContains {
  /** Even-odd ray cast over ArrayData — the same arithmetic, comparisons and
    * vertex order as Geo.pointInRing, reading doubles in place.
    */
  def contains(lon: Double, lat: Double, ring: ArrayData): Boolean = {
    val n = ring.numElements() / 2
    if (n < 3) return false
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val xi = ring.getDouble(2 * i); val yi = ring.getDouble(2 * i + 1)
      val xj = ring.getDouble(2 * j); val yj = ring.getDouble(2 * j + 1)
      if ((yi > lat) != (yj > lat)) {
        val xCross = (xj - xi) * (lat - yi) / (yj - yi) + xi
        if (lon < xCross) inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }

  /** pip_contains(lon, lat, ring) as a Column. */
  def apply(lon: Column, lat: Column, ring: Column): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(PipContains(ColumnShim.expression(lon),
      ColumnShim.expression(lat), ColumnShim.expression(ring)))
  }
}
