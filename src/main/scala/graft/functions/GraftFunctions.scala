package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL-surface registration of the engine's native expressions, so
  * `SELECT cell_encode(lat, lon, zoom)` works from plain SQL.
  *
  * Two entry points:
  *  - `GraftExtensions` for session construction
  *    (`--conf spark.sql.extensions=graft.functions.GraftExtensions` or
  *    `SparkSession.builder().withExtensions(new GraftExtensions)`);
  *  - `register(spark)` for a live session (used by tests and notebooks).
  */
object GraftFunctions {

  private def buildCellEncode(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, "cell_encode(lat, lon, zoom)")
    val zoom = exprs(2) match {
      case Literal(v: Int, _) => v
      case Literal(v: Long, _) => v.toInt
      case other => throw new IllegalArgumentException(s"cell_encode zoom must be a literal, got $other")
    }
    CellEncode(exprs(0), exprs(1), zoom)
  }

  val cellEncodeInfo = new ExpressionInfo(classOf[CellEncode].getName, "cell_encode")

  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.graft.ColumnShim.registerFunction(spark, "cell_encode", buildCellEncode)

  class GraftExtensions extends (SparkSessionExtensions => Unit) {
    override def apply(e: SparkSessionExtensions): Unit =
      e.injectFunction((FunctionIdentifier("cell_encode"), cellEncodeInfo, buildCellEncode))
  }
}
