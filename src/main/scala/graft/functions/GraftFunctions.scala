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

  private def buildCosineSim(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "cosine_sim(a, b)")
    CosineSim(exprs(0), exprs(1))
  }

  val cellEncodeInfo = new ExpressionInfo(classOf[CellEncode].getName, "cell_encode")
  val cosineSimInfo = new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim")

  def register(spark: SparkSession): Unit = {
    org.apache.spark.sql.graft.ColumnShim.registerFunction(spark, "cell_encode", buildCellEncode)
    org.apache.spark.sql.graft.ColumnShim.registerFunction(spark, "cosine_sim", buildCosineSim)
  }

  class GraftExtensions extends (SparkSessionExtensions => Unit) {
    override def apply(e: SparkSessionExtensions): Unit = {
      e.injectFunction((FunctionIdentifier("cell_encode"), cellEncodeInfo, buildCellEncode))
      e.injectFunction((FunctionIdentifier("cosine_sim"), cosineSimInfo, buildCosineSim))
    }
  }
}
