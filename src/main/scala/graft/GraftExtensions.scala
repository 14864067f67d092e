package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.functions.GraftFunctions
import graft.sources.gsheets.GSheetsExtensions

/** Whole-engine session extension: the gsheets URL replacement-scan
  * rule plus the native SQL functions. Install with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    new GSheetsExtensions()(extensions)
    GraftFunctions.functions.foreach { case (name, info, builder) =>
      extensions.injectFunction((FunctionIdentifier(name), info, builder))
    }
    extensions.injectPlannerStrategy(_ => graft.plans.GraftStrategies)
  }
}
