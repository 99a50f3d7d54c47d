package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test bridge to Spark's `private[sql]` extension application, so the
  * spec can prove `GraftExtensions.injectFunction` actually lands
  * functions in a registry — without constructing a second
  * SparkSession (extensions only apply at session construction, and
  * the shared test JVM already has one). Lives under
  * `org.apache.spark.sql` purely for access; contains no Spark code.
  */
object ExtensionsBridge {
  def applyFunctions(ext: SparkSessionExtensions,
      registry: FunctionRegistry): FunctionRegistry =
    ext.registerFunctions(registry)
}
