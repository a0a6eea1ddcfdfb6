package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-only accessor for the `private[sql]` extension hooks, so specs
  * can assert what `spark.sql.extensions=graft.functions.GraftExtensions`
  * installs without building a whole new SparkSession (the shared test
  * session is created once; extensions only apply at session build). */
object GraftExtensionsTestAccess {
  def buildRegistry(ext: SparkSessionExtensions,
      base: FunctionRegistry): FunctionRegistry =
    ext.registerFunctions(base)
}
