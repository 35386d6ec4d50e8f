package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-only bridge to the private[sql] registration hook — lets the
  * spec drive the same code path session construction runs for
  * spark.sql.extensions without building a second SparkContext. */
object ExtensionsTestBridge {
  def register(ext: SparkSessionExtensions, reg: FunctionRegistry): Unit =
    ext.registerFunctions(reg)
}
