package graft

import org.apache.spark.sql.SparkSessionExtensions

/**
 * SparkSessionExtensions injector: activate graft's native expressions
 * cluster-wide with
 *   spark.sql.extensions=graft.GraftExtensions
 * (no code changes in the consuming job — the standard way to ship a
 * Catalyst extension library). `graft.functions.Registry.ensure` is
 * the equivalent runtime-registration path for embedded use; both
 * routes register the SAME [[graft.functions.Registry.defs]] list, so
 * they cannot drift.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.Registry.defs.foreach(ext.injectFunction)
}
