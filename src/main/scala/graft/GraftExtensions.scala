package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.GraftFunctionRegistry

/** Session-extensions entry point: makes every graft native expression a
  * SQL function on sessions built with
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * (`--conf` on spark-submit, or `.config(...)` on the builder). This is
  * the cluster-deployment path — one config line and `spark.sql` users get
  * `graft_simhash`, `graft_minhash`, `graft_quality_keep`, the vector
  * kernels, etc., with no code change. `Verify` and `Bench` build their
  * sessions this way, so the driver's DuckDB gate (`sql_functions` row)
  * checks this exact path, not just the API-side registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctionRegistry.all.foreach(ext.injectFunction)
}
