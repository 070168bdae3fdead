package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session extensions for the graft engine — the public plug-in point
  * for custom Catalyst pieces (SURVEY §7.3). Injects the codegen'd
  * `cosine_sim` scalar and the `hll_estimate` / `cm_sketch`
  * typed-imperative aggregates; activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * (Verify, Bench, and the test fixtures all do).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(functions.CosineSimilarity.description)
    ext.injectFunction(functions.HllEstimate.description)
    ext.injectFunction(functions.CmSketch.description)
  }
}
