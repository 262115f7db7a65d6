package org.apache.spark.rdd

/** Bridge for `RDD.isLocallyCheckpointed` (package-restricted in
  * Spark): [[org.apache.spark.sql.GraftShims.checkpointedRdd]] needs
  * it to make its "never unpersist what you did not checkpoint"
  * contract real. Same pattern as GraftShims' Column bridge.
  */
object GraftRddShims {
  def isLocallyCheckpointed(rdd: RDD[_]): Boolean = rdd.isLocallyCheckpointed
}
