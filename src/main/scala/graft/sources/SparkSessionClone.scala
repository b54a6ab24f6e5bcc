// The ONE `private[sql]` Spark API this library needs: cloneSession(),
// which copies the session state (conf, temp views) into an isolated
// child session. graft stages table writes through a clone so the
// mandatory TIMESTAMP_MICROS parquet override lives only on the clone —
// no JVM-wide lock serializing unrelated writes, no conf leak into the
// user's session (ManifestTable.stageIndexed). Same access-package
// bridge Delta Lake and Iceberg ship for the identical need; nothing
// else from the sql package is touched.
package org.apache.spark.sql.graft

import org.apache.spark.sql.classic.SparkSession

object SessionClone {
  def apply(s: SparkSession): SparkSession = s.cloneSession()
}
