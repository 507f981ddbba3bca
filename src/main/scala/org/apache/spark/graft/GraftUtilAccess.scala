package org.apache.spark.graft

import org.apache.hadoop.conf.Configuration
import org.apache.spark.util.SerializableConfiguration

/** Narrow accessor into `private[spark]` util internals — same shim
  * technique (and one-forwarder-per-internal rule) as
  * [[org.apache.spark.sql.graft.GraftSqlAccess]]. A task writing
  * through the Hadoop FileSystem API needs the DRIVER's Hadoop
  * configuration on the executor (a task-side `new Configuration()`
  * would silently drop any fs.* settings the session carries);
  * Spark's own datasources ship it with SerializableConfiguration,
  * which is `private[spark]` — even as a TYPE, so the handle crosses
  * graft code as an opaque serializable AnyRef and is unwrapped back
  * here. */
object GraftUtilAccess {

  /** Wrap the driver's Hadoop conf for closure capture. */
  def serializableConf(conf: Configuration): AnyRef =
    new SerializableConfiguration(conf)

  /** Unwrap on the task side. */
  def confOf(handle: AnyRef): Configuration =
    handle.asInstanceOf[SerializableConfiguration].value
}
