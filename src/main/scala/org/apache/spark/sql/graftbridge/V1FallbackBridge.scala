package org.apache.spark.sql.graftbridge

/** Bridge for `V2TableWithV1Fallback` (Scala `private[sql]`): Spark's
  * streaming resolution falls a v2 catalog table back to its v1
  * provider through this trait — the hook that lets a custom catalog's
  * tables serve `readStream.table(name)` / `writeStream.toTable(name)`
  * via a v1 StreamSourceProvider/StreamSinkProvider. Same shim pattern
  * as [[ColumnBridge]]. */
trait V1FallbackBridge
  extends org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback
