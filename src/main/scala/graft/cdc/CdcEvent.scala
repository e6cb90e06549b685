package graft.cdc

import java.sql.Timestamp

/** One change event from the source's logical replication feed.
  *
  * Mirrors the observable envelope of the reference's CDC connector
  * (publication over N tables emitting INSERT/UPDATE/DELETE row images in
  * commit order — /root/reference sql/0.init_healthcare.sql:353-357):
  *
  *  - `lsn` — monotonic commit ordinal; total order across the feed
  *    (sql/3.live_appointments.sql:332 relies on deterministic ordering).
  *  - `key` — primary-key value of the affected row.
  *  - `after` — post-image column values as strings (absent for DELETE);
  *    the applier casts them against the destination schema at merge time,
  *    which is where the source's CHECK-constraint validation lives.
  */
final case class CdcEvent(
    table: String,
    op: String, // INSERT | UPDATE | DELETE
    lsn: Long,
    commitTs: Timestamp,
    key: Long,
    after: Map[String, String])

object CdcOp {
  val Insert = "INSERT"
  val Update = "UPDATE"
  val Delete = "DELETE"
}
