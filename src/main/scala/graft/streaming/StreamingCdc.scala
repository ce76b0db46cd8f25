package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC apply — the continuous sibling of
  * [[graft.ops.Warehouse.applyCdc]]: a keyed change stream (op `'U'`
  * upsert / `'D'` delete, monotone-ish versions) folds into per-key
  * latest-wins state via `mapGroupsWithState`, emitting each touched key's
  * resolved current row every micro-batch (update mode).
  *
  * Resolution rule matches the batch operator: the highest version wins;
  * at equal versions the later-processed change wins (batch processing
  * order within a micro-batch, micro-batch order across them — the
  * streaming analogue of "update beats base"). A winning delete stays in
  * state as a TOMBSTONE (`deleted = true`) rather than vanishing, so a
  * stale lower-version upsert arriving later cannot resurrect the key —
  * the reason real CDC sinks keep tombstones.
  *
  * State per key is one (version, op, payload) triple — bounded by the
  * number of LIVE keys, not stream length. For unbounded key spaces add a
  * timeout-driven tombstone GC (ProcessingTimeTimeout + state.remove) —
  * deliberately not defaulted here, because dropping a tombstone early is
  * a correctness trade.
  */
object StreamingCdc {

  final case class CdcChange(key: Long, version: Long, op: String, payload: String)
  final case class CdcKeyState(version: Long, deleted: Boolean, payload: String)
  final case class CdcCurrent(key: Long, version: Long, deleted: Boolean,
                              payload: String)

  /** Fold a change stream into per-key current rows (one output row per
    * touched key per micro-batch; `deleted = true` rows are retraction
    * notices for the sink). */
  def latestByKey(changes: Dataset[CdcChange]): Dataset[CdcCurrent] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes.groupByKey(_.key)
      .mapGroupsWithState[CdcKeyState, CdcCurrent](GroupStateTimeout.NoTimeout()) {
        (key, rows, state: GroupState[CdcKeyState]) =>
          // later-processed change wins ties (>=): the streaming analogue
          // of the batch operator's "change beats base at equal versions"
          var cur: Option[CdcKeyState] = state.getOption
          rows.foreach { c =>
            if (cur.forall(c.version >= _.version))
              cur = Some(CdcKeyState(c.version, c.op == "D", c.payload))
          }
          val s = cur.get // rows is non-empty for an invoked group
          state.update(s)
          CdcCurrent(key, s.version, s.deleted, s.payload)
      }
  }
}
