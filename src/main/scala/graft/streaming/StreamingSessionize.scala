package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.Turn

/** Stateful streaming sessionization — the custom-state counterpart
  * of the batch `q_sessionize` window plan, built on
  * `flatMapGroupsWithState` (the build brief's §2.8 state primitive):
  * per-conversation session state survives across micro-batches, and
  * a session CLOSES either when a turn arrives more than `gapUs`
  * after the previous one, or when the event-time watermark passes
  * `session_end + gap` (EventTimeTimeout) — so idle conversations
  * emit their last session without waiting for more data.
  *
  * Exactly the batch gap rule (q_sessionize / the reference's
  * trace-window semantics): session ids count gap-splits from 0 per
  * conversation, so a drained stream's closed sessions equal the
  * batch query's rows (asserted in StreamingSessionizeSpec).
  *
  * Scale notes: state per KEY is one compact session record (constant
  * size — not the turn history); turns within a micro-batch are
  * sorted per conversation (bounded by per-conv batch volume, never
  * the full stream). State persists after closure so session ids
  * survive idle gaps — total state is O(#conversations), the same
  * order as any per-conversation batch aggregate.
  */
object StreamingSessionize {

  /** Closed session row — matches q_sessionize's output shape. */
  final case class SessionRow(
      conv_id: String,
      session_id: Long,
      turn_cnt: Long,
      session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp)

  /** Per-conversation state: the next session id to assign and the
    * currently open session (compact — O(1) per key). `lastUs` is the
    * timestamp of the most recent turn in TURN-INDEX order — the
    * batch plan's gap rule diffs consecutive-by-turn_idx timestamps,
    * NOT the running max, so out-of-order timestamps within a
    * conversation split exactly like batch. State persists after a
    * session closes (open = false) so `nextSessionId` survives idle
    * timeouts and resumed conversations keep batch-equal session ids;
    * total state is therefore O(#conversations), the same order as
    * any per-conversation batch aggregate.
    *
    * NOTE: this schema is part of the streaming checkpoint — changing
    * its fields invalidates existing checkpoints (restart streams
    * from a fresh checkpointLocation across such a change).
    */
  final case class ConvState(
      nextSessionId: Long,
      sessionId: Long,
      startUs: Long,
      endUs: Long,
      lastUs: Long,
      turnCnt: Long,
      open: Boolean)

  /** Full microsecond precision: getTime alone is millis — the nanos
    * field carries the sub-millisecond part the tier timestamps have.
    */
  private def tsUs(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def usTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  private def closedRow(conv: String, st: ConvState): SessionRow =
    SessionRow(conv, st.sessionId, st.turnCnt, usTs(st.startUs), usTs(st.endUs))

  /** The state-transition handler, exposed for direct unit testing. */
  private[streaming] def handle(gapUs: Long)(
      conv: String, turns: Iterator[Turn], state: GroupState[ConvState])
      : Iterator[SessionRow] = {
    if (state.hasTimedOut) {
      // watermark passed session_end + gap: emit the closure but KEEP
      // the state (open = false, no further timeout) — dropping it
      // would reset nextSessionId, and a resumed conversation would
      // re-issue session_id 0, breaking batch parity and keyed sinks.
      // A post-timeout turn necessarily has ts > watermark > end+gap,
      // so batch would also have split there: parity is preserved.
      val out = state.getOption.filter(_.open).map(closedRow(conv, _))
      state.getOption.foreach(st => state.update(st.copy(open = false)))
      out.iterator
    } else {
      // event order within the batch: by turn_idx, the conversation's
      // stable order contract (W5). Cross-batch, delivery must be
      // turn_idx-monotone per conversation (which event-time
      // watermarking of an ordered producer gives).
      val sorted = turns.toSeq.sortBy(_.turn_idx)
      var st = state.getOption.getOrElse(
        ConvState(nextSessionId = 0L, sessionId = -1L, 0L, 0L, 0L, 0L, open = false))
      val closed = scala.collection.mutable.ArrayBuffer.empty[SessionRow]
      sorted.foreach { t =>
        val us = tsUs(t.ts)
        if (!st.open) {
          st = ConvState(st.nextSessionId + 1, st.nextSessionId,
            us, us, us, 1L, open = true)
        } else if (us - st.lastUs > gapUs) {
          // the BATCH gap rule: diff against the PREVIOUS turn in
          // turn_idx order (lag), not the running max timestamp
          closed += closedRow(conv, st)
          st = ConvState(st.nextSessionId + 1, st.nextSessionId,
            us, us, us, 1L, open = true)
        } else {
          st = st.copy(startUs = math.min(st.startUs, us),
            endUs = math.max(st.endUs, us), lastUs = us,
            turnCnt = st.turnCnt + 1)
        }
      }
      state.update(st)
      // close the open session once the watermark passes end + gap.
      // CEILING millis: truncating each term would let the timeout
      // fire up to ~2ms before end+gap, opening a tiny window where a
      // within-gap turn starts a new session the batch plan would
      // have merged
      if (st.open)
        state.setTimeoutTimestamp(
          Math.floorDiv(st.endUs + gapUs + 999L, 1000L))
      closed.iterator
    }
  }

  /** Sessionize a streaming Dataset of turns. Emits one row per
    * CLOSED session (append mode). `lateness` is the event-time
    * watermark delay; data later than that is dropped by the
    * watermark, the same trade as [[StreamingRollup.windowedRollup]].
    */
  def sessions(stream: Dataset[Turn], gapUs: Long = 1800L * 1000000L,
      lateness: String = "10 minutes"): Dataset[SessionRow] = {
    import stream.sparkSession.implicits._
    stream
      .withWatermark("ts", lateness)
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(handle(gapUs))
  }
}
