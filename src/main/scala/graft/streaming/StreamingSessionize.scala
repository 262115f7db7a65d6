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
      open: Boolean,
      // highest turn_idx ever processed — the sentinel that makes
      // cross-batch out-of-order delivery OBSERVABLE (ADVICE r3): the
      // gap rule diffs consecutive-by-turn_idx timestamps, so a turn
      // with a LOWER index arriving in a LATER batch can split/merge
      // differently from batch; such arrivals are counted into the
      // caller's accumulator instead of failing silently
      lastTurnIdx: Long = -1L)

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

  /** The state-transition handler, exposed for direct unit testing.
    *
    * @param outOfOrder when set, counts turns whose turn_idx is ≤ the
    *   conversation's highest already-processed index — cross-batch
    *   out-of-order delivery that the documented turn_idx-monotone
    *   precondition forbids. The turns are still processed (best
    *   effort), but parity breaks become an observable metric.
    * @param evictAfterUs when set, CLOSED state is removed once the
    *   watermark advances this far past the closure — bounding total
    *   state for workloads with unbounded conversation churn, at the
    *   documented price that a conversation resuming AFTER eviction
    *   restarts session ids from 0 (the default None keeps state
    *   O(#conversations) and ids continuous forever).
    */
  private[streaming] def handle(gapUs: Long,
      outOfOrder: Option[org.apache.spark.util.LongAccumulator] = None,
      evictAfterUs: Option[Long] = None)(
      conv: String, turns: Iterator[Turn], state: GroupState[ConvState])
      : Iterator[SessionRow] = {
    if (state.hasTimedOut) {
      // watermark passed session_end + gap: emit the closure but KEEP
      // the state (open = false) — dropping it would reset
      // nextSessionId, and a resumed conversation would re-issue
      // session_id 0, breaking batch parity and keyed sinks. A
      // post-timeout turn necessarily has ts > watermark > end+gap,
      // so batch would also have split there: parity is preserved.
      // With an eviction TTL, a second timeout is armed instead and
      // its firing (open already false) removes the state for good.
      val out = state.getOption.filter(_.open).map(closedRow(conv, _))
      state.getOption match {
        case Some(st) if st.open =>
          state.update(st.copy(open = false))
          evictAfterUs.foreach { e =>
            state.setTimeoutTimestamp(
              state.getCurrentWatermarkMs() + Math.floorDiv(e + 999L, 1000L))
          }
        case Some(_) if evictAfterUs.isDefined => state.remove()
        case _ => ()
      }
      out.iterator
    } else {
      // event order within the batch: by turn_idx, the conversation's
      // stable order contract (W5). Cross-batch, delivery must be
      // turn_idx-monotone per conversation (which event-time
      // watermarking of an ordered producer gives).
      val sorted = turns.toSeq.sortBy(_.turn_idx)
      var st = state.getOption.getOrElse(
        ConvState(nextSessionId = 0L, sessionId = -1L, 0L, 0L, 0L, 0L, open = false))
      // observe (don't silently absorb) turns arriving BELOW the
      // already-processed index frontier — the precondition batch
      // parity rests on (see handle's scaladoc)
      val prevIdx = st.lastTurnIdx
      if (prevIdx >= 0L) {
        val late = sorted.count(_.turn_idx.toLong <= prevIdx)
        if (late > 0) outOfOrder.foreach(_.add(late.toLong))
      }
      val maxIdx = sorted.lastOption
        .map(t => math.max(prevIdx, t.turn_idx.toLong)).getOrElse(prevIdx)
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
      state.update(st.copy(lastTurnIdx = maxIdx))
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
    *
    * @param outOfOrder optional accumulator (register one via
    *   `spark.sparkContext.longAccumulator("...")`) counting turns
    *   that violate the per-conversation turn_idx-monotone delivery
    *   precondition — visible in the Spark UI / readable per batch,
    *   so batch-parity breaks are an alarm, not a silent drift.
    * @param evictAfterUs optional state TTL past session closure —
    *   bounds total state under unbounded conversation churn; a
    *   conversation resuming after eviction restarts session ids at 0
    *   (keep the default None when id continuity matters more).
    */
  def sessions(stream: Dataset[Turn], gapUs: Long = 1800L * 1000000L,
      lateness: String = "10 minutes",
      outOfOrder: Option[org.apache.spark.util.LongAccumulator] = None,
      evictAfterUs: Option[Long] = None): Dataset[SessionRow] = {
    import stream.sparkSession.implicits._
    stream
      .withWatermark("ts", lateness)
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(handle(gapUs, outOfOrder, evictAfterUs))
  }
}
