package graft.oracle

import graft.model.{Tier, TierRow, Turn}

/** Deliberately naive, driver-local reimplementation of the reference
  * semantics (SURVEY.md §5): bucket → group → aggregate, computed with
  * plain Scala collections in canonical (conv_id, turn_idx) order. The
  * distributed engine must match this EXACTLY at small scale.
  *
  * Mirrors: time bucketing (reference `dt.round`, standardized to floor
  * — see SURVEY.md §2.5 W1), grouped multi-aggregate
  * (/root/reference/jaeger_prometheus_joining/featureengineering/
  * TraceInOneRowExploder.py:58-123), cumulative counts
  * (controlflow/Joiner.py:238-252).
  */
object Oracle {

  def bucketMicros(tsMicros: Long, tier: Tier): Long = {
    val w = tier.millis * 1000L
    math.floorDiv(tsMicros, w) * w
  }

  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L

  private def toTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(math.floorDiv(us, 1000L))
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** raw turns → tier rows (same metric set as graft.rollup.Rollup). */
  def rollup(turnsSeq: Seq[Turn], tier: Tier): Seq[TierRow] = {
    turnsSeq
      .sortBy(t => (t.conv_id, t.turn_idx))
      .groupBy(t => (t.conv_id, bucketMicros(micros(t.ts), tier)))
      .map { case ((conv, b), ts) =>
        // SQL sum/min/max skip nulls — mapping over raw text would
        // NPE on exactly the null-text turns text_cnt exists to
        // count. An ALL-null bucket has SQL-NULL text_len_* values,
        // which TierRow's Long fields cannot represent: fail loudly
        // (the engine's typed Dataset[TierRow] read would equally
        // refuse it) instead of fabricating a number.
        val lens = ts.collect { case t if t.text != null => t.text.length.toLong }
        require(lens.nonEmpty,
          s"bucket ($conv, $b) has only null text: text_len_* are SQL NULL, " +
            "outside TierRow's Long domain")
        TierRow(
          conv_id = conv,
          bucket_ts = toTs(b),
          turn_cnt = ts.size.toLong,
          tool_cnt = ts.count(_.tool.isDefined).toLong,
          text_cnt = ts.count(_.text != null).toLong,
          text_len_sum = lens.sum,
          text_len_min = lens.min,
          text_len_max = lens.max,
          role_user_cnt = ts.count(_.role == "user").toLong,
          role_assistant_cnt = ts.count(_.role == "assistant").toLong,
          role_tool_cnt = ts.count(_.role == "tool").toLong)
      }
      .toSeq
      .sortBy(r => (r.conv_id, r.bucket_ts.getTime))
  }

  /** Cumulative per-conversation counts up to each bucket (J3/A5). */
  def cumulative(rows: Seq[TierRow]): Seq[(String, java.sql.Timestamp, Long, Long, Long)] = {
    rows.groupBy(_.conv_id).toSeq.flatMap { case (conv, rs) =>
      val sorted = rs.sortBy(_.bucket_ts.getTime)
      var (ct, cl, cu) = (0L, 0L, 0L)
      sorted.map { r =>
        ct += r.turn_cnt; cl += r.tool_cnt; cu += r.text_len_sum
        (conv, r.bucket_ts, ct, cl, cu)
      }
    }.sortBy(x => (x._1, x._2.getTime))
  }

  /** Gap-fill by linear interpolation between the nearest non-missing
    * neighbors; leading/trailing gaps stay None (SURVEY.md §5 test 5).
    * Input: per-bucket optional values on a dense bucket grid.
    */
  def gapFillLinear(series: Seq[(Long, Option[Double])]): Seq[(Long, Option[Double])] = {
    val idxOfKnown = series.zipWithIndex.collect { case ((_, Some(_)), i) => i }
    series.zipWithIndex.map {
      case ((b, Some(v)), _) => (b, Some(v))
      case ((b, None), i) =>
        val prev = idxOfKnown.filter(_ < i).lastOption
        val next = idxOfKnown.find(_ > i)
        (prev, next) match {
          case (Some(p), Some(q)) =>
            val (bp, vp) = (series(p)._1.toDouble, series(p)._2.get)
            val (bq, vq) = (series(q)._1.toDouble, series(q)._2.get)
            (b, Some(vp + (vq - vp) * ((b - bp) / (bq - bp))))
          case _ => (b, None)
        }
    }
  }
}
