package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval overlap join — the time-series join the engine's
  * as-of operator doesn't cover: match each point sample to EVERY
  * interval (maintenance window, incident, deploy, session) that
  * contains it, not just the nearest neighbor. The reference's
  * trace↔metric alignment rounds both feeds to a shared timestamp
  * grid (/root/reference/jaeger_prometheus_joining/
  * transformationscripts/JoinManager.py:86-99) and therefore cannot
  * answer "which samples fell inside this span's duration" at all;
  * this operator is that missing range predicate, Spark-first.
  *
  * Scale design: a raw range-condition join (`p.ts BETWEEN i.start
  * AND i.end`) has no equi key, so Spark plans it as a broadcast
  * nested loop — O(points × intervals), the classic range-join trap.
  * Here both sides are mapped onto a fixed-width ts-bucket grid:
  * each interval explodes to the buckets it covers, each point lands
  * in exactly ONE bucket, and the join becomes an EQUI join on
  * (equiKeys, bucket) with the exact range predicate applied after.
  * Shuffle is points + Σ(interval_width / bucketWidth) rows, hash-
  * partitioned on the bucket key — no nested loop at any size
  * (PlanAuditSpec pins the physical plan). Buckets also bound skew:
  * a year-long interval fans out over its buckets instead of
  * funneling every overlapping point through one join row.
  *
  * Pick `bucketWidthSpec` near the MEDIAN interval width: wider
  * buckets cut the interval fan-out, narrower buckets cut the
  * false-candidate rate of the post-filter. Both mis-tunings are
  * linear-factor costs, never correctness.
  */
object IntervalJoin {

  /** Inner-join `points` to every row of `intervals` whose
    * `[startCol, endCol)` half-open range contains the point's
    * `pointTs` (and whose `equiKeys` match, when given). Output
    * carries all columns of both inputs (names must be disjoint
    * apart from `equiKeys`); a point inside k overlapping intervals
    * emits k rows. Intervals with `end <= start` are empty ranges
    * and match nothing.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointTs: String,
      startCol: String,
      endCol: String,
      equiKeys: Seq[String],
      bucketWidthSpec: String): DataFrame = {
    val widthUs = graft.rollup.Rollup.parseWidthUs(bucketWidthSpec)
    require(widthUs > 0, s"bucket width must be positive: $bucketWidthSpec")
    val clash = points.columns.toSet
      .intersect(intervals.columns.toSet) -- equiKeys
    require(clash.isEmpty,
      s"non-key column names must be disjoint, both sides have: $clash")

    // sources may carry TIMESTAMP_NTZ (driver parquet does) and
    // unix_micros accepts only TIMESTAMP; session TZ is pinned UTC so
    // the cast is value-stable (same pattern as SeriesFunctions)
    def us(c: String, df: DataFrame) =
      unix_micros(df(c).cast("timestamp"))

    val p = points.withColumn("_ij_bucket",
      floor(us(pointTs, points) / lit(widthUs)).cast("long"))
    // half-open [start, end): the last covered bucket is the one
    // holding end − 1µs, so back-to-back intervals never double-claim
    // the boundary bucket's points (the post-filter would drop the
    // dupes, but not the wasted candidates)
    val iv = intervals
      .filter(col(endCol).cast("timestamp") > col(startCol).cast("timestamp"))
      .withColumn("_ij_bucket", explode(sequence(
        floor(us(startCol, intervals) / lit(widthUs)).cast("long"),
        floor((us(endCol, intervals) - lit(1L)) / lit(widthUs)).cast("long"))))

    p.join(iv, equiKeys :+ "_ij_bucket")
      .filter(col(pointTs).cast("timestamp") >= col(startCol).cast("timestamp")
        && col(pointTs).cast("timestamp") < col(endCol).cast("timestamp"))
      .drop("_ij_bucket")
  }

  /** Interval×interval overlap join: rows of `left` and `right`
    * whose half-open ranges intersect (`lStart < rEnd && rStart <
    * lEnd`), same bucket-grid equi-join strategy. Both sides explode
    * to covered buckets, so a pair overlapping across k shared
    * buckets would surface k times — the duplicate join keys are cut
    * BEFORE the payload join by deduping the candidate pair ids.
    * Callers supply `leftId`/`rightId` as unique row keys.
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      leftId: String, lStart: String, lEnd: String,
      rightId: String, rStart: String, rEnd: String,
      equiKeys: Seq[String],
      bucketWidthSpec: String): DataFrame = {
    val widthUs = graft.rollup.Rollup.parseWidthUs(bucketWidthSpec)
    require(widthUs > 0, s"bucket width must be positive: $bucketWidthSpec")

    def buckets(df: DataFrame, s: String, e: String) = df
      .filter(col(e).cast("timestamp") > col(s).cast("timestamp"))
      .withColumn("_ij_bucket", explode(sequence(
        floor(unix_micros(df(s).cast("timestamp")) / lit(widthUs)).cast("long"),
        floor((unix_micros(df(e).cast("timestamp")) - lit(1L)) / lit(widthUs))
          .cast("long"))))

    val lb = buckets(left, lStart, lEnd)
      .select((equiKeys :+ leftId :+ lStart :+ lEnd :+ "_ij_bucket").map(col): _*)
    val rb = buckets(right, rStart, rEnd)
      .select((equiKeys :+ rightId :+ rStart :+ rEnd :+ "_ij_bucket").map(col): _*)
    val candidates = lb.join(rb, equiKeys :+ "_ij_bucket")
      .filter(col(lStart).cast("timestamp") < col(rEnd).cast("timestamp")
        && col(rStart).cast("timestamp") < col(lEnd).cast("timestamp"))
      .select(col(leftId), col(rightId))
      .distinct()

    // right's equi keys equal left's on every surviving pair — drop
    // them so the payload join emits ONE unambiguous key column set
    candidates
      .join(left, Seq(leftId))
      .join(right.drop(equiKeys: _*), Seq(rightId))
  }
}
