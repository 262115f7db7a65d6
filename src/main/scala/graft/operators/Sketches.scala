package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.MirrorHash

/** Count-min sketch: fixed-size frequency summaries over unbounded
  * key domains. The exact path (`groupBy(key).count()`) shuffles one
  * row per DISTINCT key — at 100 TB of, say, URL or n-gram keys that
  * is itself a multi-TB shuffle; the sketch caps the state at
  * `depth × width` counters regardless of cardinality, trading a
  * bounded OVERestimate (never under) for constant size. Counters
  * merge by addition, so partial sketches combine across partitions
  * (map-side), batches, and streams without rescanning history.
  *
  * Spark-first shape: the sketch IS a (depth × width)-row DataFrame
  * built by one explode + map-side-combined groupBy — no driver
  * state, no UDAF buffer; estimates probe it with a broadcast join.
  *
  * Determinism/oracle design: rows hash with the [[MirrorHash]]
  * affine family over [[graft.functions.TextFunctions.fingerprint]]
  * values, so DuckDB can build the bit-identical sketch from the
  * same parquet and the heavy-hitter query is HASH-checked, not
  * rows-only (every count and estimate is exact integer arithmetic).
  */
object Sketches {

  /** Max depth: a(salt, i)/b(salt, i) streams are unbounded, this is
    * a sanity rail — past ~8 rows the error-probability gain is nil.
    */
  val MaxDepth = 16

  private def rowBucket(fpCol: Column, i: Int, width: Int): Column = {
    val aa = MirrorHash.a(MirrorHash.CmsSalt, i)
    val bb = MirrorHash.b(MirrorHash.CmsSalt, i)
    MirrorHash.affine(fpCol, aa, bb) % lit(width.toLong)
  }

  private def probes(fpCol: Column, depth: Int, width: Int): Column =
    explode(array((0 until depth).map { i =>
      struct(lit(i).as("cms_row"),
        rowBucket(fpCol, i, width).as("cms_bucket"))
    }: _*))

  /** Build the sketch: one row per touched (cms_row, cms_bucket)
    * with its hit count `cnt` (untouched buckets are implicit zeros —
    * [[cmsEstimate]] coalesces). `fpCol` must be a fingerprint in
    * [0, 2³¹−1), e.g. `TextFunctions.fingerprint(col("tok"))`.
    * Output size ≤ depth × width rows however large `items` is; the
    * groupBy partials combine map-side, so the shuffle is bounded by
    * depth × width per input partition, not by |items|.
    */
  def cmsBuild(items: DataFrame, fpCol: Column, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= MaxDepth, s"depth must be in [1, $MaxDepth]: $depth")
    require(width >= 2, s"width must be >= 2: $width")
    items.select(probes(fpCol, depth, width).as("_rb"))
      .groupBy(col("_rb.cms_row").as("cms_row"),
        col("_rb.cms_bucket").as("cms_bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge two partial sketches built with the same (depth, width):
    * counters add. This is what makes the sketch incremental — a
    * day's partial folds into the running total without touching
    * prior days' raw data.
    */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("cms_row", "cms_bucket")
      .agg(sum("cnt").as("cnt"))

  /** Point-estimate the count of each row of `keys`: min over the
    * depth counters the key hashes to (the count-min rule — each
    * counter OVERcounts by its collisions, the min is the tightest).
    * `fpCol` must evaluate on `keys` to the same fingerprint used at
    * build time; `keyCols` are carried through to the output next to
    * `cms_est`. The sketch side is ≤ depth × width rows, so the join
    * is an explicit broadcast — probing never shuffles the keys.
    */
  def cmsEstimate(sketch: DataFrame, keys: DataFrame, fpCol: Column,
      keyCols: Seq[String], depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= MaxDepth, s"depth must be in [1, $MaxDepth]: $depth")
    require(width >= 2, s"width must be >= 2: $width")
    keys
      .select(keyCols.map(col) :+ probes(fpCol, depth, width).as("_rb"): _*)
      .select(keyCols.map(col) :+ col("_rb.cms_row").as("cms_row")
        :+ col("_rb.cms_bucket").as("cms_bucket"): _*)
      .join(broadcast(sketch), Seq("cms_row", "cms_bucket"), "left")
      .groupBy(keyCols.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }

  /** Support-based heavy hitters: keys whose estimated count clears
    * `minSupportPermille`/1000 of the total item count — the φN rule,
    * scale-free so the same query is meaningful at any corpus size.
    * The total comes from the sketch itself (row 0's counters sum to
    * |items|), NOT a second scan. Candidates are the distinct keys of
    * `items` projected on `keyCols` (`fpCol` must be derivable from
    * those columns); by the overestimate guarantee no true heavy
    * hitter is missed — false POSITIVES near the threshold are the
    * sketch's documented slack.
    */
  def cmsHeavyHitters(items: DataFrame, fpCol: Column, keyCols: Seq[String],
      depth: Int, width: Int, minSupportPermille: Int): DataFrame = {
    require(minSupportPermille >= 1 && minSupportPermille <= 1000,
      s"minSupportPermille must be in [1, 1000]: $minSupportPermille")
    val sketch = cmsBuild(items, fpCol, depth, width)
    val total = sketch.filter(col("cms_row") === 0)
      .agg(sum(col("cnt")).as("_total"))
    val keys = items.select(keyCols.map(col): _*).distinct()
    cmsEstimate(sketch, keys, fpCol, keyCols, depth, width)
      .crossJoin(broadcast(total))
      .filter(col("cms_est") * lit(1000L) >=
        col("_total") * lit(minSupportPermille.toLong))
      .drop("_total")
  }
}
