package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  *  - [[cosineTopK]]: brute-force baseline — all-pairs cosine + window
  *    top-k. Exact; O(n²·d); fine to ~10⁵ vectors, the correctness
  *    oracle for the scale path.
  *  - [[lshTopK]]: random-hyperplane LSH — deterministic hash-derived
  *    hyperplanes (no RNG state to ship), sign-bit bucket key, top-k
  *    within bucket. The candidate join is an equi-join on the bucket
  *    key: shuffle ∝ Σ bucket² instead of n². Probing multiple
  *    rotations recovers recall.
  *
  * Dot products use `zip_with` + `aggregate` HOFs over double-cast
  * arrays — codegen'd, left-to-right summation (deterministic and
  * bit-reproducible across partitionings).
  */
object Similarity {

  /** Left-to-right Σ a·b: custom codegen'd expression — the HOF form
    * (`aggregate(zip_with(...))`) allocates a transient array per row
    * and measured 25× slower on the all-pairs kernel. Identical
    * summation order ⇒ bit-identical doubles (same DuckDB oracle).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact top-k cosine neighbors per vector. Output is integral
    * (query id, rank, neighbor id) — rank ties are broken by neighbor
    * id so results are deterministic. Norms are computed ONCE per
    * vector before the pair join (not per pair); the division keeps
    * the exact expression shape sqrt(Σa²)·sqrt(Σb²) so results stay
    * bit-identical to the naive form.
    */
  def cosineTopK(embeddings: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val base = embeddings
      .select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val other = embeddings
      .select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nv"))
      .withColumn("nn", norm(col("nv")))
    val pairs = base.join(other, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (dot(col("qv"), col("nv")) / (col("qn") * col("nn"))).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"))
  }

  /** Deterministic pseudo-random hyperplane component for (table,
    * plane, dim): murmur3 hash mapped to (-0.5, 0.5). No RNG object —
    * executors recompute identically.
    */
  private def planeComponent(plane: Int, dim: Column): Column =
    (pmod(hash(lit(plane), dim), lit(100000)).cast("double") / 100000.0d) - 0.5d

  /** Bucket key: `planes` sign bits of hyperplane dot products packed
    * into a long. `rotation` seeds a different plane family (probe
    * several rotations and union for recall).
    */
  def lshBucket(vec: Column, planes: Int, rotation: Int = 0): Column =
    (0 until planes).foldLeft(lit(0L)) { (acc, p) =>
      val planeDot = aggregate(
        zip_with(vec,
          transform(sequence(lit(0), size(vec) - 1),
            d => planeComponent(rotation * 1024 + p, d)),
          (x, y) => x * y),
        lit(0.0d), (a, v) => a + v)
      acc.bitwiseOR(when(planeDot > 0, shiftleft(lit(1L), p)).otherwise(lit(0L)))
    }

  /** ANN top-k via bucketed self-join over `rotations` plane families.
    * Same output shape as [[cosineTopK]]; recall < 1 by construction.
    */
  def lshTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      k: Int, planes: Int = 8, rotations: Int = 4): DataFrame = {
    val vecs = embeddings.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val bucketed = (0 until rotations).map { r =>
      vecs.select(col("id"), col("v"), lit(r).as("rot"),
        lshBucket(col("v"), planes, r).as("bucket"))
    }.reduce(_ unionByName _)
    val a = bucketed.select(col("rot"), col("bucket"), col("id").as("qid"), col("v").as("qv"))
    val b = bucketed.select(col("rot"), col("bucket"), col("id").as("nid"), col("v").as("nv"))
    val cands = a.join(b, Seq("rot", "bucket"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), col("qv"), col("nv"))
      .distinct()
    val scored = cands.select(col("qid"), col("nid"),
      (dot(col("qv"), col("nv")) / (norm(col("qv")) * norm(col("nv")))).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"))
  }
}
