package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-level change-data-capture between two versions of a keyed
  * table: which rows appeared, disappeared, or changed — the diff the
  * snapshot LOG can't answer (ChronoTable's `readIncremental` streams
  * appended FILES; after a compaction or partition overwrite the file
  * delta over-reports, while this operator reports the true row-level
  * delta). Feeds downstream incremental consumers: re-embed only
  * changed documents, re-cluster only changed near-dup inputs,
  * invalidate only changed rollup buckets.
  *
  * Scale shape: ONE full-outer equi join on the key (both sides
  * shuffle-partitioned by key, AQE handles skew), per-column
  * comparison is a codegen'd null-safe projection, unchanged rows are
  * filtered before any downstream work. Output ∝ churn, not table
  * size.
  */
object SnapshotDiff {

  /** Row-level diff. Output: key columns, `op` ('I' insert / 'D'
    * delete / 'U' update), `changed_cols` (sorted-as-given names of
    * value columns that differ; empty for I/D), and every value
    * column twice as `<c>_old` / `<c>_new` (null on the absent
    * side). Both inputs must share the schema; rows equal on ALL
    * value columns are dropped. Keys are assumed unique per side
    * (table-key contract, same as [[graft.table.ChronoTable]]'s
    * partition-overwrite keys).
    */
  def diff(oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "diff needs at least one key column")
    require(oldDf.columns.sorted.sameElements(newDf.columns.sorted),
      s"schemas differ: ${oldDf.columns.mkString(",")} vs ${newDf.columns.mkString(",")}")
    require(keyCols.forall(oldDf.columns.contains),
      s"missing key columns: ${keyCols.filterNot(oldDf.columns.contains)}")
    val valCols = newDf.columns.filterNot(keyCols.contains).toSeq
    val o = oldDf.select(keyCols.map(col) ++
      valCols.map(c => col(c).as(s"${c}_old")) :+ lit(1).as("_po"): _*)
    val n = newDf.select(keyCols.map(col) ++
      valCols.map(c => col(c).as(s"${c}_new")) :+ lit(1).as("_pn"): _*)
    val differs: Column = valCols
      .map(c => !(col(s"${c}_old") <=> col(s"${c}_new")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val changed: Column = filter(
      array(valCols.map(c =>
        when(!(col(s"${c}_old") <=> col(s"${c}_new")), lit(c))): _*),
      _.isNotNull)
    o.join(n, keyCols, "full_outer")
      .withColumn("op",
        when(col("_po").isNull, lit("I"))
          .when(col("_pn").isNull, lit("D"))
          .when(differs, lit("U")))
      .filter(col("op").isNotNull)
      .withColumn("changed_cols",
        when(col("op") === "U", changed)
          .otherwise(typedlit(Seq.empty[String])))
      .drop("_po", "_pn")
  }

  /** Diff two snapshots of a [[graft.table.ChronoTable]] by content.
    * Lineage columns the table layer stamps (`batch_id`) are excluded
    * from the comparison — they change on every rewrite without the
    * ROW changing.
    */
  def diffSnapshots(table: graft.table.ChronoTable, fromSnapshotId: Long,
      toSnapshotId: Long, keyCols: Seq[String],
      excludeCols: Seq[String] = Seq("batch_id")): DataFrame = {
    def prep(df: DataFrame): DataFrame =
      df.drop(excludeCols.filter(df.columns.contains): _*)
    diff(prep(table.read(fromSnapshotId)), prep(table.read(toSnapshotId)),
      keyCols)
  }
}
