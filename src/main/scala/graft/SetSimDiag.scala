package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Throwaway r06 diagnostic: cardinalities + stage timings of the
  * q_setsim_join chain at a given SF dir. Not part of any gate.
  */
object SetSimDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[diag] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val (tNum, tDen) = (1, 4)
    val gkey = Seq("lang", "source", "shingle")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"[diag] docs = ${docs.count()}")
    val shingles = graft.operators.Dedup.charShingles(
      docs, "doc_id", "text", 5, keepCols = Seq("lang", "source"))
    val sh = shingles.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("shingles materialize")(sh.count())
    println(s"[diag] shingle rows = ${sh.count()}")
    val dfreq = sh.groupBy(gkey.map(col): _*).agg(count(lit(1)).as("_df"))
    val wSz = Window.partitionBy(col("doc_id"))
    val wRk = Window.partitionBy(col("doc_id"))
      .orderBy(col("_df").asc, col("shingle").asc)
    val ceilT = floor((lit(tNum.toLong) * col("_sz") + lit(tDen.toLong - 1))
      .cast("double") / lit(tDen.toDouble)).cast("long")
    val prefix = timed("prefix checkpoint")(sh
      .join(dfreq, gkey)
      .withColumn("_sz", count(lit(1)).over(wSz))
      .withColumn("_rk", row_number().over(wRk))
      .filter(col("_rk") <= col("_sz") - ceilT + 1)
      .select(gkey.map(col) ++ Seq(col("doc_id"), col("_sz"), col("_rk")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    println(s"[diag] prefix rows = ${timed("prefix materialize")(prefix.count())}")
    val left = prefix.select(gkey.map(col) ++ Seq(col("doc_id").as("id1"),
      col("_sz").as("_sz1"), col("_rk").as("_rk1")): _*)
    val right = prefix.select(gkey.map(col) ++ Seq(col("doc_id").as("id2"),
      col("_sz").as("_sz2"), col("_rk").as("_rk2")): _*)
    val coll = left.join(right, gkey).filter(col("id1") < col("id2"))
    timed("collision rows count")(println(s"[diag] collisions = ${coll.count()}"))
    val lenOk = coll.filter(greatest(col("_sz1"), col("_sz2")) * lit(tNum.toLong) <=
      least(col("_sz1"), col("_sz2")) * lit(tDen.toLong))
    timed("after length filter")(println(s"[diag] len-ok = ${lenOk.count()}"))
    val agged = lenOk.groupBy(col("id1"), col("id2"))
      .agg(max(least(col("_sz1") - col("_rk1"), col("_sz2") - col("_rk2")))
          .as("_rem"),
        max(col("_sz1")).as("_s1"), max(col("_sz2")).as("_s2"))
    timed("distinct pairs")(println(s"[diag] pairs = ${agged.count()}"))
    val pos = agged.filter((col("_rem") + 1) * lit((tDen + tNum).toLong) >=
      lit(tNum.toLong) * (col("_s1") + col("_s2")))
    timed("after positional filter")(println(s"[diag] pos-ok = ${pos.count()}"))
    val docArr = sh.groupBy(col("doc_id"))
      .agg(collect_list(col("shingle")).as("_arr"), count(lit(1)).as("_sz"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("docArr materialize")(docArr.count())
    val verified = timed("verify (array_intersect + filter)") {
      pos.select("id1", "id2")
        .join(docArr.select(col("doc_id").as("id1"), col("_arr").as("_a1"),
          col("_sz").as("_sza")), "id1")
        .join(docArr.select(col("doc_id").as("id2"), col("_arr").as("_a2"),
          col("_sz").as("_szb")), "id2")
        .withColumn("inter_sz",
          size(array_intersect(col("_a1"), col("_a2"))).cast("long"))
        .select(col("id1"), col("id2"), col("inter_sz"),
          (col("_sza") + col("_szb") - col("inter_sz")).as("union_sz"))
        .filter(col("inter_sz") * lit(tDen.toLong) >=
          lit(tNum.toLong) * col("union_sz")).count()
    }
    println(s"[diag] verified = $verified")
    spark.stop()
  }
}
