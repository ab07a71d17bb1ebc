package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** [[Layout.partitionPureBy]] — the exact partitioner behind the
  * multi-key grouped metadata serve (q187/q188). Pins:
  * (1) EVERY output partition holds rows of exactly one distinct key
  *     combination, under heavy group skew (hash partitioning collides
  *     groups; range partitioning straddles boundaries — this must
  *     not);
  * (2) `subSplits` > 1 spreads a group over several partitions while
  *     PRESERVING purity;
  * (3) NULL key values form their own group;
  * (4) no rows are lost or duplicated. */
class PartitionPureBySpec extends SparkSpec {

  private def perPartitionKeyCombos(df: org.apache.spark.sql.DataFrame,
      keys: Seq[String]): Seq[Int] = {
    val idx = keys.map(df.schema.fieldIndex)
    df.rdd.mapPartitions(it =>
      Iterator.single(it.map(r => idx.map(r.get)).toSet.size))
      .collect().toSeq
  }

  test("every partition is pure on the composite key, skew included; " +
      "nulls group; no row moves") {
    import spark.implicits._
    // heavy skew: group (0, a) carries 80% of rows; 12 further groups
    // share the rest; one group has a NULL second key
    val df = (0 until 5000).map { i =>
      val g = if (i % 5 != 0) (0, Some("a"))
        else ((i / 5) % 6, if (i % 25 == 0) None else Some(s"k${i % 2}"))
      (g._1.toLong, g._2, i.toLong)
    }.toDF("ga", "gb", "v")
    val pure = Layout.partitionPureBy(df, Seq("ga", "gb"))
    val combos = perPartitionKeyCombos(pure, Seq("ga", "gb"))
    assert(combos.forall(_ <= 1),
      s"every partition must hold at most one key combo, got $combos")
    val nGroups = df.select(col("ga"), col("gb")).distinct().count()
    assert(combos.count(_ == 1) === nGroups,
      "every group must land in exactly one partition")
    assert(pure.collect().map(_.getLong(2)).sorted.toSeq ===
      df.collect().map(_.getLong(2)).sorted.toSeq,
      "no rows lost or duplicated")
  }

  test("subSplits spreads a group over several partitions without " +
      "losing purity") {
    import spark.implicits._
    val df = (0 until 3000).map(i => ((i % 3).toLong, i.toLong))
      .toDF("g", "v")
    val pure = Layout.partitionPureBy(df, Seq("g"), subSplits = 4)
    val combos = perPartitionKeyCombos(pure, Seq("g"))
    assert(combos.size === 12 && combos.forall(_ <= 1),
      s"3 groups x 4 splits, each pure, got $combos")
    // at least one group actually spreads over >1 partition
    val partsPerGroup = pure.rdd.mapPartitionsWithIndex((p, it) =>
      it.map(r => (r.getLong(0), p)).toSet.iterator)
      .collect().groupBy(_._1).map(_._2.map(_._2).toSet.size)
    assert(partsPerGroup.exists(_ > 1),
      s"subSplits must spread groups, got $partsPerGroup")
    assert(pure.count() === 3000)
  }
}
