package graft

import org.apache.spark.sql.functions._
import graft.ops.CmSketch

/** Count-min sketch: exact parity with a driver-side reference grid,
  * merge associativity, the upper-bound guarantee, and weighted
  * counting. */
class CmSketchSpec extends SparkSpec {
  import spark.implicits._

  private val D = 4
  private val W = 64 // small width so collisions actually occur

  /** Driver-side reference grid + point estimate, an independent path
    * from the Column expressions. */
  private def refGrid(keys: Seq[String]): Map[(Int, Int), Long] =
    keys.flatMap(k => (0 until D).map(i => (i, CmSketch.colOfLong(k, i, W))))
      .groupBy(identity).map { case (c, xs) => c -> xs.size.toLong }

  private def refEstimate(grid: Map[(Int, Int), Long], key: String): Long =
    (0 until D).map(i =>
      grid.getOrElse((i, CmSketch.colOfLong(key, i, W)), 0L)).min

  test("grid and estimates match the driver-side reference exactly") {
    val keys = (1 to 2000).map(i => s"k-${i % 300}") // skewed repeats
    val df = keys.map(("g", _)).toDF("g", "k")
    val grid = CmSketch.sketch(df, Seq("g"), $"k", depth = D, width = W)
    val got = grid.select("d", "c", "cnt").as[(Int, Int, Long)]
      .collect().map { case (d, c, n) => (d, c) -> n }.toMap
    assert(got == refGrid(keys))
    val probes = (0 until 300 by 7).map(i => ("g", s"k-$i")).toDF("g", "pk")
    val est = CmSketch.pointEstimate(grid, probes, Seq("g"), $"pk",
        depth = D, width = W)
      .select("pk", "est").as[(String, Long)].collect().toMap
    val ref = refGrid(keys)
    (0 until 300 by 7).foreach { i =>
      assert(est(s"k-$i") == refEstimate(ref, s"k-$i"))
    }
  }

  test("estimates upper-bound the true counts; misses estimate >= 0") {
    val keys = (1 to 3000).map(i => s"z-${(math.sqrt(i.toDouble)).toInt}")
    val truth = keys.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val df = keys.map(("g", _)).toDF("g", "k")
    val grid = CmSketch.sketch(df, Seq("g"), $"k", depth = D, width = W)
    val probes = truth.keys.toSeq.sorted.map(("g", _)).toDF("g", "pk")
    val est = CmSketch.pointEstimate(grid, probes, Seq("g"), $"pk",
        depth = D, width = W)
      .select("pk", "est").as[(String, Long)].collect().toMap
    truth.foreach { case (k, n) =>
      assert(est(k) >= n, s"$k: est ${est(k)} below true $n")
    }
    // an absent key may collide but never goes negative
    val miss = CmSketch.pointEstimate(grid,
        Seq(("g", "never-seen")).toDF("g", "pk"), Seq("g"), $"pk",
        depth = D, width = W)
      .select("est").as[Long].head()
    assert(miss >= 0)
  }

  test("merged shard grids equal the whole-corpus grid bit-for-bit") {
    val df = (1 to 4000).map(i => (s"g${i % 2}", s"m-${i % 500}"))
      .toDF("g", "k")
    val shards = (0 until 4).map(p =>
      CmSketch.sketch(df.filter(abs(hash($"k")) % 4 === p), Seq("g"), $"k",
        depth = D, width = W))
    val merged = CmSketch.mergeSketches(shards.reduce(_ unionByName _),
      Seq("g"))
    val whole = CmSketch.sketch(df, Seq("g"), $"k", depth = D, width = W)
    val m = merged.orderBy("g", "d", "c").collect().toSeq
    val w = whole.orderBy("g", "d", "c").collect().toSeq
    assert(m == w)
  }

  test("join-size estimate upper-bounds truth and matches the reference") {
    val aKeys = (1 to 800).map(i => s"k-${i % 200}")      // 200 distinct
    val bKeys = (1 to 300).map(i => s"k-${100 + i % 150}") // overlap 100..199
    val trueJoin = {
      val bc = bKeys.groupBy(identity).view.mapValues(_.size).toMap
      aKeys.map(k => bc.getOrElse(k, 0).toLong).sum
    }
    val ga = CmSketch.sketch(aKeys.map(("g", _)).toDF("g", "k"), Seq("g"),
      $"k", depth = D, width = W)
    val gb = CmSketch.sketch(bKeys.map(("g", _)).toDF("g", "k"), Seq("g"),
      $"k", depth = D, width = W)
    val est = CmSketch.joinSizeEstimate(ga, gb, D)
      .select(col("est").cast("long")).as[Long].head()
    assert(est >= trueJoin, s"est $est below true $trueJoin")
    // driver reference: same grids, min of inner products
    val ra = refGrid(aKeys); val rb = refGrid(bKeys)
    val ref = (0 until D).map { i =>
      (0 until W).map(c =>
        ra.getOrElse((i, c), 0L) * rb.getOrElse((i, c), 0L)).sum
    }.min
    assert(est == ref)
    // disjoint key spaces still estimate >= 0 (and 0 when no cell collides
    // in some row)
    val gd = CmSketch.sketch(Seq(("g", "zzz-only")).toDF("g", "k"), Seq("g"),
      $"k", depth = D, width = W)
    val estD = CmSketch.joinSizeEstimate(ga, gd, D)
      .select(col("est").cast("long")).as[Long].head()
    assert(estD >= 0)
  }

  test("weighted counting sums weights, null weights count zero") {
    val df = Seq(("g", "a", 5L), ("g", "a", 3L), ("g", "b", 7L))
      .toDF("g", "k", "w")
      .unionByName(Seq(("g", "b")).toDF("g", "k")
        .withColumn("w", lit(null).cast("bigint")))
    val grid = CmSketch.sketch(df, Seq("g"), $"k", weight = $"w",
      depth = D, width = W)
    val est = CmSketch.pointEstimate(grid,
        Seq(("g", "a"), ("g", "b")).toDF("g", "pk"), Seq("g"), $"pk",
        depth = D, width = W)
      .select("pk", "est").as[(String, Long)].collect().toMap
    assert(est("a") == 8L && est("b") == 7L)
  }
}
