package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** The native vec_dot expression must be BITWISE identical to the
  * higher-order-function form it replaces — same left-to-right IEEE
  * fold — including the null semantics the HOF form implies (length
  * mismatch or any null element poisons the fold to null). Anything
  * short of bitwise equality would hash-split every cosine oracle. */
class VecDotSpec extends SparkSpec {
  import spark.implicits._

  private def bits(d: java.lang.Double): java.lang.Long =
    if (d == null) null else java.lang.Double.doubleToRawLongBits(d)

  test("bitwise equal to the HOF fold on deterministic pseudo-random vectors") {
    // ugly magnitudes on purpose: accumulation order differences WOULD
    // show up here if the kernels disagreed
    val rows = (0 until 500).map { i =>
      val a = Array.tabulate(64)(j =>
        math.sin(i * 64 + j) * math.pow(10.0, (i + j) % 7 - 3))
      val b = Array.tabulate(64)(j =>
        math.cos(i * 31 + j * 17) * math.pow(10.0, (j - i) % 5))
      (i.toLong, a, b)
    }
    val df = rows.toDF("id", "a", "b")
    val both = df.select(
        Similarity.dot(col("a"), col("b")).as("native"),
        Similarity.dotHof(col("a"), col("b")).as("hof"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        s"bit split: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("null semantics replay the HOF form") {
    val df = Seq(
        (1L, Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](3.0, 4.0)),
        (2L, Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](3.0)),
        (3L, Array[java.lang.Double](1.0, null), Array[java.lang.Double](3.0, 4.0)),
        (4L, Array.empty[java.lang.Double], Array.empty[java.lang.Double]))
      .toDF("id", "a", "b")
      .select(col("id"), col("a").cast("array<double>").as("a"),
        col("b").cast("array<double>").as("b"))
    val got = df.select(col("id"),
        Similarity.dot(col("a"), col("b")).as("native"),
        Similarity.dotHof(col("a"), col("b")).as("hof"))
      .orderBy("id").collect()
    got.foreach { r =>
      val n = if (r.isNullAt(1)) null else java.lang.Double.valueOf(r.getDouble(1))
      val h = if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2))
      assert(bits(n) == bits(h), s"id ${r.getLong(0)}: $n vs $h")
    }
    // and the specific expectations, so the HOF baseline can't drift
    assert(got(0).getDouble(1) == 11.0)
    assert(got(1).isNullAt(1) && got(2).isNullAt(1))
    assert(got(3).getDouble(1) == 0.0)
  }

  test("vec_dot runs inside whole-stage codegen") {
    val df = spark.range(100)
      .select(col("id"),
        transform(sequence(lit(0), lit(15)), i => i.cast("double") + col("id"))
          .as("v"))
      .select(Similarity.dot(col("v"), col("v")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix is the whole-stage-codegen span marker in the
    // compact rendering: the project CARRYING vec_dot must be starred
    // (a non-codegen expression would force the project out of the span)
    assert("""\*\(\d+\) Project \[vec_dot""".r.findFirstIn(plan).isDefined,
      plan.take(1000))
    assert(df.collect().length == 100)
  }
}
