package graft

import org.apache.spark.sql.functions._

import graft.ops.Cardinality

/** The `md5_hash60` native kernel vs the composable
  * conv/substring/md5 chain ([[Cardinality.hashOf]] — the executable
  * specification), the [[HllKernelSpec]] rule applied to the KMV/CMS
  * hash path. */
class KmvKernelSpec extends SparkSpec {
  import spark.implicits._

  test("kernel hash == column-chain hash, fixture + edges") {
    val fixture = spark.read
      .parquet("/root/testdata/sf0.01/orders.parquet")
      .select(col("o_custkey").cast("string").as("k"))
      .unionByName(Seq("", "a", "ü", "日本語", "x" * 500).toDF("k"))
    val rows = fixture.select(
        call_function("md5_hash60", col("k")).as("kv"),
        Cardinality.hashOf(col("k")).as("cv"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"kernel ${r.getLong(0)} != chain ${r.getLong(1)}"))
  }

  test("kernel == the streaming fold's JVM mirror") {
    Seq("", "probe", "日本語").foreach { k =>
      val plan = Seq(k).toDF("k")
        .select(call_function("md5_hash60", col("k"))).as[Long].head()
      assert(plan == Cardinality.hashLong(k))
    }
  }

  test("md5_hash60 runs inside whole-stage codegen") {
    val df = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")
      .select(call_function("md5_hash60",
        col("o_custkey").cast("string")).as("h"))
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[.*md5_hash60""".r.findFirstIn(plan).isDefined,
      plan.take(1500))
  }

  test("null keys stay null through the kernel") {
    val out = Seq((1, Option.empty[String]), (2, Some("x"))).toDF("i", "k")
      .select(call_function("md5_hash60", col("k")).as("h"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(out.count(_.isEmpty) == 1 && out.count(_.isDefined) == 1)
  }
}
