package graft

import org.apache.spark.sql.functions._

import graft.sinks.{Sinks, VersionedStore}

/** Round-17 contract pins (verdict tasks #7/#8 + round-16 ADVICE):
  *
  *  - keysUnique debug fence: `spark.graft.store.validateUnique=true`
  *    re-arms the dup probe, so a caller violating the one-row-per-key
  *    contract fails LOUDLY instead of landing nondeterministic
  *    newest-wins data (the fence the fast path removed from the
  *    production shape).
  *  - single-bucket empty-batch fence: an empty batch over a live
  *    single-bucket [[Sinks.upsertPartitioned]] store must be a no-op,
  *    not a full-store rewrite + swap.
  *  - typedLit model bound: the literal-map scoring expression stays
  *    WHOLE-STAGE CODEGEN'D at exactly
  *    [[graft.ops.LinearTrainer.MaxLiteralWeights]] entries
  *    (codegen fallback disabled, so a compile failure would throw —
  *    the bound is proven, not assumed).
  */
class Round17Spec extends SparkSpec {
  import spark.implicits._

  test("validateUnique re-arms the keysUnique dup fence") {
    val root = tmpDir("r17_dupfence")
    val dup = Seq((1L, 10L), (1L, 11L), (2L, 20L)).toDF("k", "v")
    spark.conf.set("spark.graft.store.validateUnique", "true")
    try {
      val e = intercept[Exception] {
        VersionedStore.deltaUpsert(dup, Seq("k"), s"$root/s",
          nBuckets = 2, keysUnique = true)
      }
      assert(e.getMessage.contains("MORE THAN ONE upsert row"),
        s"expected the dup-fence message, got: ${e.getMessage}")
    } finally spark.conf.unset("spark.graft.store.validateUnique")
    // production shape (fence off): a CONTRACT-HONORING batch lands
    // with the staging write as its only action and reads back exactly
    val ok = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    VersionedStore.deltaUpsert(ok, Seq("k"), s"$root/s2",
      nBuckets = 2, keysUnique = true)
    assert(VersionedStore.read(spark, s"$root/s2").orderBy("k")
      .as[(Long, Long)].collect().toSeq == Seq((1L, 10L), (2L, 20L)))
  }

  test("empty batch over a live single-bucket store rewrites nothing") {
    val root = tmpDir("r17_emptybatch")
    val store = s"$root/w"
    Seq((1L, 5L), (2L, 6L)).toDF("b", "w")
      .write.mode("ignore").parquet(s"$root/seed") // warm codegen only
    Sinks.upsertPartitioned(Seq((1L, 5L), (2L, 6L)).toDF("b", "w"),
      Seq("b"), store, nBuckets = 1)
    val bucket = new java.io.File(s"$store/b00000")
    def sig(): Seq[(String, Long, Long)] = bucket.listFiles().toSeq
      .map(f => (f.getName, f.lastModified, f.length)).sortBy(_._1)
    val before = sig()
    assert(before.nonEmpty, "seed batch must have landed")
    Thread.sleep(20) // ensure a rewrite would move lastModified
    Sinks.upsertPartitioned(
      Seq.empty[(Long, Long)].toDF("b", "w"), Seq("b"), store, nBuckets = 1)
    assert(sig() == before,
      "an empty batch must not rewrite/swap the live bucket")
    // content unchanged too
    assert(Sinks.readPartitioned(spark, store).orderBy("b")
      .as[(Long, Long)].collect().toSeq == Seq((1L, 5L), (2L, 6L)))
  }

  test("literal weight map stays codegen'd at the MaxLiteralWeights bound") {
    val n = graft.ops.LinearTrainer.MaxLiteralWeights
    val w: Map[Long, Long] = (0 until n).map(i => i.toLong -> (i * 3L)).toMap
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val scored = spark.range(1000)
        .select((col("id") * 131L % n).as("_b"))
        .select(col("_b"),
          coalesce(element_at(typedLit(w), col("_b")), lit(0L)).as("_s"))
      val rows = scored.orderBy("_b").limit(3).as[(Long, Long)].collect()
      assert(rows.forall { case (b, s) => s == b * 3L },
        s"literal-map lookup must evaluate exactly: $rows")
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}
