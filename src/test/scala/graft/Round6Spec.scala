package graft

import org.scalatest.funsuite.AnyFunSuite

import scala.sys.process.{Process, ProcessLogger}

/** Round-6 additions (VERDICT r5 item 2): oracle result-TYPING lint.
  *
  * DuckDB promotes `sum()` over BIGINT to HUGEINT, so an uncast
  * `sum(x) // n` oracle column fetches into pandas as float64 and
  * renders `66.0` where Spark renders `66` — the driver's value hash
  * splits on typing alone even when every value matches. This bit
  * q83_vocab_oov and q102_skew_report in round 5. A textual lint can't
  * decide this (typing flows through CTEs), so the check EXECUTES every
  * oracle SQL in DuckDB (tools/oracle_typing_lint.py, binding each text
  * as a relation and reading its logical result types) and fails on any
  * HUGEINT/UHUGEINT output column.
  *
  * The spec shells out to the same python3+duckdb the driver uses; if
  * that interpreter isn't present (e.g. a bare sbt box), the tests
  * cancel rather than fail — the driver's own environment always has
  * it, so the gate still runs where it matters.
  */
class OracleTypingSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"
  private val lint = "tools/oracle_typing_lint.py"

  private lazy val duckdbAvailable: Boolean =
    try Process(Seq("python3", "-c", "import duckdb")).! == 0
    catch { case _: Throwable => false }

  /** Runs the lint over a rendered oracle_sql.json; (exitCode, output). */
  private def runLint(json: String): (Int, String) = {
    val f = java.nio.file.Files.createTempFile("oracle_sql", ".json")
    java.nio.file.Files.writeString(f, json)
    val out = new StringBuilder
    val logger = ProcessLogger(l => out.append(l).append('\n'),
                               l => out.append(l).append('\n'))
    val code = Process(Seq("python3", lint, sfDir, f.toString)).!(logger)
    (code, out.toString)
  }

  test("every committed oracle SQL yields no HUGEINT result column") {
    assume(duckdbAvailable, "python3+duckdb not on this box")
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir missing")
    val (code, out) = runLint(Verify.oracleJson(SparkEntry.oracleSql))
    assert(code == 0, s"typing lint failed:\n$out")
    assert(out.contains("well-typed") || out.contains("no HUGEINT"), out)
  }

  test("the lint reproduces the round-5 bug class (uncast sum() //)") {
    assume(duckdbAvailable, "python3+duckdb not on this box")
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir missing")
    // q102's pre-fix oracle text: `sum(cnt) // count(*)` promotes to
    // HUGEINT. The lint must flag exactly this shape.
    val bad =
      """WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
        |           FROM events GROUP BY user_id)
        |SELECT sum(cnt) // count(*) AS mean_key_rows FROM c""".stripMargin
    val (code, out) = runLint(Verify.oracleJson(Map("bad_q102" -> bad)))
    assert(code == 1, s"lint should fail on uncast sum()//:\n$out")
    assert(out.contains("BAD TYPE bad_q102.mean_key_rows"), out)
  }
}

/** Round-6 item 5 (VERDICT r5): round counts of the iterative CC forms
  * must be a property of CLUSTER SHAPE, not corpus size — the flat-
  * round-count claim SCALING.md measures, pinned as a regression test.
  * A dedup corpus 10× bigger has 10× more clusters of the same shape;
  * if rounds grew with cluster COUNT, every round's full-shuffle cost
  * would multiply at 100 TB. */
class RoundInvarianceSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.ConnectedComponents

  /** `n` disjoint 4-cliques — the dedup-graph shape at any scale. */
  private def cliquePile(n: Int) =
    (0 until n).flatMap { c =>
      val base = c * 10L
      for { i <- 0L until 4L; j <- (i + 1) until 4L } yield (base + i, base + j)
    }.toDF("a", "b")

  test("min-label CC rounds are invariant to 10x more clusters") {
    ConnectedComponents(cliquePile(5), "a", "b", maxLocalEdges = 0).count()
    val r5 = ConnectedComponents.lastRounds.get
    ConnectedComponents(cliquePile(50), "a", "b", maxLocalEdges = 0).count()
    val r50 = ConnectedComponents.lastRounds.get
    assert(r5 == r50, s"rounds grew with cluster count: $r5 -> $r50")
    assert(r5 <= 3, s"4-cliques should converge in <=3 rounds, took $r5")
  }

  test("star-contraction rounds are invariant to 10x more clusters") {
    ConnectedComponents.starContraction(cliquePile(5), "a", "b").count()
    val r5 = ConnectedComponents.lastRounds.get
    ConnectedComponents.starContraction(cliquePile(50), "a", "b").count()
    val r50 = ConnectedComponents.lastRounds.get
    assert(r5 == r50, s"rounds grew with cluster count: $r5 -> $r50")
  }
}

/** q106's degenerate-input contract: an EMPTY event log yields an empty
  * funnel with the batch form's schema, not an NPE from the null
  * midpoint aggregate (review finding, round 6). */
class FunnelStreamEmptySpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("q106 on an empty events table returns empty, not NPE") {
    val root = tmpDir("q106_empty")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .limit(0)
      .write.parquet(s"$root/events.parquet")
    val out = Queries.all("q106_funnel_stream")(spark, root)
    assert(out.count() == 0L)
    assert(out.columns.toSeq ==
      Seq("user_id", "t_0", "t_1", "t_2", "depth"))
  }
}

/** The incremental near-dup refresh must equal the naive full re-mine
  * restricted to the batch — same pairs, same smaller-id winner rule —
  * while never joining old×old (the whole point at 100 TB). */
class IncrementalNearDupSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import graft.ops.ApproxDedup

  private lazy val withSets = spark.read
    .parquet("/root/testdata/sf0.01/documents.parquet")
    .withColumn("_sh", ApproxDedup.wordNgrams(col("text"), 2))
  private lazy val old = withSets.filter(col("doc_id") % 10 =!= 0)
  private lazy val batch = withSets.filter(col("doc_id") % 10 === 0)

  test("incremental survivors == full-mine + smaller-id winner rule") {
    val fast = ApproxDedup.incrementalLshNovel(old, batch, "doc_id", "_sh",
        k = 16, bands = 4, rowsPerBand = 4, threshold = 0.5)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))

    // naive oracle: mine the FULL corpus, then apply the same rule
    val pairs = ApproxDedup.minhashLshPairs(withSets, "doc_id", "_sh",
      k = 16, bands = 4, rowsPerBand = 4, threshold = 0.5)
    val sym = pairs.select(col("id_a").as("x"), col("id_b").as("y"))
      .unionByName(pairs.select(col("id_b").as("x"), col("id_a").as("y")))
    val dup = sym.filter(col("x") % 10 === 0)
      .filter(col("y") % 10 =!= 0 || col("y") < col("x"))
      .select(col("x").as("doc_id")).distinct()
    val naive = batch.join(dup, Seq("doc_id"), "left_anti")
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))

    assert(fast.toSeq == naive.toSeq)
    // non-vacuous: the fixture actually contains cross-split near-dups
    assert(fast.length < batch.count(),
      "fixture has no near-dups — the equality above proved nothing")
  }

  test("incremental plan carries no quadratic join shapes") {
    val plan = ApproxDedup.incrementalLshNovel(old, batch, "doc_id", "_sh",
        k = 16, bands = 4, rowsPerBand = 4, threshold = 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("scoped form releases its caches") {
    val before = spark.sparkContext.getPersistentRDDs
      .filter { case (_, r) => !r.isCheckpointed }.keySet
    val sc = ApproxDedup.incrementalLshNovelScoped(old, batch, "doc_id",
      "_sh", k = 16, bands = 4, rowsPerBand = 4, threshold = 0.5)
    sc.df.count(); sc.release()
    val after = spark.sparkContext.getPersistentRDDs
      .filter { case (_, r) => !r.isCheckpointed }.keySet
    assert((after -- before).isEmpty, "incrementalLshNovelScoped leaked caches")
  }
}

/** HTML→text extraction edge cases (q111's operator in isolation). */
class HtmlExtractSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h")
      .select(graft.ops.TextAnalysis.extractHtmlText(col("h")))
      .head().getString(0)

  test("script/style contents vanish wholesale, tag-hostile or not") {
    assert(extract("""a<script>if (1 < 2 && 3 > 2) { x("<b>"); }</script>b""")
      == "a b")
    assert(extract("<style>p > span { c: '<'; }</style>body") == "body")
  }

  test("tags strip, entities unescape, &amp; resolves last") {
    assert(extract("<p>x &lt;tag&gt; &quot;q&quot; &#39;s&#39; y</p>")
      == "x <tag> \"q\" 's' y")
    // &amp;lt; is the ESCAPED literal "&lt;" — must not double-unescape
    assert(extract("a &amp;lt; b") == "a &lt; b")
    assert(extract("x&nbsp;&nbsp;y") == "x y")
  }

  test("whitespace collapses and trims across removed structure") {
    assert(extract("<div>\n  <p>one</p>\n  <p>two</p>\n</div>")
      == "one two")
    assert(extract("<br/><hr>") == "")
  }
}

/** q110's partial-coverage contract: a batch doc WITHOUT an embedding
  * row passes the semantic gate (the gate can't judge what it can't
  * see). The committed sf0.001/sf0.01 fixtures are 1:1 doc↔vector, so
  * only a synthetic fixture can regression-guard this — the bug it
  * pins was green at sf0.01 and 4-vs-281 red at sf0.1. */
class RefreshPipelineSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("batch docs without an embedding survive the semantic gate") {
    import spark.implicits._
    // 20 docs, unique texts (no exact/lexical dups); batch = {0, 10}
    def writeDocs(root: String): Unit =
      (0L until 20L)
        .map(i => (i, "s", f"unique text number $i alpha$i beta${i * 7} gamma${i * 13} delta${i * 29} epsilon${i * 31} zeta${i * 37} eta${i * 41}"))
        .toDF("doc_id", "source", "text")
        .write.parquet(s"$root/documents.parquet")
    val oldVecs = (1L to 9L).map(i =>
      (i, Array(i.toDouble, 1.0, (i % 3).toDouble, 2.0)))
    def run(root: String, doc0Vec: Array[Double]): Set[Long] = {
      writeDocs(root)
      (oldVecs :+ (0L, doc0Vec)).toDF("vec_id", "embedding")
        .write.parquet(s"$root/embeddings.parquet")
      Queries.all("q110_refresh_pipeline")(spark, root)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }

    // control: doc 0's vector is orthogonal-ish to every old vector →
    // BOTH batch docs survive, proving the exact and lexical gates pass
    // doc 0 (so fixture A's drop below is attributable to the semantic
    // gate, not an upstream over-drop — review finding, round 6)
    val control = run(tmpDir("q110_ctl"), Array(0.0, 0.0, -5.0, 0.001))
    assert(control == Set(0L, 10L), s"control: $control")

    // fixture A: doc 0 duplicates old doc 1's vector → semantic drop;
    // doc 10 has NO vector and must pass the gate it can't be judged by
    val out = run(tmpDir("q110_partial"), Array(1.0, 1.0, 1.0, 2.0))
    assert(out == Set(10L), s"expected exactly {10}, got $out")
  }
}

/** The incremental SEMANTIC refresh must equal the naive form: assign
  * everything to the ledger centroids, mine all within-cell pairs, and
  * apply the same drop rule — while the incremental plan never pairs
  * old×old. */
class IncrementalSemDedupSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import graft.ops.{SemanticDedup, Similarity}

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.01/embeddings.parquet")
  private lazy val old = emb.filter(col("vec_id") % 10 =!= 0)
  private lazy val batch = emb.filter(col("vec_id") % 10 === 0)

  test("incremental survivors == naive all-pairs with the same drop rule") {
    import spark.implicits._
    val fast = SemanticDedup.incrementalSurvivors(old, batch, "vec_id",
        "embedding", k = 8, iters = 2, threshold = 0.3)
      .select("vec_id").orderBy("vec_id").collect().map(_.getLong(0))

    // naive: same ledger centroids, assign ALL, every within-cell pair
    val cents = Similarity.kmeansFit(old, "vec_id", "embedding", 8, 2)
      .zipWithIndex.map { case (c, i) => (i.toLong, c.toSeq) }
      .toSeq.toDF("centroid_id", "embedding")
    val assigned = Similarity.ivfAssign(emb, cents, "vec_id",
      "centroid_id", "embedding")
    val pairs = Similarity.nearDupPairs(
      assigned.withColumnRenamed("corpus_id", "vec_id"),
      "vec_id", "centroid_id", "cv", threshold = 0.3)
    val sym = pairs.select(col("id_a").as("x"), col("id_b").as("y"))
      .unionByName(pairs.select(col("id_b").as("x"), col("id_a").as("y")))
    val dup = sym.filter(col("x") % 10 === 0)
      .filter(col("y") % 10 =!= 0 || col("y") < col("x"))
      .select(col("x").as("vec_id")).distinct()
    val naive = batch.join(dup, Seq("vec_id"), "left_anti")
      .select("vec_id").orderBy("vec_id").collect().map(_.getLong(0))

    assert(fast.toSeq == naive.toSeq)
    assert(fast.length < batch.count(), "fixture dropped nothing — vacuous")
    assert(fast.nonEmpty, "everything dropped — boundary-only equality")
  }

  test("incremental semantic plan has no quadratic joins and leaks no cache") {
    val before = spark.sparkContext.getPersistentRDDs
      .filter { case (_, r) => !r.isCheckpointed }.keySet
    // the LAZY (Scoped) form exposes the real join plan — the eager
    // form checkpoints, which would reduce this assertion to a scan of
    // the checkpoint (review finding, round 6)
    val sc = SemanticDedup.incrementalSurvivorsScoped(old, batch,
      "vec_id", "embedding", k = 8, iters = 2, threshold = 0.3)
    val plan = sc.df.queryExecution.executedPlan.toString
    assert(plan.contains("Join"), "plan audit lost sight of the joins")
    assert(!plan.contains("CartesianProduct"), "CartesianProduct")
    sc.df.count(); sc.release()
    val after = spark.sparkContext.getPersistentRDDs
      .filter { case (_, r) => !r.isCheckpointed }.keySet
    assert((after -- before).isEmpty, "incrementalSurvivors leaked caches")
  }
}

/** Round-6 item 6 (VERDICT r5): the Z-order layout must actually BUY
  * file skipping, not just report bounds. Writes the same grid twice —
  * Z-clustered via [[graft.ops.Layout.zWrite]] and unclustered — and
  * asserts a single-dimension predicate's matching rows concentrate in
  * a fraction of the clustered files while touching every unclustered
  * one. (Files whose min/max rectangle excludes the predicate contain
  * no matching rows — exactly the files parquet footer pruning skips —
  * so distinct `input_file_name()` over the matches measures the
  * skippable set without parsing footers.) */
class ZOrderWriteSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("z-clustered layout concentrates a dimension predicate into few files") {
    // 256x256 grid: x = id mod 256, y = id div 256
    val grid = spark.range(65536)
      .select((col("id") % 256).as("x"), expr("id div 256").as("y"),
        col("id").as("payload"))
    val clustered = tmpDir("zorder") + "/clustered"
    val plain = tmpDir("zorder") + "/plain"
    graft.ops.Layout.zWrite(grid, Seq(col("x"), col("y")), bits = 8,
      numFiles = 16, path = clustered)
    // unclustered control: same file count, round-robin placement
    grid.repartition(16).write.mode("overwrite").parquet(plain)

    def filesTouched(path: String): Long =
      spark.read.parquet(path)
        .filter(col("x") >= 16 && col("x") < 32) // 1/16 of the x-range
        .select(input_file_name()).distinct().count()

    val zFiles = filesTouched(clustered)
    val plainFiles = filesTouched(plain)
    assert(plainFiles == 16L,
      s"control layout should spread matches across all files, got $plainFiles")
    // 16 files over a 16-bit Z-space = a 4x4 tile grid; an x-stripe of
    // width 16 intersects one tile column = 4 tiles. repartitionByRange
    // SAMPLES its bounds (seeded off the RDD id, so suite order shifts
    // them) — a bound landing inside a tile splits it across two files,
    // so allow one straddle per tile; the point is FEW files vs all 16.
    assert(zFiles <= 8L, s"clustered layout touched $zFiles of 16 files")
  }

  test("zWrite keeps every row and the original schema") {
    val grid = spark.range(1000)
      .select((col("id") % 32).as("x"), expr("id div 32").as("y"))
    val path = tmpDir("zorder") + "/roundtrip"
    graft.ops.Layout.zWrite(grid, Seq(col("x"), col("y")), bits = 5,
      numFiles = 4, path = path)
    val back = spark.read.parquet(path)
    assert(back.columns.sorted.toSeq == Seq("x", "y"))
    assert(back.count() == 1000L)
    assert(back.select(sum(col("x") + col("y") * 32)).head().getLong(0)
      == (0L until 1000L).sum)
  }
}
