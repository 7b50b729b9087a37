package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the most recent right row with
  * the same key and `rightTime <= leftTime` (event attribution, price
  * lookup, config-at-time-of-event joins — the reference's monitor
  * joins per-object logs to the latest stat snapshot the same way,
  * TaskMonitor/s3_monitor_statistic.py:56-80 reads the newest bucket
  * at-or-before a timestamp).
  *
  * Spark has no native as-of join, and the naive formulations die at
  * scale: a theta-join (`l.key = r.key AND r.ts <= l.ts` + argmax)
  * explodes to every (left, right-prior) pair before pruning, and a
  * per-key `collect_list` sort holds whole keys in memory. This is the
  * union-tag formulation instead:
  *
  *   1. tag right rows side=0, left rows side=1, union — NO join;
  *   2. one window over (key) ordered by (time, side, id) carrying
  *      `max(struct(time, id)) FILTER (side=0)` over the strictly-
  *      preceding frame — each left row sees exactly the latest
  *      at-or-before right row (side 0 sorts first, so an equal-time
  *      right row IS visible to the left row: ≤ semantics);
  *   3. equi-join the matched (key, time) back to the right table to
  *      recover its payload (ties broken by max id on both engines).
  *
  * Cost: ONE shuffle of |L|+|R| rows on the key (the window), plus an
  * equi-join of |L| matches back to R — no pair explosion, no per-key
  * memory beyond the running max. Skewed keys follow the same AQE /
  * salting remedies as any keyed window.
  */
object AsOfJoin {

  /** @param left      rows to enrich; must carry `key`, `time`, `leftId`
    * @param right     lookup rows; must carry `key`, `time`, `rightId`
    * @param key       equi-join key column name (both sides)
    * @param time      epoch-seconds (or any orderable numeric) column name
    * @param leftId    unique left row id (total order within ties)
    * @param rightId   unique right row id (tie-break: larger id wins)
    * @param payload   right columns to attach (prefixed `asof_`)
    * @return left rows + `asof_time`, `asof_<rightId>`, `asof_<payload>`
    *         (null where no right row is at-or-before the left row)
    */
  def lastPrior(left: DataFrame, right: DataFrame, key: String, time: String,
                leftId: String, rightId: String,
                payload: Seq[String] = Nil): DataFrame = {
    // every OTHER left column rides along in one struct (null on right
    // rows), so enrichment really returns the left rows — not a
    // projection of them. (Left/right ids must share a type: they form
    // the window's tie-break order together.)
    val extras = left.columns.toIndexedSeq
      .filterNot(c => c == key || c == time || c == leftId)
    // fail fast on name collisions with the internal/output columns —
    // a colliding extra would silently overwrite the time column or a
    // join key during unpacking (data corruption, not an error)
    val reserved = Set("t", "lid", "rid", "side", "prior", "_lrest",
      "_asof_struct", "asof_time", "asof_rid", s"asof_$rightId") ++
      payload.map(p => s"asof_$p")
    val clashes = extras.filter(reserved)
    require(clashes.isEmpty,
      s"lastPrior: left column(s) ${clashes.mkString(", ")} collide with " +
        "internal/output names — rename them before the join")
    val l = left.select(Seq(col(key), col(time).as("t"),
        col(leftId).as("lid")) ++
        (if (extras.nonEmpty) Seq(struct(extras.map(col): _*).as("_lrest"))
         else Nil): _*)
      .withColumn("side", lit(1))
    val r = right.select(col(key), col(time).as("t"), col(rightId).as("rid"))
      .withColumn("side", lit(0))
    val tagged = r.unionByName(l, allowMissingColumns = true)

    // Strictly-preceding frame over a TOTAL order (t, side, id): every
    // right row with t' <= t sorts before the left row, so the running
    // max never looks ahead. max(struct) keeps (time, id) atomic —
    // separate max(t), max(id) columns could come from different rows.
    val w = Window.partitionBy(key)
      .orderBy(col("t"), col("side"), coalesce(col("rid"), col("lid")))
      .rowsBetween(Window.unboundedPreceding, -1)
    val matched = tagged
      .withColumn("prior",
        max(when(col("side") === 0, struct(col("t"), col("rid")))).over(w))
      .filter(col("side") === 1)
      .select(Seq(col(key), col("t"), col("lid"),
        col("prior.t").as("asof_time"), col("prior.rid").as("asof_rid")) ++
        (if (extras.nonEmpty) Seq(col("_lrest")) else Nil): _*)

    // Payload recovery: equi-join on (key, time, id) — exact, so ties
    // already resolved by the window's max are matched 1:1.
    // "_asof_struct", not "asof_payload": a payload column literally
    // named "payload" would collide with its own asof_ prefix
    val payloadDf = right.select(
      col(key), col(time).as("asof_time"), col(rightId).as("asof_rid"),
      struct(payload.map(col): _*).as("_asof_struct"))
    val out = matched.join(payloadDf, Seq(key, "asof_time", "asof_rid"), "left")
    val withPayload = payload.foldLeft(out) { (df, p) =>
      df.withColumn(s"asof_$p", col("_asof_struct").getField(p))
    }.drop("_asof_struct")
    // unpack the carried left columns back to top level
    extras.foldLeft(withPayload) { (df, c) =>
      df.withColumn(c, col("_lrest").getField(c))
    }.drop("_lrest")
      .withColumnRenamed("t", time).withColumnRenamed("lid", leftId)
      .withColumnRenamed("asof_rid", s"asof_$rightId")
  }
}
