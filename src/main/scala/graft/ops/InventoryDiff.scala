package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J1 — inventory diff: full-outer join of two inventory snapshots on key,
  * classifying each key as New / Delete / Update / Same.
  *
  * The reference consumes this as a pre-computed file
  * (AzureTaskProducer/largeInventoryDiffToSQS.py:3-12, Variance ∈
  * {New, Update, Delete}); the engine makes the diff itself a first-class
  * operator so source/dest verification (docs/Tasks.md:38-44) is one join.
  *
  * Scale: a key-partitioned shuffle join; both sides shuffle once on the
  * join key. With bucketed inventory tables (bucketBy(key)) the shuffle
  * disappears entirely; AQE handles skewed keys.
  */
object InventoryDiff {

  /** @param old   prior snapshot, must contain `keyCol` + compare columns
    * @param curr  new snapshot, same schema
    * @param keyCol join key column name
    * @param compareCols columns whose change means Update
    * @param includeSame keep unchanged keys (Variance = Same) — the
    *        reference's diff files omit them */
  def apply(old: DataFrame, curr: DataFrame, keyCol: String,
            compareCols: Seq[String], includeSame: Boolean = false): DataFrame = {
    // Explicit presence markers: a present row with all-null compare
    // columns must not be mistaken for an absent side.
    val o = old.select((keyCol +: compareCols).map(col): _*)
      .withColumnRenamed(keyCol, "k")
      .select(col("k") +: lit(true).as("old_present") +:
        compareCols.map(c => col(c).as(s"old_$c")): _*)
    val n = curr.select((keyCol +: compareCols).map(col): _*)
      .withColumnRenamed(keyCol, "k")
      .select(col("k") +: lit(true).as("new_present") +:
        compareCols.map(c => col(c).as(s"new_$c")): _*)

    val changed = compareCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)

    val joined = o.join(n, Seq("k"), "full_outer")
      .withColumn("variance",
        when(col("old_present").isNull, lit("New"))
          .when(col("new_present").isNull, lit("Delete"))
          .when(changed, lit("Update"))
          .otherwise(lit("Same")))
      .drop("old_present", "new_present")
      .withColumnRenamed("k", keyCol)
    if (includeSame) joined else joined.filter(col("variance") =!= "Same")
  }
}
