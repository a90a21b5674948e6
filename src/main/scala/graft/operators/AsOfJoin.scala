package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — for each left row, the latest right row of
  * the same key with right_time <= left_time. The label/feature-store join
  * of training pipelines; Spark has no built-in ASOF join (SURVEY guide's
  * canonical "operator Spark lacks").
  *
  * Implemented per the preference order's option (a): composed from
  * built-ins — a tagged union + one `last(ignoreNulls)` window pass. One
  * shuffle+sort on the key, no range cross-join blowup, arbitrarily many
  * left rows per right row stream through. Right rows sort before left rows
  * at equal timestamps (tag 0 < 1), giving `<=` semantics like DuckDB's
  * ASOF JOIN.
  *
  * Tie determinism: when several right rows share (key, time), the window
  * additionally orders right rows by the tuple of carried columns, so the
  * MAX carried tuple wins — a total, repartition-stable rule (round-3 fix;
  * previously tie-dependent). Carried columns must therefore be orderable
  * types (no maps), which the Spark analyzer enforces.
  */
object AsOfJoin {

  def lastValueAsOf(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightCols: Seq[String]): DataFrame = {
    // Join on the key in its NATIVE type: a blanket cast("long") nulled out
    // every non-numeric key (string symbols — the canonical quotes/trades
    // use) and silently collapsed all rows into one null-key partition.
    // The right key is widened to the left key's type only when the two
    // differ (e.g. int vs long); incompatible casts fail at analysis.
    val keyType = left.schema(leftKey).dataType
    val rKey =
      if (right.schema(rightKey).dataType == keyType) col(rightKey)
      else col(rightKey).cast(keyType)
    val rordType = right.select(struct(rightCols.map(col): _*)).schema.head.dataType
    val leftStruct = struct(left.columns.map(col): _*).as("_l")
    val lTagged = left.select(
      Seq(col(leftKey).as("_k"), col(leftTime).as("_t"),
        lit(1).as("_tag"), lit(null).cast(rordType).as("_rord"), leftStruct) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c")): _*)
    val rTagged = right.select(
      Seq(rKey.as("_k"), col(rightTime).cast(
        left.schema(leftTime).dataType).as("_t"),
        lit(0).as("_tag"), struct(rightCols.map(col): _*).as("_rord"),
        lit(null).cast(lTagged.schema("_l").dataType).as("_l")) ++
        rightCols.map(c => col(c).as(s"_r_$c")): _*)
    // _rord breaks (key, time) ties among right rows; left rows carry null
    // and already sort after rights at equal _t via _tag.
    val w = Window.partitionBy(col("_k")).orderBy(col("_t"), col("_tag"), col("_rord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .select(col("_tag") +: col("_l") +:
        rightCols.map(c => last(col(s"_r_$c"), ignoreNulls = true).over(w)
          .as(s"asof_$c")): _*)
      .where(col("_tag") === 1)
      .select(col("_l.*") +: rightCols.map(c => col(s"asof_$c")): _*)
  }
}
