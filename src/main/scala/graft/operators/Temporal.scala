package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal joins over event/page-capture streams — engine-added
 * capability (the reference is batch-file-only; SURVEY.md §2.11). The
 * headline operator is the as-of join, the time-series primitive
 * Spark's built-in join menu lacks.
 */
object Temporal {

  /**
   * As-of join: for every left row, the single right row with the same
   * key and the greatest right timestamp <= the left row's timestamp
   * (ties on the right timestamp broken by the greatest `rTieCol` —
   * deterministic output for any input). Left rows with no prior right
   * row keep nulls (left-outer as-of).
   *
   * Plan (the sort-merge as-of form used by kdb/Flink, expressed
   * relationally): tag both sides, union, ONE shuffle on the key, and
   * inside each key's (ts, side, tie) sort order propagate the right
   * row's payload forward with `last(_, ignoreNulls)` over an
   * unbounded-preceding running window; keep left rows. No per-pair
   * join explosion exists at any skew — a key with L lefts and R
   * rights costs L + R rows of shuffle and sort, never L*R — and the
   * running window is the streaming-friendly shape (same contract as
   * a watermarked mapGroupsWithState fold). Right rows sort BEFORE
   * left rows at an equal timestamp, so `rts == lts` matches
   * (inclusive as-of, DuckDB `ASOF JOIN` semantics).
   *
   * `rightCols` are emitted with their own names; callers rename
   * beforehand to avoid collisions with left columns.
   */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               ltsCol: String, rtsCol: String, rTieCol: String,
               rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.select(
      keys.map(col) ++
        Seq(col(ltsCol).as("__ts"), lit(1).as("__side"),
          lit(null).cast("long").as("__tie"),
          struct(leftCols.map(col): _*).as("__lv")) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType)
          .as(s"__r_$c")): _*)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rtsCol).as("__ts"), lit(0).as("__side"),
          col(rTieCol).cast("long").as("__tie"),
          lit(null).cast(left.select(struct(leftCols.map(col): _*))
            .schema.head.dataType).as("__lv")) ++
        rightCols.map(c => col(c).as(s"__r_$c")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(Seq(col("__side"), col("__lv")) ++
        rightCols.map(c =>
          last(col(s"__r_$c"), ignoreNulls = true).over(w)
            .as(s"__a_$c")): _*)
    carried.where(col("__side") === 1)
      .select(leftCols.map(c => col(s"__lv.$c").as(c)) ++
        rightCols.map(c => col(s"__a_$c").as(s"asof_$c")): _*)
  }
}
