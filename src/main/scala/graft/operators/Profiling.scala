package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the data-quality census a pipeline runs before trusting
  * a new 100 TB drop: per column, row count, null count, distinct count.
  * Schema-dynamic (works on any DataFrame, the `COLUMNS(*) APPLY` idea as
  * programmatic column generation) and ONE scan: all per-column aggregates
  * ride in a single `agg`, then the 1×(3k+1) result row unpivots via `stack`
  * — no per-column jobs, no collect.
  *
  * Exact distinct counts plan through Spark's Expand (one extra row per
  * profiled column); at extreme width or scale swap `countDistinct` for
  * `approx_count_distinct` and the same single-scan shape holds with no
  * Expand (the HLL-vs-exact contract is pinned for q_distinct in
  * PropertySpec).
  */
object Profiling {

  def profile(df: DataFrame): DataFrame =
    profileWith(df, c => countDistinct(c))

  /** The 100 TB shape: `approx_count_distinct` (HLL++) instead of exact —
    * ONE pass with NO Expand in the plan (PropertySpec asserts both the
    * plan property and that every estimate lands within tolerance of the
    * exact census).
    */
  def profileApprox(df: DataFrame, rsd: Double = 0.02): DataFrame =
    profileWith(df, c => approx_count_distinct(c, rsd))

  private def profileWith(df: DataFrame,
      distinctAgg: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : DataFrame = {
    val cols = df.columns.toSeq
    // backtick-quote everywhere so dotted names profile as columns, not as
    // struct-field paths; names containing the quote characters themselves
    // can't be expressed in the generated stack literal — fail loudly
    cols.foreach(c => require(!c.contains("`") && !c.contains("'"),
      s"cannot profile column with quote characters in its name: $c"))
    // positional internal aliases (_nn_0/_nd_0) — immune to a pre-existing
    // column that happens to be named like a name-derived alias
    val aggs = cols.zipWithIndex.flatMap { case (c, i) => Seq(
      count(col(s"`$c`")).as(s"_nn_$i"),
      distinctAgg(col(s"`$c`")).as(s"_nd_$i")) } :+ count(lit(1)).as("_n_rows_all")
    val row = df.agg(aggs.head, aggs.tail: _*)
    // backslashes are escape characters inside the generated SQL string
    // literal — double them so the emitted col_name round-trips verbatim
    val stackArgs = cols.zipWithIndex.map { case (c, i) =>
      s"'${c.replace("\\", "\\\\")}', _n_rows_all, _n_rows_all - _nn_$i, _nd_$i"
    }.mkString(", ")
    row.selectExpr(
      s"stack(${cols.length}, $stackArgs) AS (col_name, n_rows, n_nulls, n_distinct)")
  }
}
