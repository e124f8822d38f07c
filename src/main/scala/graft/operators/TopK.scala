package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference, Descending, SortOrder}
import org.apache.spark.sql.types.LongType
import graft.plans.{TopKPerGroupNode, TopKPerGroupStrategy}

/** Builder facade for the native top-k-per-group plan
  * ([[graft.plans.TopKPerGroupNode]]): the drop-in replacement for
  * `withColumn(rank, row_number().over(partitionBy(group).orderBy(order)))
  * .filter(rank <= k)` that prunes to k rows per group BELOW the shuffle.
  */
object TopK {

  /** `row_number() <= k` per group as the two-phase native plan. `orderBy`
    * is (column name, descending?) pairs — catalyst SortOrders are built
    * directly over the resolved child attributes (the hand-built-node
    * discipline of asofJoinNative; converting Column sort expressions
    * would drag the non-serializable connect-side AST into task closures).
    * The order must totally order each group (append a unique tiebreak) —
    * the same determinism contract as every `row_number` site. The minted
    * rank column is a non-null long.
    */
  def perGroup(df: DataFrame, groupCols: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int,
      rankName: String = "rnk"): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    val plan = df.queryExecution.analyzed
    def attr(n: String) = plan.output.find(_.name == n).getOrElse(
      sys.error(s"missing column $n"))
    val gs = groupCols.map(attr)
    val sortOrder = orderBy.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    val rankOut = AttributeReference(rankName, LongType, nullable = false)()
    org.apache.spark.sql.GraftPlanShim.ofRows(spark,
      TopKPerGroupNode(plan, gs, sortOrder, k, rankOut))
  }
}
