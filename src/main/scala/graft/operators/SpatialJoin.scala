package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed eps-distance (range) join via grid bucketing.
  *
  * The classic spatial-join rewrite (SURVEY.md §4): an eps-distance
  * theta join would plan as a nested-loop cross product, which is
  * O(n*m) and unusable at scale. Instead both sides are snapped to a
  * uniform grid of cell side eps; the probe side is replicated to its
  * 3x3 cell neighborhood (every true neighbor pair must share one of
  * those cell keys), the join becomes a plain shuffled HASH equi-join
  * on the cell key, and an exact distance filter removes false
  * candidates. Shuffle volume is O(n + 9m), each task sees only its
  * cells' points — this is the same trick the DBSCAN core uses for its
  * local neighbor index, lifted to a cluster-wide operator, and is the
  * load-bearing piece for big-big similarity joins at 100 TB.
  */
object SpatialJoin {

  private implicit class Dollar(private val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }

  /** All pairs (l, r) with squared euclidean distance <= eps^2.
    * Output columns: left columns prefixed `l_`, right prefixed `r_`,
    * plus `dist_sq`. Pairs are emitted once (including self-pairs if
    * the same table is passed twice — filter on ids as needed).
    */
  def epsJoin(left: DataFrame, right: DataFrame, eps: Double,
      xCol: String = "x", yCol: String = "y"): DataFrame = {
    val cell = (c: Column) => floor(c / eps).cast("long")
    // replicate LEFT to its 3x3 neighborhood; right keeps one copy
    val l9 = left.select(
        struct(left.columns.map(col): _*).as("l"),
        cell(col(xCol)).as("cx0"), cell(col(yCol)).as("cy0"))
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select($"l", ($"cx0" + $"dx").as("cx"), ($"cy0" + $"dy").as("cy"))
    val r1 = right.select(
      struct(right.columns.map(col): _*).as("r"),
      cell(col(xCol)).as("cx"), cell(col(yCol)).as("cy"))
    val dsq = (col(s"l.$xCol") - col(s"r.$xCol")) * (col(s"l.$xCol") - col(s"r.$xCol")) +
      (col(s"l.$yCol") - col(s"r.$yCol")) * (col(s"l.$yCol") - col(s"r.$yCol"))
    l9.join(r1, Seq("cx", "cy"))
      .withColumn("dist_sq", dsq)
      .filter($"dist_sq" <= eps * eps)
      .select(
        (left.columns.map(c => col(s"l.$c").as(s"l_$c")) ++
          right.columns.map(c => col(s"r.$c").as(s"r_$c")) :+ $"dist_sq"): _*)
  }

  /** Per-point eps-neighborhood size (excluding self) — DBSCAN's core
    * test as a standalone relational operator.
    */
  def neighborCounts(points: DataFrame, eps: Double, idCol: String,
      xCol: String = "x", yCol: String = "y"): DataFrame = {
    val p = points.select(col(idCol).as("id"), col(xCol).as("x"), col(yCol).as("y"))
    epsJoin(p, p, eps)
      .filter(col("l_id") =!= col("r_id"))
      .groupBy(col("l_id").as("id"))
      .agg(count(lit(1)).as("n_neighbors"))
  }
}
