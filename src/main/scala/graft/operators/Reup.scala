package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** THE re-upload (near-copy) fixture convention, in one place: rows whose
  * id ≡ 7 or 15 (mod 24) are re-uploads of their block leader
  * (id − id % 24) — their payload columns resolve to the leader's values,
  * with a left fallback to their own when the leader id is absent. Density
  * is 3 near-dup pairs per 24 ids, constant per block — never a function
  * of corpus size, so no band bucket grows with the corpus.
  *
  * One definition serves every family that certifies on it (text simhash
  * near-dup, video frames, image hashes, the wide∧cell knn graph), Scala
  * and SQL both — a convention edited in six hand-copied sites is a
  * convention waiting to desynchronize an oracle from its engine
  * (code-review r14).
  */
object Reup {

  /** Resolve `cols` (source column → output alias) through the convention:
    * re-upload rows take the leader's values, everything else passes
    * through. Returns (idCol, aliases…). The resolution join is
    * broadcast-sized on the re-upload slice (2/24 of the input). */
  def resolve(df: DataFrame, idCol: String,
              cols: Seq[(String, String)]): DataFrame = {
    val id = col(idCol)
    val isReup = id % 24 === 7 || id % 24 === 15
    val srcCols = cols.map(_._1).distinct.filterNot(_ == idCol)
    val reups = df.filter(isReup)
      .select(col(idCol) +: (id - id % 24).as("__src") +: srcCols.map(col): _*)
      .join(df.select(col(idCol).as("__src") +:
        cols.map(_._1).distinct.map(c => col(c).as(s"__s_$c")): _*),
        Seq("__src"), "left")
      .select(col(idCol) +: cols.map { case (c, a) =>
        coalesce(col(s"__s_$c"), col(c)).as(a) }: _*)
    df.filter(!isReup)
      .select(col(idCol) +: cols.map { case (c, a) => col(c).as(a) }: _*)
      .unionByName(reups)
  }

  /** The same resolution as a DuckDB CTE — ends with
    * `cteName(idCol, aliases…)`. Embedded into outer stripMargin strings:
    * no generated line may begin with `|`. */
  def srcSql(cteName: String, table: String, idCol: String,
             cols: Seq[(String, String)]): String = {
    val sel = cols.map { case (c, a) => s"COALESCE(s.$c, d.$c) AS $a" }
      .mkString(", ")
    s"""$cteName AS (SELECT d.$idCol, $sel
       |        FROM $table d LEFT JOIN $table s
       |        ON d.$idCol % 24 IN (7, 15) AND s.$idCol = d.$idCol - d.$idCol % 24)""".stripMargin
  }
}
