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
    * through. Returns (idCol, aliases…). Leaders are exactly the ids
    * ≡ 0 (mod 24), so the lookup (build) side is PRE-FILTERED to that
    * 1/24 slice — Spark can only broadcast the build side of this
    * left-outer join, and an unfiltered build side would make the
    * broadcast/shuffle corpus-sized on the production relations that ride
    * this resolver (ADVICE r14). The filter is a no-op on results: every
    * join key `id − id % 24` is ≡ 0 (mod 24) by construction. */
  def resolve(df: DataFrame, idCol: String,
              cols: Seq[(String, String)]): DataFrame = {
    val id = col(idCol)
    val isReup = id % 24 === 7 || id % 24 === 15
    val srcCols = cols.map(_._1).distinct.filterNot(_ == idCol)
    val reups = df.filter(isReup)
      .select(col(idCol) +: (id - id % 24).as("__src") +: srcCols.map(col): _*)
      .join(df.filter(id % 24 === 0).select(col(idCol).as("__src") +:
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
    // mirror of resolve()'s leader pre-filter: join only the ≡0 (mod 24) slice
    s"""$cteName AS (SELECT d.$idCol, $sel
       |        FROM $table d LEFT JOIN (SELECT * FROM $table WHERE $idCol % 24 = 0) s
       |        ON d.$idCol % 24 IN (7, 15) AND s.$idCol = d.$idCol - d.$idCol % 24)""".stripMargin
  }
}
