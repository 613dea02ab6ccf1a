package graft.operators

import graft.functions.Exprs._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Founded-year enrichment (SURVEY.md §3.2, founded_year.py): multi-method
  * year extraction + consensus/weighted/priority voting + left-join attach.
  *
  * Input model: `texts(website, method, text)` — one row per fetched page
  * text per method ('jsonld' | 'relevant' | 'homepage' | 'google'); the
  * fetching itself is the connector layer (S4/S5/S7). All voting rules are
  * single groupBy conditional aggregations (one shuffle each).
  */
object FoundedYear {

  /** Candidate long table `(website, method, year)`:
    * jsonld texts use the founded-key lookup + first-match year (X17+X4);
    * page texts use the anchor-gated extraction (F5∧F6 -> X3∧F7). */
  def candidates(texts: DataFrame, curYear: Int = PinnedCurrentYear): DataFrame = {
    val jsonldYear = firstYear(coalesce(
      foundedValue(from_json(col("text"), MapType(StringType, StringType))),
      col("text")))
    val years = when(col("method") === "jsonld",
      filter(array(jsonldYear), y => y.isNotNull && yearInRange(y, curYear)))
      .otherwise(anchorGatedYears(col("text"), curYear))
    texts.select(col("website"), col("method"), explode(years).as("year"))
      .distinct()
  }

  /** A1: year present in every method that produced candidates; min wins. */
  def consensus(cand: DataFrame): DataFrame = {
    val tot = cand.groupBy("website").agg(countDistinct("method").as("n_methods"))
    cand.groupBy("website", "year").agg(countDistinct("method").as("n_m"))
      .join(tot, "website").filter(col("n_m") === col("n_methods"))
      .groupBy("website").agg(min("year").as("consensus_year"))
  }

  /** A2: +1 per non-google method, +10 for google; >= 11 means google plus
    * at least one other (founded_year.py:230-247). */
  def weightedVote(cand: DataFrame): DataFrame =
    cand.groupBy("website", "year")
      .agg((countDistinct(when(col("method") =!= "google", col("method"))) +
        lit(10) * max(when(col("method") === "google", 1).otherwise(0))).as("s"))
      .filter(col("s") >= 11)
      .groupBy("website").agg(min("year").as("vote_year"))

  /** A3: first non-empty method in jsonld -> relevant -> homepage -> google
    * order, then min within it (founded_year.py:249-266). */
  def priorityFallback(cand: DataFrame): DataFrame =
    cand.groupBy("website").agg(coalesce(
      min(when(col("method") === "jsonld", col("year"))),
      min(when(col("method") === "relevant", col("year"))),
      min(when(col("method") === "homepage", col("year"))),
      min(when(col("method") === "google", col("year")))).as("fallback_year"))

  /** P2/J4: attach Founded_Year to the firm table — consensus, else
    * weighted vote, else priority fallback (the reference's escalation
    * order, founded_year.py:203-266). */
  def enrich(firms: DataFrame, texts: DataFrame,
             curYear: Int = PinnedCurrentYear): DataFrame = {
    val cand = candidates(texts, curYear)
    firms
      .join(consensus(cand), Seq("website"), "left")
      .join(weightedVote(cand), Seq("website"), "left")
      .join(priorityFallback(cand), Seq("website"), "left")
      .withColumn("Founded_Year",
        coalesce(col("consensus_year"), col("vote_year"), col("fallback_year")))
      .drop("consensus_year", "vote_year", "fallback_year")
  }
}
