package graft

import graft.operators.FoundedYear

/** Voting-rule semantics on synthetic method texts (founded_year.py parity). */
class FoundedYearSpec extends SparkSpec {
  import spark.implicits._

  private def texts = Seq(
    // firm A: all methods agree on 1987 (consensus path)
    ("https://a.com", "jsonld", """{"foundingDate":"1987-03-01"}"""),
    ("https://a.com", "relevant", "Founded in 1987 after years of work since 1985"),
    ("https://a.com", "homepage", "established 1987"),
    ("https://a.com", "google", "Acme was founded in 1987"),
    // firm B: no full consensus; google + homepage agree on 1999 (weighted path)
    ("https://b.com", "jsonld", """{"foundingDate":"2001-01-01"}"""),
    ("https://b.com", "homepage", "since 1999"),
    ("https://b.com", "google", "Beta, established 1999"),
    // firm C: methods disagree entirely -> priority fallback takes jsonld
    ("https://c.com", "jsonld", """{"founded":"2010"}"""),
    ("https://c.com", "google", "founded 1995"),
    // firm D: address/date noise must be vetoed -> no candidates at all
    ("https://d.com", "homepage", "Founded office street 2600"),
    ("https://d.com", "google", "Founded January 1987")
  ).toDF("website", "method", "text")

  private def firms = Seq(
    ("A", "https://a.com"), ("B", "https://b.com"),
    ("C", "https://c.com"), ("D", "https://d.com")
  ).toDF("FullName", "website")

  test("candidates: anchor gate extracts, vetoes drop noise") {
    val cand = FoundedYear.candidates(texts).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(cand.contains(("https://a.com", "relevant", 1987)))
    assert(cand.contains(("https://a.com", "relevant", 1985))) // both years pass the gate
    assert(cand.contains(("https://a.com", "jsonld", 1987)))
    assert(!cand.exists(_._1 == "https://d.com")) // F6 vetoes
  }

  test("A1 consensus: intersection across all methods, min wins") {
    val c = FoundedYear.consensus(FoundedYear.candidates(texts))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(c("https://a.com") == 1987)
    assert(!c.contains("https://b.com"))
  }

  test("A2 weighted vote: google + one other reaches threshold 11") {
    val v = FoundedYear.weightedVote(FoundedYear.candidates(texts))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(v("https://b.com") == 1999)
    assert(!v.contains("https://c.com")) // google-only = 10 < 11
  }

  test("enrich: escalation order consensus > weighted > priority") {
    val out = FoundedYear.enrich(firms, texts)
      .collect().map(r => (r.getAs[String]("FullName"), Option(r.getAs[Integer]("Founded_Year")))).toMap
    assert(out("A").contains(1987)) // consensus
    assert(out("B").contains(1999)) // weighted
    assert(out("C").contains(2010)) // priority fallback -> jsonld first
    assert(out("D").isEmpty)        // everything vetoed -> null
  }
}
