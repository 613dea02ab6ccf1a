package graft

import org.apache.spark.sql.functions._

/** Pins the events.ts schema contract: the testdata has shipped `ts` as both
  * INT64 TIMESTAMP(NANOS) (read as raw nanos longs under `nanosAsLong`) and
  * TIMESTAMP_NTZ(µs). `Tables.tsUs` must dispatch on the actual column type
  * and land both vintages on the SAME microsecond value — the r9 regression
  * (7 queries red) was a hardcoded nanos assumption going stale when the
  * driver refreshed the testdata. */
class EventsSchemaSpec extends SparkSpec {
  import spark.implicits._

  private val usInstant = 1700000000123456L // 2023-11-14T22:13:20.123456Z

  test("tsUs on the nanos-long vintage is integral div 1000") {
    val df = Seq((1L, usInstant * 1000L), (2L, 999L)).toDF("event_id", "ts")
    val got = df.select(col("event_id"), Tables.tsUs(df).as("ts_us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === usInstant)
    assert(got(2L) === 0L, "sub-µs nanos floor to zero (integral div)")
  }

  test("tsUs on the timestamp_ntz vintage matches the nanos vintage exactly") {
    val ntz = Seq(Tuple1(usInstant))
      .toDF("us")
      .select(expr("cast(timestamp_micros(us) as timestamp_ntz)").as("ts"))
    assert(ntz.schema("ts").dataType === org.apache.spark.sql.types.TimestampNTZType)
    val got = ntz.select(Tables.tsUs(ntz).as("ts_us")).collect().head.getLong(0)
    assert(got === usInstant, "UTC-pinned ntz->timestamp cast is a tz-free reinterpretation")
  }

  test("tsUs on a plain timestamp vintage is unix_micros directly") {
    val tdf = Seq(Tuple1(usInstant)).toDF("us")
      .select(expr("timestamp_micros(us)").as("ts"))
    assert(tdf.schema("ts").dataType === org.apache.spark.sql.types.TimestampType)
    val got = tdf.select(Tables.tsUs(tdf).as("ts_us")).collect().head.getLong(0)
    assert(got === usInstant)
  }

  test("the live testdata events table dispatches and yields plausible epochs") {
    val ev = Tables.events(spark, sf0001)
    val row = ev.select(min(Tables.tsUs(ev)).as("lo"), max(Tables.tsUs(ev)).as("hi"))
      .collect().head
    val (lo, hi) = (row.getLong(0), row.getLong(1))
    assert(lo >= 0L && lo <= hi, "post-epoch, ordered")
    // any sane event corpus sits between 2000-01-01 and 2100-01-01 in µs
    assert(hi > 946684800000000L && hi < 4102444800000000L,
      s"ts_us out of plausible range: $hi — dispatch returned wrong unit?")
  }

  test("tsUs rejects an unsupported ts type instead of mis-converting") {
    val bad = Seq(Tuple1("2024-01-01")).toDF("ts")
    intercept[IllegalStateException] { Tables.tsUs(bad) }
  }
}
