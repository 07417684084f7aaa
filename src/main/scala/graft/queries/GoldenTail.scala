package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Last golden-file corners from the reference's SQL test corpus
  * (reference `sql/core/src/test/resources/sql-tests/inputs/` —
  * `datetime.sql`, `extract.sql`, and the `udf`/`udaf.sql` family):
  * a calendar-edge battery (leap years, pre-Gregorian dates, epoch
  * boundaries, the full trunc family), a timestamp-precision battery,
  * and UDF-in-every-clause shapes — each hash-checked against DuckDB.
  *
  * Engine-dialect notes: day-of-week is derived engine-specifically
  * (Spark `pmod(datediff(d, 1970-01-01)+4, 7)` vs DuckDB
  * `EXTRACT(DOW)`, both Sunday=0); format strings are `yyyy-MM-dd`
  * vs `%Y-%m-%d`; everything else is shared proleptic-Gregorian
  * semantics at session timezone UTC.
  */
object GoldenTail {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // datetime.sql / extract.sql: calendar edges on a fixed date list —
    // leap day in a leap century (2000) and a non-leap century (1900),
    // month-end clamping under add_months, ISO week 53 boundaries, the
    // first Gregorian date, and the epoch itself.
    "q_dt_golden" -> { (s, _) =>
      import s.implicits._
      val dates = Seq("1582-10-15", "1900-02-28", "1969-12-31", "1970-01-01",
        "2000-02-29", "2007-02-03", "2016-01-03", "2016-12-31", "2021-01-01",
        "2024-01-31", "2024-02-29", "2024-12-30")
      dates.toDF("ds").select(col("ds"), col("ds").cast("date").as("d"))
        .select(col("ds"),
          year(col("d")).as("y"),
          quarter(col("d")).as("q"),
          month(col("d")).as("m"),
          dayofmonth(col("d")).as("dom"),
          dayofyear(col("d")).as("doy"),
          weekofyear(col("d")).as("iso_week"),
          pmod(datediff(col("d"), lit("1970-01-01").cast("date")) + 4, lit(7))
            .cast("int").as("dow_sun0"),
          date_format(last_day(col("d")), "yyyy-MM-dd").as("month_end"),
          (dayofmonth(last_day(trunc(col("d"), "year")) // Jan 31 → +1 month
            ) === 31).as("jan_has_31"),
          date_format(add_months(col("d"), 1), "yyyy-MM-dd").as("plus_1mo"),
          date_format(add_months(col("d"), -13), "yyyy-MM-dd").as("minus_13mo"),
          date_format(trunc(col("d"), "year"), "yyyy-MM-dd").as("tr_year"),
          date_format(trunc(col("d"), "quarter"), "yyyy-MM-dd").as("tr_quarter"),
          date_format(trunc(col("d"), "month"), "yyyy-MM-dd").as("tr_month"),
          date_format(trunc(col("d"), "week"), "yyyy-MM-dd").as("tr_week"),
          datediff(col("d"), lit("1970-01-01").cast("date")).as("epoch_days"),
          (dayofmonth(last_day(make_date(year(col("d")), lit(2), lit(1)))) === 29)
            .as("is_leap_year"))
        .orderBy("ds")
    },

    // datetime.sql timestamp half: sub-second precision, epoch-second
    // boundaries (including a pre-1970 negative), trunc to
    // hour/minute/second, interval arithmetic, and format-string
    // parsing — all at session timezone UTC.
    "q_dt_epoch" -> { (s, _) =>
      import s.implicits._
      val tss = Seq("1969-12-31 23:59:59", "1970-01-01 00:00:00",
        "2011-05-06 07:08:09.123456", "2016-12-31 00:12:00.789",
        "2038-01-19 03:14:08")
      tss.toDF("tss").select(col("tss"), col("tss").cast("timestamp").as("t"))
        .select(col("tss"),
          unix_timestamp(col("t")).as("epoch_s"),
          hour(col("t")).as("h"),
          minute(col("t")).as("mi"),
          second(col("t")).as("sec"),
          date_format(col("t"), "SSSSSS").cast("long").as("micros"),
          date_format(date_trunc("hour", col("t")),
            "yyyy-MM-dd HH:mm:ss").as("tr_hour"),
          date_format(date_trunc("minute", col("t")),
            "yyyy-MM-dd HH:mm:ss").as("tr_minute"),
          date_format(date_trunc("second", col("t")),
            "yyyy-MM-dd HH:mm:ss").as("tr_second"),
          date_format(col("t") + expr("INTERVAL 90 MINUTE"),
            "yyyy-MM-dd HH:mm:ss").as("plus_90m"),
          date_format(col("t") - expr("INTERVAL 1 SECOND"),
            "yyyy-MM-dd HH:mm:ss").as("minus_1s"),
          date_format(to_timestamp(lit("31/12/2016 13:10"), "dd/MM/yyyy HH:mm"),
            "yyyy-MM-dd HH:mm:ss").as("parsed"),
          date_format(make_timestamp(lit(2024), lit(2), lit(29), lit(13),
            lit(10), lit(15)), "yyyy-MM-dd HH:mm:ss").as("made"))
        .orderBy("tss")
    },

    // udf/udf-group-by.sql shapes: the same Scala UDFs flowing through
    // every clause position — projection, WHERE, GROUP BY key, HAVING,
    // and ORDER BY — with the oracle re-expressing the lambda bodies as
    // plain SQL arithmetic.
    "q_udf_clauses" -> { (s, dir) =>
      val bucket = udf((k: Long) => k % 7L)
      val spread = udf((lo: Long, hi: Long) => hi - lo)
      val o = Tables.load(s, dir, "orders")
        .filter(bucket(col("o_orderkey")) =!= 3L)
      o.groupBy(bucket(col("o_custkey")).as("cust_bucket"))
        .agg(count(lit(1)).as("n"),
          spread(min(col("o_orderkey")), max(col("o_orderkey"))).as("key_spread"))
        .filter(col("n") > 10)
        .orderBy(col("cust_bucket"))
    })

  val oracle: Map[String, String] = Map(
    "q_dt_golden" ->
      """WITH t AS (
        |  SELECT ds, CAST(ds AS DATE) AS d FROM (VALUES
        |    ('1582-10-15'), ('1900-02-28'), ('1969-12-31'), ('1970-01-01'),
        |    ('2000-02-29'), ('2007-02-03'), ('2016-01-03'), ('2016-12-31'),
        |    ('2021-01-01'), ('2024-01-31'), ('2024-02-29'), ('2024-12-30')
        |  ) AS v(ds))
        |SELECT ds,
        |  CAST(year(d) AS INT) AS y,
        |  CAST(quarter(d) AS INT) AS q,
        |  CAST(month(d) AS INT) AS m,
        |  CAST(day(d) AS INT) AS dom,
        |  CAST(dayofyear(d) AS INT) AS doy,
        |  CAST(weekofyear(d) AS INT) AS iso_week,
        |  CAST(EXTRACT(DOW FROM d) AS INT) AS dow_sun0,
        |  strftime(last_day(d), '%Y-%m-%d') AS month_end,
        |  day(last_day(date_trunc('year', d))) = 31 AS jan_has_31,
        |  strftime(CAST(d + INTERVAL 1 MONTH AS DATE), '%Y-%m-%d') AS plus_1mo,
        |  strftime(CAST(d - INTERVAL 13 MONTH AS DATE), '%Y-%m-%d') AS minus_13mo,
        |  strftime(CAST(date_trunc('year', d) AS DATE), '%Y-%m-%d') AS tr_year,
        |  strftime(CAST(date_trunc('quarter', d) AS DATE), '%Y-%m-%d') AS tr_quarter,
        |  strftime(CAST(date_trunc('month', d) AS DATE), '%Y-%m-%d') AS tr_month,
        |  strftime(CAST(date_trunc('week', d) AS DATE), '%Y-%m-%d') AS tr_week,
        |  CAST(date_diff('day', DATE '1970-01-01', d) AS INT) AS epoch_days,
        |  day(last_day(make_date(CAST(year(d) AS BIGINT), 2, 1))) = 29 AS is_leap_year
        |FROM t ORDER BY ds""".stripMargin,
    "q_dt_epoch" ->
      """WITH t AS (
        |  SELECT tss, CAST(tss AS TIMESTAMP) AS t FROM (VALUES
        |    ('1969-12-31 23:59:59'), ('1970-01-01 00:00:00'),
        |    ('2011-05-06 07:08:09.123456'), ('2016-12-31 00:12:00.789'),
        |    ('2038-01-19 03:14:08')
        |  ) AS v(tss))
        |SELECT tss,
        |  CAST(floor(epoch(t)) AS BIGINT) AS epoch_s,
        |  CAST(hour(t) AS INT) AS h,
        |  CAST(minute(t) AS INT) AS mi,
        |  CAST(floor(EXTRACT(SECOND FROM t)) AS INT) AS sec,
        |  CAST(EXTRACT(MICROSECOND FROM t) AS BIGINT) % 1000000 AS micros,
        |  strftime(date_trunc('hour', t), '%Y-%m-%d %H:%M:%S') AS tr_hour,
        |  strftime(date_trunc('minute', t), '%Y-%m-%d %H:%M:%S') AS tr_minute,
        |  strftime(date_trunc('second', t), '%Y-%m-%d %H:%M:%S') AS tr_second,
        |  strftime(t + INTERVAL 90 MINUTE, '%Y-%m-%d %H:%M:%S') AS plus_90m,
        |  strftime(t - INTERVAL 1 SECOND, '%Y-%m-%d %H:%M:%S') AS minus_1s,
        |  strftime(strptime('31/12/2016 13:10', '%d/%m/%Y %H:%M'),
        |    '%Y-%m-%d %H:%M:%S') AS parsed,
        |  strftime(make_timestamp(2024, 2, 29, 13, 10, 15.0),
        |    '%Y-%m-%d %H:%M:%S') AS made
        |FROM t ORDER BY tss""".stripMargin,
    "q_udf_clauses" ->
      """SELECT o_custkey % 7 AS cust_bucket, count(*) AS n,
        |  CAST(max(o_orderkey) - min(o_orderkey) AS BIGINT) AS key_spread
        |FROM orders
        |WHERE o_orderkey % 7 <> 3
        |GROUP BY 1 HAVING count(*) > 10
        |ORDER BY cust_bucket""".stripMargin)
}
