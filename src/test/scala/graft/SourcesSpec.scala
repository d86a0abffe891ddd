package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Ewma
import graft.sources.Pages

/** Source-format coverage (SURVEY.md §2.1: CSV scan for parity fixtures) and
  * EWMA crossover arithmetic.
  */
class SourcesSpec extends SparkSuite {
  import spark.implicits._

  test("CSV sink + scan round-trips the page table (binary as base64)") {
    val dir = Files.createTempDirectory("graft_csv_").toString
    val pages = Pages.synthesize(spark, 500L, seed = 3L)
    pages
      // Spark's base64 emits MIME-chunked output (newline every 76 chars),
      // which a CSV cell cannot hold — strip the breaks (unbase64 is lenient)
      .withColumn("html_b64", regexp_replace(base64(col("html")), "[\\r\\n]", ""))
      .drop("html")
      .write.option("header", "true")
      // the CSV writer trims cell whitespace by default; synthesized texts
      // end mid-phrase with trailing spaces that must survive the roundtrip
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .mode("overwrite").csv(dir)
    val back = spark.read
      .option("header", "true")
      .schema("url string, warc_ts timestamp, text string, lang string, html_b64 string")
      .csv(dir)
      .withColumn("html", unbase64(col("html_b64")))
      .select("url", "warc_ts", "html", "text", "lang")
    // CSV writes empty strings as null; normalize both sides for compare
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("text", coalesce(col("text"), lit("")))
      .withColumn("html_sha", sha2(col("html"), 256)).drop("html")
    assert(norm(back).exceptAll(norm(pages)).isEmpty)
    assert(back.count() === 500)
  }

  test("EWMA crossover equals ratio of span EWMAs") {
    val daily = Seq(
      (1L, "2024-01-01", 10.0), (1L, "2024-01-02", 20.0),
      (1L, "2024-01-03", 30.0), (1L, "2024-01-04", 40.0)
    ).toDF("uid", "d", "v").withColumn("d", col("d").cast("timestamp"))
    // crossovers returns the series frame (uid, ts_sec, ewma + cross cols)
    val out = Ewma.crossovers(daily, Seq("uid"), "d", "v", spans = Seq(3.0, 5.0),
        lagRows = 1, minPeriods = 1)
      .orderBy("ts_sec").collect()
    // row 4 (lag-1 series 10,20,30): ewma3 = adjust-weighted with decay .5:
    // (30 + 20*.5 + 10*.25)/(1+.5+.25); ewma5 decay 2/3
    val e3 = (30.0 + 20.0 * 0.5 + 10.0 * 0.25) / (1 + 0.5 + 0.25)
    val e5 = (30.0 + 20.0 * (2.0 / 3) + 10.0 * (4.0 / 9)) / (1 + 2.0 / 3 + 4.0 / 9)
    val last = out.last
    assert(approxEq(last.getAs[Double]("v_ewma3"), e3))
    assert(approxEq(last.getAs[Double]("v_ewma5"), e5))
    assert(approxEq(last.getAs[Double]("v_ewma_cross_3_5"), e3 / e5))
    // first row: no lagged history -> all null
    assert(out.head.isNullAt(out.head.fieldIndex("v_ewma_cross_3_5")))
  }
}
