package graft.functions

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Semi-structured / JSON surface — weather-feed parity (SURVEY.md §2.7 F2-F6).
  *
  * The reference keeps a raw JSON payload in a VARIANT column and extracts
  * typed fields from a nested struct + array-of-struct payload
  * (`/root/reference/dags/weather_realtime_etl.py:116-124,140`). Here that is
  * `from_json` with an explicit schema (codegen-friendly, no UDFs) and
  * `get_json_object` for path extraction; oracle comparison is on extracted
  * typed fields, never raw JSON bytes (SURVEY.md §7 hard-part 4).
  */
object Json {

  /** OpenWeather-shaped payload schema
    * (`/root/reference/dags/weather_realtime_etl.py:118-121`). */
  val weatherSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("main", StructType(Seq(
      StructField("temp", DoubleType),
      StructField("humidity", IntegerType)))),
    StructField("weather", ArrayType(StructType(Seq(
      StructField("description", StringType)))))))

  /** Parse a nested payload and project the reference's typed weather row
    * (city/temp_f/weather_desc/humidity_pct — DDL `weather_realtime_etl.py:52-64`). */
  def weatherParse(s: SparkSession): DataFrame = {
    import s.implicits._
    val payload =
      """{"name":"New York","main":{"temp":61.2,"humidity":78},
        |"weather":[{"description":"light rain"}]}""".stripMargin.replace("\n", "")
    s.range(1).select(from_json(lit(payload), weatherSchema).as("j"))
      .select(
        $"j.name".as("city"),
        $"j.main.temp".as("temp_f"),
        $"j.weather".getItem(0).getField("description").as("weather_desc"),
        $"j.main.humidity".as("humidity_pct"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // path extraction over a real distributed column
    "q_json_extract" -> ((s, d) => {
      Tables.events(s, d)
        .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
    }),
    // typed from_json over the same column, aggregated per event_type
    "q_json_typed" -> ((s, d) => {
      val schema = StructType(Seq(StructField("k", IntegerType)))
      Tables.events(s, d)
        .select(col("event_type"), from_json(col("props"), schema).getField("k").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("k_sum"), count(lit(1)).as("n"))
    }),
    "q_json_weather" -> ((s, _) => weatherParse(s)),
    // DSv2 WRITE path: nation through the staged-commit JSON-lines sink
    // (sources/JsonLineSink.scala), read back with the declared schema —
    // identity on the rows, same oracle as the CSV round-trip
    "q_dsv2_sink" -> ((s, d) => {
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_dsv2_sink_" +
        java.lang.ProcessHandle.current().pid()
      Tables.nation(s, d).write.format("graft.sources.JsonLineSink")
        .option("path", tmp).mode("overwrite").save()
      s.read.schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .option("mode", "FAILFAST").json(tmp)
    }),
    // the same observation through the DataSource V2 point source
    // (sources/JsonPointSource.scala) — custom TableProvider + column-pruned
    // scan instead of a parsed literal; same oracle row
    "q_dsv2_point" -> ((s, _) => {
      val payload =
        """{"name":"New York","main":{"temp":61.2,"humidity":78},
          |"weather":[{"description":"light rain"}]}""".stripMargin.replace("\n", "")
      s.read.format("graft.sources.JsonPointSource")
        .option("payload", payload).load()
    }),
    // STREAMING DSv2: the same feed through the MicroBatchStream source
    // (sources/JsonPointMicroBatch.scala) — offset = line index,
    // linesPerBatch=2 forces the 6-observation backlog through 3 rate-
    // limited micro-batches under Trigger.AvailableNow; the aggregate in
    // complete mode must equal the batch aggregate of the same payload
    // (decimal-summed avg so partial-aggregation order can't flip bits)
    "q_stream_dsv2" -> ((s, _) => {
      val agg = s.readStream.format("graft.sources.JsonPointStreamSource")
        .option("payload", streamPayload).option("linesPerBatch", "2").load()
        .groupBy(col("weather_desc"))
        .agg(count(lit(1)).as("n_obs"),
          (sum(col("temp_f").cast(DecimalType(18, 2))).cast("double") /
            count(lit(1))).as("avg_temp_f"),
          sum(col("humidity_pct").cast("long")).as("sum_humidity"))
      graft.streaming.StreamingOps.runToParquet(s, agg, "graft_dsv2_stream")
    }),
    // F5 to_json: serialize a typed struct to JSON, re-parse, extract — the
    // round-trip must be the identity on the typed fields (oracle checks the
    // values; JSON text itself is never compared, SURVEY.md §7 hard-part 4)
    "q_json_roundtrip" -> ((s, d) => {
      val schema = StructType(Seq(
        StructField("k", LongType), StructField("pri", StringType)))
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          to_json(struct(col("o_orderkey").as("k"),
            col("o_orderpriority").as("pri"))).as("j"))
        .select(col("o_orderkey"), from_json(col("j"), schema).as("p"))
        .select(col("o_orderkey"), col("p.k").as("k"), col("p.pri").as("pri"))
    }),
  )

  /** Six observations, one JSON line each — the multi-line form of the
    * weather payload, shared by the streaming-DSv2 query and its spec. */
  private[graft] val streamPayload: String = Seq(
    ("New York", 61.2, 78, "light rain"),
    ("Los Angeles", 75.0, 40, "clear sky"),
    ("Chicago", 55.4, 65, "light rain"),
    ("Houston", 88.1, 70, "clear sky"),
    ("Phoenix", 95.0, 20, "clear sky"),
    ("Seattle", 52.3, 85, "moderate rain"))
    .map { case (city, t, h, desc) =>
      s"""{"name":"$city","main":{"temp":$t,"humidity":$h},""" +
        s""""weather":[{"description":"$desc"}]}"""
    }.mkString("\n")

  val oracle: Map[String, String] = Map(
    "q_stream_dsv2" ->
      """WITH obs(city, temp_f, humidity_pct, weather_desc) AS (VALUES
        |  ('New York', 61.2, 78, 'light rain'),
        |  ('Los Angeles', 75.0, 40, 'clear sky'),
        |  ('Chicago', 55.4, 65, 'light rain'),
        |  ('Houston', 88.1, 70, 'clear sky'),
        |  ('Phoenix', 95.0, 20, 'clear sky'),
        |  ('Seattle', 52.3, 85, 'moderate rain'))
        |SELECT weather_desc, count(*) AS n_obs,
        |       CAST(SUM(CAST(temp_f AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_temp_f,
        |       CAST(SUM(humidity_pct) AS BIGINT) AS sum_humidity
        |FROM obs GROUP BY weather_desc""".stripMargin,
    "q_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, count(*) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "q_json_typed" ->
      """SELECT event_type, CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS k_sum,
        |       count(*) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "q_json_weather" ->
      """SELECT 'New York' AS city, CAST(61.2 AS DOUBLE) AS temp_f,
        |       'light rain' AS weather_desc, CAST(78 AS INTEGER) AS humidity_pct""".stripMargin,
    "q_dsv2_point" ->
      """SELECT 'New York' AS city, CAST(61.2 AS DOUBLE) AS temp_f,
        |       'light rain' AS weather_desc, CAST(78 AS INTEGER) AS humidity_pct""".stripMargin,
    "q_dsv2_sink" -> "SELECT * FROM nation",
    "q_json_roundtrip" ->
      "SELECT o_orderkey, o_orderkey AS k, o_orderpriority AS pri FROM orders",
  )
}
