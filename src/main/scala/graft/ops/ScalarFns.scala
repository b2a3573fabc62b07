package graft.ops

import graft.{Q, Tables}
import graft.Tables.{dec4, scaledLong}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.8 scalar functions: string / date / math / conditional / array /
  * map / json. All built-in `functions._` (whole-stage-codegen'd); integer
  * outputs are cast to BIGINT on both engines so the physical types match
  * the oracle exactly.
  */
object ScalarFns {

  val fnString: Q = (s, d) =>
    Tables.part(s, d)
      .select(col("p_partkey"),
        upper(col("p_name")).as("up_name"),
        lower(col("p_brand")).as("low_brand"),
        substring(col("p_name"), 1, 5).as("name5"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
        length(col("p_name")).cast(LongType).as("name_len"),
        regexp_replace(col("p_name"), lit(" "), lit("_")).as("name_us"),
        lpad(col("p_size").cast(StringType), 4, "0").as("size_pad"),
        regexp_extract(col("p_brand"), "[0-9]+", 0).as("brand_num"))
      .orderBy("p_partkey")

  /** Cryptographic digests — the content-addressing primitive under exact
    * dedup, cache keys, and data-source checksums (the reference's
    * duplicate-skip is a SHA1 of the upload, varda/models.py ::
    * DataSource.checksum [U]). Hex strings render identically on both
    * engines. */
  val fnHash: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        md5(col("text")).as("md5_hex"),
        sha2(col("text"), 256).as("sha_hex"))
      .orderBy("doc_id")

  val fnDate: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast(LongType).as("yr"),
        month(col("o_orderdate")).cast(LongType).as("mo"),
        dayofmonth(col("o_orderdate")).cast(LongType).as("dy"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate"), to_date(lit("1990-01-01")))
          .cast(LongType).as("days_since"),
        date_add(col("o_orderdate"), 7).as("plus7"),
        weekday(col("o_orderdate")).cast(LongType).as("dow_mon0"))
      .orderBy("o_orderkey")

  // dup (l_orderkey, l_linenumber) rows exist — sort on the base columns
  // that determine every derived output, then project (order-preserving).
  val fnMath: Q = (s, d) =>
    Tables.lineitem(s, d)
      .orderBy("l_orderkey", "l_linenumber", "l_extendedprice",
        "l_discount", "l_quantity")
      .select(col("l_orderkey"), col("l_linenumber"),
        scaledLong(round(dec4(col("l_extendedprice")), 1)
          .cast(DecimalType(18, 1)), 1).as("price_round1_e1"),
        floor(col("l_extendedprice")).cast(LongType).as("price_floor"),
        ceil(col("l_extendedprice")).cast(LongType).as("price_ceil"),
        scaledLong(abs(dec4(col("l_discount")) - lit(BigDecimal("0.05")).cast(DecimalType(18, 4)))
          .cast(DecimalType(18, 4)), 4).as("disc_dev_e4"),
        (col("l_orderkey") % 7).as("key_mod7"),
        pow(col("l_quantity").cast(LongType), 2).cast(LongType).as("qty_sq"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        scaledLong(log(col("l_extendedprice")).cast(DecimalType(18, 6)), 6)
          .as("price_ln_e6"))

  val fnConditional: Q = (s, d) =>
    Tables.customer(s, d)
      .select(col("c_custkey"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 5000, "mid")
          .otherwise("high").as("bal_band"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("N/A")).as("seg"),
        greatest(col("c_custkey") % 7, col("c_nationkey").cast(LongType)).as("g7"),
        least(col("c_custkey") % 7, col("c_nationkey").cast(LongType)).as("l7"))
      .orderBy("c_custkey")

  val fnArray: Q = (s, d) => {
    val toks = split(col("text"), " ")
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(toks).cast(LongType).as("n_tokens"),
        size(array_distinct(toks)).cast(LongType).as("n_distinct"),
        array_contains(toks, "spark").as("has_spark"),
        element_at(sort_array(array_distinct(toks)), 1).as("first_token"))
      .orderBy("doc_id")
  }

  val fnMap: Q = (s, d) => {
    val m = from_json(col("props"), MapType(StringType, LongType))
    Tables.events(s, d)
      .select(col("event_id"),
        element_at(map_keys(m), 1).as("key0"),
        element_at(m, "k").as("k_val"),
        size(map_keys(m)).cast(LongType).as("n_keys"))
      .orderBy("event_id")
  }

  val fnJson: Q = (s, d) => {
    val maybeBad = when(col("event_id") % 10 === 0, substring(col("props"), 1, 3))
      .otherwise(col("props"))
    Tables.events(s, d)
      .select(col("event_id"),
        get_json_object(maybeBad, "$.k").cast(LongType).as("k_val"))
      .orderBy("event_id")
  }

  val queries: Map[String, Q] = Map(
    "fn_string" -> fnString,
    "fn_hash" -> fnHash,
    "fn_date" -> fnDate,
    "fn_math" -> fnMath,
    "fn_conditional" -> fnConditional,
    "fn_array" -> fnArray,
    "fn_map" -> fnMap,
    "fn_json" -> fnJson)

  val oracle: Map[String, String] = Map(
    "fn_hash" ->
      """SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha_hex
         FROM documents ORDER BY doc_id""",
    "fn_string" ->
      """SELECT p_partkey,
           upper(p_name) AS up_name,
           lower(p_brand) AS low_brand,
           substr(p_name, 1, 5) AS name5,
           trim('  ' || p_name || '  ') AS trimmed,
           CAST(length(p_name) AS BIGINT) AS name_len,
           replace(p_name, ' ', '_') AS name_us,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           regexp_extract(p_brand, '[0-9]+') AS brand_num
         FROM part ORDER BY p_partkey""",
    "fn_date" ->
      """SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           CAST(day(o_orderdate) AS BIGINT) AS dy,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
           CAST(o_orderdate + INTERVAL 7 DAY AS DATE) AS plus7,
           CAST(isodow(o_orderdate) - 1 AS BIGINT) AS dow_mon0
         FROM orders ORDER BY o_orderkey""",
    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
           CAST(CAST(CAST(round(CAST(l_extendedprice AS DECIMAL(18,4)), 1) AS DECIMAL(18,1)) AS DECIMAL(38,1)) * 10 AS BIGINT) AS price_round1_e1,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(CAST(CAST(abs(CAST(l_discount AS DECIMAL(18,4)) - CAST(0.05 AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DECIMAL(38,4)) * 10000 AS BIGINT) AS disc_dev_e4,
           l_orderkey % 7 AS key_mod7,
           CAST(power(CAST(l_quantity AS BIGINT), 2) AS BIGINT) AS qty_sq,
           sqrt(l_quantity) AS qty_sqrt,
           CAST(CAST(CAST(ln(l_extendedprice) AS DECIMAL(18,6)) AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS price_ln_e6
         FROM lineitem
         ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_discount, l_quantity""",
    "fn_conditional" ->
      """SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bal_band,
           coalesce(NULLIF(c_mktsegment, 'BUILDING'), 'N/A') AS seg,
           greatest(c_custkey % 7, CAST(c_nationkey AS BIGINT)) AS g7,
           least(c_custkey % 7, CAST(c_nationkey AS BIGINT)) AS l7
         FROM customer ORDER BY c_custkey""",
    "fn_array" ->
      """SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           list_sort(list_distinct(string_split(text, ' ')))[1] AS first_token
         FROM documents ORDER BY doc_id""",
    "fn_map" ->
      """SELECT event_id,
           json_keys(props)[1] AS key0,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(len(json_keys(props)) AS BIGINT) AS n_keys
         FROM events ORDER BY event_id""",
    "fn_json" ->
      """SELECT event_id,
           CASE WHEN json_valid(s2) THEN CAST(json_extract_string(s2, '$.k') AS BIGINT)
                ELSE NULL END AS k_val
         FROM (SELECT event_id,
                 CASE WHEN event_id % 10 = 0 THEN substr(props, 1, 3) ELSE props END AS s2
               FROM events) t
         ORDER BY event_id""")
}
