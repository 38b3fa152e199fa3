package graft.functions

import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Scalar-function queries (SURVEY.md §2.6): string, date/time, math,
  * conditional, array. All are per-row codegen'd built-ins — they fuse into
  * one WholeStageCodegen stage with the scan, so at 100 TB they cost one
  * pass over the pruned columns and nothing else.
  *
  * Cross-engine trap pins (SURVEY §2.7 item 7), verified by crosscheck:
  *  - Spark `dayofweek` is 1=Sunday; DuckDB's is 0=Sunday → oracle adds 1.
  *  - Spark `regexp_replace` replaces ALL matches; DuckDB only the first
  *    without the 'g' flag → oracle passes 'g'.
  *  - `regexp_extract` group index is 1-based-first-capture on both.
  *  - Spark `ceil`/`floor` return BIGINT; DuckDB's return DOUBLE → oracle
  *    casts.
  *  - DuckDB has no `pmod` → oracle spells ((x % m) + m) % m.
  */
object Scalars {

  /** Q24 — string functions over customer names. */
  val q24 = Q(
    "q_fn_string",
    """SELECT c_custkey,
      |  CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT) AS name_id,
      |  lower(c_mktsegment) AS seg_lower,
      |  substring(c_name, 1, 8) AS name_prefix,
      |  concat_ws('|', c_mktsegment, c_name) AS joined,
      |  CAST(length(c_name) AS INT) AS name_len,
      |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
      |  regexp_replace(c_name, '\d', '#', 'g') AS masked,
      |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS translated,
      |  trim(concat('  ', c_mktsegment, '  ')) AS trimmed,
      |  replace(c_name, 'Customer', 'Cust') AS replaced,
      |  string_split(c_name, '#')[1] AS name_head
      |FROM customer
      |ORDER BY c_custkey""".stripMargin
  ) { (spark, dir) =>
    Tables.customer(spark, dir)
      .select(col("c_custkey"),
        regexp_extract(col("c_name"), "Customer#(\\d+)", 1).cast("long").as("name_id"),
        lower(col("c_mktsegment")).as("seg_lower"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("joined"),
        length(col("c_name")).as("name_len"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("key_padded"),
        regexp_replace(col("c_name"), "\\d", "#").as("masked"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("translated"),
        trim(concat(lit("  "), col("c_mktsegment"), lit("  "))).as("trimmed"),
        regexp_replace(col("c_name"), "Customer", "Cust").as("replaced"),
        split(col("c_name"), "#").getItem(0).as("name_head"))
      .orderBy("c_custkey")
  }

  /** Q25 — date/time functions over orders (the reference family's core
    * transform: the time-dimension build). */
  val q25 = Q(
    "q_fn_date",
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INT) AS y,
      |  CAST(quarter(o_orderdate) AS INT) AS q,
      |  CAST(month(o_orderdate) AS INT) AS m,
      |  CAST(dayofmonth(o_orderdate) AS INT) AS dom,
      |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
      |  CAST(weekofyear(o_orderdate) AS INT) AS woy,
      |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
      |  CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
      |  CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
      |  last_day(CAST(o_orderdate AS DATE)) AS eom,
      |  strftime(o_orderdate, '%Y-%m') AS ym
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin
  ) { (spark, dir) =>
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        dayofweek(col("o_orderdate")).as("dow"),
        weekofyear(col("o_orderdate")).as("woy"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
          .as("days_since"),
        add_months(col("o_orderdate"), 3).as("plus3m"),
        last_day(col("o_orderdate")).as("eom"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      .orderBy("o_orderkey")
  }

  /** Q26 — math functions + decimal fixed-point. round() is applied only to
    * irrational-valued results (sqrt/ln/pow) where a decimal .5 boundary
    * has ~zero probability; 2-dp money is never rounded to coarser grains
    * (half-even vs half-up would bite). */
  val q26 = Q(
    "q_fn_math",
    """SELECT p_partkey,
      |  abs(p_retailprice - 1500) AS abs_diff,
      |  CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
      |  CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
      |  round(sqrt(p_retailprice), 6) AS price_sqrt,
      |  round(ln(p_retailprice + 1), 6) AS price_ln,
      |  round(exp(p_size / 25.0), 6) AS size_exp,
      |  round(pow(CAST(p_size AS DOUBLE), 1.5), 6) AS size_pow,
      |  CAST(((p_size - 25) % 7 + 7) % 7 AS INT) AS size_pmod,
      |  CAST(sign(p_retailprice - 1500) AS INT) AS price_sign,
      |  CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec
      |FROM part
      |ORDER BY p_partkey""".stripMargin
  ) { (spark, dir) =>
    Tables.part(spark, dir)
      .select(col("p_partkey"),
        abs(col("p_retailprice") - 1500).as("abs_diff"),
        ceil(col("p_retailprice")).as("price_ceil"),
        floor(col("p_retailprice")).as("price_floor"),
        round(sqrt(col("p_retailprice")), 6).as("price_sqrt"),
        round(log(col("p_retailprice") + 1), 6).as("price_ln"),
        round(exp(col("p_size") / lit(25.0)), 6).as("size_exp"),
        round(pow(col("p_size").cast("double"), 1.5), 6).as("size_pow"),
        pmod(col("p_size") - 25, lit(7)).as("size_pmod"),
        signum(col("p_retailprice") - 1500).cast("int").as("price_sign"),
        // DecimalType round-trip exercised, but surfaced as DOUBLE: the
        // driver's hash canonicalizes Spark/DuckDB parquet decimals
        // differently (round-2 verdict: 0/22000 cells differ by value,
        // hash still mismatched on the repo's only decimal output column).
        col("p_retailprice").cast("decimal(12,2)").cast("double").as("price_dec"))
      .orderBy("p_partkey")
  }

  /** Q27 — conditional logic: CASE bands, nullif/coalesce, least/greatest. */
  val q27 = Q(
    "q_fn_cond",
    s"""SELECT
       |  CASE WHEN o_totalprice < 50000 THEN 'low'
       |       WHEN o_totalprice < 150000 THEN 'mid'
       |       ELSE 'high' END AS band,
       |  COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status2,
       |  COUNT(*) AS n_orders,
       |  ${Det.sqlExactSum("least(o_totalprice, 100000)", 100)} AS sum_capped,
       |  ${Det.sqlExactSum("greatest(o_totalprice, 1000)", 100)} AS sum_floored
       |FROM orders
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin
  ) { (spark, dir) =>
    Tables.orders(spark, dir)
      .select(
        when(col("o_totalprice") < 50000, "low")
          .when(col("o_totalprice") < 150000, "mid")
          .otherwise("high").as("band"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("PENDING")).as("status2"),
        col("o_totalprice"))
      .groupBy("band", "status2")
      .agg(count(lit(1)).as("n_orders"),
        Det.exactSum(least(col("o_totalprice"), lit(100000.0)), 100).as("sum_capped"),
        Det.exactSum(greatest(col("o_totalprice"), lit(1000.0)), 100).as("sum_floored"))
      .orderBy("band", "status2")
  }

  /** Q28 — array functions + posexplode (Generator/UDTF surface) over the
    * embeddings table: per-element long format for the first 4 dims plus
    * whole-array stats. float32 → double casts are exact; round6 pins the
    * decimal representation on both engines. */
  val q28 = Q(
    "q_fn_array",
    """SELECT vec_id, i - 1 AS pos,
      |  round(CAST(embedding[i] AS DOUBLE), 6) AS v6,
      |  CAST(len(embedding) AS INT) AS dim,
      |  round(CAST(list_max(embedding) AS DOUBLE), 6) AS vmax,
      |  round(CAST(list_min(embedding) AS DOUBLE), 6) AS vmin
      |FROM embeddings, range(1, 5) t(i)
      |WHERE vec_id < 10
      |ORDER BY vec_id, pos""".stripMargin
  ) { (spark, dir) =>
    Tables.embeddings(spark, dir)
      .filter(col("vec_id") < 10)
      .select(col("vec_id"),
        size(col("embedding")).as("dim"),
        round(array_max(col("embedding")).cast("double"), 6).as("vmax"),
        round(array_min(col("embedding")).cast("double"), 6).as("vmin"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .filter(col("pos") < 4)
      .select(col("vec_id"), col("pos").cast("long").as("pos"),
        round(col("v").cast("double"), 6).as("v6"),
        col("dim"), col("vmax"), col("vmin"))
      .orderBy("vec_id", "pos")
  }

  /** Map functions over a MapType column built from the events JSON: size,
    * element_at, sorted map_keys, map_filter, and an aggregate over
    * map_values. The map exists only inside the Spark plan (MapType has no
    * stable cross-engine parquet hash), so every OUTPUT column is a plain
    * int/string the oracle reproduces directly from the JSON — the operator
    * under test is Spark's map machinery, the contract stays comparable. */
  val qFnMap = Q(
    "q_fn_map",
    """SELECT event_id,
      |  3 AS n_keys,
      |  CAST(json_extract(props, '$.k') AS INT) % 7 AS k7,
      |  'k,k3,k7' AS keys_str,
      |  CAST(json_extract(props, '$.k') AS INT)
      |    + CAST(json_extract(props, '$.k') AS INT) % 7
      |    + CAST(json_extract(props, '$.k') AS INT) % 3 AS vals_sum,
      |  CAST((CAST(json_extract(props, '$.k') AS INT) > 50)::INT
      |    + (CAST(json_extract(props, '$.k') AS INT) % 7 > 50)::INT
      |    + (CAST(json_extract(props, '$.k') AS INT) % 3 > 50)::INT AS INT) AS n_big
      |FROM events
      |WHERE event_id < 2000
      |ORDER BY event_id""".stripMargin
  ) { (spark, dir) =>
    val k = get_json_object(col("props"), "$.k").cast("int")
    Tables.events(spark, dir)
      .filter(col("event_id") < 2000)
      .withColumn("m", map_from_arrays(
        array(lit("k"), lit("k7"), lit("k3")),
        array(k, pmod(k, lit(7)), pmod(k, lit(3)))))
      .select(col("event_id"),
        size(col("m")).as("n_keys"),
        element_at(col("m"), "k7").as("k7"),
        concat_ws(",", array_sort(map_keys(col("m")))).as("keys_str"),
        aggregate(map_values(col("m")), lit(0), (acc, x) => acc + x).as("vals_sum"),
        size(map_filter(col("m"), (_, v) => v > 50)).as("n_big"))
      .orderBy("event_id")
  }

  /** Bitwise functions: AND/OR/XOR/shifts/popcount over the part key —
    * exact integer ops, trivially deterministic cross-engine. */
  val qFnBitwise = Q(
    "q_fn_bitwise",
    """SELECT p_partkey,
      |  p_partkey & 255 AS b_and,
      |  p_partkey | 4096 AS b_or,
      |  xor(p_partkey, 1365) AS b_xor,
      |  p_partkey << 2 AS b_shl,
      |  p_partkey >> 3 AS b_shr,
      |  CAST(bit_count(p_partkey) AS INT) AS b_pop
      |FROM part
      |ORDER BY p_partkey""".stripMargin
  ) { (spark, dir) =>
    Tables.part(spark, dir)
      .select(col("p_partkey"),
        (col("p_partkey").bitwiseAND(255)).as("b_and"),
        (col("p_partkey").bitwiseOR(4096)).as("b_or"),
        (col("p_partkey").bitwiseXOR(1365)).as("b_xor"),
        shiftleft(col("p_partkey"), 2).as("b_shl"),
        shiftright(col("p_partkey"), 3).as("b_shr"),
        bit_count(col("p_partkey")).as("b_pop"))
      .orderBy("p_partkey")
  }

  /** StructType expressions: build structs in-plan, extract fields. Like
    * q_fn_map, the struct lives only inside the plan — outputs are plain
    * scalars so the cross-engine compare stays exact. */
  val qFnStruct = Q(
    "q_fn_struct",
    """SELECT o_orderkey,
      |  ({'lo': least(o_totalprice, 100000.0),
      |    'hi': greatest(o_totalprice, 100000.0)}).hi AS hi_price,
      |  struct_extract({'y': CAST(year(o_orderdate) AS INT),
      |                  'm': CAST(month(o_orderdate) AS INT)}, 'm') AS o_month
      |FROM orders
      |WHERE o_orderkey <= 3000
      |ORDER BY o_orderkey""".stripMargin
  ) { (spark, dir) =>
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") <= 3000)
      .withColumn("pr", struct(
        least(col("o_totalprice"), lit(100000.0)).as("lo"),
        greatest(col("o_totalprice"), lit(100000.0)).as("hi")))
      .withColumn("ym", struct(
        year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m")))
      .select(col("o_orderkey"), col("pr.hi").as("hi_price"),
        col("ym.m").as("o_month"))
      .orderBy("o_orderkey")
  }

  /** Dirty-data handling: TRY_CAST over free-text tokens — NULL on parse
    * failure instead of a job-killing exception, the semantics every ETL
    * ingest path needs. COUNT(expr) counts the successful parses. */
  val qFnTryCast = Q(
    "q_fn_trycast",
    """SELECT lang,
      |  COUNT(*) AS n_tokens,
      |  COUNT(TRY_CAST(t AS INT)) AS n_numeric,
      |  CAST(SUM(TRY_CAST(t AS INT)) AS BIGINT) AS sum_numeric
      |FROM (SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents)
      |GROUP BY lang
      |ORDER BY lang""".stripMargin
  ) { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("t"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_tokens"),
        count(expr("try_cast(t AS INT)")).as("n_numeric"),
        sum(expr("try_cast(t AS INT)")).as("sum_numeric"))
      .orderBy("lang")
  }

  def all: Seq[Q] = Seq(q24, q25, q26, q27, q28, qFnMap, qFnBitwise, qFnStruct,
    qFnTryCast)
}
