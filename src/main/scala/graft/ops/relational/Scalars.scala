package graft.ops.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** §2-H scalar functions: string / datetime / math / conditional /
  * array / map / json / hash. All built-in `functions._` — codegen'd,
  * pushdown-transparent; no UDFs in this module (see TextUdf for the
  * UDF/UDTF surface).
  *
  * Engine-parity normalizations (vs DuckDB, SURVEY §5.4): day-of-week
  * via ISO numbering, floor/ceil cast to BIGINT, transcendentals
  * rounded, float arrays widened to double before arithmetic, doubles
  * stringified via DECIMAL(12,2) before hashing.
  */
object Scalars {

  def qFnString(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "part")
      .select(
        $"p_partkey",
        lower($"p_name").as("lo"),
        upper($"p_brand").as("up"),
        trim(concat(lit("  "), $"p_name", lit("  "))).as("trimmed"),
        substring($"p_name", 1, 5).as("sub5"),
        concat_ws("|", $"p_brand", $"p_type", $"p_name").as("joined"),
        lpad($"p_size".cast(StringType), 4, "0").as("size_padded"),
        size(split($"p_name", " ")).as("n_tokens"),
        regexp_extract($"p_name", "(\\w+)$", 1).as("last_word"),
        regexp_replace($"p_name", "[aeiou]", "_").as("devoweled"),
        levenshtein($"p_brand", lit("Brand#1")).as("lev"),
        length($"p_name").as("len"))
      .orderBy($"p_partkey")
  }

  def qFnDatetime(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "orders")
      .select(
        $"o_orderkey",
        to_date(date_trunc("month", $"o_orderdate")).as("month_start"),
        year($"o_orderdate").as("yr"),
        month($"o_orderdate").as("mo"),
        (weekday($"o_orderdate") + 1).as("isodow"),
        datediff($"o_orderdate", lit("1995-01-01").cast(DateType)).as("days_since"),
        ($"o_orderdate" + expr("INTERVAL 3 MONTH")).as("plus3mo"),
        last_day($"o_orderdate").as("month_end"),
        unix_timestamp($"o_orderdate").as("epoch_s"))
      .orderBy($"o_orderkey")
  }

  def qFnMath(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val centered = $"l_extendedprice" - 50000.0
    Tables.table(spark, dir, "lineitem")
      .select(
        $"l_orderkey", $"l_linenumber",
        // 2dp×2dp products sit exactly on .xx5 round boundaries where
        // Spark (rounds shortest decimal repr) and DuckDB (rounds true
        // binary value) disagree — multiply in exact DECIMAL instead.
        round($"l_extendedprice".cast(DecimalType(12, 2)) *
          $"l_discount".cast(DecimalType(12, 2)), 2)
          .cast(DoubleType).as("rounded"),
        floor($"l_extendedprice").as("fl"),
        ceil($"l_extendedprice").as("ce"),
        round(abs(centered), 2).as("abs_centered"),
        signum(centered).cast(IntegerType).as("sgn"),
        round(pow($"l_quantity", 2.0), 2).as("qty_sq"),
        round(log($"l_extendedprice"), 6).as("ln_price"),
        round(log10($"l_extendedprice"), 6).as("log10_price"),
        round(sqrt($"l_quantity"), 6).as("sqrt_qty"),
        pmod($"l_orderkey" - 7, lit(5)).as("pm"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  def qFnConditional(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "orders")
      .select(
        $"o_orderkey",
        when($"o_totalprice" < 50000.0, "small")
          .when($"o_totalprice" < 200000.0, "medium")
          .otherwise("large").as("band"),
        least($"o_totalprice", lit(100000.0)).as("capped"),
        greatest($"o_custkey", lit(100L)).as("floored_key"),
        when($"o_orderstatus" === "O", 1).otherwise(0).as("is_open"))
      .orderBy($"o_orderkey")
  }

  def qFnArray(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "embeddings")
      // widen float32 → double before any arithmetic (both engines)
      .withColumn("v", transform($"embedding", _.cast(DoubleType)))
      .select(
        $"vec_id",
        size($"embedding").as("dim"),
        round(aggregate($"v", lit(0.0), (acc, x) => acc + x), 4).as("v_sum"),
        round(aggregate(zip_with($"v", $"v", (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x), 4).as("sq_norm"),
        size(filter($"v", _ > 0.0)).as("n_pos"),
        // Array-typed outputs are serialized to delimiter-joined strings:
        // the driver's pandas comparator cannot sort/hash list cells.
        // Doubles stringify via DECIMAL(12,4) (PARITY rule 13).
        array_join(transform(slice($"v", 1, 5),
          x => round(x, 4).cast(DecimalType(12, 4)).cast(StringType)), ",")
          .as("first5"),
        array_join(transform(
          sort_array(transform(slice($"v", 1, 5), x => round(x, 4))),
          x => x.cast(DecimalType(12, 4)).cast(StringType)), ",")
          .as("first5_sorted"),
        size(array_distinct(transform($"v", x => round(x, 1)))).as("n_distinct_1dp"))
      .orderBy($"vec_id")
  }

  def qFnMap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "events")
      .withColumn("m", from_json($"props", MapType(StringType, IntegerType)))
      .select(
        $"event_id",
        element_at($"m", "k").as("k_val"),
        size($"m").as("n_keys"),
        array_join(sort_array(map_keys($"m")), ",").as("keys_sorted"))
      .orderBy($"event_id")
  }

  def qFnJson(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val payload = StructType(Seq(StructField("k", IntegerType)))
    Tables.table(spark, dir, "events")
      .select(
        $"event_id",
        get_json_object($"props", "$.k").as("k_str"),
        from_json($"props", payload).getField("k").as("k_typed"),
        // Spark 4 variant path: parse once, extract typed
        variant_get(parse_json($"props"), "$.k", "int").as("k_variant"))
      .orderBy($"event_id")
  }

  def qFnHash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val balStr = $"c_acctbal".cast(DecimalType(12, 2)).cast(StringType)
    val fp = concat_ws("|", $"c_custkey", $"c_name", $"c_mktsegment", balStr)
    Tables.table(spark, dir, "customer")
      .select(
        $"c_custkey",
        md5(fp).as("row_md5"),
        sha2(fp, 256).as("row_sha256"))
      .orderBy($"c_custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fn_string" -> (qFnString _),
    "q_fn_datetime" -> (qFnDatetime _),
    "q_fn_math" -> (qFnMath _),
    "q_fn_conditional" -> (qFnConditional _),
    "q_fn_array" -> (qFnArray _),
    "q_fn_map" -> (qFnMap _),
    "q_fn_json" -> (qFnJson _),
    "q_fn_hash" -> (qFnHash _)
  )

  val oracle: Map[String, String] = Map(
    "q_fn_string" ->
      """SELECT p_partkey,
        |  lower(p_name) AS lo, upper(p_brand) AS up,
        |  trim('  ' || p_name || '  ') AS trimmed,
        |  substring(p_name, 1, 5) AS sub5,
        |  concat_ws('|', p_brand, p_type, p_name) AS joined,
        |  lpad(p_size::VARCHAR, 4, '0') AS size_padded,
        |  len(string_split(p_name, ' ')) AS n_tokens,
        |  regexp_extract(p_name, '(\w+)$', 1) AS last_word,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        |  levenshtein(p_brand, 'Brand#1') AS lev,
        |  length(p_name) AS len
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_fn_datetime" ->
      """SELECT o_orderkey,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        |  isodow(o_orderdate) AS isodow,
        |  date_diff('day', DATE '1995-01-01', o_orderdate::DATE) AS days_since,
        |  o_orderdate + INTERVAL 3 MONTH AS plus3mo,
        |  last_day(o_orderdate::DATE) AS month_end,
        |  epoch(o_orderdate)::BIGINT AS epoch_s
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice::DECIMAL(12,2) * l_discount::DECIMAL(12,2), 2)::DOUBLE AS rounded,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS fl,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
        |  round(abs(l_extendedprice - 50000.0), 2) AS abs_centered,
        |  CAST(sign(l_extendedprice - 50000.0) AS INT) AS sgn,
        |  round(pow(l_quantity, 2.0), 2) AS qty_sq,
        |  round(ln(l_extendedprice), 6) AS ln_price,
        |  round(log10(l_extendedprice), 6) AS log10_price,
        |  round(sqrt(l_quantity), 6) AS sqrt_qty,
        |  ((((l_orderkey - 7) % 5) + 5) % 5) AS pm
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_fn_conditional" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice < 50000.0 THEN 'small'
        |       WHEN o_totalprice < 200000.0 THEN 'medium'
        |       ELSE 'large' END AS band,
        |  least(o_totalprice, 100000.0) AS capped,
        |  greatest(o_custkey, 100) AS floored_key,
        |  CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS is_open
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_fn_array" ->
      """WITH t AS (
        |  SELECT vec_id, embedding,
        |         list_transform(embedding, x -> x::DOUBLE) AS v
        |  FROM embeddings)
        |SELECT vec_id,
        |  len(embedding) AS dim,
        |  round(list_reduce(list_prepend(0.0, v), (acc, x) -> acc + x), 4) AS v_sum,
        |  round(list_reduce(list_prepend(0.0,
        |    list_apply(range(1, len(v) + 1), i -> v[i] * v[i])),
        |    (acc, x) -> acc + x), 4) AS sq_norm,
        |  len(list_filter(v, x -> x > 0.0)) AS n_pos,
        |  array_to_string(list_transform(v[1:5],
        |    x -> round(x, 4)::DECIMAL(12,4)::VARCHAR), ',') AS first5,
        |  array_to_string(list_transform(
        |    list_sort(list_transform(v[1:5], x -> round(x, 4))),
        |    x -> x::DECIMAL(12,4)::VARCHAR), ',') AS first5_sorted,
        |  len(list_distinct(list_transform(v, x -> round(x, 1)))) AS n_distinct_1dp
        |FROM t ORDER BY vec_id""".stripMargin,
    "q_fn_map" ->
      """SELECT event_id,
        |  json_extract(props, '$.k')::INT AS k_val,
        |  len(json_keys(props)) AS n_keys,
        |  array_to_string(list_sort(json_keys(props)), ',') AS keys_sorted
        |FROM events ORDER BY event_id""".stripMargin,
    "q_fn_json" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  json_extract(props, '$.k')::INT AS k_typed,
        |  json_extract(props, '$.k')::INT AS k_variant
        |FROM events ORDER BY event_id""".stripMargin,
    "q_fn_hash" ->
      """WITH t AS (
        |  SELECT c_custkey,
        |    concat_ws('|', c_custkey, c_name, c_mktsegment,
        |              c_acctbal::DECIMAL(12,2)::VARCHAR) AS fp
        |  FROM customer)
        |SELECT c_custkey, md5(fp) AS row_md5, sha256(fp) AS row_sha256
        |FROM t ORDER BY c_custkey""".stripMargin
  )
}
