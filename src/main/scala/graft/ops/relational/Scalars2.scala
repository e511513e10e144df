package graft.ops.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Tables

/** §2-H extended scalar-function coverage (second tranche): the rest
  * of the everyday string/array/datetime surface a migrating user
  * would reach for. Same parity discipline as Scalars (docs/PARITY.md).
  */
object Scalars2 {

  def qFnString2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "part")
      .withColumn("joined", concat_ws("|", $"p_brand", $"p_type", $"p_name"))
      .select(
        $"p_partkey",
        split_part($"joined", lit("|"), lit(2)).as("second_field"),
        instr($"p_name", "e").as("first_e"),
        repeat($"p_brand", 2).as("brand2"),
        reverse($"p_name").as("rev"),
        ascii(substring($"p_name", 1, 1)).as("first_ascii"),
        $"p_name".startsWith("red").as("is_red"),
        $"p_name".contains("widget").as(("has_widget")),
        format_string("%s-%04d", $"p_type", $"p_size").as("fmt"),
        // joined to a string: driver compare can't hash array cells
        array_join(regexp_extract_all($"p_name", lit("[aeiou]+"), lit(0)), ",")
          .as("vowel_runs"),
        expr("left(p_name, 3)").as("l3"),
        expr("right(p_name, 3)").as("r3"),
        translate($"p_name", "aeiou", "AEIOU").as("caps_vowels"))
      .orderBy($"p_partkey")
  }

  def qFnArray2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "documents")
      .withColumn("toks", split($"text", " "))
      .select(
        $"doc_id",
        array_position($"toks", "the").as("pos_the"),
        size(flatten(array(slice($"toks", 1, 2), slice($"toks", 3, 2)))).as("flat4"),
        array_max($"toks").as("max_tok"),
        array_min($"toks").as("min_tok"),
        array_join(sort_array(array_intersect(array_distinct($"toks"),
          array(lit("the"), lit("a"), lit("data")))), ",").as("stop_hits"),
        exists($"toks", t => t === "value").as("has_value"),
        forall($"toks", t => length(t) <= 20).as("all_short"),
        array_join(concat(slice($"toks", 1, 2), slice($"toks", 1, 1)), ",")
          .as("concat3"),
        element_at($"toks", 1).as("first_tok"))
      .orderBy($"doc_id")
  }

  def qFnDatetime2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "orders")
      .select(
        $"o_orderkey",
        quarter($"o_orderdate").as("q"),
        dayofyear($"o_orderdate").as("doy"),
        weekofyear($"o_orderdate").as("woy"),
        make_date(year($"o_orderdate"), month($"o_orderdate"),
          dayofmonth($"o_orderdate")).as("rebuilt"),
        date_format($"o_orderdate", "yyyy-MM").as("ym"),
        to_date(date_trunc("quarter", $"o_orderdate")).as("q_start"),
        ((year($"o_orderdate") - 1995) * 12 + month($"o_orderdate") - 1)
          .as("months_since_1995"))
      .orderBy($"o_orderkey")
  }

  /** Error-tolerant evaluation: try_cast / guarded division — ANSI
    * mode makes bad casts and div-by-zero THROW, so ETL over dirty
    * data needs the try_* forms that yield NULL instead. */
  def qFnTry(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "documents")
      .withColumn("first_tok", element_at(split($"text", " "), 1))
      .select(
        $"doc_id",
        try_element_at(split($"text", " "), lit(3)).as("tok3"),
        $"first_tok".try_cast("int").as("tok_as_int"),       // word → NULL
        try_divide($"n_chars", $"doc_id" % 5).as("guarded_div"), // /0 → NULL
        try_to_number(lit("12.5"), lit("99.9")).cast("double").as("parsed"))
      .orderBy($"doc_id")
  }

  /** Bitwise scalar surface: AND/OR/XOR/NOT, shifts, popcount — all on
    * two's-complement BIGINT, so every result is exact on both engines
    * (negatives included; shift operands kept non-negative because
    * DuckDB's >> on negatives is implementation-defined while Spark's
    * sign-extends). */
  def qFnBitwise(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "events")
      .select(
        $"event_id",
        ($"event_id".bitwiseAND($"user_id")).as("b_and"),
        ($"event_id".bitwiseOR($"user_id")).as("b_or"),
        ($"event_id".bitwiseXOR($"user_id")).as("b_xor"),
        expr("~(event_id % 256)").as("b_not"),
        shiftleft($"event_id" % 1024, 3).cast("long").as("shl"),
        shiftright($"event_id", 2).as("shr"),
        bit_count($"event_id").as("bits"))
      .orderBy($"event_id")
  }

  /** Regex family: extract / replace-all / match / extract-all-count.
    * Cross-engine hazard and its containment: Spark runs java.util
    * .regex, DuckDB runs RE2 — the engines disagree on advanced syntax
    * (lookaround, possessives, some class shorthands: the Ws.scala
    * whitespace finding), so every pattern here stays inside the
    * POSIX-safe intersection (explicit ASCII classes, literals,
    * alternation, plus and star) where the two are identical.
    * DuckDB's regexp_replace needs the explicit 'g' flag to match
    * Spark's replace-ALL default — probed, encoded in the oracle. */
  def qFnRegex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "part")
      .select(
        $"p_partkey",
        regexp_extract($"p_name", "[a-z]+", 0).as("first_word"),
        regexp_replace($"p_name", "[aeiou]", "_").as("devoweled"),
        $"p_name".rlike("^[a-z]+ ").as("starts_word"),
        size(expr("regexp_extract_all(p_name, '[a-z]+', 0)"))
          .cast("long").as("n_words"),
        regexp_extract($"p_brand", "[0-9]+", 0).as("brand_num"))
      .orderBy($"p_partkey")
  }

  /** Jaro-Winkler fuzzy similarity via the native
    * [[graft.functions.JaroWinkler]] codegen Expression — the record-
    * linkage comparator. Three rungs per customer: the NEXT customer's
    * name (high-similarity id-suffix pairs), an in-query transposition
    * typo (swap of name chars 10/11 — the classic fat-finger case the
    * comparator was designed for), and the market segment (dissimilar
    * — exercises the sub-0.7 no-boost branch). The oracle runs
    * DuckDB's jaro_winkler_similarity: the match certifies the kernel
    * byte-for-byte (probed bit-identical over 20k random pairs in
    * development; textbook parameters p=0.1, prefix<=4, boost>0.7,
    * empty->0). Shape: one self-join on the derived next-key (equi,
    * shuffle-free after AQE broadcast at dim scale) + narrow per-row
    * kernels — map-only at 100 TB. */
  def qFnJaro(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.JaroWinkler.register(spark)
    val jw = graft.functions.JaroWinkler.jaro_winkler _
    val cust = Tables.table(spark, dir, "customer")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
    val nxt = cust.select(($"c_custkey" - 1).as("nk"), $"c_name".as("next_name"))
    val typo = expr("concat(substr(c_name, 1, 9), substr(c_name, 11, 1), " +
      "substr(c_name, 10, 1), substr(c_name, 12))")
    cust.join(nxt, $"c_custkey" === $"nk", "inner")
      .select(
        $"c_custkey",
        round(jw($"c_name", $"next_name"), 4).as("jw_next"),
        round(jw($"c_name", typo), 4).as("jw_typo"),
        round(jw($"c_name", $"c_mktsegment"), 4).as("jw_seg"))
      .orderBy($"c_custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fn_jaro" -> (qFnJaro _),
    "q_fn_regex" -> (qFnRegex _),
    "q_fn_bitwise" -> (qFnBitwise _),
    "q_fn_try" -> (qFnTry _),
    "q_fn_string2" -> (qFnString2 _),
    "q_fn_array2" -> (qFnArray2 _),
    "q_fn_datetime2" -> (qFnDatetime2 _)
  )

  val oracle: Map[String, String] = Map(
    // DuckDB's jaro_winkler_similarity — same textbook parameters as
    // the native kernel (probed bit-identical over 20k random pairs)
    "q_fn_jaro" ->
      """SELECT c.c_custkey,
        |  round(jaro_winkler_similarity(c.c_name, n.c_name), 4) AS jw_next,
        |  round(jaro_winkler_similarity(c.c_name,
        |    concat(substr(c.c_name, 1, 9), substr(c.c_name, 11, 1),
        |           substr(c.c_name, 10, 1), substr(c.c_name, 12))), 4)
        |    AS jw_typo,
        |  round(jaro_winkler_similarity(c.c_name, c.c_mktsegment), 4) AS jw_seg
        |FROM customer c
        |JOIN customer n ON c.c_custkey = n.c_custkey - 1
        |ORDER BY c.c_custkey""".stripMargin,
    // POSIX-safe pattern intersection; explicit 'g' flag = Spark's
    // replace-all default
    "q_fn_regex" ->
      """SELECT p_partkey,
        |  coalesce(regexp_extract(p_name, '[a-z]+', 0), '') AS first_word,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        |  regexp_matches(p_name, '^[a-z]+ ') AS starts_word,
        |  len(regexp_extract_all(p_name, '[a-z]+', 0))::BIGINT AS n_words,
        |  coalesce(regexp_extract(p_brand, '[0-9]+', 0), '') AS brand_num
        |FROM part
        |ORDER BY p_partkey""".stripMargin,
    "q_fn_bitwise" ->
      """SELECT event_id,
        |  event_id & user_id AS b_and,
        |  event_id | user_id AS b_or,
        |  xor(event_id, user_id) AS b_xor,
        |  ~(event_id % 256) AS b_not,
        |  ((event_id % 1024) << 3)::BIGINT AS shl,
        |  event_id >> 2 AS shr,
        |  bit_count(event_id)::INT AS bits
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "q_fn_try" ->
      """WITH t AS (
        |  SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |  toks[3] AS tok3,
        |  TRY_CAST(toks[1] AS INT) AS tok_as_int,
        |  n_chars / NULLIF(doc_id % 5, 0) AS guarded_div,
        |  12.5::DOUBLE AS parsed
        |FROM t ORDER BY doc_id""".stripMargin,
    "q_fn_string2" ->
      """WITH t AS (
        |  SELECT *, concat_ws('|', p_brand, p_type, p_name) AS joined FROM part)
        |SELECT p_partkey,
        |  split_part(joined, '|', 2) AS second_field,
        |  strpos(p_name, 'e') AS first_e,
        |  repeat(p_brand, 2) AS brand2,
        |  reverse(p_name) AS rev,
        |  ascii(substring(p_name, 1, 1)) AS first_ascii,
        |  starts_with(p_name, 'red') AS is_red,
        |  contains(p_name, 'widget') AS has_widget,
        |  printf('%s-%04d', p_type, p_size) AS fmt,
        |  array_to_string(regexp_extract_all(p_name, '[aeiou]+'), ',') AS vowel_runs,
        |  left(p_name, 3) AS l3,
        |  right(p_name, 3) AS r3,
        |  translate(p_name, 'aeiou', 'AEIOU') AS caps_vowels
        |FROM t ORDER BY p_partkey""".stripMargin,
    "q_fn_array2" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |  coalesce(list_position(toks, 'the'), 0)::BIGINT AS pos_the,
        |  len(flatten([toks[1:2], toks[3:4]])) AS flat4,
        |  list_max(toks) AS max_tok,
        |  list_min(toks) AS min_tok,
        |  coalesce(array_to_string(list_sort(list_intersect(list_distinct(toks),
        |    ['the', 'a', 'data'])), ','), '') AS stop_hits,
        |  len(list_filter(toks, t -> t = 'value')) > 0 AS has_value,
        |  len(list_filter(toks, t -> NOT (length(t) <= 20))) = 0 AS all_short,
        |  array_to_string(toks[1:2] || toks[1:1], ',') AS concat3,
        |  toks[1] AS first_tok
        |FROM t ORDER BY doc_id""".stripMargin,
    "q_fn_datetime2" ->
      """SELECT o_orderkey,
        |  quarter(o_orderdate) AS q,
        |  dayofyear(o_orderdate) AS doy,
        |  weekofyear(o_orderdate) AS woy,
        |  make_date(year(o_orderdate)::INT, month(o_orderdate)::INT,
        |            day(o_orderdate)::INT) AS rebuilt,
        |  strftime(o_orderdate, '%Y-%m') AS ym,
        |  date_trunc('quarter', o_orderdate) AS q_start,
        |  (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS months_since_1995
        |FROM orders ORDER BY o_orderkey""".stripMargin
  )
}
