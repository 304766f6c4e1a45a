package graft.functions

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Scalar function surface (SURVEY §2.8): string / date / math / cast /
  * array / map / json, all codegen'd built-ins — zero UDFs.
  *
  * Reference semantics: zero-padded filename assembly
  * (pipelines/precipitation_pipeline.py:135), filename parse via split
  * (precipitation_pipeline.py:300-302) and suffix strip (:279), date
  * parsing + parts (precipitation_pipeline.py:91,131-132), corner
  * arithmetic with abs/halving (precipitation_pipeline.py:175-207),
  * safe numeric casts (pipelines/humidity_pipeline.py:159-162,
  * population_pipeline.py:45), polygon ring array construction
  * (precipitation_pipeline.py:202-208), country→value map
  * (population_pipeline.py:38-45), compact JSON serialize/deserialize
  * (humidity_pipeline.py:172, population_pipeline.py:54).
  */
object Scalars {

  // graft.spread before the regex/string-heavy projections: the
  // orderBy's range-sampling pass executes the child twice, so a
  // single-split source pays the single-core projection twice over
  // (observed: q_fn_cast 2.8s → 0.8s at sf0.1).
  private def spread(df: org.apache.spark.sql.DataFrame, key: String) =
    graft.spread(df, col(key))

  val queries: Map[String, Q] = Map(
    "q_fn_string" -> ((s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        lpad(col("p_size").cast("string"), 2, "0").as("size_padded"),
        concat(col("p_brand"), lit("_"), col("p_name")).as("brand_name"),
        split(col("p_type"), " ").getItem(0).as("type_head"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("devoweled"),
        upper(col("p_brand")).as("brand_upper"),
        substring(col("p_name"), 1, 5).as("name5"),
        length(col("p_name")).cast("long").as("name_len"))
        .orderBy(col("p_partkey"))),

    "q_fn_date" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        year(col("ts")).cast("int").as("y"),
        month(col("ts")).cast("int").as("m"),
        dayofmonth(col("ts")).cast("int").as("day_of_month"),
        hour(col("ts")).cast("int").as("h"),
        date_trunc("month", col("ts")).as("month_start"),
        date_trunc("hour", col("ts")).as("hour_start"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
          .cast("long").as("days_since"))
        .orderBy(col("event_id"))),

    // sort covers EVERY output column: (l_orderkey, l_linenumber) is
    // not unique in the harness lineitem, so the full-row sort is what
    // makes the emitted order (and the oracle hash) deterministic.
    "q_fn_math" -> ((s, d) =>
      spread(Tables.lineitem(s, d), "l_orderkey").select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - lit(0.05)).as("abs_off"),
        // round at 3 decimals: the exact quotient has ≤3 decimals, so
        // neither engine ever rounds at a .5 boundary (Spark rounds the
        // shortest decimal repr, DuckDB the binary value — they disagree
        // exactly at boundaries).
        round(col("l_extendedprice") / 2.0, 3).as("half_price"),
        floor(col("l_quantity")).cast("long").as("qty_floor"),
        ceil(col("l_tax") * 100).cast("long").as("tax_pct_ceil"),
        round(sqrt(col("l_extendedprice")), 4).as("price_sqrt"),
        pmod(col("l_orderkey"), lit(7)).as("key_mod7"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("half_price"),
          col("abs_off"), col("qty_floor"), col("tax_pct_ceil"),
          col("price_sqrt"), col("key_mod7"))),

    // Safe casts: try_cast yields NULL on malformed input instead of
    // failing the job (the reference's isdigit() gate + int()). The
    // regex split is materialized once and both casts read the array —
    // inlining it per output column would run the regex twice per row.
    "q_fn_cast" -> ((s, d) =>
      spread(Tables.orders(s, d), "o_orderkey")
        .select(col("o_orderkey"), col("o_totalprice"),
          split(col("o_orderpriority"), "-").as("prio_parts"))
        .select(
          col("o_orderkey"),
          col("prio_parts").getItem(0).cast("int").as("prio_ok"),
          expr("try_cast(element_at(prio_parts, 2) AS INT)").as("prio_bad"),
          floor(col("o_totalprice")).cast("int").as("price_int"),
          col("o_totalprice").cast("string").as("price_str"))
        .orderBy(col("o_orderkey"))),

    "q_fn_array" -> ((s, d) =>
      Tables.embeddings(s, d).select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 6).as("first_val"),
        round(aggregate(col("embedding"),
          lit(0.0), (acc, x) => acc + x.cast("double")), 4).as("sum_vals"),
        round(aggregate(col("embedding"),
          lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double")))), 6)
          .as("max_abs"))
        .orderBy(col("vec_id"))),

    "q_fn_json" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"))
        .orderBy(col("event_id"))),

    // Spark 4 VARIANT surface (the OPEN semi-structured path that
    // replaces stringly-JSON pipelines at scale: parse ONCE into the
    // shredded binary encoding, then typed path extraction is a
    // codegen'd read, not a per-access reparse): parse_json the props
    // column, variant_get typed paths — a present key aggregated per
    // arm, a missing key proving NULL (never error) semantics, and
    // schema_of_variant pinning what the parse inferred. Row-local
    // projection + one counts-only hash aggregate.
    "q_fn_variant" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_type"),
        expr("variant_get(parse_json(props), '$.k', 'long')").as("k"),
        expr("variant_get(parse_json(props), '$.missing', 'long')")
          .as("miss"),
        expr("schema_of_variant(parse_json(props))").as("sch"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n_k"),
          sum(col("k")).as("sum_k"),
          count(col("miss")).as("n_missing"),
          countDistinct(col("sch")).as("n_schemas"))
        .select(col("event_type"), col("n_k"), col("sum_k"),
          col("n_missing"), col("n_schemas"),
          graft.halfUp(col("sum_k").cast("double") /
            col("n_k").cast("double"), 6).as("avg_k"))
        .orderBy(col("event_type"))),

    // XML scalar surface (Spark 4's to_xml/from_xml, the row-level
    // siblings of the q_sink_xml file round trip): render each nation
    // row as an XML fragment, parse it back with an explicit schema,
    // and surface the extracted fields PLUS a fragment length — the
    // parse must reproduce the source values exactly (entity escaping
    // round-trips free text), and the length pins the rendered shape
    // itself, not just the parse. Row-local codegen projection, no
    // shuffle before the output sort; the oracle recomputes the
    // length arithmetic from the raw fields, so the two engines agree
    // on the fragment without DuckDB ever rendering XML.
    "q_fn_xml" -> ((s, d) => {
      val xml = to_xml(struct(col("n_nationkey").as("k"),
        col("n_name").as("nm")))
      val parsed = from_xml(xml, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("nm",
          org.apache.spark.sql.types.StringType))))
      Tables.nation(s, d)
        .select(col("n_nationkey"), parsed.as("p"), length(xml).as("xml_len"))
        .select(col("n_nationkey"), col("p.k").as("k"), col("p.nm").as("nm"),
          col("xml_len"))
        .orderBy(col("n_nationkey"))
    }),

    // Generator (UDTF-surface, SURVEY §2.11): posexplode flattens the
    // embedding vectors to (vec_id, pos, val) rows — the monthly
    // file fan-out / row-generator shape. Narrow: each input row
    // expands in place, no shuffle before the output sort.
    "q_fn_explode" -> ((s, d) =>
      Tables.embeddings(s, d)
        .filter(col("vec_id") < 20)
        .select(col("vec_id"),
          posexplode(transform(col("embedding"), x => round(x.cast("double"), 6))))
        .toDF("vec_id", "pos", "val")
        .orderBy(col("vec_id"), col("pos"))),

    // Map build + probe (population_pipeline.py:38-45 builds a
    // country→population dict, :60 probes it): per-region name→key map
    // via map_from_entries, probed with element_at, then exploded back
    // to sorted rows so the oracle compare is deterministic (map
    // internal ordering is not).
    "q_fn_map" -> ((s, d) => {
      val m = Tables.nation(s, d)
        .groupBy(col("n_regionkey"))
        .agg(map_from_entries(
          collect_list(struct(col("n_name"), col("n_nationkey")))).as("m"))
        .withColumn("canada_key", element_at(col("m"), "CANADA"))
      m.select(col("n_regionkey"), explode(col("m")), col("canada_key"))
        .orderBy(col("n_regionkey"), col("key"))
    }),
  )

  val oracle: Map[String, String] = Map(
    "q_fn_string" ->
      """SELECT p_partkey,
        |       lpad(CAST(p_size AS VARCHAR), 2, '0') AS size_padded,
        |       p_brand || '_' || p_name AS brand_name,
        |       string_split(p_type, ' ')[1] AS type_head,
        |       regexp_replace(p_name, '[aeiou]', '', 'g') AS devoweled,
        |       upper(p_brand) AS brand_upper,
        |       substring(p_name, 1, 5) AS name5,
        |       CAST(length(p_name) AS BIGINT) AS name_len
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_fn_date" ->
      """SELECT event_id,
        |       CAST(year(ts) AS INT) AS y,
        |       CAST(month(ts) AS INT) AS m,
        |       CAST(day(ts) AS INT) AS day_of_month,
        |       CAST(hour(ts) AS INT) AS h,
        |       CAST(date_trunc('month', ts) AS TIMESTAMP) AS month_start,
        |       CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
        |       CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS days_since
        |FROM events ORDER BY event_id""".stripMargin,
    "q_fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        |       abs(l_discount - 0.05) AS abs_off,
        |       round(l_extendedprice / 2.0, 3) AS half_price,
        |       CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
        |       CAST(ceil(l_tax * 100) AS BIGINT) AS tax_pct_ceil,
        |       round(sqrt(l_extendedprice), 4) AS price_sqrt,
        |       l_orderkey % 7 AS key_mod7
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, half_price, abs_off, qty_floor,
        |         tax_pct_ceil, price_sqrt, key_mod7""".stripMargin,
    "q_fn_cast" ->
      """SELECT o_orderkey,
        |       CAST(string_split(o_orderpriority, '-')[1] AS INT) AS prio_ok,
        |       TRY_CAST(string_split(o_orderpriority, '-')[2] AS INT) AS prio_bad,
        |       CAST(floor(o_totalprice) AS INT) AS price_int,
        |       CAST(o_totalprice AS VARCHAR) AS price_str
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_fn_array" ->
      """SELECT vec_id,
        |       CAST(len(embedding) AS BIGINT) AS dim,
        |       round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
        |       round(list_sum(CAST(embedding AS DOUBLE[])), 4) AS sum_vals,
        |       round(list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))), 6) AS max_abs
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_fn_json" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,
    // the harness props are uniformly {"k": <int>} so the inferred
    // variant schema is one distinct struct per arm
    "q_fn_variant" ->
      """SELECT event_type,
        |       CAST(count(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |         AS BIGINT) AS n_k,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |         AS BIGINT) AS sum_k,
        |       CAST(count(CAST(json_extract_string(props, '$.missing')
        |         AS BIGINT)) AS BIGINT) AS n_missing,
        |       CAST(1 AS BIGINT) AS n_schemas,
        |       floor(CAST(sum(CAST(json_extract_string(props, '$.k')
        |             AS BIGINT)) AS DOUBLE)
        |           / CAST(count(CAST(json_extract_string(props, '$.k')
        |             AS BIGINT)) AS DOUBLE) * 1000000.0 + 0.5)
        |         / 1000000.0 AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the parse must reproduce the source fields; the fragment length
    // is recomputed from the raw fields (to_xml's fixed frame is 38
    // chars for a 2-field row: <ROW>\n 4sp <k>…</k>\n 4sp <nm>…</nm>\n
    // </ROW>) — valid because harness names are markup-free (escaping
    // itself is pinned by IOSpec's hostile-string round trip)
    "q_fn_xml" ->
      """SELECT n_nationkey, CAST(n_nationkey AS BIGINT) AS k, n_name AS nm,
        |       CAST(38 + length(CAST(n_nationkey AS VARCHAR))
        |            + length(n_name) AS INT) AS xml_len
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q_fn_explode" ->
      """SELECT vec_id,
        |       CAST(unnest(range(len(embedding))) AS INT) AS pos,
        |       unnest(list_transform(CAST(embedding AS DOUBLE[]),
        |              x -> round(x, 6))) AS val
        |FROM embeddings WHERE vec_id < 20
        |ORDER BY vec_id, pos""".stripMargin,
    "q_fn_map" ->
      """SELECT n_regionkey, n_name AS key, n_nationkey AS value,
        |       max(CASE WHEN n_name = 'CANADA' THEN n_nationkey END)
        |         OVER (PARTITION BY n_regionkey) AS canada_key
        |FROM nation ORDER BY n_regionkey, key""".stripMargin,
  )
}
