"""Scalar function surface (SURVEY §2B, M3): string / date / math /
array / map / json batteries.

Everything here is a built-in ``pyspark.sql.functions`` expression —
JVM-side, whole-stage-codegen'd, no Python in the hot path. The
reference's only scalar machinery is pandas string/dt accessors and a
row-wise apply (`lambda_function.py:128,139-143`); this module is the
engine-wide generalization.

Cross-engine parity notes (vs the DuckDB oracle):
  * integer-returning Spark fns are pinned to BIGINT on both sides;
  * set-valued array results (distinct/intersect) are array_sort'ed —
    their element order is unspecified in both engines;
  * transcendental results (pow/log/exp) are rounded to 9 dp: JVM and
    libm may differ in the final ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "fn_string",
    oracle="""
SELECT p_partkey,
       upper(p_brand)                              AS brand_up,
       lower(p_type)                               AS type_lo,
       trim(p_name)                                AS name_trim,
       length(p_name)::BIGINT                      AS name_len,
       substr(p_type, 1, 5)                        AS type_pre,
       concat(p_brand, ':', p_type)                AS brand_type,
       replace(p_brand, 'Brand', 'B')              AS brand_short,
       regexp_extract(p_brand, '([0-9]+)', 1)      AS brand_num,
       lpad(p_size::VARCHAR, 4, '0')               AS size_pad,
       reverse(p_brand)                            AS brand_rev,
       strpos(p_type, ' ')::BIGINT                 AS first_space,
       translate(p_brand, '#', '-')                AS brand_dash
FROM part
""",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String battery: case, trim, length, substring, concat, replace,
    regexp_extract, pad, reverse, locate, translate."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_up"),
        F.lower("p_type").alias("type_lo"),
        F.trim("p_name").alias("name_trim"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_pre"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_brand", "Brand", "B").alias("brand_short"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.reverse("p_brand").alias("brand_rev"),
        F.locate(" ", F.col("p_type")).cast("long").alias("first_space"),
        F.translate("p_brand", "#", "-").alias("brand_dash"),
    )


@query(
    "fn_string_split",
    oracle="""
SELECT p_partkey,
       array_to_string(string_split(p_name, ' '), '|') AS words,
       len(string_split(p_name, ' '))::BIGINT AS n_words,
       string_split(p_name, ' ')[1]        AS first_word
FROM part
""",
)
def fn_string_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split -> array, element access, cardinality. The array itself is
    emitted '|'-joined: the driver's pandas value-hash cannot digest
    array-typed cells (see agg_collect, round 1)."""
    p = load_table(spark, sf_dir, "part")
    words = F.split("p_name", " ")
    return p.select(
        "p_partkey",
        F.array_join(words, "|").alias("words"),
        F.size(words).cast("long").alias("n_words"),
        F.element_at(words, 1).alias("first_word"),
    )


@query(
    "fn_date",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate)::BIGINT                       AS yr,
       month(o_orderdate)::BIGINT                      AS mo,
       day(o_orderdate)::BIGINT                        AS dy,
       quarter(o_orderdate)::BIGINT                    AS qtr,
       isodow(o_orderdate)::BIGINT                     AS iso_dow,
       dayname(o_orderdate)                            AS dow_name,
       strftime(o_orderdate, '%Y-%m')                  AS ym,
       date_trunc('month', o_orderdate)::DATE          AS month_start,
       last_day(o_orderdate::DATE)                     AS month_end,
       (o_orderdate::DATE + 30)                        AS due_date,
       datediff('day', o_orderdate,
                TIMESTAMP '2000-01-01 00:00:00')::BIGINT AS days_to_y2k,
       epoch(o_orderdate)::BIGINT                      AS epoch_s
FROM orders
""",
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time battery: parts, ISO weekday, names, formatting, trunc,
    last_day, arithmetic, datediff, epoch."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("yr"),
        F.month(d).cast("long").alias("mo"),
        F.dayofmonth(d).cast("long").alias("dy"),
        F.quarter(d).cast("long").alias("qtr"),
        (F.weekday(d) + 1).cast("long").alias("iso_dow"),
        F.date_format(d, "EEEE").alias("dow_name"),
        F.date_format(d, "yyyy-MM").alias("ym"),
        F.trunc(d.cast("date"), "month").alias("month_start"),
        F.last_day(d.cast("date")).alias("month_end"),
        F.date_add(d.cast("date"), 30).alias("due_date"),
        F.datediff(
            F.lit("2000-01-01").cast("date"), d.cast("date")
        ).cast("long").alias("days_to_y2k"),
        F.unix_timestamp(d.cast("timestamp")).alias("epoch_s"),
    )


@query(
    "fn_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       abs(l_extendedprice - 30000)          AS price_dev,
       round(l_extendedprice / 7, 2)         AS price_7th_round,
       floor(l_quantity / 10)::BIGINT        AS qty_decile,
       ceil(l_extendedprice / 1000)::BIGINT  AS price_k,
       round(sqrt(l_extendedprice), 9)       AS price_sqrt,
       round(ln(l_extendedprice + 1), 9)     AS price_ln,
       round(pow(l_discount + 1, 3), 9)      AS disc_cube,
       sign(l_extendedprice - 30000)         AS dev_sign,
       (l_orderkey % 7)::BIGINT              AS key_mod,
       greatest(l_discount, l_tax)           AS max_rate,
       least(l_discount, l_tax)              AS min_rate
FROM lineitem
""",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery: abs/round/floor/ceil/sqrt/ln/pow/sign/mod and
    greatest/least. Transcendentals rounded to 9dp (ulp differences
    between JVM and libm)."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(price - 30000).alias("price_dev"),
        F.round(price / 7, 2).alias("price_7th_round"),
        F.floor(F.col("l_quantity") / 10).cast("long").alias("qty_decile"),
        F.ceil(price / 1000).cast("long").alias("price_k"),
        F.round(F.sqrt(price), 9).alias("price_sqrt"),
        F.round(F.log(price + 1), 9).alias("price_ln"),
        F.round(F.pow(F.col("l_discount") + 1, 3), 9).alias("disc_cube"),
        F.signum(price - 30000).alias("dev_sign"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@query(
    "fn_predicates",
    oracle="""
SELECT p_partkey,
       (p_size BETWEEN 10 AND 20)                       AS size_mid,
       (p_brand IN ('Brand#11', 'Brand#22', 'Brand#33')) AS brand_pick,
       (p_type LIKE '%BRASS%')                          AS is_brass,
       (p_name IS NULL)                                 AS name_null,
       CASE WHEN p_retailprice < 1000 THEN 'cheap'
            WHEN p_retailprice < 1500 THEN 'mid'
            ELSE 'pricey' END                           AS price_band,
       (p_size > 25 OR (p_type LIKE 'SMALL%' AND NOT p_size > 10)) AS odd_combo
FROM part
""",
)
def fn_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate battery: BETWEEN, IN, LIKE, IS NULL, CASE, boolean
    algebra — all as Catalyst expressions usable in filters."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").between(10, 20).alias("size_mid"),
        F.col("p_brand").isin("Brand#11", "Brand#22", "Brand#33").alias("brand_pick"),
        F.col("p_type").like("%BRASS%").alias("is_brass"),
        F.col("p_name").isNull().alias("name_null"),
        F.when(F.col("p_retailprice") < 1000, "cheap")
        .when(F.col("p_retailprice") < 1500, "mid")
        .otherwise("pricey")
        .alias("price_band"),
        (
            (F.col("p_size") > 25)
            | (F.col("p_type").like("SMALL%") & ~(F.col("p_size") > 10))
        ).alias("odd_combo"),
    )


@query(
    "fn_array",
    oracle="""
WITH w AS (SELECT p_partkey, string_split(p_type, ' ') AS ws FROM part)
SELECT p_partkey,
       array_to_string(list_sort(ws), '|')    AS sorted_words,
       array_to_string(list_sort(list_distinct(ws)), '|') AS uniq_words,
       list_contains(ws, 'BRASS')             AS has_brass,
       coalesce(array_to_string(ws[2:3], '|'), '') AS mid_slice,
       list_sum(list_transform(ws, w -> length(w)))::BIGINT AS total_chars,
       coalesce(array_to_string(list_sort(list_intersect(ws, ['SMALL', 'LARGE', 'BRASS'])), '|'), '') AS kw_hits,
       array_to_string(ws, '_')               AS joined
FROM w
""",
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array battery: sort, distinct, contains, slice, higher-order
    aggregate/transform, intersect, join-to-string. Array-typed results
    are '|'-joined so the driver's pandas value-hash can digest them."""
    p = load_table(spark, sf_dir, "part")
    ws = F.split("p_type", " ")
    kw = F.array(F.lit("SMALL"), F.lit("LARGE"), F.lit("BRASS"))
    return p.select(
        "p_partkey",
        F.array_join(F.array_sort(ws), "|").alias("sorted_words"),
        F.array_join(F.array_sort(F.array_distinct(ws)), "|").alias("uniq_words"),
        F.array_contains(ws, "BRASS").alias("has_brass"),
        F.array_join(F.slice(ws, 2, 2), "|").alias("mid_slice"),
        F.aggregate(
            F.transform(ws, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
        ).cast("long").alias("total_chars"),
        F.array_join(F.array_sort(F.array_intersect(ws, kw)), "|").alias("kw_hits"),
        F.array_join(ws, "_").alias("joined"),
    )


@query(
    "fn_explode",
    oracle="""
SELECT word, count(*)::BIGINT AS n
FROM (SELECT unnest(string_split(p_type, ' ')) AS word FROM part)
GROUP BY word
""",
)
def fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode (UNNEST): word histogram over the split p_type corpus —
    the generate-then-aggregate shape used by every tokenizer pipeline."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split("p_type", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "fn_map",
    oracle="""
SELECT o_orderkey,
       map_extract(MAP {'status': o_orderstatus, 'prio': o_orderpriority},
                   'status')[1]                 AS status_val,
       len(map_keys(MAP {'status': o_orderstatus, 'prio': o_orderpriority}))::BIGINT
                                                AS n_keys,
       array_to_string(list_sort(map_keys(
           MAP {'status': o_orderstatus, 'prio': o_orderpriority})), '|')
                                                AS keys_sorted
FROM orders
""",
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map battery: construction, element_at, map_keys/size. Scalar
    projections of the map are compared (a raw map column has no
    canonical order to hash)."""
    o = load_table(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"), F.lit("prio"), F.col("o_orderpriority")
    )
    return o.select(
        "o_orderkey",
        F.element_at(m, "status").alias("status_val"),
        F.size(m).cast("long").alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), "|").alias("keys_sorted"),
    )


@query(
    "fn_json",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k')            AS k_str,
       CAST(json_extract(props, '$.k') AS BIGINT)   AS k_int,
       (CAST(json_extract(props, '$.k') AS BIGINT) > 50) AS k_big
FROM events
""",
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON battery over events.props: string path extraction, typed
    extraction via from_json with an explicit schema, derived predicate."""
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k BIGINT")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        (parsed.getField("k") > 50).alias("k_big"),
    )


@query(
    "fn_json_roundtrip",
    oracle="""
SELECT event_id,
       to_json(struct_pack(et := event_type, uid := user_id))::VARCHAR AS packed
FROM events
""",
)
def fn_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_json over a struct: serialize typed columns back to JSON
    (both engines emit compact key:value with no whitespace)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.to_json(
            F.struct(F.col("event_type").alias("et"), F.col("user_id").alias("uid"))
        ).alias("packed"),
    )


@query(
    "fn_conditional",
    oracle="""
SELECT c_custkey,
       coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER')  AS seg_masked,
       ifnull(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS bal_floor,
       CASE WHEN c_acctbal > 5000 THEN 'gold'
            WHEN c_acctbal > 0    THEN 'silver'
            ELSE 'zinc' END                                  AS tier,
       (c_acctbal IS NOT DISTINCT FROM NULL)                 AS bal_is_null_safe
FROM customer
""",
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional battery: coalesce, nullif, ifnull, CASE, null-safe
    equality (<=>)."""
    c = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_masked"
        ),
        F.ifnull(F.when(bal < 0, None).otherwise(bal), F.lit(0.0)).alias("bal_floor"),
        F.when(bal > 5000, "gold").when(bal > 0, "silver").otherwise("zinc").alias(
            "tier"
        ),
        bal.eqNullSafe(F.lit(None).cast("double")).alias("bal_is_null_safe"),
    )


@query(
    "fn_regexp",
    oracle="""
SELECT p_partkey,
       regexp_matches(p_name, 'o')                               AS has_o,
       array_to_string(regexp_extract_all(p_name, '[a-z]+', 0), '|') AS words,
       regexp_replace(p_name, '[aeiou]', '_', 'g')               AS devoweled,
       array_to_string(regexp_split_to_array(p_name, ' '), '|')  AS tokens,
       len(regexp_extract_all(p_name, '[aeiou]', 0))::BIGINT     AS n_vowels,
       regexp_extract(p_name, '[a-z]+', 0)                       AS first_word
FROM part
""",
)
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp battery: rlike, extract_all, global replace, split,
    match count, first match. All JVM-side codegen'd expressions — the
    reference's only pattern machinery is pandas ``.str`` accessors
    (`lambda_function.py:139-143`); this is the engine-wide surface a
    100 TB text pipeline filters and tokenizes with."""
    p = load_table(spark, sf_dir, "part")
    name = F.col("p_name")
    return p.select(
        "p_partkey",
        name.rlike("o").alias("has_o"),
        F.array_join(F.regexp_extract_all(name, F.lit("[a-z]+"), 0), "|").alias(
            "words"
        ),
        F.regexp_replace(name, "[aeiou]", "_").alias("devoweled"),
        F.array_join(F.split(name, " "), "|").alias("tokens"),
        F.regexp_count(name, F.lit("[aeiou]")).cast("long").alias("n_vowels"),
        F.regexp_substr(name, F.lit("[a-z]+")).alias("first_word"),
    )


@query(
    "fn_hash",
    oracle="""
SELECT c_custkey,
       md5(c_name)                          AS name_md5,
       sha256(c_name)                       AS name_sha256,
       base64(c_name::BLOB)                 AS name_b64,
       lower(hex(c_name))                   AS name_hex,
       md5(concat(c_name, '|', c_mktsegment)) AS row_digest
FROM customer
""",
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Digest battery: md5 / sha256 / base64 / hex, plus a composite
    row digest — the content-addressing primitives exact dedup and
    change-data capture key on at scale (cheap, JVM-side, no shuffle)."""
    c = load_table(spark, sf_dir, "customer")
    name = F.col("c_name")
    return c.select(
        "c_custkey",
        F.md5(name.cast("binary")).alias("name_md5"),
        F.sha2(name.cast("binary"), 256).alias("name_sha256"),
        F.base64(name.cast("binary")).alias("name_b64"),
        F.lower(F.hex(name)).alias("name_hex"),
        F.md5(F.concat_ws("|", name, F.col("c_mktsegment")).cast("binary")).alias(
            "row_digest"
        ),
    )


@query(
    "fn_bitwise",
    oracle="""
SELECT o_orderkey,
       (o_orderkey & 255)::BIGINT        AS low_byte,
       (o_orderkey | 15)::BIGINT         AS with_low,
       xor(o_orderkey, 21845)::BIGINT    AS toggled,
       (o_orderkey << 3)::BIGINT         AS shl3,
       (o_orderkey >> 2)::BIGINT         AS shr2,
       (~o_orderkey)::BIGINT             AS flipped,
       bit_count(o_orderkey)::BIGINT     AS popcount
FROM orders
""",
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise battery: AND/OR/XOR/shifts/NOT/popcount — the integer
    bit-twiddling layer that simhash, bloom filters, and LSH banding
    are built from (see llm/dedup.py for the composed uses)."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).cast("long").alias("low_byte"),
        k.bitwiseOR(F.lit(15)).cast("long").alias("with_low"),
        k.bitwiseXOR(F.lit(21845)).cast("long").alias("toggled"),
        F.shiftleft(k, 3).cast("long").alias("shl3"),
        F.shiftright(k, 2).cast("long").alias("shr2"),
        F.bitwise_not(k).cast("long").alias("flipped"),
        F.bit_count(k).cast("long").alias("popcount"),
    )


@query(
    "fn_variant",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT)   AS k_int,
       json_extract_string(props, '$.k')            AS k_str,
       CAST(json_extract(props, '$.missing') AS BIGINT) AS missing_int,
       (json_type(props, '$.k') = 'NULL')           AS k_is_json_null,
       'OBJECT<k: ' ||
         (CASE WHEN json_type(props, '$.k') IN ('UBIGINT', 'BIGINT', 'INTEGER')
               THEN 'BIGINT'
               WHEN json_type(props, '$.k') = 'DOUBLE' THEN 'DOUBLE'
               ELSE 'STRING' END) || '>'            AS vschema
FROM events
""",
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT battery over ``events.props`` — the modern
    semi-structured path next to fn_json's string-based one:
    ``parse_json`` produces a binary VARIANT (typed, shreddable —
    at 100 TB this is the open-format answer to schemaless columns:
    parse once at ingest, then typed sub-column access without
    re-parsing strings), ``try_variant_get`` extracts typed values
    (wrong-type/missing paths null out instead of erroring),
    ``is_variant_null`` distinguishes JSON null from SQL missing, and
    ``schema_of_variant`` reports the per-row inferred shape. The
    oracle mirrors each call with DuckDB's JSON machinery
    (json_extract / json_type), pinning the value semantics the
    VARIANT encoding must preserve."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k_int"),
        F.try_variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.missing", "bigint").alias("missing_int"),
        F.is_variant_null(F.try_variant_get(v, "$.k", "variant")).alias(
            "k_is_json_null"
        ),
        F.schema_of_variant(v).alias("vschema"),
    )


@query(
    "fn_url",
    oracle="""
WITH urls AS (
  SELECT doc_id,
         'https://' || source || '.example.com/docs/' || lang || '/'
           || doc_id || '?ref=corpus&page=' || (doc_id % 7) AS url
  FROM documents
)
SELECT doc_id, url,
       regexp_extract(url, 'https?://([^/]+)', 1) AS host,
       regexp_extract(url, 'https?://[^/]+(/[^?#]*)', 1) AS path,
       regexp_extract(url, '\\?(.*)$', 1) AS query,
       regexp_extract(url, '[?&]page=([^&]*)', 1) AS page_param,
       regexp_extract(url, 'https?://(?:[^./]+\\.)*([^./]+\\.[^./]+)$|https?://(?:[^./]+\\.)*([^./]+\\.[^./]+)/', 2)
         AS reg_domain
FROM urls
""",
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing — the web-pipeline scalar family (CommonCrawl-style
    corpora key everything on URLs): host / path / query extraction
    via Spark's `parse_url` plus a registrable-domain approximation
    (last two labels — a stand-in for the public-suffix list, which is
    data, not logic). URLs are synthesized deterministically from
    document metadata since the corpus has no URL column; DuckDB has
    no parse_url, so the oracle spells the SAME extractions as anchors
    over regexp_extract — cross-engine agreement doubles as a spec
    test of Spark's parse_url semantics on these shapes. All JVM-side
    scan-fused expressions, zero shuffle."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?ref=corpus&page="),
        (F.col("doc_id") % 7).cast("string"),
    )
    u = d.select("doc_id", url.alias("url"))
    host = F.parse_url("url", F.lit("HOST"))
    return u.select(
        "doc_id",
        "url",
        host.alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("page")).alias("page_param"),
        F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1).alias("reg_domain"),
    )


@query(
    "fn_try_arithmetic",
    oracle="""
SELECT event_id,
       CASE WHEN event_id % 7 = 0 THEN NULL
            ELSE round(value / (event_id % 7), 6) END AS div_r,
       CASE WHEN CAST(9223372036854775807 AS HUGEINT) - (event_id % 3)
                 + (event_id % 5) > CAST(9223372036854775807 AS HUGEINT)
            THEN NULL
            ELSE CAST(least(CAST(9223372036854775807 AS HUGEINT)
                            - (event_id % 3) + (event_id % 5),
                            CAST(9223372036854775807 AS HUGEINT)) AS BIGINT)
       END AS add_r,
       CASE WHEN event_id % 4 >= 2 THEN NULL
            ELSE 4611686018427387904 * (event_id % 4) END::BIGINT AS mul_r,
       TRY_CAST(CASE WHEN event_id % 3 = 0 THEN '12.5' ELSE 'abc' END
                AS DOUBLE) AS cast_r,
       (['a', 'b'])[CAST(1 + event_id % 4 AS INT)] AS elem_r
FROM events WHERE value IS NOT NULL
""",
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI-mode escape hatches: try_divide / try_add /
    try_multiply / try_cast / try_element_at return NULL where strict
    evaluation raises (divide-by-zero, BIGINT overflow, malformed
    cast, out-of-bounds index) — the per-expression form of the
    null-on-error coerce semantics the R4-R6 pipeline relies on, and
    what keeps a 100 TB job from dying on row 37 billion.

    DuckDB has no try_ arithmetic, so the oracle SPELLS OUT each
    failure condition as a CASE (overflow probed in wider arithmetic,
    the out-of-bounds list index via DuckDB's native NULL-on-OOB
    indexing) — cross-engine agreement therefore checks Spark's try_
    semantics against an explicit model of when they must fail. Pure
    scan-fused projection, zero shuffles, zero Python.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.where(F.col("value").isNotNull()).select(
        "event_id",
        F.round(
            F.try_divide(F.col("value"), F.col("event_id") % 7), 6
        ).alias("div_r"),
        F.try_add(
            F.lit(9223372036854775807) - F.col("event_id") % 3,
            F.col("event_id") % 5,
        )
        .cast("long")
        .alias("add_r"),
        F.try_multiply(F.lit(4611686018427387904), F.col("event_id") % 4)
        .cast("long")
        .alias("mul_r"),
        F.expr(
            "try_cast(CASE WHEN event_id % 3 = 0 THEN '12.5' ELSE 'abc' END"
            " AS DOUBLE)"
        ).alias("cast_r"),
        F.try_element_at(
            F.array(F.lit("a"), F.lit("b")),
            (1 + F.col("event_id") % 4).cast("int"),
        ).alias("elem_r"),
    )


@query(
    "fn_datetime_advanced",
    oracle="""
SELECT o_orderkey,
       o_orderdate,
       (o_orderdate + INTERVAL 3 MONTH)::DATE AS plus_3mo,
       last_day(o_orderdate) AS month_end,
       quarter(o_orderdate)::BIGINT AS qtr,
       date_trunc('quarter', o_orderdate) AS qtr_start,
       weekofyear(o_orderdate)::BIGINT AS iso_week,
       dayofyear(o_orderdate)::BIGINT AS doy,
       (year(o_orderdate) * 12 + month(o_orderdate))::BIGINT AS month_index,
       make_date(year(o_orderdate), month(o_orderdate), 1) AS month_start
FROM orders WHERE o_orderkey % 97 = 0
""",
)
def fn_datetime_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-arithmetic surface beyond `fn_date`'s basics:
    add_months (month-clamped, both engines clamp Jan 31 + 1 mo to
    Feb 28/29), last_day, quarter + quarter truncation, ISO week,
    day-of-year, a portable linear month index (year*12+month — the
    cross-engine substitute for months_between, whose fractional
    31-day-month rule is Spark-specific), and first-of-month via
    make_date. All Catalyst expressions inside one codegen'd
    projection over a pushed-down key filter."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 97 == 0)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        "o_orderdate",
        F.add_months(d, 3).alias("plus_3mo"),
        F.last_day(d).alias("month_end"),
        F.quarter(d).cast("long").alias("qtr"),
        F.trunc(d, "quarter").alias("qtr_start"),
        F.weekofyear(d).cast("long").alias("iso_week"),
        F.dayofyear(d).cast("long").alias("doy"),
        (F.year(d) * 12 + F.month(d)).cast("long").alias("month_index"),
        F.make_date(F.year(d), F.month(d), F.lit(1)).alias("month_start"),
    )
