"""Scalar function families (SURVEY.md §2.8) — one composite query per family.

Reference parity: the pandas exercise's cleaning/standardization calls
(str methods, date parsing, type coercion — SURVEY.md §0, reconstructed).
All expressions are built-in pyspark.sql.functions → JVM codegen, no Python
in the row path.

Dialect drift handled per SURVEY §2.8 (validated by direct DuckDB 1.0 probes
this session):
  - day-of-week: Spark weekday()+1 == DuckDB date_part('isodow') (Mon=1)
  - regexp_replace: DuckDB needs the 'g' flag to match Spark's replace-all
  - DuckDB log() is log10 — use ln()/log10() explicitly
  - DuckDB epoch() returns DOUBLE — floor+cast to match unix_timestamp
  - DuckDB list sums are HUGEINT — cast BIGINT
  - DuckDB list slicing/indexing is 1-based inclusive; Spark is 0-based
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_table
from ..registry_util import new_registry

QUERIES, ORACLES, register = new_registry()


@register(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                                   AS up_name,
           lower(c_mktsegment)                             AS lo_seg,
           length(c_name)                                  AS name_len,
           substring(c_name, 1, 8)                         AS name_head,
           concat_ws('|', c_mktsegment, c_name)            AS seg_name,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0')       AS padded_key,
           replace(c_name, 'Customer#', '')                AS stripped,
           trim('  ' || c_name || '  ')                    AS trimmed,
           regexp_extract(c_name, '([0-9]+)', 1)           AS digits,
           regexp_replace(c_name, '[0-9]', '#', 'g')       AS masked
    FROM customer
    """,
)
def fn_string(spark, sf_dir):
    """String family: the name-normalization surface of the integration
    exercise (upper/lower/trim/substring/concat/pad/replace/regex)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up_name"),
        F.lower("c_mktsegment").alias("lo_seg"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_head"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("seg_name"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.replace(F.col("c_name"), F.lit("Customer#"), F.lit("")).alias("stripped"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("trimmed"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.regexp_replace("c_name", "[0-9]", "#").alias("masked"),
    )


@register(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT)      AS yr,
           CAST(month(o_orderdate) AS BIGINT)     AS mo,
           CAST(day(o_orderdate) AS BIGINT)       AS dy,
           CAST(date_part('isodow', o_orderdate) AS BIGINT)       AS isodow,
           date_trunc('month', o_orderdate)                       AS month_start,
           CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR)        AS plus30,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00',
                          o_orderdate) AS BIGINT)                 AS days_since_95,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR)   AS month_end,
           CAST(floor(epoch(o_orderdate)) AS BIGINT)              AS unix_s,
           strftime(o_orderdate, '%Y-%m')                         AS ym
    FROM orders
    """,
)
def fn_date(spark, sf_dir):
    """Date family (parsing/standardization). dayofweek convention pinned to
    ISO (Mon=1): Spark weekday()+1 ≡ DuckDB isodow — Spark's dayofweek()
    (Sun=1) deliberately avoided."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dy"),
        (F.weekday("o_orderdate") + 1).cast("long").alias("isodow"),
        # cast: date_trunc yields tz-aware timestamp; keep outputs ntz
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30)
        .cast("string")
        .alias("plus30"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01 00:00:00").cast("timestamp_ntz")
        )
        .cast("long")
        .alias("days_since_95"),
        F.last_day(F.col("o_orderdate").cast("date")).cast("string").alias("month_end"),
        F.unix_timestamp(F.col("o_orderdate").cast("timestamp"))
        .cast("long")
        .alias("unix_s"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           round(l_extendedprice / 7, 2)         AS seventh,
           abs(-l_discount) + 0.0                AS abs_disc,
           CAST(ceil(l_extendedprice) AS BIGINT)  AS ceil_price,
           CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
           round(sqrt(l_quantity), 4)            AS sqrt_qty,
           round(pow(l_quantity, 2), 4)          AS qty_sq,
           round(ln(l_extendedprice), 4)         AS ln_price,
           round(log10(l_extendedprice), 4)      AS log10_price,
           l_orderkey % 7                        AS mod7,
           l_orderkey // 7                       AS intdiv7
    FROM lineitem
    WHERE l_linenumber = 2
    """,
)
def fn_math(spark, sf_dir):
    """Math family incl. integer vs float division semantics (div vs /).
    DuckDB's log() is log10 — ln()/log10() used explicitly on both sides."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_linenumber") == 2).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") / 7, 2).alias("seventh"),
        # +0.0 normalizes IEEE negative zero (DuckDB abs(-0.0) keeps the sign)
        (F.abs(-F.col("l_discount")) + 0.0).alias("abs_disc"),
        F.ceil("l_extendedprice").alias("ceil_price"),
        F.floor("l_extendedprice").alias("floor_price"),
        F.round(F.sqrt("l_quantity"), 4).alias("sqrt_qty"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        F.round(F.log("l_extendedprice"), 4).alias("ln_price"),
        F.round(F.log10("l_extendedprice"), 4).alias("log10_price"),
        (F.col("l_orderkey") % 7).alias("mod7"),
        F.expr("l_orderkey div 7").alias("intdiv7"),
    )


@register(
    "fn_array",
    oracle="""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks, n_chars FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT)                                  AS n_tokens,
           list_contains(toks, 'data')                                AS has_data,
           array_to_string(toks[1:3], ' ')                            AS first3,
           array_to_string(list_sort(list_distinct(toks)), ',')       AS vocab,
           CAST(len(list_filter(toks, x -> length(x) > 4)) AS BIGINT) AS n_long,
           CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum')
                AS BIGINT)                                            AS char_sum,
           (CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum')
                AS BIGINT) + len(toks) - 1 = n_chars)                 AS len_checks
    FROM d
    """,
)
def fn_array(spark, sf_dir):
    """Array family + higher-order functions (transform/filter/aggregate) on
    tokenized documents. HOFs run inside codegen — this is the no-UDF path
    for token-level logic. The len_checks invariant (token chars + separators
    == n_chars) doubles as a data-integrity audit."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    char_sum = F.aggregate(
        F.transform(toks, lambda x: F.length(x)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.array_contains(toks, "data").alias("has_data"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("first3"),
        F.array_join(F.sort_array(F.array_distinct(toks)), ",").alias("vocab"),
        F.size(F.filter(toks, lambda x: F.length(x) > 4)).cast("long").alias("n_long"),
        char_sum.alias("char_sum"),
        (char_sum + F.size(toks) - 1 == F.col("n_chars")).alias("len_checks"),
    )


@register(
    "fn_explode",
    oracle="""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           unnest(toks)                                    AS token,
           unnest(list_transform(toks, (x, i) -> i - 1))   AS pos
    FROM d
    WHERE doc_id < 100
    """,
)
def fn_explode(spark, sf_dir):
    """posexplode: one row per (doc, position, token). Oracle uses DuckDB's
    zipped-unnest with a 1-based lambda index shifted to Spark's 0-based
    positions (probed: parallel unnests zip, not cross-join)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.filter(F.col("doc_id") < 100)
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token"))
        .select("doc_id", "token", F.col("pos").cast("long").alias("pos"))
    )


@register(
    "fn_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER)      AS k_int,
           CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
           (json_extract_string(props, '$.k') IS NOT NULL)         AS has_k,
           (json_extract_string(props, '$.missing') IS NOT NULL)   AS has_missing
    FROM events
    """,
)
def fn_json(spark, sf_dir):
    """JSON extraction from events.props (measured shape: {"k": <int>}):
    string-path extraction + typed from_json + key-existence checks."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    typed = F.from_json("props", "k INT")
    return e.select(
        "event_id",
        F.coalesce(k, typed["k"]).alias("k_int"),  # both paths must agree
        (k % 10).alias("k_bucket"),
        k.isNotNull().alias("has_k"),
        F.get_json_object("props", "$.missing").isNotNull().alias("has_missing"),
    )


@register(
    "fn_map_struct",
    oracle="""
    SELECT o_orderkey,
           struct_pack(status := o_orderstatus, prio := o_orderpriority).status
               AS s_status,
           map(['status', 'prio'], [o_orderstatus, o_orderpriority])['status'][1]
               AS m_status,
           array_to_string(map_keys(
               map(['status', 'prio'], [o_orderstatus, o_orderpriority])), ',')
               AS m_keys
    FROM orders
    WHERE o_orderkey < 5000
    """,
)
def fn_map_struct(spark, sf_dir):
    """Map/struct construction and field access, serialized to plain strings
    so the value-hash is type-stable (DuckDB map subscript yields a LIST —
    probed — hence the [1] unwrap in the oracle)."""
    o = load_table(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"), F.lit("prio"), F.col("o_orderpriority")
    )
    return o.filter(F.col("o_orderkey") < 5000).select(
        "o_orderkey",
        F.struct(
            F.col("o_orderstatus").alias("status"), F.col("o_orderpriority").alias("prio")
        )["status"].alias("s_status"),
        F.element_at(m, "status").alias("m_status"),
        F.array_join(F.map_keys(m), ",").alias("m_keys"),
    )


@register(
    "fn_null_family",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           nullif(l_discount, 0.0)                          AS disc_null,
           coalesce(nullif(l_discount, 0.0), -9.0)          AS disc_coal,
           ifnull(nullif(l_tax, 0.0), -1.0)                 AS tax_filled,
           CASE WHEN nullif(l_discount, 0.0) IS NOT NULL
                THEN 'has' ELSE 'none' END                  AS nvl2_equiv,
           (nullif(l_discount, 0.0) IS NOT DISTINCT FROM
            nullif(l_tax, 0.0))                             AS null_safe_eq
    FROM lineitem
    WHERE l_quantity <= 3
    """,
)
def fn_null_family(spark, sf_dir):
    """NULL-handling family incl. null-safe equality (<=> / IS NOT DISTINCT
    FROM) — null<=>null is TRUE, null=null is NULL; the distinction matters
    for join keys carrying injected nulls."""
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.nullif(F.col("l_discount"), F.lit(0.0))
    tax = F.nullif(F.col("l_tax"), F.lit(0.0))
    return li.filter(F.col("l_quantity") <= 3).select(
        "l_orderkey",
        "l_linenumber",
        disc.alias("disc_null"),
        F.coalesce(disc, F.lit(-9.0)).alias("disc_coal"),
        F.ifnull(tax, F.lit(-1.0)).alias("tax_filled"),
        F.nvl2(disc, F.lit("has"), F.lit("none")).alias("nvl2_equiv"),
        disc.eqNullSafe(tax).alias("null_safe_eq"),
    )


@register(
    "fn_hash",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           md5(concat_ws('|', CAST(l_orderkey AS VARCHAR),
                              CAST(l_linenumber AS VARCHAR),
                              CAST(l_partkey AS VARCHAR)))  AS row_md5,
           sha256(CAST(l_orderkey AS VARCHAR))              AS key_sha
    FROM lineitem
    WHERE l_linenumber = 3
    """,
)
def fn_hash(spark, sf_dir):
    """Deterministic row fingerprints (integration keys): md5 + sha-256 over
    canonical '|'-joined key strings. xxhash64 exists Spark-side for cheap
    shuffle keys but has no DuckDB twin, so fingerprint outputs stick to
    portable digests."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_linenumber") == 3).select(
        "l_orderkey",
        "l_linenumber",
        F.md5(
            F.concat_ws(
                "|",
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
                F.col("l_partkey").cast("string"),
            )
        ).alias("row_md5"),
        F.sha2(F.col("l_orderkey").cast("string"), 256).alias("key_sha"),
    )


@register(
    "fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey & 255 AS BIGINT)        AS low_byte,
           CAST(o_orderkey | 4096 AS BIGINT)       AS with_flag,
           CAST(xor(o_orderkey, o_custkey) AS BIGINT) AS key_xor,
           CAST(o_orderkey << 2 AS BIGINT)         AS shl2,
           CAST(o_orderkey >> 3 AS BIGINT)         AS shr3,
           CAST(bit_count(o_orderkey) AS BIGINT)   AS popcount
    FROM orders
    WHERE o_orderkey % 101 = 0
    """,
)
def fn_bitwise(spark, sf_dir):
    """Bitwise family: AND/OR/XOR masks, shifts, popcount — the bit-level
    toolkit behind bucket assignment, bloom/LSH signatures and flag fields.
    All codegen'd JVM expressions; DuckDB spells xor as a function and
    shifts identically."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 101 == 0).select(
        "o_orderkey",
        F.expr("o_orderkey & 255").cast("long").alias("low_byte"),
        F.expr("o_orderkey | 4096").cast("long").alias("with_flag"),
        F.expr("o_orderkey ^ o_custkey").cast("long").alias("key_xor"),
        F.shiftleft("o_orderkey", 2).cast("long").alias("shl2"),
        F.shiftright("o_orderkey", 3).cast("long").alias("shr3"),
        F.bit_count("o_orderkey").cast("long").alias("popcount"),
    )


@register(
    "fn_regexp",
    oracle="""
    SELECT p_partkey,
           CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS BIGINT) AS n_vowel_runs,
           regexp_replace(p_name, ' ', '_', 'g')                       AS underscored,
           array_to_string(regexp_split_to_array(p_name, ' '), '|')   AS tokens_joined,
           CASE WHEN regexp_matches(p_name, '^[a-z]+ ')
                THEN 1 ELSE 0 END                                      AS starts_word
    FROM part
    """,
)
def fn_regexp(spark, sf_dir):
    """Regexp function family: extract-all (+ count), global replace,
    regex split (array output joined to a string so the hash is
    dtype-stable), and a match predicate. All four stay JVM-side
    (codegen'd java.util.regex) — no Python. Dialect note: DuckDB's
    regexp_replace is first-match-only without the 'g' flag; Spark's
    always-global regexp_replace is the semantic both sides pin here."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.size(F.expr("regexp_extract_all(p_name, '[aeiou]+', 0)"))
        .cast("long")
        .alias("n_vowel_runs"),
        F.regexp_replace("p_name", " ", "_").alias("underscored"),
        F.array_join(F.split("p_name", " "), "|").alias("tokens_joined"),
        F.when(F.col("p_name").rlike("^[a-z]+ "), 1).otherwise(0).alias("starts_word"),
    )
