"""Scalar expression/function surface (SURVEY.md section 2.8).

The reference registers 282 SQL functions (reference: analysis/
FunctionRegistry.scala:192-505) implemented under catalyst/expressions/
(stringExpressions.scala, mathExpressions.scala, datetimeExpressions.scala,
conditionalExpressions.scala, nullExpressions.scala, hash.scala,
regexpExpressions.scala, Cast.scala). All are builtin in PySpark; each
battery below pins a category's semantics against DuckDB over real table
data. Functions with no DuckDB twin (soundex, crc32, sha1, xxhash64,
initcap, months_between, next_day) are covered rows-only in
`expr_spark_only_battery` + unit tests.

Cross-engine notes baked into these queries:
- transcendentals (sin/exp/ln/...) agree between JVM Math and libm on the
  tested inputs; verified value-by-value in tests before inclusion here.
- double->string formatting differs between engines: never emit it.
- Spark regexp_replace is global-by-default; DuckDB needs the 'g' flag.
- Spark dayofweek is 1=Sunday; DuckDB dow is 0=Sunday.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ushas_spark.io import load_table
from ushas_spark.registry import query


@query(
    "expr_string_battery",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS up,
       lower(p_brand) AS lo,
       length(p_name) AS len,
       substring(p_name, 3, 5) AS sub,
       concat(p_brand, ':', p_type) AS cat,
       concat_ws('-', p_brand, p_type) AS catws,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS pad,
       rpad(p_brand, 12, '.') AS rpadded,
       trim('  pad  ') AS trimmed,
       replace(p_type, 'a', '@') AS repl,
       reverse(p_brand) AS rev,
       repeat(p_brand, 2) AS rep,
       left(p_name, 4) AS l4,
       right(p_name, 4) AS r4,
       CAST(strpos(p_name, 'a') AS BIGINT) AS pos_a,
       translate(p_type, 'aeiou', 'AEIOU') AS transl,
       split_part(p_type, ' ', 1) AS first_word,
       CAST(levenshtein(p_brand, 'Brand#1') AS BIGINT) AS lev,
       CAST(ascii(p_brand) AS BIGINT) AS asc
FROM part
ORDER BY p_partkey
""",
)
def expr_string_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions (reference: stringExpressions.scala: ConcatWs:55,
    Upper:330, Lower:350, substring, lpad/rpad, trim family, translate,
    levenshtein...)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.length("p_name").cast("long").alias("len"),
        F.substring("p_name", 3, 5).alias("sub"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("cat"),
        F.concat_ws("-", "p_brand", "p_type").alias("catws"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("pad"),
        F.rpad("p_brand", 12, ".").alias("rpadded"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
        F.replace(F.col("p_type"), F.lit("a"), F.lit("@")).alias("repl"),
        F.reverse("p_brand").alias("rev"),
        F.repeat("p_brand", 2).alias("rep"),
        F.left(F.col("p_name"), F.lit(4)).alias("l4"),
        F.right(F.col("p_name"), F.lit(4)).alias("r4"),
        F.instr("p_name", "a").cast("long").alias("pos_a"),
        F.translate("p_type", "aeiou", "AEIOU").alias("transl"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.levenshtein("p_brand", F.lit("Brand#1")).cast("long").alias("lev"),
        F.ascii("p_brand").cast("long").alias("asc"),
    ).orderBy("p_partkey")


@query(
    "expr_date_battery",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate) AS yr,
       month(o_orderdate) AS mo,
       day(o_orderdate) AS dy,
       quarter(o_orderdate) AS qtr,
       dayofyear(o_orderdate) AS doy,
       (dayofweek(o_orderdate) + 1) AS dow_sun1,
       weekofyear(o_orderdate) AS wk,
       hour(o_orderdate) AS hr,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
       datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
       CAST(epoch(o_orderdate) AS BIGINT) AS unix_ts,
       strftime(o_orderdate, '%Y-%m') AS ym,
       dayname(CAST(o_orderdate AS DATE)) AS dname
FROM orders
ORDER BY o_orderkey
""",
)
def expr_date_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime functions (reference: datetimeExpressions.scala:
    CurrentDate:61 family, date_trunc, last_day, datediff,
    unix_timestamp...). dow normalised: Spark dayofweek is 1=Sunday,
    DuckDB dow is 0=Sunday."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("yr"),
        F.month(d).cast("long").alias("mo"),
        F.dayofmonth(d).cast("long").alias("dy"),
        F.quarter(d).cast("long").alias("qtr"),
        F.dayofyear(d).cast("long").alias("doy"),
        F.dayofweek(d).cast("long").alias("dow_sun1"),
        F.weekofyear(d).cast("long").alias("wk"),
        F.hour(d).cast("long").alias("hr"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_add(d.cast("date"), 30), "yyyy-MM-dd").alias("plus30"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_95"),
        F.unix_timestamp(d).alias("unix_ts"),
        F.date_format(d, "yyyy-MM").alias("ym"),
        F.date_format(d, "EEEE").alias("dname"),
    ).orderBy("o_orderkey")


@query(
    "expr_math_battery",
    oracle="""
SELECT p_partkey,
       abs(p_retailprice - 1000.0) AS absval,
       CAST(sign(p_retailprice - 1000.0) AS DOUBLE) AS sgn,
       floor(p_retailprice) AS flr,
       ceil(p_retailprice) AS cl,
       round(p_retailprice) AS rnd0,
       sqrt(p_retailprice) AS sq,
       power(CAST(p_size AS DOUBLE), 2.0) AS pw,
       CAST(mod(p_size, 7) AS BIGINT) AS md,
       CAST(((p_size % 7) + 7) % 7 AS BIGINT) AS pmd,
       CAST(greatest(p_size, 25) AS BIGINT) AS gr,
       least(p_retailprice, 1000.0) AS ls,
       CAST(p_size AS DOUBLE) / 8.0 AS dv,
       CAST(floor(CAST(p_size AS DOUBLE) / 8.0) AS BIGINT) AS intdiv,
       CAST(factorial(p_size % 10) AS BIGINT) AS fact
FROM part
ORDER BY p_partkey
""",
)
def expr_math_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions over table data, restricted to operations that are
    IEEE-exact or correctly-rounded in both engines (reference:
    mathExpressions.scala, arithmetic.scala: Abs:98, Pmod:361,
    Least/Greatest). Excluded by design: round(x, n>0) (Spark rounds the
    shortest decimal repr, DuckDB the scaled double -- they disagree on
    x.x5 inputs) and bare double->int casts (Spark truncates, DuckDB
    rounds -- spell out floor/round explicitly instead)."""
    p = load_table(spark, sf_dir, "part")
    price = F.col("p_retailprice")
    size = F.col("p_size")
    return p.select(
        "p_partkey",
        F.abs(price - 1000.0).alias("absval"),
        F.signum(price - 1000.0).alias("sgn"),
        F.floor(price).cast("double").alias("flr"),
        F.ceil(price).cast("double").alias("cl"),
        F.round(price).alias("rnd0"),
        F.sqrt(price).alias("sq"),
        F.pow(size.cast("double"), F.lit(2.0)).alias("pw"),
        (size % 7).cast("long").alias("md"),
        F.pmod(size, F.lit(7)).cast("long").alias("pmd"),
        F.greatest(size, F.lit(25)).cast("long").alias("gr"),
        F.least(price, F.lit(1000.0)).alias("ls"),
        (size.cast("double") / 8.0).alias("dv"),
        F.floor(size.cast("double") / 8.0).cast("long").alias("intdiv"),
        F.factorial(size % 10).cast("long").alias("fact"),
    ).orderBy("p_partkey")


@query(
    "expr_transcendental_battery",
    oracle="""
SELECT x,
       sin(x) AS sn, cos(x) AS cs, tan(x) AS tn,
       log10(x + 1.0) AS lg10,
       atan2(x, 2.0) AS at2,
       degrees(x) AS dg
FROM (SELECT CAST(l_quantity AS DOUBLE) AS x FROM lineitem WHERE l_linenumber = 1)
ORDER BY x
""",
)
def expr_transcendental_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcendentals on small-integer-valued doubles (l_quantity in
    1..50), restricted to the functions verified bit-identical between JVM
    math and libm over the full input domain (the domain is SF-invariant,
    so the check holds at every scale). exp/ln/log2/asin/atan are 1-ulp
    different between Spark's fdlibm and DuckDB's libm on some inputs and
    live in the rows-only battery instead."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    x = F.col("l_quantity").cast("double").alias("x")
    c = F.col("x")
    return li.select(x).select(
        "x",
        F.sin(c).alias("sn"),
        F.cos(c).alias("cs"),
        F.tan(c).alias("tn"),
        F.log10(c + 1.0).alias("lg10"),
        F.atan2(c, F.lit(2.0)).alias("at2"),
        F.degrees(c).alias("dg"),
    ).orderBy("x")


@query(
    "expr_conditional_battery",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'big'
            WHEN o_totalprice > 150000 THEN 'mid'
            ELSE 'small' END AS bucket,
       CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'done'
            ELSE 'other' END AS status_word,
       coalesce(NULL, NULL, o_orderpriority, 'none') AS coal,
       nullif(o_orderstatus, 'O') AS nif,
       ifnull(nullif(o_orderstatus, 'O'), 'was-open') AS inn,
       CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END AS maybe_price,
       isnan(CAST('nan' AS DOUBLE)) AS nan_check,
       (o_totalprice BETWEEN 100000 AND 200000) AS in_band,
       (o_orderstatus IN ('O','P')) AS in_set,
       (o_orderpriority LIKE '1%') AS like1
FROM orders
ORDER BY o_orderkey
""",
)
def expr_conditional_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditionals and null handling (reference:
    conditionalExpressions.scala If:35 CaseWhen:121,
    nullExpressions.scala Coalesce:47 NullIf:150 IsNaN:211,
    predicates.scala In:231)."""
    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    status = F.col("o_orderstatus")
    return o.select(
        "o_orderkey",
        F.when(price > 300000, "big").when(price > 150000, "mid").otherwise("small").alias("bucket"),
        F.when(status == "O", "open").when(status == "F", "done").otherwise("other").alias("status_word"),
        F.coalesce(F.lit(None), F.lit(None), F.col("o_orderpriority"), F.lit("none")).alias("coal"),
        F.nullif(status, F.lit("O")).alias("nif"),
        F.ifnull(F.nullif(status, F.lit("O")), F.lit("was-open")).alias("inn"),
        F.when(status == "O", F.lit(None).cast("double")).otherwise(price).alias("maybe_price"),
        F.isnan(F.lit(float("nan"))).alias("nan_check"),
        price.between(100000, 200000).alias("in_band"),
        status.isin("O", "P").alias("in_set"),
        F.col("o_orderpriority").like("1%").alias("like1"),
    ).orderBy("o_orderkey")


@query(
    "expr_cast_battery",
    oracle="""
SELECT p_partkey,
       CAST(p_size AS VARCHAR) AS int_str,
       CAST(CAST(FLOOR(p_retailprice) AS INT) AS VARCHAR) AS dbl_int_str,
       CAST(p_size AS DOUBLE) AS int_dbl,
       CAST('42' AS BIGINT) AS str_int,
       CAST('3.5' AS DOUBLE) AS str_dbl,
       CAST('1995-06-17' AS DATE) > DATE '1995-01-01' AS str_date_cmp,
       CAST(p_size > 25 AS VARCHAR) AS bool_str,
       CAST(CAST(p_size > 25 AS BOOLEAN) AS INT) AS bool_int,
       try_cast('not-a-number' AS INT) AS bad_int,
       CAST(p_size AS SMALLINT) AS sm,
       CAST(p_size AS TINYINT) AS ti
FROM part
ORDER BY p_partkey
""",
)
def expr_cast_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast matrix (reference: Cast.scala:202) incl. try_cast null-on-
    failure (ANSI mode throws otherwise -- Spark 4 default matches
    DuckDB's strictness). Double->string excluded: engines format
    differently by design."""
    p = load_table(spark, sf_dir, "part")
    size = F.col("p_size")
    return p.select(
        "p_partkey",
        size.cast("string").alias("int_str"),
        F.floor("p_retailprice").cast("int").cast("string").alias("dbl_int_str"),
        size.cast("double").alias("int_dbl"),
        F.lit("42").cast("long").alias("str_int"),
        F.lit("3.5").cast("double").alias("str_dbl"),
        (F.lit("1995-06-17").cast("date") > F.lit("1995-01-01").cast("date")).alias("str_date_cmp"),
        (size > 25).cast("string").alias("bool_str"),
        (size > 25).cast("boolean").cast("int").alias("bool_int"),
        F.expr("try_cast('not-a-number' AS INT)").alias("bad_int"),
        size.cast("short").alias("sm"),
        size.cast("byte").alias("ti"),
    ).orderBy("p_partkey")


@query(
    "expr_hash_battery",
    oracle="""
SELECT doc_id,
       md5(text) AS h_md5,
       sha256(text) AS h_sha256,
       md5(concat(lang, ':', text)) AS h_keyed
FROM documents
ORDER BY doc_id
""",
)
def expr_hash_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic digests (reference: hash.scala Md5:53 Sha2:88).
    Spark's murmur3 hash / xxhash64 are seeded engine-specifically ->
    rows-only battery."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2(F.col("text"), 256).alias("h_sha256"),
        F.md5(F.concat(F.col("lang"), F.lit(":"), F.col("text"))).alias("h_keyed"),
    ).orderBy("doc_id")


@query(
    "expr_regex_battery",
    oracle="""
SELECT doc_id,
       regexp_extract(text, '([a-z]+)', 1) AS first_word,
       regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS second_word,
       regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled,
       regexp_matches(text, 'data|spark') AS mentions_tech,
       (text LIKE '%data%') AS like_data,
       (text SIMILAR TO '.*(join|scan).*') AS similar_check,
       len(regexp_split_to_array(text, ' +')) AS n_tokens
FROM documents
ORDER BY doc_id
""",
)
def expr_regex_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family (reference: regexpExpressions.scala Like:105 RLike:183
    StringSplit:241 RegExpReplace:279 RegExpExtract:377). Spark
    regexp_replace replaces all matches by default == DuckDB with 'g'."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.regexp_extract(t, r"([a-z]+)", 1).alias("first_word"),
        F.regexp_extract(t, r"([a-z]+) ([a-z]+)", 2).alias("second_word"),
        F.regexp_replace(t, r"[aeiou]", "_").alias("devoweled"),
        t.rlike("data|spark").alias("mentions_tech"),
        t.like("%data%").alias("like_data"),
        t.rlike("^.*(join|scan).*$").alias("similar_check"),
        F.size(F.split(t, r" +")).cast("long").alias("n_tokens"),
    ).orderBy("doc_id")


@query("expr_spark_only_battery")  # no DuckDB twin: rows-only + unit tests
def expr_spark_only_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functions with no portable oracle: murmur3 hash / xxhash64
    (hash.scala Murmur3Hash/XxHash64 -- engine-specific), crc32, sha1,
    soundex, initcap, months_between, next_day, format_string, conv,
    hex/unhex, base64, bit ops. Deterministic within Spark: the unit test
    pins golden values so regressions are caught without DuckDB."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.hash("p_name").alias("h_murmur3"),
        F.xxhash64("p_name").alias("h_xx64"),
        F.crc32(F.col("p_name").cast("binary")).alias("h_crc32"),
        F.sha1(F.col("p_name").cast("binary")).alias("h_sha1"),
        F.soundex("p_name").alias("sdx"),
        F.initcap("p_type").alias("icap"),
        F.months_between(
            F.lit("1997-02-28 10:30:00").cast("timestamp"),
            F.lit("1996-10-30").cast("timestamp"),
        ).alias("mb"),
        F.next_day(F.lit("2015-01-14").cast("date"), "TU").alias("nd"),
        F.format_string("part-%05d", F.col("p_partkey")).alias("fmt"),
        F.conv(F.col("p_partkey").cast("string"), 10, 16).alias("cv"),
        F.hex(F.col("p_partkey")).alias("hx"),
        F.base64(F.col("p_name").cast("binary")).alias("b64"),
        F.bit_count(F.col("p_partkey")).alias("bc"),
        F.shiftleft(F.col("p_partkey"), 2).alias("shl"),
        # fdlibm-flavoured transcendentals (1 ulp off libm on some inputs
        # -- see expr_transcendental_battery docstring)
        F.exp(F.col("p_size").cast("double") / 10.0).alias("ex"),
        F.log(F.col("p_retailprice")).alias("ln_"),
        F.log2(F.col("p_retailprice")).alias("lg2"),
        F.asin(F.col("p_size").cast("double") / 60.0).alias("asn"),
        F.atan(F.col("p_size").cast("double")).alias("atn"),
        F.sinh(F.col("p_size").cast("double") / 10.0).alias("snh"),
        F.cosh(F.col("p_size").cast("double") / 10.0).alias("csh"),
        F.tanh(F.col("p_size").cast("double") / 10.0).alias("tnh"),
        F.cbrt(F.col("p_retailprice")).alias("cbr"),
    ).orderBy("p_partkey")


_MASK_ORACLE = """
SELECT c_custkey,
       regexp_replace(regexp_replace(regexp_replace(c_name,
         '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
         AS masked_default,
       regexp_replace(regexp_replace(regexp_replace(c_name,
         '[A-Z]', 'U', 'g'), '[a-z]', 'l', 'g'), '[0-9]', '9', 'g')
         AS masked_custom,
       regexp_replace(c_name, '[0-9]', '*', 'g') AS masked_digits_only,
       substring(c_name, 1, 4) ||
         regexp_replace(regexp_replace(regexp_replace(substring(c_name, 5),
           '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
         AS masked_keep_prefix
FROM customer
ORDER BY c_custkey
"""


@query("expr_mask_battery", oracle=_MASK_ORACLE)
def expr_mask_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-masking function family (Spark 3.4+ ``mask`` -- PII-safe
    projection of identifier columns). The oracle states mask's exact
    contract as chained character-class regexp_replace: uppercase->X,
    lowercase->x, digit->n, others kept; custom replacement chars;
    digits-only masking (NULL upper/lower chars keep those classes);
    and the common keep-prefix redaction pattern via substring + mask.
    Pure per-row JVM expressions -- map-side, no shuffle."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.mask(F.col("c_name")).alias("masked_default"),
        F.mask(
            F.col("c_name"), F.lit("U"), F.lit("l"), F.lit("9")
        ).alias("masked_custom"),
        F.mask(
            F.col("c_name"),
            F.lit(None).cast("string"),
            F.lit(None).cast("string"),
            F.lit("*"),
        ).alias("masked_digits_only"),
        F.concat(
            F.substring("c_name", 1, 4),
            F.mask(F.expr("substring(c_name, 5)")),
        ).alias("masked_keep_prefix"),
    ).orderBy("c_custkey")
