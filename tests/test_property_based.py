"""Hypothesis property tests — exceeding the reference's test strategy
(SURVEY §5.7: the reference has no property-based corpus).

Each property runs against the live SparkSession, so examples are kept
small and deadlines disabled (JVM round-trips)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from trino_private_spark.plans.translate import translate

ident = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True)


@given(n=st.integers(1, 1000), m=st.integers(0, 1000))
@settings(max_examples=25, deadline=None)
def test_translate_fetch_offset_roundtrip(n, m):
    out = translate(f"SELECT a FROM t OFFSET {m} ROWS FETCH FIRST {n} ROWS ONLY")
    assert out == f"SELECT a FROM t LIMIT {n} OFFSET {m}"


@given(s=st.text(alphabet=st.characters(codec="ascii"), max_size=40))
@settings(max_examples=25, deadline=None)
def test_translate_preserves_string_literals(s):
    lit = s.replace("'", "''")
    sql = f"SELECT strpos(x, '{lit}') FROM t"
    out = translate(sql)
    # literal contents survive rewrites even when they contain fn names;
    # backslashes DOUBLE on purpose (round 10): Trino literals have no
    # escape processing, Spark's parser does, so '\' must reach Spark
    # as '\\' to stay one literal backslash
    assert f"'{lit.replace(chr(92), chr(92) * 2)}'" in out
    # strpos -> instr, wrapped to keep Trino's BIGINT return width
    assert out.startswith("SELECT CAST(instr(x, ")
    assert out.endswith(") AS BIGINT) FROM t")


@settings(max_examples=10, deadline=None)
@given(
    xs=st.lists(st.integers(-1000, 1000), min_size=1, max_size=30),
    q=st.sampled_from([0.0, 0.25, 0.5, 0.9, 1.0]),
)
def test_reservoir_exact_when_small(xs, q):
    from trino_private_spark.functions.sketches import ReservoirSketch

    sk = ReservoirSketch()
    for x in xs:
        sk.add(float(x))
    got = sk.value_at_quantile(q)
    s = sorted(xs)
    expected = s[min(int(q * len(s)), len(s) - 1)]
    assert got == expected  # below capacity the sketch is exact


@settings(max_examples=10, deadline=None)
@given(
    a=st.sets(st.integers(0, 500), min_size=5, max_size=60),
    b=st.sets(st.integers(0, 500), min_size=5, max_size=60),
)
def test_minhash_jaccard_unbiased(spark, a, b):
    """MinHash jaccard estimate within binomial noise of exact jaccard."""
    from trino_private_spark.functions.sketches import jaccard_index, setdigest_agg

    exact = len(a & b) / len(a | b)
    df = spark.createDataFrame(
        [("a", v) for v in a] + [("b", v) for v in b], "g string, v long"
    )
    sigs = df.groupBy("g").agg(setdigest_agg(F.col("v"), num_hashes=96).alias("sig"))
    rows = {r.g: r.sig for r in sigs.collect()}
    est = sum(1 for x, y in zip(rows["a"], rows["b"]) if x == y) / 96
    assert abs(est - exact) < 0.2  # ~4 sigma at n=96
