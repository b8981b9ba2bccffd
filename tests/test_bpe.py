"""BPE trainer/encoder (llm/bpe.py) vs an in-test pure-Python reference."""

from __future__ import annotations

from pyspark.sql import functions as F


def _ref_bpe(texts: list[str], n_merges: int, min_count: int = 2):
    """Reference Sennrich-style BPE on a word-frequency dict."""
    freqs: dict[str, int] = {}
    for t in texts:
        for w in t.lower().split():
            freqs[w] = freqs.get(w, 0) + 1
    words = [(list(w), f) for w, f in freqs.items()]
    merges = []
    for _ in range(n_merges):
        cnt: dict[tuple[str, str], int] = {}
        for syms, f in words:
            for p in zip(syms, syms[1:]):
                cnt[p] = cnt.get(p, 0) + f
        if not cnt:
            break
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (a, b) = best[0]
        merges.append((a, b))
        nxt = []
        for syms, f in words:
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            nxt.append((out, f))
        words = nxt
    return merges


CORPUS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest wide",
    "low newer wide lowest",
]


def test_bpe_train_matches_reference(spark):
    from trino_private_spark.llm.bpe import bpe_train

    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = bpe_train(df, n_merges=8)
    assert got == _ref_bpe(CORPUS, 8)
    assert len(got) == 8


def test_bpe_train_partitioning_invariant(spark):
    from trino_private_spark.llm.bpe import bpe_train

    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    # distributed rounds (driver_threshold=0) under different partitionings
    assert bpe_train(df.coalesce(1), n_merges=5, driver_threshold=0) == bpe_train(
        df.repartition(7), n_merges=5, driver_threshold=0
    )


def test_bpe_driver_and_distributed_paths_agree(spark):
    from trino_private_spark.llm.bpe import bpe_train

    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    assert bpe_train(df, n_merges=6) == bpe_train(df, n_merges=6, driver_threshold=0)


def test_bpe_apply_roundtrip_and_compression(spark):
    from trino_private_spark.llm.bpe import bpe_apply, bpe_train

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id bigint, text string"
    )
    merges = bpe_train(df, n_merges=8)
    enc = bpe_apply(df, merges).collect()
    src = {r.doc_id: r.text for r in df.collect()}
    for r in enc:
        # lossless: concatenated tokens reproduce the text sans spaces
        assert "".join(r.tokens) == src[r.id].lower().replace(" ", "")
        # compression: fewer tokens than characters, at least one per word
        n_words = len(src[r.id].split())
        n_chars = len(src[r.id].replace(" ", ""))
        assert n_words <= r.n_tokens < n_chars


def test_bpe_min_count_stops_early(spark):
    from trino_private_spark.llm.bpe import bpe_train

    df = spark.createDataFrame([("ab cd",)], "text string")
    # every pair occurs once -> below min_count=2 -> no merges
    assert bpe_train(df, n_merges=5, min_count=2) == []


def test_bpe_apply_fold_and_arrow_agree(spark):
    # the two encode plans (JVM fold chain vs Arrow rank-dict loop) must
    # tokenize identically on a trained merge list
    from trino_private_spark.llm.bpe import bpe_apply, bpe_train

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    merges = bpe_train(df, n_merges=12, min_count=1)
    fold = bpe_apply(df, merges, method="fold").orderBy("id").collect()
    arrow = bpe_apply(df, merges, method="arrow").orderBy("id").collect()
    assert [r.tokens for r in fold] == [r.tokens for r in arrow]
    assert [r.n_tokens for r in fold] == [r.n_tokens for r in arrow]


def test_bpe_apply_paths_agree_random_corpus(spark):
    # randomized corpora (fixed seed): train real merge lists, encode with
    # both plans, require byte-identical tokens — pins the VERDICT fix
    import random

    from trino_private_spark.llm.bpe import bpe_apply, bpe_train

    rng = random.Random(61)
    for trial in range(3):
        vocab = [
            "".join(rng.choice("abcdef") for _ in range(rng.randint(2, 8)))
            for _ in range(30)
        ]
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 15)))
            for _ in range(40)
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        merges = bpe_train(df, n_merges=20, min_count=1)
        assert len(merges) > 5
        fold = bpe_apply(df, merges, method="fold").orderBy("id").collect()
        arrow = bpe_apply(df, merges, method="arrow").orderBy("id").collect()
        assert [r.tokens for r in fold] == [r.tokens for r in arrow], trial


def test_bpe_apply_auto_routes_by_size(spark):
    from trino_private_spark.llm.bpe import FOLD_MAX_MERGES, bpe_apply

    df = spark.createDataFrame([(1, "aaab aab")], "doc_id long, text string")
    small = [("a", "a")]
    big = small + [(f"x{i}", f"y{i}") for i in range(FOLD_MAX_MERGES)]
    # auto on a big list must NOT build a fold chain: the plan string of
    # the arrow path contains a Python evaluation node, the fold path a
    # deep aggregate expression
    plan_big = bpe_apply(df, big)._jdf.queryExecution().sparkPlan().toString()
    assert "MapInPandas" in plan_big
    plan_small = (
        bpe_apply(df, small)._jdf.queryExecution().sparkPlan().toString()
    )
    assert "MapInPandas" not in plan_small
    # and both still tokenize alike
    a = bpe_apply(df, small, method="fold").collect()[0]
    b = bpe_apply(df, small, method="arrow").collect()[0]
    assert a.tokens == b.tokens == ["aa", "a", "b", "aa", "b"]


def test_bpe_apply_arrow_null_and_empty_text(spark):
    from trino_private_spark.llm.bpe import bpe_apply

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "ab")], "doc_id long, text string"
    )
    for method in ("fold", "arrow"):
        rows = {r.id: r for r in bpe_apply(df, [("a", "b")], method=method).collect()}
        assert rows[1].tokens == [] and rows[1].n_tokens == 0
        assert rows[2].tokens == [] and rows[2].n_tokens == 0
        assert rows[3].tokens == ["ab"]
