"""hash_split / pack_sequences: determinism, stability, distribution,
and an exact pandas re-implementation of the packing rule."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from zdb_spark.operators.curation import hash_split, pack_sequences


def _docs(spark, n=5000):
    return spark.range(n).select(F.col("id").alias("doc_id"),
                                 (F.col("id") % 97 + 5).alias("toks"))


def _py_bucket(salt, ident):
    h = hashlib.md5(f"{salt}:{ident}".encode()).hexdigest()
    return int(h[:8], 16) % 10_000


def test_hash_split_matches_python_md5(spark):
    """The Spark-side conv(md5) bucket equals stdlib md5 — the exact
    portability property the DuckDB oracle relies on."""
    out = hash_split(_docs(spark, 500), "doc_id").toPandas()
    for _, row in out.iterrows():
        b = _py_bucket("v1", row.doc_id)
        want = "train" if b < 8000 else ("val" if b < 9000 else "test")
        assert row.split == want, (row.doc_id, b, row.split, want)


def test_hash_split_distribution_and_stability(spark):
    df = _docs(spark)
    a = hash_split(df, "doc_id").toPandas()
    frac = a.split.value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.03
    assert abs(frac["val"] - 0.1) < 0.02
    assert abs(frac["test"] - 0.1) < 0.02
    # stable under repartition and across calls
    b = hash_split(df.repartition(13), "doc_id").toPandas()
    pd.testing.assert_frame_equal(a.sort_values("doc_id").reset_index(drop=True),
                                  b.sort_values("doc_id").reset_index(drop=True))
    # different salt re-deals
    c = hash_split(df, "doc_id", salt="v2").toPandas()
    merged = a.merge(c, on="doc_id", suffixes=("_a", "_c"))
    assert (merged.split_a != merged.split_c).any()


def test_hash_split_validation(spark):
    df = _docs(spark, 10)
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", splits={"a": 0.9, "b": 0.2})
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", splits={"a": -0.1, "b": 0.5})


def _pack_order_key(ident) -> str:
    """The operator's in-shard packing order: md5('v1:'||id) hex string
    (lexicographic), ties by id — hashed order de-correlates ingest-
    adjacent documents."""
    return hashlib.md5(f"v1:{ident}".encode()).hexdigest()


def test_pack_sequences_matches_reference(spark):
    """Exact parity with a sequential pandas re-implementation of the
    rule: shard by hashed id, pack in HASHED-id order (ties by id),
    bin = floor((cum-t)/max)."""
    max_tokens, n_shards = 256, 8
    df = _docs(spark, 2000)
    got = (pack_sequences(df, "doc_id", "toks", max_tokens,
                          n_shards=n_shards)
           .toPandas().sort_values("doc_id").reset_index(drop=True))

    pdf = df.toPandas()
    pdf["shard"] = [(_py_bucket("v1", i)) % n_shards for i in pdf.doc_id]
    pdf["okey"] = [_pack_order_key(i) for i in pdf.doc_id]
    pdf = pdf.sort_values(["shard", "okey", "doc_id"])
    pdf["cum"] = pdf.groupby("shard")["toks"].cumsum()
    pdf["bin"] = ((pdf["cum"] - pdf["toks"]) // max_tokens).astype(int)
    want = pdf.sort_values("doc_id").reset_index(drop=True)

    assert got.shard.tolist() == want.shard.tolist()
    assert got.bin.tolist() == want["bin"].tolist()


def test_pack_sequences_oversize_doc_blocks_bin(spark):
    """A doc with toks > max_tokens advances the cumsum past its bin:
    no doc LATER IN PACK ORDER in the shard shares that bin."""
    rows = [(1, 10), (2, 500), (3, 10), (4, 10)]
    df = spark.createDataFrame(rows, "doc_id long, toks long")
    out = (pack_sequences(df, "doc_id", "toks", 100, n_shards=1)
           .toPandas())
    out["okey"] = [_pack_order_key(i) for i in out.doc_id]
    out = out.sort_values("okey").reset_index(drop=True)
    big_pos = out.index[out.doc_id == 2][0]
    big_bin = out.loc[big_pos, "bin"]
    later = out.iloc[big_pos + 1:]
    assert (later["bin"] > big_bin).all()


def test_pack_sequences_validation(spark):
    with pytest.raises(ValueError):
        pack_sequences(_docs(spark, 10), "doc_id", "toks", 0)


def test_stratified_sample_deterministic_and_exact(spark):
    from zdb_spark.operators.curation import stratified_sample

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("src"))
    out = stratified_sample(df, "src", "doc_id",
                            {"s0": 1.0, "s1": 0.5, "s2": 0.0},
                            default_fraction=0.25).toPandas()
    # exact membership from the same md5 bucket rule
    for _, row in out.iterrows():
        b = _py_bucket("v1", row.doc_id)
        cap = {"s0": 10000, "s1": 5000, "s2": 0}.get(row.src, 2500)
        assert b < cap
    kept = out.groupby("src").size()
    assert kept.get("s0", 0) == 500          # 100% of s0
    assert "s2" not in kept                  # 0% stratum fully dropped
    assert 150 < kept.get("s1", 0) < 350     # ~50% of 500
    # stable under repartition
    again = stratified_sample(df.repartition(7), "src", "doc_id",
                              {"s0": 1.0, "s1": 0.5, "s2": 0.0},
                              default_fraction=0.25).toPandas()
    assert sorted(out.doc_id) == sorted(again.doc_id)


def test_stratified_sample_validation(spark):
    from zdb_spark.operators.curation import stratified_sample

    with pytest.raises(ValueError):
        stratified_sample(_docs(spark, 10), "doc_id", "doc_id", {"x": 1.5})


def test_token_budget_mix_budget_and_determinism(spark):
    from zdb_spark.operators.curation import token_budget_mix

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 2).cast("string")).alias("src"),
        (F.col("id") % 50 + 10).alias("toks"))
    out = token_budget_mix(df, "src", "toks", "doc_id",
                           {"s0": 3000, "s1": 500}, n_shards=1).toPandas()
    # unknown sources dropped; per-source totals within one straddler
    sums = out.groupby("src")["toks"].sum()
    assert 3000 <= sums["s0"] < 3000 + 60
    assert 500 <= sums["s1"] < 500 + 60
    # hashed-id order: re-derive the expected pick set in pandas
    pdf = df.toPandas()
    pdf["h"] = [hashlib.md5(f"v1:{i}".encode()).hexdigest()
                for i in pdf.doc_id]
    pdf = pdf.sort_values(["src", "h"])
    pdf["cum"] = pdf.groupby("src")["toks"].cumsum()
    budget = pdf["src"].map({"s0": 3000.0, "s1": 500.0})
    want = pdf[pdf["cum"] - pdf["toks"] < budget]
    assert sorted(out.doc_id) == sorted(want.doc_id)
    # sharded: per-source total still within n_shards straddlers
    sharded = token_budget_mix(df, "src", "toks", "doc_id",
                               {"s0": 3000, "s1": 500}, n_shards=4).toPandas()
    ssum = sharded.groupby("src")["toks"].sum()
    assert 3000 - 60 * 4 < ssum["s0"] < 3000 + 60 * 4
    assert sharded.shard.nunique() == 4
    # empty budget dict: a clean ValueError, not an AttributeError on
    # the unbuilt CASE expression
    with pytest.raises(ValueError, match="at least one source"):
        token_budget_mix(df, "src", "toks", "doc_id", {})


def test_contamination_detects_planted_overlap(spark):
    from zdb_spark.operators.curation import contamination

    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        (1, base),                                   # == bench doc: all grams hit
        (2, "completely different words " * 5),      # clean
        (3, "prefix words then " + base),            # contains bench grams
        (4, "alpha bravo charlie delta echo"),       # < 8 tokens of overlap only
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([(100, base)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           contamination(df, bench, "text", "doc_id", n=8).collect()}
    assert out[1]["contaminated"] and out[1]["n_contaminated"] == 3
    assert not out[2]["contaminated"] and out[2]["n_contaminated"] == 0
    assert out[3]["contaminated"] and out[3]["n_contaminated"] == 3
    assert not out[4]["contaminated"]  # shares words but no 8-gram


def test_chunk_documents_windows_and_overlap(spark):
    from zdb_spark.operators.curation import chunk_documents

    words = " ".join(f"w{i}" for i in range(25))   # 25 tokens
    df = spark.createDataFrame([(1, words), (2, "short doc")],
                               "doc_id long, text string")
    out = chunk_documents(df, "text", "doc_id",
                          max_tokens=10, overlap=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    # stride 6: starts 0,6,12,18 (start<=n-overlap-1=20)
    assert [r["chunk_idx"] for r in c1] == [0, 1, 2, 3]
    assert c1[0]["chunk_text"].split() == [f"w{i}" for i in range(10)]
    assert c1[1]["chunk_text"].split() == [f"w{i}" for i in range(6, 16)]
    # consecutive chunks share exactly `overlap` tokens
    assert c1[0]["chunk_text"].split()[-4:] == c1[1]["chunk_text"].split()[:4]
    assert c1[3]["n_chunk_tokens"] == 25 - 18
    # short doc: one whole chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "short doc"
    # every source token appears in some chunk (coverage)
    covered = set()
    for r in c1:
        covered.update(r["chunk_text"].split())
    assert covered == set(words.split())


def test_chunk_documents_validation(spark):
    from zdb_spark.operators.curation import chunk_documents

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        chunk_documents(df, "text", "doc_id", max_tokens=8, overlap=8)


def test_temperature_sample_weights_and_determinism(spark):
    import math

    from zdb_spark.operators.curation import temperature_sample

    rows = ([(i, "big") for i in range(400)]
            + [(i, "small") for i in range(400, 500)])
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = temperature_sample(df, "src", "doc_id",
                             alpha=0.5, target_docs=200)
    rows_out = out.collect()
    p = {r["src"]: r["sample_p"] for r in rows_out}
    z = math.sqrt(400) + math.sqrt(100)
    assert math.isclose(p["big"], 200 * math.sqrt(400) / z / 400)
    assert math.isclose(p["small"], 200 * math.sqrt(100) / z / 100)
    # alpha<1 up-weights the small source's inclusion probability
    assert p["small"] > p["big"]
    # deterministic: same membership on rerun and after repartitioning
    again = temperature_sample(df.repartition(7), "src", "doc_id",
                               alpha=0.5, target_docs=200)
    assert sorted(r["doc_id"] for r in rows_out) \
        == sorted(r["doc_id"] for r in again.collect())
    # realized counts within hash-bucket noise of expectation
    got = {}
    for r in rows_out:
        got[r["src"]] = got.get(r["src"], 0) + 1
    assert abs(got["big"] - 400 * p["big"]) < 30
    assert abs(got["small"] - 100 * p["small"]) < 20


def test_temperature_sample_small_source_taken_whole(spark):
    from zdb_spark.operators.curation import temperature_sample

    rows = ([(i, "huge") for i in range(500)]
            + [(500 + i, "tiny") for i in range(5)])
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = temperature_sample(df, "src", "doc_id",
                             alpha=0.0, target_docs=400)
    # alpha=0: both sources target 200 docs; tiny has 5 -> p=1, all kept
    tiny = [r for r in out.collect() if r["src"] == "tiny"]
    assert len(tiny) == 5 and all(r["sample_p"] == 1.0 for r in tiny)


def test_temperature_sample_validation(spark):
    from zdb_spark.operators.curation import temperature_sample

    df = spark.createDataFrame([(1, "a")], "doc_id long, src string")
    with pytest.raises(ValueError, match="alpha"):
        temperature_sample(df, "src", "doc_id", alpha=-1, target_docs=1)
    with pytest.raises(ValueError, match="target_docs"):
        temperature_sample(df, "src", "doc_id", target_docs=0)


def test_cap_per_group_unbiased_and_bounded(spark):
    from zdb_spark.operators.curation import cap_per_group

    rows = [(i, "hot" if i < 80 else f"cold{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    out = cap_per_group(df, "domain", "doc_id", max_per_group=5)
    got = out.collect()
    by_dom = {}
    for r in got:
        by_dom.setdefault(r["domain"], []).append(r["doc_id"])
    assert len(by_dom["hot"]) == 5
    # hash-first order: the kept set is NOT simply ids 0-4
    assert sorted(by_dom["hot"]) != [0, 1, 2, 3, 4]
    assert all(len(v) == 1 for d, v in by_dom.items() if d != "hot")
    # deterministic under repartitioning
    again = cap_per_group(df.repartition(7), "domain", "doc_id",
                          max_per_group=5)
    assert sorted(r["doc_id"] for r in again.collect()) \
        == sorted(r["doc_id"] for r in got)
    # map-side group limit in the plan (hot groups bounded pre-shuffle)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    with pytest.raises(ValueError, match="max_per_group"):
        cap_per_group(df, "domain", "doc_id", max_per_group=0)


def test_normalize_url_cases(spark):
    from zdb_spark.operators.text import extract_domain, normalize_url

    cases = {
        "HTTPS://WWW.Site3.com:443/p/9?utm_source=x&id=9#s":
            ("https://site3.com/p/9?id=9", "site3.com"),
        "http://example.com:80/a?a=1&utm_a=1&utm_b=2&b=2":
            ("http://example.com/a?a=1&b=2", "example.com"),
        # href= must NOT be stripped by the ref= rule
        "https://sub.Host.org/Path?href=keep&gclid=zzz":
            ("https://sub.host.org/Path?href=keep", "sub.host.org"),
        "https://www.x.com/?utm_only=1": ("https://x.com/", "x.com"),
        "http://plain.net/path": ("http://plain.net/path", "plain.net"),
        # non-default port survives; ref= as a real param is stripped
        "https://h.com:8080/keepport?ref=camp":
            ("https://h.com:8080/keepport", "h.com"),
    }
    df = spark.createDataFrame([(i, u) for i, u in enumerate(cases)],
                               "i long, url string")
    got = {r["i"]: (r["n"], r["d"]) for r in
           df.select("i", normalize_url("url").alias("n"),
                     extract_domain("url").alias("d")).collect()}
    for i, u in enumerate(cases):
        assert got[i] == cases[u], (u, got[i])


class TestSplitLeakage:
    def test_cross_split_pairs_only(self, spark):
        import hashlib

        from zdb_spark.operators.curation import split_leakage

        def split_of(i):
            b = int(hashlib.md5(f"v1:{i}".encode()).hexdigest()[:8],
                    16) % 10000
            return "train" if b < 8000 else ("val" if b < 9000 else "test")

        # find one id pair in the SAME split and one in DIFFERENT splits
        base = split_of(0)
        same = next(i for i in range(1, 200) if split_of(i) == base)
        diff = next(i for i in range(1, 200) if split_of(i) != base)
        text = "the quick brown fox jumps over the lazy dog " * 4
        rows = [(0, text), (same, text), (diff, text),
                (500, "completely unrelated filler content here x y z")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {(r["id_a"], r["id_b"]): (r["split_a"], r["split_b"])
               for r in split_leakage(df, "text", "doc_id").collect()}
        # identical texts: all three pairs are near-dups, but only the
        # cross-split ones may be reported
        assert (0, diff) in out or (diff, 0) in out
        assert (0, same) not in out and (same, 0) not in out
        for (a, b), (sa, sb) in out.items():
            assert sa != sb
            assert sa == split_of(a) and sb == split_of(b)


class TestPercentileCut:
    def test_exact_decile_cut(self, spark):
        from zdb_spark.operators.curation import percentile_cut
        df = spark.createDataFrame([(i, float(i)) for i in range(1, 11)],
                                   "doc_id long, s double")
        kept, thr = percentile_cut(df, "s", p=0.1)
        # percentile(1..10, 0.1) = 1.9 -> rows 2..10 survive
        assert thr == 1.9
        assert sorted(r["doc_id"] for r in kept.collect()) == list(range(2, 11))

    def test_validation(self, spark):
        import pytest as _pytest

        from zdb_spark.operators.curation import percentile_cut
        df = spark.createDataFrame([(1, 1.0)], "doc_id long, s double")
        with _pytest.raises(ValueError):
            percentile_cut(df, "s", p=0.0)
        empty = df.where("s > 5")
        with _pytest.raises(ValueError):
            percentile_cut(empty, "s", p=0.5)


class TestContaminationFuzzy:
    def _frames(self, spark):
        # Corpus doc 2 is a light PARAPHRASE of bench doc 100: words
        # swapped/reordered so exact 8-gram overlap is zero but char-
        # shingle Jaccard stays high.  Doc 3 is a verbatim copy; doc 4
        # is clean.
        bench_text = ("what is the capital city of france and when was "
                      "it founded by the romans in ancient times")
        # typo-level edits in every 8-word window: zero shared 8-grams
        # (exact form blind) but shingle Jaccard ~0.76 (fuzzy catches)
        paraphrase = ("what is the capital citty of france and when was "
                      "it foundedd by the romans in anciente times")
        corpus = spark.createDataFrame(
            [(2, paraphrase), (3, bench_text),
             (4, "entirely unrelated content about spark partitions " * 3)],
            "doc_id long, text string")
        bench = spark.createDataFrame([(100, bench_text)],
                                      "doc_id long, text string")
        return corpus, bench

    def test_catches_paraphrase_exact_misses(self, spark):
        from zdb_spark.operators.curation import (contamination,
                                                  contamination_fuzzy)

        corpus, bench = self._frames(spark)
        exact = {r["doc_id"]: r["contaminated"] for r in
                 contamination(corpus, bench, "text", "doc_id",
                               n=8).collect()}
        fuzzy = {(r["doc_id"], r["bench_id"]): r["jaccard"] for r in
                 contamination_fuzzy(corpus, bench, "text",
                                     "doc_id").collect()}
        # exact n-gram: verbatim copy caught, paraphrase NOT
        assert exact[3] and not exact[2]
        # fuzzy: both caught, clean doc not
        assert fuzzy[(3, 100)] == 1.0
        assert 0.5 <= fuzzy[(2, 100)] < 1.0
        assert not any(a == 4 for a, _ in fuzzy)

    def test_bench_side_broadcast_no_cartesian(self, spark):
        from zdb_spark.operators.curation import contamination_fuzzy

        corpus, bench = self._frames(spark)
        out = contamination_fuzzy(corpus, bench, "text", "doc_id")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        # the band-bucket probe joins the broadcast bench side
        assert "BroadcastHashJoin" in plan

    def test_distinct_id_column_names(self, spark):
        from zdb_spark.operators.curation import contamination_fuzzy

        corpus, bench = self._frames(spark)
        bench2 = bench.withColumnRenamed("doc_id", "qid")
        out = contamination_fuzzy(corpus, bench2, "text", "doc_id",
                                  bench_id_col="qid")
        got = {(r["doc_id"], r["bench_id"]) for r in out.collect()}
        assert got == {(2, 100), (3, 100)}


class TestPercentileCutByGroup:
    def test_per_group_quartile(self, spark):
        from zdb_spark.operators.curation import percentile_cut_by_group

        # group a: scores 1..8 (p25 -> 2.75); group b: 101..104 (p25 -> 101.75)
        rows = ([(i, "a", float(i)) for i in range(1, 9)]
                + [(100 + i, "b", 100.0 + i) for i in range(1, 5)])
        df = spark.createDataFrame(rows, "doc_id long, g string, s double")
        kept, thr = percentile_cut_by_group(df, "s", "g", p=0.25)
        t = {r["g"]: r["threshold"] for r in thr.collect()}
        assert t == {"a": 2.75, "b": 101.75}
        got = sorted(r["doc_id"] for r in kept.collect())
        assert got == [3, 4, 5, 6, 7, 8, 102, 103, 104]

    def test_broadcast_threshold_join(self, spark):
        from zdb_spark.operators.curation import percentile_cut_by_group

        df = spark.createDataFrame(
            [(i, f"g{i % 3}", float(i)) for i in range(30)],
            "doc_id long, g string, s double")
        kept, _ = percentile_cut_by_group(df, "s", "g", p=0.1)
        plan = kept._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_validation_and_null_group(self, spark):
        import pytest as _pytest

        from zdb_spark.operators.curation import percentile_cut_by_group

        df = spark.createDataFrame([(1, "a", 1.0)],
                                   "doc_id long, g string, s double")
        with _pytest.raises(ValueError):
            percentile_cut_by_group(df, "s", "g", p=1.0)
        # all-null score group contributes no survivors, others unharmed
        rows = [(1, "a", 1.0), (2, "a", 2.0), (3, "b", None), (4, "b", None)]
        df2 = spark.createDataFrame(rows, "doc_id long, g string, s double")
        kept, thr = percentile_cut_by_group(df2, "s", "g", p=0.5)
        assert sorted(r["doc_id"] for r in kept.collect()) == [2]
        t = {r["g"]: r["threshold"] for r in thr.collect()}
        assert t["b"] is None


class TestGlobalShuffle:
    def test_permutation_matches_reference_order(self, spark):
        """pos is exactly the rank in the (bucket, md5, id) total order —
        the distributed offset+rank construction equals the global sort
        it avoids, checked against a stdlib re-implementation."""
        from zdb_spark.operators.curation import global_shuffle

        df = _docs(spark, 400)
        out = global_shuffle(df, "doc_id", seed="v1", n_shards=8).toPandas()

        def key(i):
            h = hashlib.md5(f"v1:{i}".encode()).hexdigest()
            return (int(h[:8], 16) % 10_000, h, i)

        want = {i: p for p, i in
                enumerate(sorted(out.doc_id, key=key))}
        got = dict(zip(out.doc_id, out.pos))
        assert got == want
        assert (out.shard == out.pos % 8).all()
        assert sorted(out.pos) == list(range(400))

    def test_deterministic_and_seed_sensitive(self, spark):
        from zdb_spark.operators.curation import global_shuffle

        df = _docs(spark, 300).repartition(13)
        a = (global_shuffle(df, "doc_id").toPandas()
             .sort_values("doc_id").reset_index(drop=True))
        b = (global_shuffle(df.repartition(3), "doc_id").toPandas()
             .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)
        c = (global_shuffle(df, "doc_id", seed="v2").toPandas()
             .sort_values("doc_id").reset_index(drop=True))
        assert (a.pos != c.pos).any()
        # every shard is a ~uniform slice of the corpus
        sizes = a.shard.value_counts()
        assert len(sizes) == 8 and sizes.max() - sizes.min() <= 1

    def test_validation(self, spark):
        from zdb_spark.operators.curation import global_shuffle

        with pytest.raises(ValueError, match="n_shards"):
            global_shuffle(_docs(spark, 10), "doc_id", n_shards=0)


class TestImportanceWeights:
    def _corpus(self, spark):
        """20 'code' docs (target), 20 'prose', 10 mixed: the target
        vocabulary is disjoint from prose so the LLR direction is
        unambiguous."""
        rows = []
        for i in range(20):
            rows.append((i, "def func return yield lambda class import "
                            f"def func return v{i}", "target"))
        for i in range(20, 40):
            rows.append((i, "the cat sat on the mat and the dog ran "
                            f"over the hill w{i}", "web"))
        for i in range(40, 50):
            rows.append((i, "def func the cat return yield on the mat "
                            f"m{i}", "web"))
        rows.append((99, "single", "web"))  # <2 tokens -> NULL weight
        return spark.createDataFrame(rows, "doc_id long, text string, "
                                           "source string")

    def test_target_docs_score_higher(self, spark):
        from zdb_spark.operators.curation import importance_weights

        df = self._corpus(spark)
        out = importance_weights(df, F.col("source") == "target",
                                 n_buckets=512).toPandas()
        w = dict(zip(out.doc_id, out.log_weight))
        t_min = min(w[i] / i_grams(out, i) for i in range(20))
        # per-gram normalization so doc length doesn't mask direction
        web_max = max(w[i] / i_grams(out, i) for i in range(20, 40))
        assert t_min > 0 > web_max
        mixed = [w[i] / i_grams(out, i) for i in range(40, 50)]
        assert all(web_max < m < t_min for m in mixed)
        assert pd.isna(w[99])

    def test_matches_stdlib_reimplementation(self, spark):
        """Exact replay: md5 buckets, add-alpha LLR, per-doc sum,
        round(4) — the same arithmetic the DuckDB oracle runs."""
        import math

        from zdb_spark.operators.curation import importance_weights

        df = self._corpus(spark)
        out = importance_weights(df, F.col("source") == "target",
                                 n_buckets=512, alpha=0.5).toPandas()
        rows = df.collect()
        buckets = {}
        for r in rows:
            toks = r.text.strip().lower().split()
            for a, b in zip(toks, toks[1:]):
                h = hashlib.md5(f"{a} {b}".encode()).hexdigest()
                bkt = int(h[:8], 16) % 512
                n_raw, n_t = buckets.get(bkt, (0, 0))
                buckets[bkt] = (n_raw + 1,
                                n_t + (1 if r.source == "target" else 0))
        t_raw = sum(v[0] for v in buckets.values())
        t_t = sum(v[1] for v in buckets.values())
        lr = {b: math.log((n_t + 0.5) / (t_t + 256.0))
                 - math.log((n_raw + 0.5) / (t_raw + 256.0))
              for b, (n_raw, n_t) in buckets.items()}
        for r in rows:
            toks = r.text.strip().lower().split()
            got = out.loc[out.doc_id == r.doc_id].iloc[0]
            if len(toks) < 2:
                assert pd.isna(got.log_weight)
                continue
            want = round(sum(
                lr[int(hashlib.md5(f"{a} {b}".encode())
                       .hexdigest()[:8], 16) % 512]
                for a, b in zip(toks, toks[1:])), 4)
            assert abs(got.log_weight - want) < 1e-9, r.doc_id
            assert got.n_grams == len(toks) - 1

    def test_carry_cols_inner_equals_default_joined(self, spark):
        """r19: keep_unscored=False + carry_cols must return exactly
        the default path's non-NULL rows with the metadata attached —
        the curation_v3 rewiring's equivalence contract."""
        from zdb_spark.operators.curation import importance_weights

        df = self._corpus(spark)
        default = importance_weights(df, F.col("source") == "target",
                                     n_buckets=512)
        want = {(r.doc_id, r.source, r.n_grams, r.log_weight)
                for r in default.join(df.select("doc_id", "source"),
                                      "doc_id").collect()
                if r.log_weight is not None}
        inner = importance_weights(df, F.col("source") == "target",
                                   n_buckets=512,
                                   carry_cols=("source",),
                                   keep_unscored=False)
        got = {(r.doc_id, r.source, r.n_grams, r.log_weight)
               for r in inner.collect()}
        assert got == want
        with pytest.raises(ValueError, match="keep_unscored"):
            importance_weights(df, F.col("source") == "target",
                               carry_cols=("source",))


def i_grams(out, i):
    return int(out.loc[out.doc_id == i, "n_grams"].iloc[0])


class TestContaminationBloom:
    """Bloom-prefiltered decontamination must be EXACT — identical to
    ``contamination`` on every corpus (the prefilter has no false
    negatives; stage 2 removes the false positives)."""

    def test_identical_to_exact_on_planted_overlap(self, spark):
        from zdb_spark.operators.curation import (contamination,
                                                  contamination_bloom)

        base = ("alpha bravo charlie delta echo foxtrot golf hotel "
                "india juliet")
        rows = [(1, base), (2, "completely different words " * 5),
                (3, "prefix words then " + base),
                (4, "alpha bravo charlie delta echo")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        bench = spark.createDataFrame([(100, base)],
                                      "doc_id long, text string")
        a = sorted(map(tuple, contamination(
            df, bench, "text", "doc_id", n=8).collect()))
        b = sorted(map(tuple, contamination_bloom(
            df, bench, "text", "doc_id", n=8, m_bits=4096,
            k=4).collect()))
        assert a == b

    def test_exact_even_when_filter_saturated(self, spark):
        # m_bits=32 saturates the filter: everything passes stage 1 and
        # stage 2 must carry the full exactness burden
        from zdb_spark.operators.curation import (contamination,
                                                  contamination_bloom)

        docs = spark.range(40).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("w"), F.col("id"), F.lit(" x y z a b c d e f"))
            .alias("text"))
        bench = docs.where(F.col("doc_id") < 5).select("text")
        a = sorted(map(tuple, contamination(docs, bench).collect()))
        b = sorted(map(tuple, contamination_bloom(
            docs, bench, m_bits=32, k=2).collect()))
        assert a == b

    def test_no_shuffle_before_survivor_agg(self, spark):
        # the corpus side must reach the verify join through broadcast
        # joins only — no Exchange below the first corpus aggregation
        from zdb_spark.operators.curation import contamination_bloom

        docs = spark.range(50).select(
            F.col("id").alias("doc_id"),
            F.lit("some shared words appear here repeatedly often "
                  "enough grams").alias("text"))
        bench = docs.where(F.col("doc_id") < 2).select("text")
        plan = contamination_bloom(
            docs, bench, m_bits=1024)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestNgramNovelty:
    def test_novelty_counts_first_occurrences(self, spark):
        from zdb_spark.operators.curation import ngram_novelty

        seq = "a b c d e f g h i j"          # 3 distinct 8-grams
        rows = [(1, seq),                     # all 3 grams novel
                (2, seq),                     # exact dup: 0 novel
                (3, seq + " k"),              # 4 grams, 1 novel
                (4, "short text")]            # < 8 tokens: no grams
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.doc_id: r for r in ngram_novelty(df).collect()}
        assert (out[1].n_grams, out[1].n_novel, out[1].novelty) \
            == (3, 3, 1.0)
        assert (out[2].n_grams, out[2].n_novel) == (3, 0)
        assert out[2].novelty == 0.0
        assert (out[3].n_grams, out[3].n_novel) == (4, 1)
        assert out[3].novelty == 0.25
        assert (out[4].n_grams, out[4].n_novel, out[4].novelty) \
            == (0, 0, None)

    def test_novel_mass_partitions_distinct_grams(self, spark, sf_dir):
        import os

        from zdb_spark.operators.curation import ngram_novelty
        from zdb_spark.operators.text import _ngram_col, tokenize

        docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet"))
        nv = ngram_novelty(docs, n=5)
        total_novel = nv.agg(F.sum("n_novel")).first()[0]
        distinct_grams = docs.select(F.explode(F.array_distinct(
            _ngram_col(tokenize("text"), 5))).alias("g")) \
            .distinct().count()
        assert total_novel == distinct_grams
        assert nv.where((F.col("novelty") < 0)
                        | (F.col("novelty") > 1)).count() == 0


class TestNgramNoveltyVsBloom:
    def test_lower_bounds_true_novelty_no_false_negatives(self, spark):
        from zdb_spark.operators.curation import ngram_novelty_vs_bloom
        from zdb_spark.operators.sketches import bloom_words
        from zdb_spark.operators.text import _ngram_col, tokenize

        hist = spark.createDataFrame(
            [(0, "a b c d e f g h i j")], "doc_id long, text string")
        new = spark.createDataFrame(
            [(1, "a b c d e f g h i j"),       # fully seen
             (2, "q r s t u v w x y z"),       # fully new
             (3, "a b c d e f g h new1 new2"), # 1 seen, 2 new grams
             (4, "tiny")],                     # no grams
            "doc_id long, text string")
        g = hist.select(F.explode(F.array_distinct(
            _ngram_col(tokenize("text"), 8))).alias("gram"))
        words = bloom_words(g, "gram", m_bits=4096, k=4)
        out = {r.doc_id: r for r in ngram_novelty_vs_bloom(
            new, words, n=8, m_bits=4096, k=4).collect()}
        # bloom has no false negatives: seen grams MUST count as seen
        assert out[1].n_seen == 3 and out[1].n_new == 0
        assert out[1].new_frac == 0.0
        # definitely-new is a lower bound: n_new <= true new count
        assert out[2].n_grams == 3 and out[2].n_new <= 3
        assert out[3].n_seen >= 1            # the surviving true gram
        assert out[3].n_grams == 3
        assert (out[4].n_grams, out[4].n_new, out[4].new_frac) \
            == (0, 0, None)

    def test_tight_at_low_fill(self, spark, sf_dir):
        # at realistic fill the FP mass is tiny: novelty-vs-bloom of the
        # corpus against its OWN grams must report ~everything seen
        import os

        from zdb_spark.operators.curation import ngram_novelty_vs_bloom
        from zdb_spark.operators.sketches import bloom_words
        from zdb_spark.operators.text import _ngram_col, tokenize

        docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet"))
        g = docs.select(F.explode(F.array_distinct(
            _ngram_col(tokenize("text"), 5))).alias("gram"))
        words = bloom_words(g, "gram", m_bits=1 << 19, k=4)
        out = ngram_novelty_vs_bloom(docs, words, n=5,
                                     m_bits=1 << 19, k=4)
        assert out.agg(F.sum("n_new")).first()[0] == 0


class TestUrlCanonicalization:
    """canonicalize_url / url_dedup (crawl-frontier hygiene): scheme/
    host lowering, default-port and fragment drops, tracking-param
    removal, query sorting, opaque-string passthrough, min-id
    election — all pure Catalyst (plan pinned UDF-free)."""

    def test_rules(self, spark):
        from zdb_spark.operators.curation import canonicalize_url

        rows = [
            (1, "HTTPS://Example.COM:443/Path/?utm_source=x&b=2&a=1#f"),
            (2, "https://example.com/Path/?a=1&b=2"),
            (3, "http://Example.com:80"),
            (4, "http://example.com/?gclid=zz&fbclid=aa"),
            (5, "  not a url at ALL  "),
            (6, "ftp://Host:21/file"),                 # non-default port
            (7, "https://example.com:8443/x?z=1&y=2"),  # kept + sorted
            (8, "https://example.com/CasePath"),        # path case kept
        ]
        df = spark.createDataFrame(rows, "id long, url string")
        got = {r.id: r.c for r in df.select(
            "id", canonicalize_url("url").alias("c")).collect()}
        assert got[1] == "https://example.com/Path/?a=1&b=2"
        assert got[1] == got[2]
        assert got[3] == "http://example.com/"
        assert got[4] == "http://example.com/"
        assert got[5] == "not a url at all"
        assert got[6] == "ftp://host:21/file"
        assert got[7] == "https://example.com:8443/x?y=2&z=1"
        assert got[8] == "https://example.com/CasePath"

    def test_dedup_election_and_plan(self, spark):
        from zdb_spark.operators.curation import url_dedup

        rows = [(10, "https://a.com/x?b=1&a=1"),
                (11, "HTTPS://A.COM:443/x?a=1&b=1#frag"),
                (12, "https://a.com/y")]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        out = url_dedup(df)
        got = {r.doc_id: (r.canonical_id, r.is_canonical)
               for r in out.collect()}
        assert got == {10: (10, True), 11: (10, False), 12: (12, True)}
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


class TestUrlReviewFixes:
    """Regression pins for the round-14 review findings on the URL
    operators: NULL rows survive dedup, fragment '?' is not a query,
    bare ref is functional (not stripped)."""

    def test_null_urls_survive_dedup(self, spark):
        from zdb_spark.operators.curation import url_dedup

        rows = [(1, "https://a.com/x"), (2, None), (3, None)]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        out = {r.doc_id: (r.canonical_id, r.is_canonical)
               for r in url_dedup(df).collect()}
        # every input row is present; NULL urls form their own group
        assert set(out) == {1, 2, 3}
        assert out[1] == (1, True)
        assert out[2] == (2, True) and out[3] == (2, False)

    def test_fragment_question_mark_is_not_a_query(self, spark):
        from zdb_spark.operators.curation import canonicalize_url

        rows = [(1, "https://a.com/p#sec?b=1"), (2, "https://a.com/p")]
        df = spark.createDataFrame(rows, "id long, url string")
        got = {r.id: r.c for r in df.select(
            "id", canonicalize_url("url").alias("c")).collect()}
        assert got[1] == got[2] == "https://a.com/p"

    def test_bare_ref_param_is_kept(self, spark):
        from zdb_spark.operators.curation import canonicalize_url

        rows = [(1, "https://g.com/o/r/blob/f.py?ref=main"),
                (2, "https://g.com/o/r/blob/f.py?ref=dev"),
                (3, "https://t.co/x?ref_src=twsrc")]
        df = spark.createDataFrame(rows, "id long, url string")
        got = {r.id: r.c for r in df.select(
            "id", canonicalize_url("url").alias("c")).collect()}
        assert got[1] != got[2]                # distinct branches kept
        assert got[3] == "https://t.co/x"      # ref_src still stripped
