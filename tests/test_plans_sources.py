"""Tests for plan introspection (the scale discipline: filters must reach
the scan) and the source connectors."""

import os

import pytest

from pyspark.sql import Row, functions as F

from zdb_spark.plans.inspect import assert_pushdown, scan_report
from zdb_spark.schema import ColumnType, PartitionBy, Schema
from zdb_spark.sources.readers import (convert_column_type, ingest_csv,
                                       ingest_json, rows)
from zdb_spark.table import Table

NS = 1_000_000_000
DAY = 86_400 * NS
T0 = 1704067200 * NS


def make_table(spark, home, name="src1"):
    schema = (Schema(name)
              .add_col("sym", ColumnType.SYMBOL16)
              .add_col("price", ColumnType.F64)
              .with_partition_by(PartitionBy.DAY))
    return Table.create(spark, schema, home=home)


class TestPlanInspect:
    def test_scan_report_shows_pruning(self, spark, tmp_home):
        t = make_table(spark, tmp_home)
        rows(t, [(T0 + i * DAY, "A", float(i)) for i in range(5)])
        rep = scan_report(t.scan(T0 + DAY, T0 + 2 * DAY, ["ts", "price"]))
        assert rep.has_partition_pruning
        assert rep.has_pushed_filters
        assert "price" in rep.read_schema
        assert "sym" not in rep.read_schema  # projection pruned

    def test_assert_pushdown_passes(self, spark, tmp_home):
        t = make_table(spark, tmp_home)
        rows(t, [(T0, "A", 1.0)])
        assert_pushdown(t.scan(T0, T0 + DAY), want_columns=["ts"])

    def test_assert_pushdown_catches_missing(self, spark, tmp_home):
        t = make_table(spark, tmp_home)
        rows(t, [(T0, "A", 1.0)])
        with pytest.raises(AssertionError):
            assert_pushdown(t.df())  # no filters at all

    def test_no_shuffle_in_pure_scan(self, spark, tmp_home):
        t = make_table(spark, tmp_home)
        rows(t, [(T0, "A", 1.0)])
        rep = scan_report(t.scan(T0, T0 + DAY))
        assert rep.exchanges == 0


class TestSources:
    def test_rows_append(self, spark, tmp_home):
        t = make_table(spark, tmp_home)
        assert rows(t, [(T0, "A", 1.0), (T0 + 1, "B", 2.0)]) == 2
        assert t.row_count == 2

    def test_ingest_csv(self, spark, tmp_home, tmp_path):
        t = make_table(spark, tmp_home)
        p = tmp_path / "in.csv"
        p.write_text("ts,sym,price\n"
                     f"{T0},AAPL,10.5\n{T0 + 1},MSFT,20.25\n")
        assert ingest_csv(t, str(p)) == 2
        got = {r["sym"]: r["price"] for r in t.scan().collect()}
        assert got == {"AAPL": 10.5, "MSFT": 20.25}

    def test_ingest_json(self, spark, tmp_home, tmp_path):
        t = make_table(spark, tmp_home)
        p = tmp_path / "in.jsonl"
        p.write_text(f'{{"ts": {T0}, "sym": "GOOG", "price": 5.5}}\n')
        assert ingest_json(t, str(p)) == 1

    def test_ingest_enforces_order(self, spark, tmp_home):
        from zdb_spark.table import OutOfOrderError

        t = make_table(spark, tmp_home)
        rows(t, [(T0 + DAY, "A", 1.0)])
        with pytest.raises(OutOfOrderError):
            rows(t, [(T0, "B", 2.0)])

    def test_convert_column_type(self, spark, tmp_home):
        t = make_table(spark, tmp_home)
        rows(t, [(T0, "A", 1.5), (T0 + 1, "B", 2.5)])
        convert_column_type(spark, "src1", "price", ColumnType.F32,
                            home=tmp_home)
        t2 = Table.open(spark, "src1", home=tmp_home)
        assert t2.schema.column("price").ctype is ColumnType.F32
        assert t2.df().schema["price"].dataType.typeName() == "float"
        assert t2.df().count() == 2


class TestExportTarShards:
    """WebDataset-style tar shard export (sources/writers.py)."""

    def _df(self, spark, n=57):
        return spark.createDataFrame(
            [(i, f"doc-{i}-" + "x" * (i % 9), b"\x01\x02" * (i % 5 + 1))
             for i in range(n)],
            "doc_id long, txt string, blob binary")

    def test_roundtrip_content_and_order(self, spark, tmp_path):
        from zdb_spark.sources.writers import (export_tar_shards,
                                               read_tar_shards)

        d = str(tmp_path / "wds")
        m = export_tar_shards(self._df(spark), d, 4, "doc_id",
                              {"txt": "txt", "blob": "bin"})
        assert m["rows"] == 57 and sum(m["per_shard"].values()) == 57
        rows = read_tar_shards(spark, d).collect()
        assert len(rows) == 114
        txt = {r.key: bytes(r.content).decode() for r in rows
               if r.ext == "txt"}
        assert txt["13"] == "doc-13-" + "x" * 4
        blob = {r.key: bytes(r.content) for r in rows if r.ext == "bin"}
        assert blob["3"] == b"\x01\x02" * 4
        # member order: keys string-sorted within a shard, member exts
        # in dict order per sample — the determinism contract
        by_shard = {}
        for r in sorted(rows, key=lambda r: (r.shard, r.pos)):
            by_shard.setdefault(r.shard, []).append((r.key, r.ext))
        for mem in by_shard.values():
            keys = [k for k, _ in mem[::2]]
            assert keys == sorted(keys)
            assert all(mem[i][1] == "txt" and mem[i + 1][1] == "bin"
                       for i in range(0, len(mem), 2))

    def test_export_leaves_no_temp_debris(self, spark, tmp_path):
        """Shards are written to attempt-unique temps and renamed on
        task success (round-11 review: a speculative re-attempt must
        never interleave into the final tar); after a successful export
        only final shard-*.tar files remain."""
        import glob
        import os

        from zdb_spark.sources.writers import export_tar_shards

        d = str(tmp_path / "wds")
        export_tar_shards(self._df(spark), d, 3, "doc_id",
                          {"txt": "txt"})
        names = sorted(os.path.basename(p)
                       for p in glob.glob(os.path.join(d, "shard-*")))
        assert names == [f"shard-{k:06d}.tar" for k in range(3)]

    def test_read_skips_non_file_members(self, spark, tmp_path):
        """Externally produced tars can carry directory/symlink members;
        extractfile() returns None for those — the reader must skip
        them (round-11 review), not crash with AttributeError."""
        import io
        import tarfile

        from zdb_spark.sources.writers import read_tar_shards

        d = tmp_path / "ext"
        d.mkdir()
        with tarfile.open(d / "shard-000000.tar", "w") as tf:
            dir_info = tarfile.TarInfo("samples")
            dir_info.type = tarfile.DIRTYPE
            tf.addfile(dir_info)
            data = b"hello"
            info = tarfile.TarInfo("a.txt")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            link = tarfile.TarInfo("b.txt")
            link.type = tarfile.SYMTYPE
            link.linkname = "a.txt"
            tf.addfile(link)
        rows = read_tar_shards(spark, str(d)).collect()
        assert [(r.key, r.ext, bytes(r.content), r.pos)
                for r in rows] == [("a", "txt", b"hello", 0)]

    def test_byte_identical_across_runs(self, spark, tmp_path):
        import glob
        import hashlib
        import os

        from zdb_spark.sources.writers import export_tar_shards

        def digest(dd):
            return {os.path.basename(p):
                    hashlib.md5(open(p, "rb").read()).hexdigest()
                    for p in glob.glob(dd + "/shard-*.tar")}

        df = self._df(spark)
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        export_tar_shards(df, a, 4, "doc_id", {"txt": "txt"})
        export_tar_shards(df.orderBy(F.desc("doc_id")), b, 4, "doc_id",
                          {"txt": "txt"})
        assert digest(a) == digest(b)      # input order never leaks

    def test_refuses_overwrite_and_bad_args(self, spark, tmp_path):
        import pytest as _pt

        from zdb_spark.sources.writers import (export_tar_shards,
                                               read_tar_shards)

        df = self._df(spark, n=5)
        d = str(tmp_path / "once")
        export_tar_shards(df, d, 2, "doc_id", {"txt": "txt"})
        with _pt.raises(FileExistsError):
            export_tar_shards(df, d, 2, "doc_id", {"txt": "txt"})
        with _pt.raises(ValueError, match="n_shards"):
            export_tar_shards(df, str(tmp_path / "z"), 0, "doc_id",
                              {"txt": "txt"})
        with _pt.raises(ValueError, match="members"):
            export_tar_shards(df, str(tmp_path / "z"), 2, "doc_id", {})
        with _pt.raises(FileNotFoundError):
            read_tar_shards(spark, str(tmp_path / "nothing"))


class TestExportShards:
    def test_roundtrip_and_manifest(self, spark, tmp_path):
        import json as _json

        from zdb_spark.sources.writers import export_shards

        df = spark.range(100).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("text-"), F.col("id")).alias("text"))
        out = str(tmp_path / "shards")
        m = export_shards(df, out, n_shards=4, id_col="doc_id")
        assert m["rows"] == 100 and m["n_shards"] == 4
        assert sorted(m["per_shard"]) == [0, 1, 2, 3]
        assert sum(m["per_shard"].values()) == 100
        # persisted manifest matches the returned one (keys stringified
        # by json round-trip)
        disk = _json.load(open(f"{out}/_manifest.json"))
        assert disk["rows"] == 100
        assert {int(k): v for k, v in disk["per_shard"].items()} \
            == m["per_shard"]
        # shard dirs exist and the data round-trips with assignment intact
        back = spark.read.json(out)
        assert back.count() == 100
        got = {(int(r["shard"]), r["doc_id"]) for r in back.collect()}
        from zdb_spark.operators.curation import _hash_bucket
        exp = {(int(r["s"]), r["doc_id"]) for r in df.select(
            "doc_id", (_hash_bucket("doc_id", "v1") % 4).alias("s"))
            .collect()}
        assert got == exp

    def test_deterministic_across_runs(self, spark, tmp_path):
        from zdb_spark.sources.writers import export_shards

        df = spark.range(50).select(F.col("id").alias("doc_id"))
        m1 = export_shards(df, str(tmp_path / "a"), 8, "doc_id")
        m2 = export_shards(df.orderBy(F.col("doc_id").desc()),
                           str(tmp_path / "b"), 8, "doc_id")
        assert m1["per_shard"] == m2["per_shard"]  # order-insensitive

    def test_empty_shards_recorded(self, spark, tmp_path):
        from zdb_spark.sources.writers import export_shards

        df = spark.range(2).select(F.col("id").alias("doc_id"))
        m = export_shards(df, str(tmp_path / "c"), 8, "doc_id")
        assert len(m["per_shard"]) == 8 and m["rows"] == 2
        assert sum(1 for v in m["per_shard"].values() if v == 0) == 6

    def test_validation(self, spark, tmp_path):
        from zdb_spark.sources.writers import export_shards

        df = spark.range(2).select(F.col("id").alias("doc_id"))
        with pytest.raises(ValueError, match="n_shards"):
            export_shards(df, str(tmp_path / "d"), 0, "doc_id")
        with pytest.raises(ValueError, match="unknown fmt"):
            export_shards(df, str(tmp_path / "e"), 2, "doc_id",
                          fmt="feather")
        # errorifexists: second write to the same path must fail
        export_shards(df, str(tmp_path / "f"), 2, "doc_id")
        with pytest.raises(Exception):
            export_shards(df, str(tmp_path / "f"), 2, "doc_id")


class TestBucketedJoin:
    def test_fact_fact_join_zero_exchange(self, spark, sf_dir):
        # The remaining 100-TB join story: both fact tables bucketed by
        # the join key -> SortMergeJoin with NO Exchange on either side.
        from pyspark.sql import functions as F

        from zdb_spark.sources.bucketed import bucketed_join, save_bucketed

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        save_bucketed(li.select("l_orderkey", "l_extendedprice"),
                      "b_lineitem", "l_orderkey", n_buckets=8)
        save_bucketed(orders.select(F.col("o_orderkey").alias("l_orderkey"),
                                    "o_custkey"),
                      "b_orders", "l_orderkey", n_buckets=8)
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = bucketed_join(spark, "b_lineitem", "b_orders", "l_orderkey")
            assert scan_report(j).exchanges == 0
            # control: the same join on plain parquet shuffles both sides
            plain = (li.select("l_orderkey")
                     .join(orders.select(F.col("o_orderkey")
                                         .alias("l_orderkey")),
                           "l_orderkey"))
            assert scan_report(plain).exchanges >= 2
            # correctness unchanged by the layout
            assert j.count() == li.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
            spark.sql("DROP TABLE IF EXISTS b_lineitem")
            spark.sql("DROP TABLE IF EXISTS b_orders")


class TestPipelineOperatorPlans:
    """Pin the shuffle/broadcast claims SCALE.md makes for the newer
    pipeline operators: row-local ops must plan with ZERO Exchanges;
    the benchmark side of decontamination must broadcast."""

    @pytest.fixture(scope="class")
    def docs(self, spark):
        return spark.createDataFrame(
            [(i, f"alpha beta gamma delta token{i} epsilon zeta")
             for i in range(50)], "doc_id long, text string")

    def test_repetition_features_zero_shuffle(self, docs):
        from zdb_spark.operators.text import repetition_features

        rep = scan_report(repetition_features(docs, "text"))
        assert rep.exchanges == 0

    def test_chunk_documents_zero_shuffle(self, docs):
        from zdb_spark.operators.curation import chunk_documents

        rep = scan_report(chunk_documents(docs, "text", "doc_id",
                                          max_tokens=4, overlap=1))
        assert rep.exchanges == 0

    def test_stratified_sample_zero_shuffle(self, docs):
        from zdb_spark.operators.curation import stratified_sample

        df = docs.withColumn("src", F.lit("a"))
        rep = scan_report(stratified_sample(df, "src", "doc_id",
                                            {"a": 0.5}))
        assert rep.exchanges == 0

    def test_redact_pii_zero_shuffle(self, docs):
        from zdb_spark.operators.text import redact_pii

        assert scan_report(redact_pii(docs, "text")).exchanges == 0

    def test_assign_centroids_zero_shuffle(self, spark):
        from zdb_spark.operators.similarity import assign_centroids

        df = spark.createDataFrame([(i, [float(i), 1.0]) for i in range(20)],
                                   "vec_id long, embedding array<double>")
        rep = scan_report(assign_centroids(df, [[1.0, 0.0], [0.0, 1.0]],
                                           "embedding"))
        assert rep.exchanges == 0

    def test_contamination_broadcasts_benchmark(self, spark, docs):
        from zdb_spark.operators.curation import contamination

        bench = docs.where(F.col("doc_id") < 5)
        out = contamination(docs, bench, "text", "doc_id", n=3)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_apply_bpe_zero_shuffle_jvm_only(self, docs):
        from zdb_spark.operators.tokenize import apply_bpe

        out = apply_bpe(docs, [("t", "h"), ("th", "e")], "text", "doc_id")
        rep = scan_report(out)
        assert rep.exchanges == 0
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan      # pure codegen, no UDF eval node

    def test_char_entropy_zero_shuffle(self, docs):
        from zdb_spark.operators.text import char_entropy

        out = char_entropy(docs, "text")
        rep = scan_report(out)
        assert rep.exchanges == 0
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan      # pure HOF codegen, no UDF node

    def test_contamination_hash_prefilter_broadcast_verify_adaptive(
            self, spark, docs):
        from zdb_spark.operators.curation import contamination_hash

        bench = docs.where(F.col("doc_id") < 5)
        out = contamination_hash(docs, bench, "text", "doc_id", n=3)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan   # the bench-hash prefilter
        assert "CartesianProduct" not in plan
        # the verify join and the count re-attach tail join both stay
        # adaptive: survivor volume is proportional to CONTAMINATION,
        # not bounded by the benchmark, so an unconditional broadcast
        # hint could OOM under heavy contamination — AQE converts at
        # runtime when the build side really is small.  F.broadcast
        # resolves straight to a ResolvedHint node in the ANALYZED plan
        # (never UnresolvedHint), and the optimizer strips every
        # ResolvedHint — so the analyzed plan is the only place a
        # re-added verify-join hint would be visible.  Exactly ONE user
        # hint in the whole tree: the bench-hash prefilter.
        analyzed = out._jdf.queryExecution().analyzed().toString()
        assert analyzed.count("ResolvedHint") == 1

    def test_nearest_centroid_l2_zero_shuffle(self, spark):
        from zdb_spark.operators.similarity import nearest_centroid_l2_col

        df = spark.createDataFrame([(i, [float(i), 1.0]) for i in range(20)],
                                   "vec_id long, embedding array<double>")
        rep = scan_report(df.select(
            "vec_id", nearest_centroid_l2_col(
                "embedding", [[1.0, 0.0], [0.0, 1.0]]).alias("cid")))
        assert rep.exchanges == 0

    def test_centroid_outliers_single_cluster_keyed_shuffle(self, spark):
        from zdb_spark.operators.similarity import centroid_outliers

        df = spark.createDataFrame([(i, [float(i), 1.0]) for i in range(20)],
                                   "vec_id long, embedding array<double>")
        out = centroid_outliers(df, [[1.0, 0.0], [0.0, 1.0]],
                                "embedding", "vec_id")
        # assignment is row-local; the only exchange is the per-cluster
        # stats window, keyed by centroid_id
        assert scan_report(out).exchanges == 1

    def test_split_leakage_labels_are_projections(self, spark, docs):
        from zdb_spark.operators.curation import split_leakage

        out = split_leakage(docs, "text", "doc_id")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        # split labels derive from the pair ids — adding them must not
        # introduce any join beyond what the LSH pair machinery already
        # plans (compare join-node counts against the bare pairs frame)
        from zdb_spark.operators.dedup import minhash_lsh_pairs
        base = minhash_lsh_pairs(docs, "text", "doc_id",
                                 num_hashes=64, bands=16, threshold=0.5)
        base_plan = base._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Join") == base_plan.count("Join")

    def test_percentile_cut_is_filter_scan(self, spark, docs):
        from zdb_spark.operators.curation import percentile_cut

        scored = docs.withColumn("s", F.length("text").cast("double"))
        kept, thr = percentile_cut(scored, "s", p=0.1)
        # threshold is inlined as a literal: the survivor frame is one
        # shuffle-free filter scan
        assert scan_report(kept).exchanges == 0

    def test_ivfpq_probe_prunes_partitions_and_columns(self, spark, tmp_path):
        """The composed index's two pruning claims, pinned: the probe's
        plan must (a) partition-filter on centroid_id (IVF pruning) and
        (b) contain an ADC scan whose ReadSchema carries pq_codes but
        NOT the raw vector column (PQ column pruning)."""
        import re as _re

        from zdb_spark.operators.similarity import (build_ivfpq_index,
                                                    ivfpq_index_topk)

        df = spark.createDataFrame(
            [(i, [float((i * 7 + j * 3) % 11) for j in range(16)])
             for i in range(200)],
            "vec_id long, embedding array<double>")
        path = str(tmp_path / "ivfpq")
        build_ivfpq_index(df, path, n_centroids=4, m=4, k=8,
                          sample_size=200)
        out = ivfpq_index_topk(spark, path, [1.0] * 16, k=5, n_probe=2,
                               rerank=16)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "centroid_id" in plan and "PartitionFilters" in plan
        schemas = _re.findall(r"ReadSchema: (\S+)", plan)
        adc = [s for s in schemas if "pq_codes" in s]
        assert adc and all("embedding" not in s for s in adc), schemas
        assert out.count() == 5

    def test_salted_agg_guard_engages_on_planted_skew(self, spark):
        """The skew_stress gate's guard, pinned at the plan level: with a
        planted hot key, phase 1 must hash-partition on (key, _salt) —
        spreading the hot key over n_salts reducers — and a second
        exchange on the bare key merges <= n_salts partials.  The answer
        itself is value-checked by the skew_stress driver gate."""
        from zdb_spark.operators.skew import salted_agg

        rows = [Row(k="HOT", v=float(i)) for i in range(500)] + \
               [Row(k=f"c{i % 20}", v=float(i)) for i in range(100)]
        out = salted_agg(spark.createDataFrame(rows), ["k"],
                         {"n": ("v", "count"), "total": ("v", "sum")},
                         n_salts=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
        import re as _re

        parts = _re.findall(r"hashpartitioning\(([^)]*)\)", plan)
        assert any("_salt" in p and "k#" in p for p in parts), plan
        assert any("_salt" not in p and "k#" in p for p in parts), plan
        # and the guard must not change the answer
        got = {r["k"]: (r["n"], r["total"]) for r in out.collect()}
        assert got["HOT"] == (500, float(sum(range(500))))


class TestRound10OperatorPlans:
    """Shuffle/broadcast claims for the round-10 additions."""

    @pytest.fixture(scope="class")
    def docs(self, spark):
        return spark.createDataFrame(
            [(i, f"alpha beta gamma delta token{i} epsilon zeta",
              f"src{i % 3}")
             for i in range(50)], "doc_id long, text string, source string")

    def test_global_shuffle_broadcast_offsets_no_global_sort(self, docs):
        """The 10k-row offset table broadcasts back (BroadcastHashJoin),
        the big-side rank window is PARTITIONED by bucket, and there is
        no whole-stream Sort/Exchange for a global order."""
        from zdb_spark.operators.curation import global_shuffle

        out = global_shuffle(docs, "doc_id")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        # exactly one unpartitioned window: the 10k-row offset cumsum;
        # the per-row rank window must carry its bucket partition key
        assert plan.count("Window [") <= 2
        assert "partitionBy=[_gs_b]" in plan.replace(" ", "") or \
               "_gs_b" in plan.split("Window")[1]

    def test_importance_weights_broadcasts_ratio_table(self, docs):
        """The B-row LLR table and the 1-row totals broadcast; the
        bigram stream itself is never on a broadcast build side and
        never in a cartesian product."""
        from zdb_spark.operators.curation import importance_weights

        out = importance_weights(docs, F.col("source") == "src0",
                                 n_buckets=64)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_quantize_embeddings_zero_shuffle(self, spark):
        from zdb_spark.operators.similarity import quantize_embeddings

        df = spark.createDataFrame(
            [(i, [float(i), 1.0, -2.5]) for i in range(20)],
            "vec_id long, embedding array<float>")
        out = quantize_embeddings(df, "embedding")
        rep = scan_report(out)
        assert rep.exchanges == 0
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan   # pure HOF codegen, no UDF node

    def test_int8_topk_candidate_scan_jvm_only_broadcast_rerank(self, spark):
        from zdb_spark.operators.similarity import int8_topk

        df = spark.createDataFrame(
            [(i, [float(i % 7), 1.0, -2.5, 0.25]) for i in range(30)],
            "vec_id long, embedding array<float>")
        out = int8_topk(df, [1.0, 0.5, -1.0, 0.0], k=5, rerank=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan   # rerank joins 64 ids back
        assert "Python" not in plan          # both scans pure codegen
        assert "TakeOrderedAndProject" in plan

    def test_embedding_covariance_single_agg_shuffle_broadcast_combine(
            self, spark):
        from zdb_spark.operators.similarity import embedding_covariance

        df = spark.createDataFrame(
            [(i, [float(i), 1.0, -2.0]) for i in range(40)],
            "vec_id long, embedding array<float>")
        out = embedding_covariance(df, dim=3)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the d-row mean frame broadcasts back twice; the big stream
        # shuffles ONCE (the partial-aggregated posexplode groupBy —
        # its partial_ aggregate must appear before the exchange)
        assert plan.count("BroadcastHashJoin") == 2
        assert "CartesianProduct" not in plan
        assert "partial_sum" in plan


class TestWarc:
    """WARC crawl ingest (sources/warc.py) — record walk, per-member
    gunzip, HTTP splitting, the Spark explode, and loud refusals."""

    def _records(self):
        html = b"<html><body><p>Hello &amp; world</p></body></html>"
        return [
            {"warc_type": "warcinfo",
             "payload": b"software: test\r\n",
             "content_type": "application/warc-fields"},
            {"warc_type": "request", "target_uri": "http://x.com/a",
             "payload": b"GET /a HTTP/1.1\r\nHost: x.com\r\n\r\n",
             "content_type": "application/http; msgtype=request"},
            {"warc_type": "response", "target_uri": "http://x.com/a",
             "payload": html,
             "http": {"status": 200, "content_type": "text/html"}},
        ], html

    def test_roundtrip_plain_and_per_record_gzip(self):
        from zdb_spark.sources.warc import (parse_warc,
                                            warc_write_records)

        recs, html = self._records()
        for gz in (False, True):
            blob = warc_write_records(recs, gzip_per_record=gz)
            got = parse_warc(blob)
            assert [r["warc_type"] for r in got] == [
                "warcinfo", "request", "response"]
            r = got[2]
            assert (r["http_status"], r["http_content_type"]) == \
                (200, "text/html")
            assert r["http_body"] == html
            assert r["target_uri"] == "http://x.com/a"
        # byte determinism (fixture-writer contract)
        assert warc_write_records(recs, gzip_per_record=True) == \
            warc_write_records(recs, gzip_per_record=True)

    def test_loud_refusals(self):
        import zlib

        import pytest

        from zdb_spark.sources.warc import (_gunzip_members,
                                            parse_warc,
                                            warc_write_records)

        recs, _ = self._records()
        blob = warc_write_records(recs)
        with pytest.raises(ValueError, match="version"):
            parse_warc(b"WARC/0.9\r\n\r\n")
        with pytest.raises(ValueError, match="terminator"):
            parse_warc(blob[:-2])
        with pytest.raises(ValueError, match="Content-Length"):
            parse_warc(b"WARC/1.0\r\nWARC-Type: x\r\n\r\n")
        # truncated payload
        bad = blob.replace(b"Content-Length: 16",
                           b"Content-Length: 99", 1)
        with pytest.raises(ValueError, match="truncated|terminator"):
            parse_warc(bad)
        # gzip bomb: 1 MiB of zeros behind a cap of 1 KiB
        co = zlib.compressobj(9, zlib.DEFLATED, 31)
        bomb = co.compress(b"\x00" * (1 << 20)) + co.flush()
        with pytest.raises(ValueError, match="cap"):
            _gunzip_members(bomb, cap=1024)
        with pytest.raises(ValueError, match="truncated gzip"):
            _gunzip_members(bomb[:-6])
        # a response record without an HTTP status line
        broken = warc_write_records(
            [{"warc_type": "response", "target_uri": "http://x/",
              "payload": b"not http at all",
              "content_type": "application/http; msgtype=response"}])
        with pytest.raises(ValueError, match="status line"):
            parse_warc(broken)

    def test_spark_explode_and_null_blob(self, spark):
        from zdb_spark.sources.warc import (extract_warc,
                                            warc_write_records)

        recs, html = self._records()
        blob = bytearray(warc_write_records(recs,
                                            gzip_per_record=True))
        df = spark.createDataFrame([(1, blob), (2, None)],
                                   "doc_id long, warc binary")
        out = extract_warc(df, "warc", "doc_id").collect()
        assert len(out) == 3                    # NULL blob vanishes
        resp = [r for r in out if r.warc_type == "response"]
        assert len(resp) == 1
        r = resp[0]
        assert (r.id, r.url, r.http_status) == (1, "http://x.com/a",
                                                200)
        assert bytes(r.payload) == html
        # non-response records keep raw payloads and NULL status
        info = [r for r in out if r.warc_type == "warcinfo"][0]
        assert info.http_status is None
        assert bytes(info.payload) == b"software: test\r\n"

    def test_revisit_and_request_surfacing(self, spark):
        """r16 (ISO 28500 §6.7): revisit records carry payload digest
        + refers-to URI, request records their request-line method —
        the columns a Common Crawl dedup join reads."""
        from zdb_spark.sources.warc import (extract_warc, parse_warc,
                                            warc_write_records)

        recs, _ = self._records()
        recs.append({
            "warc_type": "revisit", "target_uri": "http://x.com/a",
            "payload": b"",
            "payload_digest": "sha1:ABCDEF",
            "refers_to": "<urn:uuid:rec-00000002>",
            "refers_to_uri": "http://x.com/a",
            "profile": ("http://netpreserve.org/warc/1.0/revisit/"
                        "identical-payload-digest"),
        })
        blob = warc_write_records(recs, gzip_per_record=True)
        got = parse_warc(blob)
        rev = got[3]
        assert rev["warc_type"] == "revisit"
        assert rev["payload_digest"] == "sha1:ABCDEF"
        assert rev["refers_to"] == "<urn:uuid:rec-00000002>"
        assert rev["refers_to_uri"] == "http://x.com/a"
        assert rev["profile"].endswith("identical-payload-digest")
        assert got[1]["http_method"] == "GET"
        assert "http_method" not in got[0]      # warcinfo: no HTTP
        # Spark surfacing: one row per record, typed columns
        df = spark.createDataFrame([(1, bytearray(blob))],
                                   "doc_id long, warc binary")
        rows = {r.warc_type: r
                for r in extract_warc(df, "warc", "doc_id").collect()}
        assert rows["revisit"].payload_digest == "sha1:ABCDEF"
        assert rows["revisit"].refers_to_uri == "http://x.com/a"
        assert rows["request"].http_method == "GET"
        assert rows["response"].http_method is None
        assert rows["response"].payload_digest is None

    def test_all_iso28500_types_and_segmentation(self, spark):
        """r17 (ISO 28500 §6 complete): resource/metadata/conversion/
        continuation records surface through the same stateless
        mapper, and the §5.18 segmentation headers round-trip —
        segment 1 on the origin, segment 2 + origin id on the
        continuation — the columns a reassembly join needs."""
        import pytest

        from zdb_spark.sources.warc import (extract_warc, parse_warc,
                                            warc_write_records)

        recs = [
            {"warc_type": "resource", "target_uri": "http://x/r.txt",
             "payload": b"User-agent: *\r\n",
             "content_type": "text/plain", "segment_number": 1,
             "record_id": "<urn:uuid:orig-1>"},
            {"warc_type": "continuation",
             "target_uri": "http://x/r.txt",
             "payload": b"Disallow: /\r\n", "segment_number": 2,
             "segment_origin_id": "<urn:uuid:orig-1>"},
            {"warc_type": "metadata", "target_uri": "http://x/a",
             "payload": b"fetchTimeMs: 12\r\n",
             "content_type": "application/warc-fields",
             "refers_to_uri": "http://x/a"},
            {"warc_type": "conversion", "target_uri": "http://x/a",
             "payload": b"plain text",
             "content_type": "text/plain",
             "refers_to_uri": "http://x/a"},
        ]
        blob = warc_write_records(recs, gzip_per_record=True)
        got = parse_warc(blob)
        assert [r["warc_type"] for r in got] == [
            "resource", "continuation", "metadata", "conversion"]
        assert got[0]["segment_number"] == 1
        assert got[1]["segment_number"] == 2
        assert got[1]["segment_origin_id"] == "<urn:uuid:orig-1>"
        assert "segment_number" not in got[2]
        # reassembly: origin + continuation payloads concatenate
        assert (got[0]["payload"] + got[1]["payload"]
                == b"User-agent: *\r\nDisallow: /\r\n")
        # loud on a malformed ordinal (plain blob: the gzipped form
        # would hide the header bytes from the substitution)
        plain = warc_write_records(recs)
        bad = plain.replace(b"WARC-Segment-Number: 1",
                            b"WARC-Segment-Number: x")
        assert bad != plain
        with pytest.raises(ValueError, match="Segment-Number"):
            parse_warc(bad)
        df = spark.createDataFrame([(1, bytearray(blob))],
                                   "doc_id long, warc binary")
        rows = {r.warc_type: r
                for r in extract_warc(df, "warc", "doc_id").collect()}
        assert rows["continuation"].segment_number == 2
        assert rows["resource"].segment_number == 1
        assert rows["metadata"].segment_number is None
        assert rows["metadata"].refers_to_uri == "http://x/a"
        assert rows["conversion"].content_type == "text/plain"

    def test_reassemble_segments_across_blobs(self, spark):
        """r18 (r17 verdict task 5): the reassembly JOIN itself —
        continuations fold into their origin record ACROSS input
        rows (segmentation exists because a record spans WARC
        files), ordinal order survives shuffled input, continuation
        rows disappear, unsegmented rows pass through with
        n_segments=1, and an orphan continuation (origin not
        scanned) is dropped rather than surfaced as a fake record."""
        from zdb_spark.sources.warc import (extract_warc,
                                            reassemble_warc_segments,
                                            warc_write_records)

        # blob A: the origin (segment 1) + an unsegmented metadata
        # record; blob B: segments 3 and 2 OUT OF ORDER + an orphan
        # continuation pointing at an unscanned origin
        blob_a = warc_write_records([
            {"warc_type": "resource", "target_uri": "http://x/r.txt",
             "payload": b"AAA-", "content_type": "text/plain",
             "segment_number": 1, "record_id": "<urn:uuid:orig-1>"},
            {"warc_type": "metadata", "target_uri": "http://x/a",
             "payload": b"fetchTimeMs: 12\r\n",
             "content_type": "application/warc-fields"},
        ], gzip_per_record=True)
        blob_b = warc_write_records([
            {"warc_type": "continuation", "target_uri": "http://x/r.txt",
             "payload": b"CCC", "segment_number": 3,
             "segment_origin_id": "<urn:uuid:orig-1>"},
            {"warc_type": "continuation", "target_uri": "http://x/r.txt",
             "payload": b"BBB-", "segment_number": 2,
             "segment_origin_id": "<urn:uuid:orig-1>"},
            {"warc_type": "continuation", "target_uri": "http://y/z",
             "payload": b"orphan", "segment_number": 2,
             "segment_origin_id": "<urn:uuid:missing>"},
        ], gzip_per_record=True)
        df = spark.createDataFrame(
            [(1, bytearray(blob_a)), (2, bytearray(blob_b))],
            "doc_id long, warc binary")
        recs = extract_warc(df, "warc", "doc_id")
        out = reassemble_warc_segments(recs)
        rows = {r.warc_type: r for r in out.collect()}
        assert set(rows) == {"resource", "metadata"}
        assert bytes(rows["resource"].payload) == b"AAA-BBB-CCC"
        assert rows["resource"].n_segments == 3
        assert rows["metadata"].n_segments == 1
        assert bytes(rows["metadata"].payload) == b"fetchTimeMs: 12\r\n"
