"""Nested/decimal/fixed-width type lattice through the blob layer and the
Spark jobs (reference group types + Decimal logical type:
reference/src/metadata/schema_descriptor.rs:97-144,
reference/src/parquet_bridge.rs:486-508, nested reassembly cases
reference/tests/it/read/primitive_nested.rs:26-71)."""

from __future__ import annotations

import datetime as dt
import decimal

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from parquet2_spark import blob


def _rt_chunk(pages):
    payload, meta = blob.encode_chunk(pages)
    out = blob.decode_chunk(payload)
    if isinstance(out, pa.ChunkedArray):
        out = pa.concat_arrays(out.chunks)
    want = pa.concat_arrays(pages)
    assert out.equals(want), f"mismatch (codecs={meta.codecs})"
    return meta


_CASES = {
    "list_string": pa.array(
        [[f"tok{i % 7}", "x"] * (i % 3 + 1) for i in range(400)], type=pa.list_(pa.string())
    ),
    "list_string_nulls": pa.array(
        [None if i % 5 == 0 else [f"t{i % 4}"] for i in range(300)], type=pa.list_(pa.string())
    ),
    "list_long": pa.array([list(range(i % 6)) for i in range(400)], type=pa.list_(pa.int64())),
    "list_list_int": pa.array(
        [[[1, 2], [3]], None, [[4]], [[]]] * 40, type=pa.list_(pa.list_(pa.int32()))
    ),
    "struct": pa.array(
        [{"a": i, "b": f"s{i % 9}", "c": None if i % 7 == 0 else float(i)} for i in range(400)],
        type=pa.struct([("a", pa.int64()), ("b", pa.string()), ("c", pa.float64())]),
    ),
    "struct_nulls": pa.array(
        [None if i % 4 == 0 else {"a": i, "b": "z"} for i in range(200)],
        type=pa.struct([("a", pa.int64()), ("b", pa.string())]),
    ),
    "struct_all_null": pa.array([None] * 64, type=pa.struct([("a", pa.int64())])),
    "struct_timestamp": pa.array(
        [{"t": dt.datetime(2020, 1, 1) + dt.timedelta(seconds=i)} for i in range(100)],
        type=pa.struct([("t", pa.timestamp("us"))]),
    ),
    "map": pa.array(
        [[(f"k{j}", j * i) for j in range(i % 4)] for i in range(300)],
        type=pa.map_(pa.string(), pa.int64()),
    ),
    "map_nulls": pa.array(
        [None if i % 6 == 0 else [("a", i)] for i in range(200)],
        type=pa.map_(pa.string(), pa.int64()),
    ),
    "decimal_narrow": pa.array(
        [decimal.Decimal(f"{i}.{i % 100:02d}") for i in range(400)], type=pa.decimal128(12, 2)
    ),
    "decimal_negative_nulls": pa.array(
        [None if i % 9 == 0 else decimal.Decimal(f"-{i * 7}.5") for i in range(300)],
        type=pa.decimal128(18, 1),
    ),
    "decimal_wide": pa.array(
        [decimal.Decimal("123456789012345678901234567.89") * (i + 1) for i in range(100)],
        type=pa.decimal128(38, 2),
    ),
    "fixed_binary": pa.array([bytes([i % 256]) * 16 for i in range(300)], type=pa.binary(16)),
    "fixed_binary_nulls": pa.array(
        [None if i % 7 == 0 else bytes([i % 9]) * 8 for i in range(200)], type=pa.binary(8)
    ),
    "struct_of_list_map": pa.array(
        [{"xs": [i, i + 1], "m": [("k", float(i))]} for i in range(200)],
        type=pa.struct(
            [("xs", pa.list_(pa.int64())), ("m", pa.map_(pa.string(), pa.float64()))]
        ),
    ),
    "list_struct": pa.array(
        [[{"q": i, "w": f"s{i % 3}"}] * (i % 3) for i in range(300)],
        type=pa.list_(pa.struct([("q", pa.int32()), ("w", pa.string())])),
    ),
    "map_of_list": pa.array(
        [[("a", [float(i), 2.0])] for i in range(100)],
        type=pa.map_(pa.string(), pa.list_(pa.float64())),
    ),
}


class TestNestedBlob:
    @pytest.mark.parametrize("name", sorted(_CASES))
    def test_chunk_roundtrip_multipage_sliced(self, name):
        arr = _CASES[name]
        half = len(arr) // 2
        _rt_chunk([arr.slice(0, half), arr.slice(half, len(arr) - half)])

    def test_empty_page(self):
        _rt_chunk([pa.array([], type=pa.list_(pa.string()))])

    def test_child_codec_selection_recurses(self):
        # a low-cardinality string child inside a list should pick a real
        # string codec in its (self-describing) child page, not raw plain
        arr = pa.array([["en", "en", "de"] for _ in range(2000)], type=pa.list_(pa.string()))
        payload, meta = blob.encode_chunk([arr])
        assert meta.codecs == ["nested"]
        assert meta.enc_bytes < meta.raw_bytes / 10  # dict/rle child + structure

    def test_truncated_nested_blob_raises(self):
        payload, _ = blob.encode_chunk([_CASES["struct"]])
        with pytest.raises(Exception):
            blob.decode_chunk(payload[: len(payload) // 2])


class TestNestedSpark:
    @pytest.fixture(scope="class")
    def nested_df(self, spark):
        rows = []
        for i in range(600):
            rows.append(
                (
                    i,
                    [f"tok{j}_{i % 11}" for j in range(i % 5)],
                    {"title": f"T{i % 7}", "score": float(i % 100) / 3.0,
                     "ts": dt.datetime(2021, 1, 1) + dt.timedelta(minutes=i)},
                    {f"k{j}": j * i for j in range(i % 3)},
                    decimal.Decimal(i * 997) / decimal.Decimal(100),
                )
            )
        ddl = (
            "id bigint, tokens array<string>, "
            "meta struct<title:string, score:double, ts:timestamp>, "
            "counts map<string,bigint>, price decimal(12,2)"
        )
        return spark.createDataFrame(rows, ddl).coalesce(2)

    def test_encode_decode_bit_identical(self, spark, nested_df, tmp_path_factory):
        from parquet2_spark.operators import decode_job
        from parquet2_spark.operators.encode_job import EncodeConfig, encode

        snap = str(tmp_path_factory.mktemp("snap_nested"))
        encode(spark, nested_df, snap,
               EncodeConfig(target_rows=300, page_rows=128, sort_by="id", key="id",
                            host_from_key=False))
        got = sorted(repr(tuple(r)) for r in decode_job.decode(spark, snap).collect())
        want = sorted(repr(tuple(r)) for r in nested_df.collect())
        assert got == want

    def test_projection_of_nested_column(self, spark, nested_df, tmp_path_factory):
        from parquet2_spark.operators import decode_job
        from parquet2_spark.operators.encode_job import EncodeConfig, encode

        snap = str(tmp_path_factory.mktemp("snap_nested_proj"))
        encode(spark, nested_df, snap,
               EncodeConfig(target_rows=300, page_rows=128, sort_by="id", key="id",
                            host_from_key=False))
        out = decode_job.decode(spark, snap, columns=["id", "price"])
        assert dict(out.dtypes) == {"id": "bigint", "price": "decimal(12,2)"}
        assert out.count() == 600

    def test_roundtrip_operator_nested(self, spark, nested_df):
        from parquet2_spark.operators.roundtrip import roundtrip

        got = sorted(repr(tuple(r)) for r in roundtrip(nested_df).collect())
        want = sorted(repr(tuple(r)) for r in nested_df.collect())
        assert got == want


class TestRowRangeAndExactKeyRange:
    @pytest.fixture(scope="class")
    def snap(self, spark, tmp_path_factory):
        from parquet2_spark.operators.encode_job import EncodeConfig, encode

        df = spark.range(2000).select(
            F_col("id").alias("k"),
            (F_col("id") * 3).cast("double").alias("v"),
        )
        d = str(tmp_path_factory.mktemp("snap_rr"))
        encode(spark, df, d,
               EncodeConfig(target_rows=500, page_rows=100, sort_by="k", key="k",
                            host_from_key=False))
        return d

    def test_row_range_spans_partitions(self, spark, snap):
        from parquet2_spark.operators import decode_job

        out = decode_job.decode(spark, snap, row_range=(450, 1550))
        # partitions are salted, so global row order is part-id order —
        # assert count and that rows form a contiguous slice of the
        # part-ordered full decode
        assert out.count() == 1100
        full = decode_job.decode(spark, snap)
        assert {r["k"] for r in out.collect()} <= {r["k"] for r in full.collect()}

    def test_row_range_empty_and_tail(self, spark, snap):
        from parquet2_spark.operators import decode_job

        assert decode_job.decode(spark, snap, row_range=(5000, 6000)).count() == 0
        assert decode_job.decode(spark, snap, row_range=(1990, 99999)).count() == 10

    def test_key_range_exact(self, spark, snap):
        from parquet2_spark.operators import decode_job

        out = decode_job.decode(spark, snap, key_range=("k", 137, 842))
        ks = sorted(r["k"] for r in out.collect())
        assert ks == list(range(137, 843))

    def test_row_range_planning_collects_only_survivors(self, spark, snap, monkeypatch):
        """Row-span planning is Spark-side (window cumsum): the only
        driver collect during planning returns rows for SURVIVING
        partitions, never all of them (the snapshot has 4; the interval
        overlaps 1)."""
        from pyspark.sql.classic.dataframe import DataFrame as _CDF

        from parquet2_spark.operators import decode_job

        sizes = []
        orig = _CDF.collect

        def spy(self_df):
            out = orig(self_df)
            if "base" in self_df.columns:  # the planning frame
                sizes.append(len(out))
            return out

        monkeypatch.setattr(_CDF, "collect", spy)
        out = decode_job.decode(spark, snap, row_range=(600, 900))
        assert out.count() == 300
        assert sizes and max(sizes) == 1  # 1 surviving of 4 partitions

    def test_key_range_rejects_row_range_combo(self, spark, snap):
        from parquet2_spark.operators import decode_job

        with pytest.raises(ValueError):
            decode_job.decode(spark, snap, key_range=("k", 1, 2), row_range=(0, 5))


from pyspark.sql.functions import col as F_col  # noqa: E402  (fixture use)


class TestNestedFieldProjection:
    """Dotted-column decode ("meta.title"): only selected struct fields
    are decoded; sibling fields' child pages are skipped by header walk
    (the group-type analog of the reference's get_field_columns)."""

    @pytest.fixture(scope="class")
    def snap(self, spark, tmp_path_factory):
        from parquet2_spark.operators.encode_job import EncodeConfig, encode

        rows = [
            (i, {"title": f"T{i % 9}", "body": "B" * 300, "score": float(i)})
            for i in range(800)
        ]
        df = spark.createDataFrame(
            rows, "id bigint, meta struct<title:string, body:string, score:double>"
        )
        d = str(tmp_path_factory.mktemp("snap_fproj"))
        encode(spark, df, d,
               EncodeConfig(target_rows=400, page_rows=128, sort_by="id", key="id",
                            host_from_key=False))
        return d

    def test_projects_selected_fields_only(self, spark, snap):
        from parquet2_spark.operators import decode_job

        out = decode_job.decode(spark, snap, columns=["id", "meta.title", "meta.score"])
        assert dict(out.dtypes)["meta"] == "struct<title:string,score:double>"
        got = sorted((r["id"], r["meta"]["title"], r["meta"]["score"]) for r in out.collect())
        assert got == [(i, f"T{i % 9}", float(i)) for i in range(800)]

    def test_full_struct_unchanged(self, spark, snap):
        from parquet2_spark.operators import decode_job

        out = decode_job.decode(spark, snap, columns=["id", "meta"])
        assert out.filter(F.col("meta.body") != "B" * 300).count() == 0

    def test_missing_field_raises(self, spark, snap):
        from parquet2_spark.operators import decode_job

        with pytest.raises(KeyError):
            decode_job.decode(spark, snap, columns=["meta.nope"])

    def test_non_struct_dotted_raises(self, spark, snap):
        from parquet2_spark.operators import decode_job

        with pytest.raises((TypeError, KeyError)):
            decode_job.decode(spark, snap, columns=["id.x"])


def test_digest_validate_nested_snapshot(spark, tmp_path_factory):
    """The join-free digest validator must handle nested columns (maps are
    not xxhash64-able in Spark — folded through to_json)."""
    from parquet2_spark.operators import decode_job, validate
    from parquet2_spark.operators.encode_job import EncodeConfig, encode

    rows = [
        (i, {"t": f"T{i % 5}"}, [i, i + 1], {f"k{i % 3}": i})
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "id bigint, st struct<t:string>, arr array<bigint>, mp map<string,bigint>"
    )
    snap = str(tmp_path_factory.mktemp("snap_digest_n"))
    encode(spark, df, snap,
           EncodeConfig(target_rows=150, page_rows=64, sort_by="id", key="id",
                        host_from_key=False))
    rep = validate.digest_frames(df, decode_job.decode(spark, snap))
    assert rep["bit_identical"], rep


def test_list_struct_field_projection(spark, tmp_path_factory):
    """Dotted projection into array<struct>: only selected element fields
    are decoded, sibling fields' pages skipped inside the list child."""
    from parquet2_spark.operators import decode_job
    from parquet2_spark.operators.encode_job import EncodeConfig, encode

    rows = [
        (i, [{"q": i * 10 + j, "blob": "Z" * 200} for j in range(i % 4)])
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "id bigint, entries array<struct<q:bigint, blob:string>>")
    snap = str(tmp_path_factory.mktemp("snap_lsproj"))
    encode(spark, df, snap,
           EncodeConfig(target_rows=250, page_rows=100, sort_by="id", key="id",
                        host_from_key=False))
    out = decode_job.decode(spark, snap, columns=["id", "entries.q"])
    assert dict(out.dtypes)["entries"] == "array<struct<q:bigint>>"
    got = sorted((r["id"], tuple(e["q"] for e in r["entries"])) for r in out.collect())
    want = sorted((i, tuple(i * 10 + j for j in range(i % 4))) for i in range(500))
    assert got == want


def test_map_value_struct_field_projection(spark, tmp_path_factory):
    """Dotted projection into map VALUES ("counts.n" on
    map<string, struct<n, blob>>): keys decode fully, the value struct is
    pruned to the selected fields and sibling value-field pages are
    skipped inside the items page (reference get_field_columns walks any
    group type, src/read/mod.rs:70-77). Metadata tables in training
    pipelines are map-heavy — this is their hot projection path."""
    from parquet2_spark.operators import decode_job
    from parquet2_spark.operators.encode_job import EncodeConfig, encode

    rows = [
        (
            i,
            {f"k{j}": {"n": i * 10 + j, "blob": "Z" * 200} for j in range(i % 3 + 1)},
        )
        for i in range(400)
    ]
    df = spark.createDataFrame(
        rows, "id bigint, counts map<string, struct<n:bigint, blob:string>>"
    )
    snap = str(tmp_path_factory.mktemp("snap_mvproj"))
    encode(spark, df, snap,
           EncodeConfig(target_rows=200, page_rows=100, sort_by="id", key="id",
                        host_from_key=False))
    out = decode_job.decode(spark, snap, columns=["id", "counts.n"])
    assert dict(out.dtypes)["counts"] == "map<string,struct<n:bigint>>"
    got = sorted(
        (r["id"], tuple(sorted((k, v["n"]) for k, v in r["counts"].items())))
        for r in out.collect()
    )
    want = sorted(
        (i, tuple(sorted((f"k{j}", i * 10 + j) for j in range(i % 3 + 1))))
        for i in range(400)
    )
    assert got == want
    # full map unchanged when undotted
    full = decode_job.decode(spark, snap, columns=["id", "counts"])
    assert dict(full.dtypes)["counts"] == "map<string,struct<n:bigint,blob:string>>"
    r0 = full.filter(F.col("id") == 7).first()["counts"]
    assert r0["k0"]["blob"] == "Z" * 200
