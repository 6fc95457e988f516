"""Property-based nested-type roundtrips: hypothesis drives arbitrary
shapes/nulls/values through encode_chunk/decode_chunk (blob layer only —
fast, no Spark session)."""

from __future__ import annotations

import decimal

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet2_spark import blob

_text = st.text(max_size=12)
_scalars = st.one_of(
    st.none(),
    st.integers(min_value=-(2**62), max_value=2**62),
    _text,
)


def _rt(arr: pa.Array):
    half = max(1, len(arr) // 2)
    pages = [arr.slice(0, half), arr.slice(half, len(arr) - half)]
    pages = [p for p in pages if len(p)] or [arr]
    payload, _ = blob.encode_chunk(pages)
    out = blob.decode_chunk(payload)
    if isinstance(out, pa.ChunkedArray):
        out = pa.concat_arrays(out.chunks)
    assert out.equals(pa.concat_arrays(pages))


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.none(), st.lists(_text, max_size=6)), min_size=1, max_size=80))
def test_list_string_any_shape(rows):
    _rt(pa.array(rows, type=pa.list_(pa.string())))


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.fixed_dictionaries(
                {"a": st.one_of(st.none(), st.integers(-(2**31), 2**31)), "b": _text}
            ),
        ),
        min_size=1,
        max_size=80,
    )
)
def test_struct_any_shape(rows):
    _rt(pa.array(rows, type=pa.struct([("a", pa.int64()), ("b", pa.string())])))


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.lists(st.tuples(st.text(min_size=1, max_size=6), st.integers(-100, 100)),
                     max_size=4, unique_by=lambda kv: kv[0]),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_map_any_shape(rows):
    _rt(pa.array(rows, type=pa.map_(pa.string(), pa.int64())))


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.decimals(
                min_value=decimal.Decimal("-9999999999.99"),
                max_value=decimal.Decimal("9999999999.99"),
                places=2,
                allow_nan=False,
                allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=80,
    )
)
def test_decimal_narrow_any_values(rows):
    _rt(pa.array(rows, type=pa.decimal128(12, 2)))


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.decimals(
                min_value=decimal.Decimal("-1e30"),
                max_value=decimal.Decimal("1e30"),
                places=5,
                allow_nan=False,
                allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_decimal_wide_any_values(rows):
    _rt(pa.array(rows, type=pa.decimal128(38, 5)))


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.lists(st.lists(st.integers(-1000, 1000), max_size=4), max_size=4)),
        min_size=1,
        max_size=40,
    )
)
def test_list_list_int_any_shape(rows):
    _rt(pa.array(rows, type=pa.list_(pa.list_(pa.int64()))))
