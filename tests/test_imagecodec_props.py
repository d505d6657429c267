"""Property tests for the pure-Python PNG codec: any pixel matrix must
round-trip exactly through encode/decode, under every filter type."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from claude_readability_hook_spark.core.imagecodec import decode_png, encode_png

pixels_st = st.integers(min_value=1, max_value=24).flatmap(
    lambda w: st.lists(
        st.lists(st.integers(0, 255), min_size=w, max_size=w),
        min_size=1,
        max_size=24,
    )
)


@given(pixels_st)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_property(pixels):
    w, h, ch, raw = decode_png(encode_png(pixels))
    assert (w, h, ch) == (len(pixels[0]), len(pixels), 1)
    assert list(raw) == [v for row in pixels for v in row]


@given(
    pixels_st,
    st.lists(st.integers(0, 4), min_size=24, max_size=24),
)
@settings(max_examples=60, deadline=None)
def test_png_all_filters_roundtrip_property(pixels, filter_choices):
    from tests.test_real_decode import _png_with_filters

    filters = filter_choices[: len(pixels)]
    png = _png_with_filters(pixels, filters)
    _w, _h, _ch, raw = decode_png(png)
    assert list(raw) == [v for row in pixels for v in row]
