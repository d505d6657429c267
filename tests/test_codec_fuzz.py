"""Poison-payload fuzzing for the pure-Python decode ladder: random
bytes, random mutations of VALID files, and truncations must never
hang or escape with an unexpected exception class — the media/PDF UDFs
rely on (ValueError | NotImplementedError | EOFError | struct.error)
being the complete failure surface."""

from __future__ import annotations

import struct
import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from claude_readability_hook_spark.core.imagecodec import decode_png, encode_png
from claude_readability_hook_spark.core.jpegcodec import (
    decode_jpeg,
    encode_jpeg_gray,
    encode_jpeg_gray_progressive,
)
from claude_readability_hook_spark.core.mp4codec import demux_mp4, encode_minimal_mp4
from claude_readability_hook_spark.core.pdflayout import decode_pdf, synthesize_pdf
from claude_readability_hook_spark.core.wavcodec import decode_wav, encode_wav

ALLOWED = (ValueError, NotImplementedError, EOFError, struct.error, zlib.error,
           IndexError, KeyError, OverflowError, MemoryError)


def _valid_jpeg() -> bytes:
    return encode_jpeg_gray([[(x * 5 + y * 3) % 256 for x in range(16)] for y in range(16)])


def _valid_wav() -> bytes:
    return encode_wav([(i * 37) % 20000 - 10000 for i in range(400)])


def _valid_png() -> bytes:
    return encode_png([[(x + y) % 256 for x in range(12)] for y in range(8)])


def _valid_pdf() -> bytes:
    return synthesize_pdf([[(40, 100, 10, "fuzz page")]], compress=True)


def _valid_mp4() -> bytes:
    return encode_minimal_mp4([50, 80, 64], seed=9)


def _valid_fmp4() -> bytes:
    from claude_readability_hook_spark.core.mp4codec import encode_fragmented_mp4

    return encode_fragmented_mp4([[50, 64], [72, 40]], seed=9)


def _valid_mp4_pts() -> bytes:
    # ctts + elst: the r6 composition-time parse paths under mutation
    return encode_minimal_mp4(
        [50, 80, 64, 40], seed=9, ctts_offsets=[40, 120, 0, 80],
        elst_media_time=40, elst_empty_ms=60,
    )


def _valid_fmp4_pts() -> bytes:
    from claude_readability_hook_spark.core.mp4codec import encode_fragmented_mp4

    return encode_fragmented_mp4(
        [[50, 64], [72, 40]], seed=9,
        fragment_cts=[[40, 120], [0, 80]],
        elst_media_time=40, elst_empty_ms=20,
    )


def _valid_jpeg_prog() -> bytes:
    return encode_jpeg_gray_progressive(
        [[(x * 5 + y * 3) % 256 for x in range(16)] for y in range(16)]
    )


def _valid_pdf85() -> bytes:
    return synthesize_pdf([[(40, 100, 10, "fuzz armor")]], encoding="a85_flate")


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=400))
def test_random_bytes_never_hang_decoders(payload):
    for dec in (decode_jpeg, decode_wav, decode_png, demux_mp4):
        try:
            dec(payload)
        except ALLOWED:
            pass
    # decode_pdf returns (blocks, status) with poison isolation inside
    try:
        decode_pdf(payload)
    except ALLOWED:
        pass


@settings(max_examples=60, deadline=None)
@given(
    st.sampled_from(["jpeg", "jpegprog", "wav", "png", "pdf", "pdf85", "mp4", "fmp4", "mp4pts", "fmp4pts"]),
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=0, max_value=255),
)
def test_single_byte_mutations_fail_cleanly(kind, pos, val):
    base = {
        "jpeg": _valid_jpeg,
        "jpegprog": _valid_jpeg_prog,
        "wav": _valid_wav,
        "png": _valid_png,
        "pdf": _valid_pdf,
        "pdf85": _valid_pdf85,
        "mp4": _valid_mp4,
        "fmp4": _valid_fmp4,
        "mp4pts": _valid_mp4_pts,
        "fmp4pts": _valid_fmp4_pts,
    }[kind]()
    mutated = bytearray(base)
    mutated[pos % len(mutated)] = val
    dec = {
        "jpeg": decode_jpeg,
        "jpegprog": decode_jpeg,
        "wav": decode_wav,
        "png": decode_png,
        "pdf": decode_pdf,
        "pdf85": decode_pdf,
        "mp4": demux_mp4,
        "fmp4": demux_mp4,
        "mp4pts": demux_mp4,
        "fmp4pts": demux_mp4,
    }[kind]
    try:
        dec(bytes(mutated))
    except ALLOWED:
        pass


@settings(max_examples=60, deadline=None)
@given(st.sampled_from(["jpeg", "jpegprog", "wav", "png", "pdf", "pdf85", "mp4", "fmp4", "mp4pts", "fmp4pts"]), st.data())
def test_truncations_fail_cleanly(kind, data):
    base = {
        "jpeg": _valid_jpeg,
        "jpegprog": _valid_jpeg_prog,
        "wav": _valid_wav,
        "png": _valid_png,
        "pdf": _valid_pdf,
        "pdf85": _valid_pdf85,
        "mp4": _valid_mp4,
        "fmp4": _valid_fmp4,
        "mp4pts": _valid_mp4_pts,
        "fmp4pts": _valid_fmp4_pts,
    }[kind]()
    cut = data.draw(st.integers(min_value=0, max_value=len(base) - 1))
    dec = {
        "jpeg": decode_jpeg,
        "jpegprog": decode_jpeg,
        "wav": decode_wav,
        "png": decode_png,
        "pdf": decode_pdf,
        "pdf85": decode_pdf,
        "mp4": demux_mp4,
        "fmp4": demux_mp4,
        "mp4pts": demux_mp4,
        "fmp4pts": demux_mp4,
    }[kind]
    try:
        dec(base[:cut])
    except ALLOWED:
        pass
