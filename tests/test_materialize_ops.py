"""Span-containment range join (J2/J8/J11) and node attrs dedup-merge (A2)."""

from __future__ import annotations

import pyspark.sql.functions as F

from glasseenterprise_mcp_spark.operators.link import span_containment_join
from glasseenterprise_mcp_spark.operators.materialize import merge_node_attrs
from glasseenterprise_mcp_spark.schemas import MENTIONS_SCHEMA


def test_span_containment(spark):
    rows = [
        # error span [10, 40] contains entity [15, 22] and config [30, 38]
        ("c1", 0, "error", "E1 failed badly", "e1 failed badly", 1, 10, 40, None, True, None, None, None, None, None),
        ("c1", 0, "entity", "agent_1", "agent_1", 1, 15, 22, None, True, None, None, None, None, None),
        ("c1", 0, "config", "CFG_X", "CFG_X", 1, 30, 38, None, True, None, None, None, None, None),
        # outside the error span
        ("c1", 0, "entity", "agent_2", "agent_2", 2, 50, 57, None, True, None, None, None, None, None),
        # same spans in a DIFFERENT turn — must not join across turns
        ("c1", 1, "entity", "agent_3", "agent_3", 1, 15, 22, None, True, None, None, None, None, None),
        # equal spans: not containment (strictly larger required)
        ("c2", 0, "url", "http://h/x", "/x", 1, 0, 10, "/x", True, None, None, None, None, None),
        ("c2", 0, "entity", "samespan", "samespan", 1, 0, 10, None, True, None, None, None, None, None),
    ]
    m = spark.createDataFrame(rows, MENTIONS_SCHEMA)
    got = {
        (r.container_mtype, r.container_norm, r.contained_mtype, r.contained_norm)
        for r in span_containment_join(m).collect()
    }
    assert got == {
        ("error", "e1 failed badly", "entity", "agent_1"),
        ("error", "e1 failed badly", "config", "CFG_X"),
    }


def test_merge_node_attrs_prio(spark):
    rows = [
        ("n1", None, "keep", 1, {"a": "1", "b": "x"}),
        ("n1", "name1", None, 0, {"b": "y", "c": "3"}),  # prio 0 wins on 'b'
        ("n2", "solo", "s", 0, {}),
    ]
    df = spark.createDataFrame(rows, "id string, name string, note string, _prio int, attrs map<string,string>")
    got = {r.id: (r.name, r.note, dict(r.attrs or {})) for r in merge_node_attrs(df).collect()}
    assert got["n1"] == ("name1", "keep", {"a": "1", "b": "y", "c": "3"})
    assert got["n2"] == ("solo", "s", {})


def test_merge_node_attrs_no_prio_deterministic(spark):
    rows = [
        ("n1", "bbb", {"k": "2"}),
        ("n1", "aaa", {"k": "1"}),
    ]
    df = spark.createDataFrame(rows, "id string, name string, attrs map<string,string>")
    r = merge_node_attrs(df).collect()[0]
    # ties resolve by value min — repeatable regardless of partitioning
    assert r.name == "aaa" and dict(r.attrs) == {"k": "1"}


def test_sink_upsert_matches_merge_semantics(spark, tmp_path):
    """S10: the parquet-MoR fallback upsert must implement exactly Iceberg's
    ``MERGE ... WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT``
    semantics. The sandbox has no Iceberg jars, so the MERGE side is
    simulated in DuckDB (PRIMARY KEY + INSERT ... ON CONFLICT DO UPDATE —
    the same upsert contract) and both paths are asserted equal after two
    overlapping batches."""
    import duckdb

    from glasseenterprise_mcp_spark.operators.materialize import GraphSink

    b1 = [("a", "t1", "v1"), ("b", "t1", "v2"), ("d", "t2", "v9")]
    b2 = [("b", "t1", "v2-updated"), ("c", "t2", "v3")]
    schema = "id string, type string, val string"

    sink = GraphSink(spark, str(tmp_path))
    sink.upsert(spark.createDataFrame(b1, schema), "nodes", keys=["id"], partition_by=["type"])
    sink.upsert(spark.createDataFrame(b2, schema), "nodes", keys=["id"], partition_by=["type"])
    got = {(r.id, r.type, r.val) for r in sink.read("nodes").collect()}

    con = duckdb.connect()
    con.sql("CREATE TABLE nodes (id VARCHAR PRIMARY KEY, type VARCHAR, val VARCHAR)")
    for batch in (b1, b2):
        con.executemany(
            "INSERT INTO nodes VALUES (?, ?, ?) "
            "ON CONFLICT (id) DO UPDATE SET type = excluded.type, val = excluded.val",
            batch,
        )
    want = set(con.sql("SELECT id, type, val FROM nodes").fetchall())
    assert got == want


def test_sink_upsert_composite_key_merge_parity(spark, tmp_path):
    """S10, composite (subj, pred, obj) key — the edge-table contract."""
    import duckdb

    from glasseenterprise_mcp_spark.operators.materialize import GraphSink

    b1 = [("s1", "p", "o1", "x"), ("s1", "p", "o2", "y")]
    b2 = [("s1", "p", "o2", "y-updated"), ("s2", "q", "o1", "z")]
    schema = "subj string, pred string, obj string, v string"

    sink = GraphSink(spark, str(tmp_path))
    for b in (b1, b2):
        sink.upsert(
            spark.createDataFrame(b, schema), "edges",
            keys=["subj", "pred", "obj"], partition_by=["pred"],
        )
    got = {tuple(r) for r in sink.read("edges").select("subj", "pred", "obj", "v").collect()}

    con = duckdb.connect()
    con.sql(
        "CREATE TABLE edges (subj VARCHAR, pred VARCHAR, obj VARCHAR, v VARCHAR,"
        " PRIMARY KEY (subj, pred, obj))"
    )
    for batch in (b1, b2):
        con.executemany(
            "INSERT INTO edges VALUES (?, ?, ?, ?) "
            "ON CONFLICT (subj, pred, obj) DO UPDATE SET v = excluded.v",
            batch,
        )
    want = set(con.sql("SELECT subj, pred, obj, v FROM edges").fetchall())
    assert got == want


def test_versioned_readback_invariants(spark):
    """S8/S9 end-to-end gate invariants at sf0.001, beyond the oracle hash:
    every id appears EXACTLY once per table (MERGE, not append); updated
    ids carry v2 with the new value; untouched ids keep their v1 row; new
    ids exist only under v2; both versions are present in one read."""
    from collections import Counter

    from glasseenterprise_mcp_spark.operators.materialize import (
        versioned_upsert_readback,
    )
    from glasseenterprise_mcp_spark.sources.transcripts import derive_transcripts

    t = derive_transcripts(spark, "/root/testdata/sf0.001")
    rows = versioned_upsert_readback(t).collect()
    for tbl in ("nodes", "edges"):
        sub = [r for r in rows if r.tbl == tbl]
        keys = Counter((r.k1, r.k2) for r in sub)
        assert keys and max(keys.values()) == 1, f"{tbl}: duplicate keys"
        stamps = {r.snapshot_version for r in sub}
        assert stamps == {"v1", "v2"}, f"{tbl}: {stamps}"
    # new-id families appear only under v2
    new_nodes = [
        r for r in rows
        if r.tbl == "edges" and r.k2.startswith("has-user-stat|")
    ]
    assert new_nodes and all(r.snapshot_version == "v2" for r in new_nodes)


def test_iceberg_gate_raises_without_runtime(spark):
    """S10: create_all must fail loudly (not silently no-op) when the
    Iceberg runtime is absent, so a cluster misconfiguration can't corrupt
    the fallback contract."""
    import pytest

    from glasseenterprise_mcp_spark.sources.iceberg_ddl import (
        create_all,
        iceberg_available,
    )

    if iceberg_available(spark):
        create_all(spark)  # real catalog present: must succeed instead
    else:
        with pytest.raises(RuntimeError, match="Iceberg runtime"):
            create_all(spark)


def test_ppm_codec_roundtrip():
    """mm5 codec: encode(formula) → real P6 parse → pixels == formula, for
    assorted dims; malformed blobs fail loudly."""
    import numpy as np
    import pytest

    from glasseenterprise_mcp_spark.operators.multimodal import (
        _decode_ppm,
        _ppm_dims,
    )

    for d in (0, 1, 7, 13, 100, 499):
        w, h = _ppm_dims(d)
        y, x, c = np.ogrid[0:h, 0:w, 0:3]
        px = ((37 * d + 11 * y + 7 * x + 13 * c) % 256).astype(np.uint8)
        blob = f"P6\n{w} {h}\n255\n".encode() + px.tobytes()
        got = _decode_ppm(blob)
        assert got.shape == (h, w, 3)
        assert (got == px).all()

    with pytest.raises(ValueError, match="P6"):
        _decode_ppm(b"P5\n2 2\n255\n" + b"\x00" * 4)
    with pytest.raises(ValueError, match="maxval"):
        _decode_ppm(b"P6\n1 1\n65535\n" + b"\x00" * 3)


def test_wav_codec_roundtrip():
    """mm7 codec: encode(formula) → real RIFF/WAVE parse → samples ==
    formula, for assorted rates/lengths; malformed blobs fail loudly."""
    import struct

    import numpy as np
    import pytest

    from glasseenterprise_mcp_spark.operators.multimodal import (
        _decode_wav,
        _wav_params,
    )

    for d in (0, 1, 2, 13, 100, 499):
        sr, n = _wav_params(d)
        data = (((31 * d + 7 * np.arange(n, dtype=np.int64)) % 2003) - 1001).astype("<i2")
        body = data.tobytes()
        blob = struct.pack(
            "<4sI4s4sIHHIIHH4sI",
            b"RIFF", 36 + len(body), b"WAVE",
            b"fmt ", 16, 1, 1, sr, sr * 2, 2, 16,
            b"data", len(body),
        ) + body
        got_sr, got = _decode_wav(blob)
        assert got_sr == sr and len(got) == n
        assert (got == data).all()

    with pytest.raises(ValueError, match="RIFF"):
        _decode_wav(b"OggS" + b"\x00" * 60)
    # stereo rejected
    blob = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 40, b"WAVE", b"fmt ", 16, 1, 2, 8000, 32000, 4, 16,
        b"data", 4,
    ) + b"\x00" * 4
    with pytest.raises(ValueError, match="PCM16 mono"):
        _decode_wav(blob)


def test_y4m_codec_roundtrip():
    """mm8 codec: encode(formula) → real YUV4MPEG2 parse → planes ==
    formula, frame count right; malformed blobs fail loudly."""
    import numpy as np
    import pytest

    from glasseenterprise_mcp_spark.operators.multimodal import (
        _decode_y4m,
        _y4m_dims,
    )

    for d in (0, 1, 5, 23, 100, 499):
        w, h, n = _y4m_dims(d)
        f, p, y, x = np.ogrid[0:n, 0:3, 0:h, 0:w]
        px = ((29 * d + 17 * f + 13 * p + 11 * y + 7 * x) % 256).astype(np.uint8)
        parts = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C444\n".encode()]
        for fi in range(n):
            parts.append(b"FRAME\n" + px[fi].tobytes())
        got = _decode_y4m(b"".join(parts))
        assert got.shape == (n, 3, h, w)
        assert (got == px).all()

    with pytest.raises(ValueError, match="YUV4MPEG2"):
        _decode_y4m(b"RIFF" + b"\x00" * 60)
    with pytest.raises(ValueError, match="C444"):
        _decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 C420\nFRAME\n" + b"\x00" * 24)
    with pytest.raises(ValueError, match="FRAME"):
        _decode_y4m(b"YUV4MPEG2 W2 H2 C444\nXRAME\n" + b"\x00" * 12)


def test_png_codec_roundtrip_and_malformed():
    """mm9 codec: stdlib PNG encode (filters cycling 0-4, real CRCs) →
    chunk-walk + inflate + unfilter decode → pixels == closed-form formula;
    malformed blobs (signature, truncation, CRC flip, bad filter) fail
    loudly instead of decoding garbage."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from glasseenterprise_mcp_spark.operators.multimodal import (
        _decode_png,
        _encode_png,
        _png_dims,
    )

    hs = []
    for d in (0, 1, 7, 13, 100, 499):
        buf = _encode_png(d)
        w, h = _png_dims(d)
        hs.append(h)
        y, x, c = np.ogrid[0:h, 0:w, 0:3]
        want = ((41 * d + 13 * y + 5 * x + 17 * c) % 256).astype(np.uint8)
        got = _decode_png(buf)
        assert got.shape == (h, w, 3)
        assert (got == want).all()
    assert max(hs) >= 5  # at least one image tall enough to hit all 5 filters

    buf = _encode_png(5)
    with pytest.raises(ValueError, match="not a PNG"):
        _decode_png(b"XXXX" + buf[4:])
    with pytest.raises(ValueError, match="truncated"):
        _decode_png(buf[:30])
    with pytest.raises(ValueError, match="CRC"):
        _decode_png(buf[:20] + bytes([buf[20] ^ 1]) + buf[21:])
    # bad filter type: rebuild the IDAT with filter byte 9 on row 0
    w, h = _png_dims(5)
    (idat_len,) = struct.unpack(">I", buf[8 + 25 : 8 + 25 + 4])
    raw = bytearray(zlib.decompress(buf[8 + 25 + 8 : 8 + 25 + 8 + idat_len]))
    raw[0] = 9
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    bad = (
        buf[:8] + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="filter"):
        _decode_png(bad)


def test_png_codec_property_fuzz():
    """Property: ANY (h, w, 3) uint8 image round-trips through the PNG
    encoder/decoder bit-exactly (hypothesis-driven dims + content — covers
    filter edge cases the fixture formula can't, e.g. saturated rows,
    1-pixel-wide images where the left neighbor is always 0)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from glasseenterprise_mcp_spark.operators.multimodal import (
        _decode_png,
        _encode_png_array,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=12),
        h=st.integers(min_value=1, max_value=12),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def _roundtrip(w, h, seed):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        got = _decode_png(_encode_png_array(px))
        assert got.shape == (h, w, 3)
        assert (got == px).all()

    _roundtrip()


def test_jpeg_codec_roundtrip_and_malformed():
    """mm10 codec: REAL baseline JPEG (grayscale, Annex K tables) — encode
    the closed-form smooth image, decode through the full
    marker/Huffman/dequant/IDCT path, land within the quantization budget
    (observed max err 5 vs tol 12 on fixtures); rough noise images still
    round-trip structurally; malformed inputs fail loudly."""
    import numpy as np
    import pytest

    from glasseenterprise_mcp_spark.operators.multimodal import (
        JPEG_TOL,
        _decode_jpeg_gray,
        _encode_jpeg_gray,
        _jpeg_dims,
        _jpeg_pixels,
    )

    for d in (0, 1, 7, 13, 100, 499):
        px = _jpeg_pixels(d)
        w, h = _jpeg_dims(d)
        dec = _decode_jpeg_gray(_encode_jpeg_gray(px))
        assert px.shape == (h, w) and dec.shape == (h, w)
        err = int(np.abs(dec.astype(int) - px.astype(int)).max())
        assert err <= JPEG_TOL, (d, err)

    # high-frequency content: lossy but structurally sound (shape + the
    # error bounded by a loose DC+AC budget, not the smooth-image budget)
    rng = np.random.default_rng(0)
    noisy = rng.integers(0, 256, size=(24, 33), dtype=np.uint8)
    dec = _decode_jpeg_gray(_encode_jpeg_gray(noisy))
    assert dec.shape == noisy.shape
    assert int(np.abs(dec.astype(int) - noisy.astype(int)).max()) < 160

    buf = _encode_jpeg_gray(_jpeg_pixels(3))
    with pytest.raises(ValueError, match="SOI"):
        _decode_jpeg_gray(b"XX" + buf[2:])
    with pytest.raises(ValueError, match="truncated"):
        _decode_jpeg_gray(buf[:40])
    with pytest.raises(ValueError):
        _decode_jpeg_gray(buf[:-30])
