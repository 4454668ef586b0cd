"""Targeted invariants for the round-15 rework (real resize / real
features — VERDICT r11 ask #3) beyond the oracle-parity hash gate: each
test recomputes the kernel's defining property independently in stdlib
Python from the raw bytes, so a both-engines-wrong implementation cannot
hide behind an agreeing oracle. Also locks the decoder's new strictness
(interlace byte, missing IEND) from ADVICE r11."""

from __future__ import annotations

import zlib

from real_value_etl_spark.operators import multimodal as M

SF = "/root/testdata/sf0.001"


def _ref_grid(data: bytes) -> tuple[list[int], int, int]:
    """Independent recomputation of the encoder's pixel-grid contract."""
    w = len(data) % 11 + 5
    h = max(1, -(-len(data) // w))
    padded = data + b"\x00" * (w * h - len(data))
    return list(padded), w, h


def _ref_downscale(pix: list[int], w: int, h: int) -> tuple[list[int], int, int]:
    ow, oh = (w + 1) // 2, (h + 1) // 2
    out = []
    for r2 in range(oh):
        for c2 in range(ow):
            block = [
                pix[r * w + c]
                for r in (2 * r2, 2 * r2 + 1)
                for c in (2 * c2, 2 * c2 + 1)
                if r < h and c < w
            ]
            out.append(sum(block) // len(block))
    return out, ow, oh


def test_resize_kernel_is_real_box_downscale(spark):
    """encode -> resize -> decode the THUMB wire bytes: recovered pixels
    must equal an independently computed floor-of-mean 2x downscale."""
    samples = [b"the quick brown fox jumps over the lazy dog " * 3,
               bytes(range(256)), b"Z" * 44]
    df = spark.createDataFrame(
        [(i, bytearray(s)) for i, s in enumerate(samples)],
        "doc_id long, payload binary",
    )
    thumbs = {
        r.doc_id: bytes(r.payload)
        for r in M.resize_image(M.encode_png_gray(df)).collect()
    }
    for i, s in enumerate(samples):
        pix, w, h = _ref_grid(s)
        want, ow, oh = _ref_downscale(pix, w, h)
        got = M._decode_png_gray_pixels(thumbs[i])
        assert got is not None, f"thumb {i} not decodable"
        gw, gh, gpix = got
        assert (gw, gh) == (ow, oh)
        assert gpix == want, f"doc {i}: downscaled pixels differ"


def test_feature_kernel_is_real_block_means(spark):
    """Features must be exact 4x4 spatial block means of the decoded grid,
    with exact integer moments that sum back to the whole image."""
    s = b"block mean feature extraction without any fakes left" * 2
    df = spark.createDataFrame([(1, bytearray(s))], "doc_id long, payload binary")
    rows = M.extract_features(M.encode_png_gray(df)).collect()
    pix, w, h = _ref_grid(s)
    want_sums: dict[int, int] = {}
    want_cnts: dict[int, int] = {}
    for k, p in enumerate(pix):
        r, c = divmod(k, w)
        b = (r * 4 // h) * 4 + (c * 4 // w)
        want_sums[b] = want_sums.get(b, 0) + p
        want_cnts[b] = want_cnts.get(b, 0) + 1
    assert len(rows) == 16  # h, w >= 4 here => all blocks populated
    for r in rows:
        assert r.block_sum == want_sums[r.feature_idx]
        assert r.block_n == want_cnts[r.feature_idx]
        assert r.total_sum == sum(pix) and r.total_n == w * h
        assert r.value == r.block_sum / (r.block_n * 255.0)
    assert sum(r.block_sum for r in rows) == sum(pix)
    assert sum(r.block_n for r in rows) == w * h


def _flip_byte(png: bytes, off: int, val: int) -> bytes:
    """Set one IHDR byte and re-stamp the IHDR CRC so only the semantic
    validation (not the checksum) can reject the payload."""
    b = bytearray(png)
    b[off] = val
    b[29:33] = (zlib.crc32(bytes(b[12:29])) & 0xFFFFFFFF).to_bytes(4, "big")
    return bytes(b)


def test_decoder_rejects_interlace_and_truncation():
    """ADVICE r11: interlaced (Adam7) layout and IEND-truncated streams
    must decode to None, never to misinterpreted pixels."""
    png = M._encode_png_gray(b"strict validation please, thanks a lot!!")
    assert M._decode_png_gray_pixels(png) is not None
    # interlace byte (IHDR offset 28) = 1 -> Adam7 -> reject
    assert M._decode_png_gray_pixels(_flip_byte(png, 28, 1)) is None
    # nonzero compression / filter methods -> reject
    assert M._decode_png_gray_pixels(_flip_byte(png, 26, 1)) is None
    assert M._decode_png_gray_pixels(_flip_byte(png, 27, 1)) is None
    # IEND sliced off -> truncated stream -> reject
    assert M._decode_png_gray_pixels(png[:-12]) is None


def test_phash_bits_match_exact_integer_quantization(spark, sf_dir):
    """pHash bit b == (block b at-least-average brightness), recomputed
    independently from the text bytes for a sample of documents."""
    from real_value_etl_spark.queries.all_queries import REGISTRY
    from real_value_etl_spark.queries.registry import table

    d = table(spark, sf_dir, "documents").limit(8)
    feats = M.extract_features(
        M.encode_png_gray(M.attach_binary(d, "doc_id", "text"))
    )
    got: dict[int, int] = {}
    for r in feats.collect():
        if r.block_sum * r.total_n >= r.total_sum * r.block_n:
            got[r.doc_id] = got.get(r.doc_id, 0) | (1 << r.feature_idx)
        else:
            got.setdefault(r.doc_id, 0)
    texts = {r.doc_id: r.text for r in d.collect()}
    for doc_id, text in texts.items():
        pix, w, h = _ref_grid(text.encode())
        sums: dict[int, int] = {}
        cnts: dict[int, int] = {}
        for k, p in enumerate(pix):
            r_, c = divmod(k, w)
            b = (r_ * 4 // h) * 4 + (c * 4 // w)
            sums[b] = sums.get(b, 0) + p
            cnts[b] = cnts.get(b, 0) + 1
        want = 0
        for b in sums:
            if sums[b] * (w * h) >= sum(pix) * cnts[b]:
                want |= 1 << b
        assert got[doc_id] == want, f"doc {doc_id}: phash bits differ"
    assert REGISTRY["multimodal_phash_dedup"].oracle  # still hash-gated


def test_catalyst_inflate_third_engine(spark):
    """Third-engine proof for the full Catalyst inflate: payloads are
    genuine zlib output (CPython builds them), the corpus MUST exercise
    the dynamic-Huffman path, and crafted stored-/fixed-block payloads
    go through the same expression pipeline. A corrupted stream must
    surface as not-ok, never as silently wrong bytes."""
    import hashlib
    import zlib

    from real_value_etl_spark.queries.feature_ops import catalyst_inflate

    def _pseudo_random(n: int) -> bytes:
        out, seed = b"", b"spark"
        while len(out) < n:
            seed = hashlib.sha256(seed).digest()
            out += seed
        return out[:n]

    cases = {
        # varied natural text, no long repeats -> DYNAMIC-Huffman block
        1: (b"pack my box with five dozen liquor jugs while zephyrs vex a "
            b"quick daft jim, then gaze upon sphinx of black quartz and "
            b"judge my vow; amazingly few discotheques provide jukeboxes, "
            b"so the five boxing wizards jump quickly over sixty haphazard "
            b"mounds of frozen jelly.", 9),
        # short string -> FIXED-Huffman wins the cost model
        2: (b"abcabcabcX", 9),
        # incompressible pseudo-random bytes -> STORED block
        3: (_pseudo_random(600), 9),
        # heavy repetition -> long LZ77 matches incl. overlapping copies
        4: (b"ab" * 300, 9),
    }
    payloads = {k: zlib.compress(v, lvl) for k, (v, lvl) in cases.items()}
    btypes = {k: (p[2] >> 1) & 3 for k, p in payloads.items()}
    assert 2 in btypes.values(), f"no dynamic block in fixture: {btypes}"
    assert 0 in btypes.values(), f"no stored block in fixture: {btypes}"
    assert 1 in btypes.values(), f"no fixed block in fixture: {btypes}"
    # corrupted copy of case 1: flip one payload byte mid-stream
    bad = bytearray(payloads[1])
    bad[len(bad) // 2] ^= 0xFF
    df = spark.createDataFrame(
        [(k, bytearray(p)) for k, p in payloads.items()] + [(99, bad)],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in catalyst_inflate(df).collect()}
    for k, (raw, _lvl) in cases.items():
        r = got[k]
        assert r.hdr_ok and r.single_block_ok and r.lens_ok, (k, r)
        assert r.inflate_ok and r.adler_ok, (k, r)
        assert r.n_bytes == len(raw)
        assert r.byte_sum == sum(raw)
        assert r.first_byte == raw[0] and r.last_byte == raw[-1]
        assert r.out_md5 == hashlib.md5(raw).hexdigest(), k
        # and the payload really round-trips through CPython zlib too
        assert zlib.decompress(bytes(payloads[k])) == raw
    r = got[99]
    assert not (r.inflate_ok and r.adler_ok and
                r.out_md5 == hashlib.md5(cases[1][0]).hexdigest()), (
        "corrupted stream decoded 'successfully' to the original bytes"
    )


def test_catalyst_gunzip_third_engine(spark):
    """Third-engine proof for the pure-Catalyst gzip-member decode:
    members come from stdlib gzip.compress (varied mtime — MTIME is
    metadata, not a decode precondition), the recovered bytes must match
    CPython's gunzip, and the member's OWN trailer (CRC-32 + ISIZE) must
    verify on the Catalyst side. A corrupted deflate body must surface
    through the trailer check, never as silently wrong bytes."""
    import gzip
    import hashlib

    from real_value_etl_spark.queries.feature_ops import catalyst_gunzip

    cases = {
        1: b"the quick brown fox jumps over the lazy dog " * 7,
        2: b"abcabcabcX",
        3: bytes(range(256)) * 3,  # low-redundancy spread of all bytes
    }
    payloads = {
        1: gzip.compress(cases[1], 9, mtime=0),
        2: gzip.compress(cases[2], 6, mtime=1234567890),  # nonzero MTIME
        3: gzip.compress(cases[3], 9, mtime=0),
    }
    # corrupted copy of case 1: flip a byte inside the deflate body
    bad = bytearray(payloads[1])
    bad[12] ^= 0xFF
    df = spark.createDataFrame(
        [(k, bytearray(p)) for k, p in payloads.items()] + [(99, bad)],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in catalyst_gunzip(df).collect()}
    for k, raw in cases.items():
        r = got[k]
        assert r.gzip_hdr_ok and r.single_block_ok and r.lens_ok, (k, r)
        assert r.inflate_ok and r.crc32_ok and r.isize_ok, (k, r)
        assert r.n_bytes == len(raw)
        assert r.byte_sum == sum(raw)
        assert r.first_byte == raw[0] and r.last_byte == raw[-1]
        assert r.out_md5 == hashlib.md5(raw).hexdigest(), k
        # and the member really round-trips through CPython gzip too
        assert gzip.decompress(payloads[k]) == raw
    r = got[99]
    assert not (r.inflate_ok and r.crc32_ok and
                r.out_md5 == hashlib.md5(cases[1]).hexdigest()), (
        "corrupted member decoded 'successfully' to the original bytes"
    )


def test_catalyst_unzip_third_engine(spark):
    """Third-engine proof for the pure-Catalyst ZIP extraction: archives
    come from stdlib `zipfile` (varied names, comment lengths, and
    content classes — repetitive text, short strings, incompressible
    bytes whose raw-deflate emits STORED blocks), CPython's ZipFile
    must independently validate each fixture (testzip + CRC on read),
    and the Catalyst side must recover the same metadata and bytes. A
    corrupted deflate body must surface through the CD CRC-32 check,
    never as silently wrong bytes."""
    import hashlib
    import io
    import zipfile

    from real_value_etl_spark.queries.feature_ops import catalyst_unzip

    def _pseudo_random(n: int) -> bytes:
        out, seed = b"", b"unzip"
        while len(out) < n:
            seed = hashlib.sha256(seed).digest()
            out += seed
        return out[:n]

    cases = {
        1: ("doc1.txt", b"spark catalyst inflate " * 20, 0),
        2: ("nested/path/x.bin", b"tiny", 7),
        3: ("r.dat", _pseudo_random(600), 39),  # stored-block deflate
    }
    payloads = {}
    for k, (name, data, clen) in cases.items():
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.comment = b"c" * clen
            zi = zipfile.ZipInfo(name)
            zf.writestr(zi, data, compress_type=zipfile.ZIP_DEFLATED,
                        compresslevel=9)
        payloads[k] = buf.getvalue()
        # CPython third engine: the fixture is a genuinely valid archive
        with zipfile.ZipFile(io.BytesIO(payloads[k])) as zf:
            assert zf.testzip() is None
            assert zf.read(name) == data
    # corrupted copy of case 1: flip a byte inside the deflate body
    bad = bytearray(payloads[1])
    bad[40] ^= 0xFF  # past the 30-byte LFH + 8-char name: deflate body
    df = spark.createDataFrame(
        [(k, bytearray(p)) for k, p in payloads.items()] + [(99, bad)],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in catalyst_unzip(df).collect()}
    for k, (name, data, clen) in cases.items():
        r = got[k]
        assert r.eocd_found and r.sig_chain_ok and r.names_match, (k, r)
        assert r.comment_len == clen and r.n_entries == 1, (k, r)
        assert r.fname == name and r.method == 8, (k, r)
        assert r.sizes_ok and r.inflate_ok and r.crc32_ok, (k, r)
        assert r.n_bytes == len(data) and r.byte_sum == sum(data)
        assert r.out_md5 == hashlib.md5(data).hexdigest(), k
    r = got[99]
    assert not (r.inflate_ok and r.crc32_ok and
                r.out_md5 == hashlib.md5(cases[1][1]).hexdigest()), (
        "corrupted entry extracted 'successfully' to the original bytes"
    )


def test_catalyst_tfrecord_walk_third_engine(spark):
    """Third-engine proof for the pure-Catalyst TFRecord walk: the
    CRC-32C implementation is pinned to the public check vector, wires
    are framed by an independent pure-Python writer here (not the Arrow
    kernel), a minimal pure-Python TFRecord reader re-walks the Arrow
    kernel's output, and a corrupted data CRC must flip data_crc_ok —
    never pass silently."""
    import hashlib
    import struct

    from real_value_etl_spark.operators.multimodal import (
        crc32c,
        tfrecord_mask,
    )
    from real_value_etl_spark.queries.feature_ops import (
        catalyst_tfrecord_walk,
    )

    # the public Castagnoli check vector + a masking sanity identity
    assert crc32c(b"123456789") == 0xE3069283
    assert tfrecord_mask(0) == 0xA282EAD8

    def frame(chunks):
        out = b""
        for c in chunks:
            lb = struct.pack("<Q", len(c))
            out += (
                lb
                + struct.pack("<I", tfrecord_mask(crc32c(lb)))
                + c
                + struct.pack("<I", tfrecord_mask(crc32c(c)))
            )
        return out

    cases = {
        1: [b"alpha record", b"second"],
        2: [b"x", b"yy", b"zzz", b"tail record four"],
        3: [b"single-record chain"],
    }
    payloads = {k: frame(v) for k, v in cases.items()}
    # corrupted copy of case 1: flip one bit inside the FIRST data CRC
    bad = bytearray(payloads[1])
    bad[12 + len(cases[1][0])] ^= 0x01
    df = spark.createDataFrame(
        [(k, bytearray(p)) for k, p in payloads.items()] + [(99, bad)],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in catalyst_tfrecord_walk(df).collect()}
    for k, chunks in cases.items():
        r = got[k]
        assert r.n_records == len(chunks), (k, r)
        assert r.length_crc_ok and r.data_crc_ok and r.framing_ok, (k, r)
        assert r.data_bytes_sum == sum(len(c) for c in chunks)
        assert r.bodies_md5 == hashlib.md5(b"".join(chunks)).hexdigest()
        assert r.last_len == len(chunks[-1])
        assert r.total_len == len(payloads[k])
    r = got[99]
    assert not r.data_crc_ok and r.length_crc_ok, r

    # and the Arrow kernel's wire re-reads with an independent reader
    from real_value_etl_spark.operators.multimodal import (
        TFRECORD_PAD,
        _tfrecord_batches,
    )
    import pandas as pd

    src = pd.DataFrame(
        {"doc_id": [7], "payload": [b"kernel wire check payload bytes"]}
    )
    wire = next(_tfrecord_batches(iter([src])))["payload"][0]
    pos, bodies = 0, b""
    while pos < len(wire):
        (bl,) = struct.unpack("<Q", wire[pos : pos + 8])
        (mc,) = struct.unpack("<I", wire[pos + 8 : pos + 12])
        assert mc == tfrecord_mask(crc32c(wire[pos : pos + 8]))
        data = wire[pos + 12 : pos + 12 + bl]
        (dc,) = struct.unpack("<I", wire[pos + 12 + bl : pos + 16 + bl])
        assert dc == tfrecord_mask(crc32c(data))
        bodies += data
        pos += 16 + bl
    pad = b"kernel wire check payload bytes".ljust(TFRECORD_PAD, b" ")
    assert bodies == pad[: len(bodies)]


def test_catalyst_sqlite_scan_third_engine(spark):
    """Third-engine proof for the pure-Catalyst SQLite scan: the Arrow
    kernel's bytes must deserialize into a REAL queryable database
    (stdlib sqlite3 runs actual SQL over them), the Catalyst walk must
    recover the same schema row and data rows, and structural
    corruption (magic, page type) must flip the verdict flags."""
    import hashlib
    import sqlite3

    import pandas as pd

    from real_value_etl_spark.operators.multimodal import (
        SQLITE_DDL_TAIL,
        _sqlite_batches,
    )
    from real_value_etl_spark.queries.feature_ops import catalyst_sqlite_scan

    texts = {
        11: b"the quick brown fox jumps over the lazy dog padding text",
        1000: b"zero-valued first int row exercises serial type 8",
        1001: b"one-valued first int row exercises serial type 9",
        42137: b"large ints in later rows exercise the 2-byte int type",
    }
    src = pd.DataFrame(
        {"doc_id": list(texts), "payload": list(texts.values())}
    )
    wire = {
        int(d): bytes(b)
        for d, b in zip(*(lambda w: (w["doc_id"], w["payload"]))(
            next(_sqlite_batches(iter([src])))
        ))
    }
    expected = {}
    for did, b in wire.items():
        con = sqlite3.connect(":memory:")
        con.deserialize(b)
        rows = con.execute(
            f"SELECT rowid, a, b FROM t{did} ORDER BY rowid"
        ).fetchall()
        (sql,) = con.execute(
            "SELECT sql FROM sqlite_master WHERE type='table'"
        ).fetchone()
        con.close()
        assert sql == f"CREATE TABLE t{did}{SQLITE_DDL_TAIL}"
        assert len(rows) == did % 5 + 1
        assert [r[1] for r in rows] == [
            (did + 31 * r) % 1000 for r in range(len(rows))
        ]
        expected[did] = (
            len(rows),
            sum(r[1] for r in rows),
            sum(r[0] for r in rows),
            hashlib.md5("".join(r[2] for r in rows).encode()).hexdigest(),
            sql,
        )
    bad_magic = b"X" + wire[11][1:]
    bad_page = bytearray(wire[11])
    bad_page[4096] = 5  # interior-page type where the leaf should be
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in wire.items()]
        + [(98, bytearray(bad_magic)), (99, bytes(bad_page))],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in catalyst_sqlite_scan(df).collect()}
    for did, (n, sum_a, rid_sum, bmd5, sql) in expected.items():
        r = got[did]
        assert r.magic_ok and r.enc_utf8 and r.master_ok, (did, r)
        assert r.wide_varints_ok and r.rows_ok, (did, r)
        assert (r.page_size, r.n_pages) == (4096, 2)
        assert r.tbl_name == f"t{did}" and r.rootpage == 2
        assert r.sql == sql
        assert (r.n_rows, r.sum_a, r.rowid_sum) == (n, sum_a, rid_sum)
        assert r.bodies_md5 == bmd5, did
    assert not got[98].magic_ok
    assert not got[99].rows_ok and got[99].master_ok


def test_catalyst_avro_walk_third_engine(spark):
    """Third-engine proof for the pure-Catalyst Avro OCF walk: wires are
    framed by an independent writer HERE (not the Arrow kernel),
    including a NEGATIVE long (zigzag's raison d'etre) and a 3-byte
    varint; a corrupted sync marker and an inflated block size must flip
    the verdicts, never pass silently."""
    import hashlib

    from real_value_etl_spark.operators.multimodal import (
        AVRO_SCHEMA_JSON,
        avro_zigzag_varint as zz,
    )
    from real_value_etl_spark.queries.feature_ops import catalyst_avro_walk

    # zigzag unit identities (Avro spec examples)
    assert zz(0) == b"\x00" and zz(-1) == b"\x01" and zz(1) == b"\x02"
    assert zz(-64) == b"\x7f" and zz(64) == b"\x80\x01"

    def ocf(blocks, sync):
        meta = zz(2)
        for k, v in ((b"avro.schema", AVRO_SCHEMA_JSON.encode()),
                     (b"avro.codec", b"null")):
            meta += zz(len(k)) + k + zz(len(v)) + v
        meta += zz(0)
        out = b"Obj\x01" + meta + sync
        for blk in blocks:
            data = b"".join(zz(a) + zz(len(s)) + s for a, s in blk)
            out += zz(len(blk)) + zz(len(data)) + data + sync
        return out

    sync = hashlib.md5(b"avro-test").digest()
    cases = {
        1: [[(3, b"one block"), (70000, b"three-byte varint")]],
        2: [[(0, b"a"), (127, b"bb")], [(-5, b"negative zigzag")]],
    }
    payloads = {k: ocf(v, sync) for k, v in cases.items()}
    bad_sync = bytearray(payloads[1])
    bad_sync[-1] ^= 0xFF  # trailing block sync no longer matches header
    bad_size = bytearray(payloads[1])
    # the block's declared byte size is the 2nd varint after the header
    # sync; patch it (single byte here) to a wrong but parseable value
    hdr_len = len(ocf([], sync))
    assert bad_size[hdr_len + 1] == zz(len(b"".join(
        zz(a) + zz(len(s)) + s for a, s in cases[1][0]
    )))[0]
    bad_size[hdr_len + 1] = zz(7)[0]
    df = spark.createDataFrame(
        [(k, bytearray(p)) for k, p in payloads.items()]
        + [(98, bytes(bad_sync)), (99, bytes(bad_size))],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in catalyst_avro_walk(df).collect()}
    for k, blocks in cases.items():
        r = got[k]
        flat = [rec for blk in blocks for rec in blk]
        assert r.magic_ok and r.sync_ok and r.sizes_ok, (k, r)
        assert r.n_meta == 2 and r.codec == "null"
        assert r.schema_len == len(AVRO_SCHEMA_JSON)
        assert r.n_blocks == len(blocks) and r.n_records == len(flat)
        assert r.sum_a == sum(a for a, _ in flat)
        assert r.bodies_md5 == hashlib.md5(
            b"".join(s for _, s in flat)
        ).hexdigest(), k
    assert not got[98].sync_ok
    assert not got[99].sizes_ok


def test_catalyst_protobuf_walk_third_engine(spark):
    """Third-engine proof for the pure-Catalyst protobuf walk: varint
    encoding pinned to the protobuf docs' canonical example (300 ->
    ac 02), wires framed by an independent encoder HERE, a message with
    REORDERED fields (protobuf permits any field order) and one with a
    2-byte-varint packed slab; an inflated packed-slab length must
    never decode to the original message (it surfaces through framing
    and field corruption — without a schema a longer slab legitimately
    swallows the next field's bytes, exactly what real protobuf
    decoders do)."""
    import hashlib

    from real_value_etl_spark.operators.multimodal import proto_varint as pv
    from real_value_etl_spark.queries.feature_ops import (
        catalyst_protobuf_walk,
    )

    assert pv(300) == b"\xac\x02"  # the protobuf encoding-doc example
    assert pv(1) == b"\x01" and pv(127) == b"\x7f" and pv(128) == b"\x80\x01"

    def msg(fields):
        out = b""
        for fn, wt, val in fields:
            out += pv(fn << 3 | wt)
            if wt == 0:
                out += pv(val)
            else:
                out += pv(len(val)) + val
        return out

    body = b"nine char"
    packed_small = pv(7) + pv(300) + pv(999)
    cases = {
        1: msg([(1, 0, 41), (2, 2, body), (3, 2, packed_small),
                (4, 0, 6), (9, 0, 13)]),
        # reordered fields + an unknown LEN-delimited field to skip
        2: msg([(4, 0, 3), (3, 2, pv(500)), (2, 2, body),
                (8, 2, b"opaque-ext"), (1, 0, 1000000)]),
    }
    expect = {
        1: dict(n_fields=5, id_val=41, n_vals=3, vals_sum=7 + 300 + 999,
                flags=6, unknown_skipped=1),
        2: dict(n_fields=5, id_val=1000000, n_vals=1, vals_sum=500,
                flags=3, unknown_skipped=1),
    }
    bad = bytearray(cases[1])
    # inflate the packed slab's declared length past its actual varints
    slab_off = cases[1].index(bytes([3 << 3 | 2])) + 1
    assert bad[slab_off] == len(packed_small)
    bad[slab_off] = len(packed_small) + 1
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in cases.items()]
        + [(99, bytes(bad))],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in catalyst_protobuf_walk(df).collect()}
    for k, e in expect.items():
        r = got[k]
        for f, want in e.items():
            assert getattr(r, f) == want, (k, f, getattr(r, f), want)
        assert r.body_md5 == hashlib.md5(body).hexdigest()
        assert r.packed_ok and r.framing_ok, (k, r)
    r = got[99]
    assert not (r.framing_ok and r.flags == 6 and r.unknown_skipped == 1), r
