"""io.gzfast: raw-inflate streaming reader + libdeflate member writer."""

import gzip
import io
import struct
import zlib

import numpy as np
import pytest

from ribodetector_tpu.io.gzfast import (
    BadGzipFile,
    MemberGzipWriter,
    RawInflater,
    crc32,
)


def drain(inf, blob, block=997, max_length=1 << 20):
    """Feed blob in odd-sized blocks, collecting all output."""
    out = []
    carry = b""
    pos = 0
    while pos < len(blob) or carry:
        if carry:
            raw, carry = carry, b""
        else:
            raw = blob[pos : pos + block]
            pos += block
        o, carry = inf.decompress(raw, max_length)
        out.append(o)
    out.append(inf.flush())
    return b"".join(out)


def test_crc32_matches_zlib(rng):
    data = rng.integers(0, 256, 100000).astype(np.uint8).tobytes()
    assert crc32(data) == zlib.crc32(data)
    # incremental
    c = crc32(data[:1234])
    assert crc32(data[1234:], c) == zlib.crc32(data)


def test_single_member_roundtrip(rng):
    data = rng.integers(0, 256, 300000).astype(np.uint8).tobytes()
    assert drain(RawInflater(), gzip.compress(data, 5)) == data


def test_multi_member_and_tiny_blocks(rng):
    parts = [bytes([65 + i]) * (1000 + i) for i in range(5)]
    blob = b"".join(gzip.compress(p) for p in parts)
    for block in (1, 7, 64, 10**6):
        inf = RawInflater()
        assert drain(inf, blob, block=block) == b"".join(parts)
        assert inf.members == 5
        assert not inf.mid_stream


def test_max_length_cap_at_member_boundary():
    # the zlib quirk that hung the old code: member ends inside a
    # max_length-truncated call (both unconsumed_tail and unused_data set)
    blob = gzip.compress(b"x" * 5000) + gzip.compress(b"y" * 5000)
    inf = RawInflater()
    out, carry = inf.decompress(blob, 200)
    total = out
    for _ in range(200):
        if not carry:
            break
        out, carry = inf.decompress(carry, 200)
        total += out
    assert total == b"x" * 5000 + b"y" * 5000
    assert inf.members == 2


def test_header_variants():
    data = b"payload-bytes" * 100
    # FNAME + FCOMMENT + FHCRC + FEXTRA, hand-built header
    body = zlib.compress(data, 6)[2:-4]  # raw deflate
    hdr = bytearray(b"\x1f\x8b\x08")
    hdr.append(2 | 4 | 8 | 16)  # FHCRC | FEXTRA | FNAME | FCOMMENT
    hdr += b"\0\0\0\0\x00\xff"
    extra = b"BC\x02\x00\x42\x00"
    hdr += struct.pack("<H", len(extra)) + extra
    hdr += b"some name\0"
    hdr += b"a comment\0"
    hdr += struct.pack("<H", zlib.crc32(bytes(hdr)) & 0xFFFF)
    blob = (
        bytes(hdr)
        + body
        + struct.pack("<II", zlib.crc32(data), len(data) & 0xFFFFFFFF)
    )
    assert gzip.decompress(blob) == data  # sanity: stdlib agrees it's valid
    for block in (3, 50000):
        assert drain(RawInflater(), blob, block=block) == data


def test_crc_mismatch_raises():
    blob = bytearray(gzip.compress(b"z" * 4096))
    blob[-5] ^= 0xFF  # corrupt stored CRC
    with pytest.raises(BadGzipFile, match="CRC"):
        drain(RawInflater(), bytes(blob))
    # corrupted ISIZE
    blob = bytearray(gzip.compress(b"z" * 4096))
    blob[-1] ^= 0xFF
    with pytest.raises(BadGzipFile, match="length"):
        drain(RawInflater(), bytes(blob))


def test_not_gzip_raises():
    with pytest.raises(BadGzipFile, match="Not a gzipped"):
        RawInflater().decompress(b"@r1\nACGT\n+\nIIII\n", 100)


def test_member_writer_roundtrip(rng):
    buf = io.BytesIO()
    w = MemberGzipWriter(buf)
    payloads = [
        rng.integers(65, 91, n).astype(np.uint8).tobytes() for n in (10, 100000, 3)
    ]
    for p in payloads:
        w.write(p)
    w.write(b"")  # no empty member emitted
    w.write(memoryview(bytearray(b"tail-payload")))  # zero-copy path
    w.flush()
    blob = buf.getvalue()  # before close(): close() closes the sink too
    w.close()
    assert gzip.decompress(blob) == b"".join(payloads) + b"tail-payload"
    # and our own reader handles the multi-member output
    assert drain(RawInflater(), blob) == b"".join(payloads) + b"tail-payload"


def test_open_for_write_bytes_gz_content(tmp_path):
    from ribodetector_tpu.io.writer import open_for_write_bytes

    path = str(tmp_path / "out.fq.gz")
    fh = open_for_write_bytes(path)
    fh.write(b"@r\nACGT\n+\nIIII\n")
    fh.close()
    with gzip.open(path, "rb") as gz:
        assert gz.read() == b"@r\nACGT\n+\nIIII\n"


def test_compress_member_standalone_and_threaded(rng):
    from concurrent.futures import ThreadPoolExecutor

    from ribodetector_tpu.io.gzfast import compress_member

    blocks = [
        rng.integers(65, 91, n).astype(np.uint8).tobytes()
        for n in (5, 70000, 1 << 20)
    ]
    # each result is a standalone gzip member; concatenation is a valid file
    with ThreadPoolExecutor(3) as pool:
        members = list(pool.map(compress_member, blocks))
    for blk, member in zip(blocks, members):
        assert gzip.decompress(member) == blk
    assert gzip.decompress(b"".join(members)) == b"".join(blocks)
    # writable-view input (the writer passes memoryviews into scratch
    # bytearrays) compresses identically
    assert gzip.decompress(
        compress_member(memoryview(bytearray(blocks[1])))
    ) == blocks[1]


def test_writer_parallel_gz_preserves_order(tmp_path, rng):
    """Large payloads split into pool-compressed members must land in
    submission order and decompress byte-identically."""
    from ribodetector_tpu.io.writer import open_for_write_bytes
    from ribodetector_tpu.runtime.native_pipeline import _Writer

    path = str(tmp_path / "out.fq.gz")
    fh = open_for_write_bytes(path)
    w = _Writer(compress_threads=3)
    payloads = []
    for i in range(6):
        # > _Writer.BLOCK so each splits into multiple parallel members
        payloads.append(
            rng.integers(65, 91, (3 << 20) + i).astype(np.uint8).tobytes()
        )
        payloads.append(b"small-%d\n" % i)  # serial path interleaved
    for p in payloads:
        if len(p) > 1000:
            scratch = w.acquire_scratch()
            scratch[:] = p
            w.write(fh, memoryview(scratch), scratch=scratch)
        else:
            w.write(fh, p)
    w.barrier()
    w.close()
    fh.close()
    with gzip.open(path, "rb") as gz:
        assert gz.read() == b"".join(payloads)


def test_gz_level_flag_end_to_end(tmp_path):
    """--gz-level changes the deflate level of native gz outputs: content
    identical across levels, level-1 files larger (less compression), and
    both remain valid multi-member gzip."""
    import gzip

    from ribodetector_tpu import native
    from ribodetector_tpu.cli import main as cli_main

    if not native.available():
        pytest.skip("native extension unavailable")
    rng = np.random.default_rng(31)
    inp = tmp_path / "in.fq"
    with open(inp, "w") as fh:
        for i in range(3000):
            s = "".join(rng.choice(list("ACGT"), size=80))
            fh.write(f"@g{i}\n{s}\n+\n{'I' * 80}\n")
    for lvl in ("3", "1"):
        cli_main(["-l", "80", "-i", str(inp),
                  "-o", str(tmp_path / f"o{lvl}.fq.gz"),
                  "-r", str(tmp_path / f"r{lvl}.fq.gz"),
                  "-m", "3", "--chunk_size", "1", "--kernel", "scan",
                  "--gz-level", lvl])
    for stem in ("o", "r"):
        c3 = gzip.open(tmp_path / f"{stem}3.fq.gz").read()
        c1 = gzip.open(tmp_path / f"{stem}1.fq.gz").read()
        assert c3 == c1
    sz3 = (tmp_path / "o3.fq.gz").stat().st_size
    sz1 = (tmp_path / "o1.fq.gz").stat().st_size
    assert sz1 > sz3  # level 1 trades ratio for speed


def test_config_gz_level_out_of_range_rejected(tmp_path):
    """runtime.gz_level from the config bypasses the CLI choices check; the
    Predictor must validate it (an invalid level would make libdeflate
    return a NULL compressor -- a crash in the parallel-compress path)."""
    from types import SimpleNamespace

    from ribodetector_tpu.config import ConfigParser, DEFAULT_CONFIG
    from ribodetector_tpu.runtime import Predictor

    cfg = ConfigParser.from_json(DEFAULT_CONFIG)
    cfg.config.setdefault("runtime", {})["gz_level"] = 13
    inp = tmp_path / "in.fq"
    inp.write_text("@a\nACGT\n+\nIIII\n")
    args = SimpleNamespace(
        len=60, input=[str(inp)], output=[str(tmp_path / "o.fq")], rrna=None,
        ensure="none", threads=1, memory=3, chunk_size=1, log=None,
        profile=False, trace_dir=None, resume=False, semantics=None,
        kernel="scan", precision=None, buckets=None, hosts=1, host_id=0,
        coordinator=None, num_hosts=None, deviceid=None, config=None,
        gz_level=None, barrier_timeout=None,
    )
    p = Predictor(cfg, args)
    p.load_model()
    with pytest.raises(RuntimeError, match="gz_level"):
        p.detect()


def test_member_writer_rejects_null_compressor_level(tmp_path):
    from ribodetector_tpu.io.gzfast import MemberGzipWriter, _libdeflate

    if _libdeflate() is None:
        pytest.skip("libdeflate unavailable")
    with pytest.raises(ValueError, match="rejected compression level"):
        MemberGzipWriter(open(tmp_path / "x.gz", "wb"), level=99)


def test_truncated_gz_input_fails_cleanly(tmp_path):
    """A gz input truncated mid-stream must abort the run with a clear
    error (propagated from the inflate thread), never hang or silently
    emit a partial partition."""
    import gzip
    import signal

    from ribodetector_tpu import native
    from ribodetector_tpu.cli import main as cli_main

    if not native.available():
        pytest.skip("native extension unavailable")
    rng = np.random.default_rng(41)
    plain = b"".join(
        b"@t%d\n%s\n+\n%s\n"
        % (i, rng.choice(np.frombuffer(b"ACGT", np.uint8), 70).tobytes(), b"I" * 70)
        for i in range(5000)
    )
    gz = gzip.compress(plain)
    (tmp_path / "in.fq.gz").write_bytes(gz[: len(gz) // 2])  # truncated

    def alarm(*_):
        raise AssertionError("truncated-gz run hung")

    old = signal.signal(signal.SIGALRM, alarm)
    signal.alarm(120)
    try:
        with pytest.raises(EOFError, match="end-of-stream marker"):
            cli_main(["-l", "70", "-i", str(tmp_path / "in.fq.gz"),
                      "-o", str(tmp_path / "o.fq"), "-m", "3",
                      "--chunk_size", "1", "--kernel", "scan"])
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def test_many_small_members_bgzf_style_through_cli(tmp_path):
    """A bgzf-style input (hundreds of small gzip members, the
    htslib/samtools block format) must classify identically to the same
    records in a single-member gz (member boundaries mid-record included)."""
    from ribodetector_tpu import native
    from ribodetector_tpu.cli import main as cli_main
    from ribodetector_tpu.io.gzfast import compress_member

    if not native.available():
        pytest.skip("native extension unavailable")
    rng = np.random.default_rng(53)
    recs = b"".join(
        b"@m%d\n%s\n+\n%s\n"
        % (i, rng.choice(np.frombuffer(b"ACGT", np.uint8), 70).tobytes(),
           b"I" * 70)
        for i in range(4000)
    )
    # 1 KB members: boundaries fall mid-record constantly
    bgzf = b"".join(compress_member(recs[o:o + 1024])
                    for o in range(0, len(recs), 1024))
    (tmp_path / "bgzf.fq.gz").write_bytes(bgzf)
    import gzip as _g

    (tmp_path / "plain.fq.gz").write_bytes(_g.compress(recs))
    for tag in ("bgzf", "plain"):
        cli_main(["-l", "70", "-i", str(tmp_path / f"{tag}.fq.gz"),
                  "-o", str(tmp_path / f"{tag}o.fq"),
                  "-r", str(tmp_path / f"{tag}r.fq"),
                  "-m", "3", "--chunk_size", "1", "--kernel", "scan"])
    assert (tmp_path / "bgzfo.fq").read_bytes() == (tmp_path / "plaino.fq").read_bytes()
    assert (tmp_path / "bgzfr.fq").read_bytes() == (tmp_path / "plainr.fq").read_bytes()


def test_crc32_typed_buffer_uses_byte_length():
    """crc32 must checksum nbytes, not element count: an itemsize>1 buffer
    previously hashed only the first len(data) BYTES via libdeflate while
    the zlib fallback hashed all of them (round-4 review finding)."""
    import array

    a = array.array("I", range(100))
    assert crc32(a) == zlib.crc32(a)
    assert crc32(memoryview(a)) == zlib.crc32(a)


def test_set_level_mid_stream_mixed_members(rng):
    """set_level at a member boundary: mixed-level members stay one valid
    gzip stream with identical decompressed content."""
    buf = io.BytesIO()
    w = MemberGzipWriter(buf)
    a = rng.integers(65, 91, 200000).astype(np.uint8).tobytes()
    b = rng.integers(65, 91, 200000).astype(np.uint8).tobytes()
    w.write(a)
    assert w.level == MemberGzipWriter.LEVEL
    w.set_level(1)
    assert w.level == 1
    w.write(b)
    w.set_level(1)  # no-op path
    blob = buf.getvalue()
    w.close()
    assert gzip.decompress(blob) == a + b
    assert drain(RawInflater(), blob) == a + b


def test_writer_adaptive_level_drop(tmp_path, rng, monkeypatch):
    """A persistently starved scratch pool drops the gz level to 1 for the
    rest of the run -- pool-compressed AND streaming members -- with
    content identical; an explicit level disables adaptation."""
    import threading
    import time

    from ribodetector_tpu.io.writer import open_for_write_bytes
    from ribodetector_tpu.runtime.native_pipeline import _Writer

    monkeypatch.setattr(_Writer, "ADAPT_MIN_BLOCKED", 0.01)
    monkeypatch.setattr(_Writer, "ADAPT_FRAC", 0.0)

    drops = []
    w = _Writer(compress_threads=2, on_level_drop=drops.append)
    assert w._adapt
    # drain the free pool, then return one buffer late to force a blocking
    # acquire long enough to cross the (patched) thresholds
    held = [w._free.get_nowait() for _ in range(w._free.qsize())]

    def give_back():
        time.sleep(0.05)
        w._free.put(held.pop())

    threading.Thread(target=give_back).start()
    s = w.acquire_scratch()
    assert w._dropped and w._gz_level == _Writer.ADAPT_LEVEL
    assert drops == [_Writer.ADAPT_LEVEL]
    for h in held:
        w._free.put(h)
    w._free.put(s)

    # post-drop: both compression paths emit valid (level-1) members and
    # the streaming handle is switched as its first item passes
    path = str(tmp_path / "out.fq.gz")
    fh = open_for_write_bytes(path)
    big = rng.integers(65, 91, (3 << 20)).astype(np.uint8).tobytes()
    scratch = w.acquire_scratch()
    scratch[:] = big
    w.write(fh, memoryview(scratch), scratch=scratch)  # pool path
    w.write(fh, b"small-serial-payload\n")  # streaming path
    w.barrier()
    assert fh.level == _Writer.ADAPT_LEVEL
    w.close()
    fh.close()
    with gzip.open(path, "rb") as gz:
        assert gz.read() == big + b"small-serial-payload\n"

    # explicit level: adaptation off
    w2 = _Writer(compress_threads=0, gz_level=5)
    assert not w2._adapt
    w2.close()


def test_hinted_members_fast_path_and_compat(rng):
    """compress_member/MemberGzipWriter emit 'RD' member-length hints: our
    reader one-shot-decodes whole members (fast_members counts), Python's
    gzip module still reads them (FEXTRA skipped per RFC 1952), and
    hint-less foreign members interleave fine."""
    from ribodetector_tpu.io.gzfast import compress_member

    a = rng.integers(65, 91, 300000).astype(np.uint8).tobytes()
    b = rng.integers(65, 91, 123457).astype(np.uint8).tobytes()
    c = rng.integers(65, 91, 5000).astype(np.uint8).tobytes()
    blob = compress_member(a) + gzip.compress(b) + compress_member(c)
    # foreign readers accept hinted members
    assert gzip.decompress(blob) == a + b + c
    # whole-buffer feed: both hinted members take the fast path
    inf = RawInflater()
    out, left = inf.decompress(blob, 1 << 30)
    assert out + inf.flush() == a + b + c and not left
    assert inf.members == 3 and inf.fast_members == 2
    # streaming writer members are hinted too
    buf = io.BytesIO()
    w = MemberGzipWriter(buf)
    w.write(a)
    w.write(c)
    w.flush()
    stream = buf.getvalue()  # before close(): close() closes the sink too
    w.close()
    inf = RawInflater()
    out, left = inf.decompress(stream, 1 << 30)
    assert out == a + c and inf.fast_members == 2


def test_hinted_member_split_across_feeds_stashes(rng):
    """A hinted member that spans input blocks is STASHED until complete
    and still decodes via the one-shot path (bgzf-style buffering; without
    it only alignment-lucky members would ever go fast). Multi-member
    streams with tiny feeds stay correct too."""
    from ribodetector_tpu.io.gzfast import compress_member

    a = rng.integers(65, 91, 200000).astype(np.uint8).tobytes()
    b = rng.integers(65, 91, 70001).astype(np.uint8).tobytes()
    blob = compress_member(a) + compress_member(b)
    inf = RawInflater()
    assert drain(inf, blob, block=1000) == a + b
    assert inf.members == 2 and inf.fast_members == 2


def test_hinted_member_bad_hint_falls_back(rng):
    """A lying 'RD' length hint must not corrupt decoding: the fast path
    disagrees and the streaming path decodes the member correctly."""
    from ribodetector_tpu.io.gzfast import _HINT_HDR_LEN, compress_member

    a = rng.integers(65, 91, 100000).astype(np.uint8).tobytes()
    blob = bytearray(compress_member(a))
    # overwrite the u32 hint (at offset 16) with nonsense that still
    # points inside the buffer
    struct.pack_into("<I", blob, 16, _HINT_HDR_LEN + 50)
    inf = RawInflater()
    out, left = inf.decompress(bytes(blob), 1 << 30)
    assert out + inf.flush() == a
    assert inf.fast_members == 0


def test_hinted_member_corrupt_crc_still_raises(rng):
    """Corrupting a hinted member's payload must still raise the CRC
    error (the fast path declines, the streaming re-decode verifies)."""
    from ribodetector_tpu.io.gzfast import compress_member

    a = rng.integers(65, 91, 100000).astype(np.uint8).tobytes()
    blob = bytearray(compress_member(a))
    blob[len(blob) // 2] ^= 0xFF
    inf = RawInflater()
    with pytest.raises(BadGzipFile):
        inf.decompress(bytes(blob), 1 << 30)


def test_hinted_member_budget_cap_streams(rng):
    """max_length smaller than the member's ISIZE: the fast path declines
    and the capped streaming contract holds unchanged."""
    from ribodetector_tpu.io.gzfast import compress_member

    a = rng.integers(65, 91, 300000).astype(np.uint8).tobytes()
    blob = compress_member(a)
    inf = RawInflater()
    assert drain(inf, blob, block=1 << 30, max_length=10000) == a
    assert inf.fast_members == 0


def test_overshooting_hint_past_eof_recovers_trailing_members(rng):
    """A hint lying PAST the end of the stream (corrupt u32, or a foreign
    'RD' subfield with different semantics) must not swallow intact
    members: flush() re-runs the member machine over the stash and
    mid_stream clears, so fully-decodable files decode fully."""
    from ribodetector_tpu.io.gzfast import compress_member

    a = rng.integers(65, 91, 120000).astype(np.uint8).tobytes()
    b = rng.integers(65, 91, 90001).astype(np.uint8).tobytes()
    blob = bytearray(compress_member(a) + compress_member(b))
    # member 1's hint (offset 16) claims far more than the file holds
    struct.pack_into("<I", blob, 16, (200 << 20))
    inf = RawInflater()
    out, left = inf.decompress(bytes(blob), 1 << 30)
    out += inf.flush()
    assert out == a + b and not left
    assert not inf.mid_stream  # nothing genuinely truncated
    assert inf.members == 2

    # same corruption but the file IS truncated: mid_stream must stay set
    inf = RawInflater()
    out, _ = inf.decompress(bytes(blob[: len(blob) // 2]), 1 << 30)
    inf.flush()
    assert inf.mid_stream


def test_hinted_member_budget_boundary_keeps_fast_path(rng):
    """A member whose ISIZE exceeds the REMAINING budget mid-call (but fits
    max_length) is handed back as leftover with the hint still armed, so
    the caller's next call fast-decodes it instead of dropping to zlib."""
    from ribodetector_tpu.io.gzfast import compress_member

    a = rng.integers(65, 91, 100000).astype(np.uint8).tobytes()
    b = rng.integers(65, 91, 250000).astype(np.uint8).tobytes()
    blob = compress_member(a) + compress_member(b)
    inf = RawInflater()
    out = []
    carry = blob
    while carry:
        o, carry = inf.decompress(carry, 260000)
        out.append(o)
    out.append(inf.flush())
    assert b"".join(out) == a + b
    assert inf.fast_members == 2  # the second member kept its fast path


def test_empty_gz_output_is_valid_gzip(tmp_path):
    """An output class that never receives a read must still be a VALID
    gzip stream (the reference's gzip.open writes an empty member on
    close; a 0-byte .gz makes gzip -d fail)."""
    from ribodetector_tpu.io.writer import open_for_write_bytes

    path = str(tmp_path / "empty.fq.gz")
    fh = open_for_write_bytes(path)
    fh.close()
    import os
    assert os.path.getsize(path) > 0
    assert gzip.decompress(open(path, "rb").read()) == b""
    assert drain(RawInflater(), open(path, "rb").read()) == b""
    fh2 = open_for_write_bytes(str(tmp_path / "x.fq.gz"))
    fh2.close()
    fh2.close()  # idempotent
