"""Native FASTQ fast path: zero-per-read-Python streaming runtime.

Replaces the hot host loops for FASTQ inputs (the production format). Per
chunk of R records, ONE native call parses + token-encodes the decompressed
byte buffer (native/fastx.cpp), batches are numpy views copied into reusable
padded staging buffers, and output files are written as verbatim byte-range
gathers of the input buffer -- no Python string is ever created per read
(quirk #11 holds trivially: records pass through byte-identical).

All large buffers are allocated once and reused: this host's first-touch
page faults cost ~0.5 ms/page (measured), so per-batch np.empty/np.full of
tens of MB would dominate the run. FASTA (and FASTQ with CRLF/trailing
whitespace, flagged per-record by the native parser) falls back to the
portable Python path with identical behavior.
"""

import io
import json
import os
import zlib

import numpy as np

from ribodetector_tpu import native
from ribodetector_tpu.encode import PAD_TOKEN
from ribodetector_tpu.io.fastx import seq_parser
from ribodetector_tpu.io.format import get_seq_format
from ribodetector_tpu.runtime.ensure import paired_final_labels

_BLOCK = 4 << 20


class FastqChunkStream:
    """Streams (data, offsets, tokens, lengths, clean, n) chunks of up to
    `records_per_chunk` FASTQ records from a plain or gzipped file."""

    def __init__(self, path, max_len, records_per_chunk):
        self.max_len = max_len
        self.cap = records_per_chunk
        self._fh = open(path, "rb")
        self._dec = (
            zlib.decompressobj(32 + zlib.MAX_WBITS)
            if get_seq_format(path).endswith("gz")
            else None
        )
        self._buf = bytearray()
        self._nl = 0  # newlines currently in _buf
        self._eof = False
        # reusable, pre-touched output arrays
        cap = self.cap + 2
        self._offsets = np.zeros((cap, 2), np.int64)
        self._tokens = np.zeros((cap, max_len), np.uint8)
        self._lengths = np.zeros(cap, np.int32)
        self._clean = np.zeros(cap, np.uint8)

    def _fill(self):
        while not self._eof and self._nl < 4 * self.cap:
            raw = self._fh.read(_BLOCK)
            if not raw:
                if self._dec is not None:
                    tail = self._dec.flush()
                    if tail:
                        self._buf += tail
                        self._nl += tail.count(b"\n")
                self._eof = True
                self._fh.close()
                break
            block = self._dec.decompress(raw) if self._dec is not None else raw
            if block:
                self._buf += block
                self._nl += block.count(b"\n")

    def __iter__(self):
        lib = native._load()
        import ctypes

        while True:
            self._fill()
            if not self._buf:
                return
            data = bytes(self._buf)
            consumed = np.zeros(1, np.int64)
            n = lib.rd_parse_fastq(
                data,
                len(data),
                self.cap,
                self.max_len,
                native._ptr(self._offsets, ctypes.c_int64),
                native._ptr(self._tokens, ctypes.c_uint8),
                native._ptr(self._lengths, ctypes.c_int32),
                native._ptr(self._clean, ctypes.c_uint8),
                native._ptr(consumed, ctypes.c_int64),
            )
            used = int(consumed[0])
            if n == 0:
                if self._eof:
                    return  # trailing junk without a complete record
                # shouldn't happen (cap >= 1 and _fill ensures data), guard:
                return
            self._nl -= data.count(b"\n", 0, used)
            del self._buf[:used]
            yield (
                data,
                self._offsets[:n],
                self._tokens[:n],
                self._lengths[:n],
                self._clean[:n],
                n,
            )
            if self._eof and not self._buf:
                return


def records_from_chunk_bytes(data, offsets, n):
    """Python-tuple records for a (rare) dirty chunk: identical semantics to
    the portable parser (rstrip quirks included)."""
    end = int(offsets[n - 1, 1]) if n else 0
    fh = io.TextIOWrapper(io.BytesIO(data[:end]), encoding="latin-1")
    return list(seq_parser(fh, "fastq"))


class NativeRunner:
    """Drives the native chunk streams through the Predictor's jitted
    classify step and byte-gather writers. Owns the reusable staging
    buffers; one instance per detect() run."""

    def __init__(self, predictor):
        self.p = predictor
        # Device batch: the reference's -m formula (quirk #9) guards GPU RAM
        # on its hardware; on TPU a [131072, len] uint8 token batch is ~13 MB
        # of HBM, so the native path lifts the device batch to cut per-call
        # dispatch overhead. batch_size still sizes chunks (--chunk_size
        # parity) and bounds host memory via the chunk stream.
        bs = self.dbs = max(predictor.batch_size, min(131072, self._records_per_chunk()))
        rows = 2 * bs if predictor.is_paired else bs
        # double-buffered staging: the in-flight batch's host buffer must not
        # be rewritten while its (possibly lazy) H2D transfer is pending
        self._staging = [
            np.full((rows, predictor.len), PAD_TOKEN, np.uint8) for _ in range(2)
        ]
        self._stage_len = [np.zeros(rows, np.int32) for _ in range(2)]
        self._slot = 0
        self._scratch = bytearray()  # reusable gather buffer for writes

    # -- batching ------------------------------------------------------

    def _infer_tokens(self, tok1, len1, tok2=None, len2=None):
        """Copy token views into the padded staging buffer, classify, and
        return logits for the actual rows."""
        nb = len(tok1)
        self._slot ^= 1
        st, sl = self._staging[self._slot], self._stage_len[self._slot]
        st[:nb] = tok1
        sl[:nb] = len1
        if tok2 is not None:
            st[nb : 2 * nb] = tok2
            sl[nb : 2 * nb] = len2
            st[2 * nb :] = PAD_TOKEN
            sl[2 * nb :] = 0
        else:
            st[nb:] = PAD_TOKEN
            sl[nb:] = 0
        return self.p._infer(st, sl)

    # -- writing -------------------------------------------------------

    def _write_sel(self, fh, data, offsets, sel):
        if len(sel):
            with self.p.timer.stage("write"):
                fh.write(native.gather_records(data, offsets, sel, self._scratch))

    # -- single-end ----------------------------------------------------

    def run_single(self):
        p = self.p
        resume = ResumeState.maybe(p) if getattr(p.args, "resume", False) else None
        counts = {"norrna": 0, "rrna": 0, "unclf": 0}
        num_read = 0
        bs = self.dbs
        stream = FastqChunkStream(p.input[0], p.len, self._records_per_chunk())
        chunks = iter(stream)
        if resume:
            num_read, counts = resume.restore(p, [chunks])
            fhs = None
        else:
            fhs = p._open_outputs(binary=True)

        timer = p.timer
        pending = None  # (data, offsets, base, nb, logits_dev)
        ci = resume.chunks_done if resume else 0
        while True:
            with timer.stage("parse"):
                chunk = next(chunks, None)
            if chunk is None:
                break
            data, offsets, tokens, lengths, clean, n = chunk
            if resume:
                fhs = resume.open_chunk(p, ci)
            chunk_records = (
                records_from_chunk_bytes(data, offsets, n)
                if not clean.all()
                else None
            )
            for start in range(0, n, bs):
                nb = min(bs, n - start)
                with timer.stage("infer_dispatch"):
                    logits_dev = self._infer_tokens(
                        tokens[start : start + nb], lengths[start : start + nb]
                    )
                if pending is not None:
                    self._finish_single(fhs, counts, *pending)
                # snapshot the offsets rows: the stream's offset array is
                # reused and will be overwritten by the next chunk's parse
                # while this batch is still in flight
                pending = (
                    data,
                    offsets[start : start + nb].copy(),
                    chunk_records,
                    start,
                    nb,
                    logits_dev,
                )
                if resume:
                    # chunk completion must cover all its batches
                    self._finish_single(fhs, counts, *pending)
                    pending = None
            num_read += n
            if resume:
                resume.complete_chunk(p, ci, fhs, num_read, counts)
            ci += 1
            if p.chunk_size is not None:
                p._log_progress(num_read)
        if pending is not None:
            self._finish_single(fhs, counts, *pending)
        if resume:
            resume.merge(p)
        else:
            p._close_outputs(fhs)
        p._log_summary(num_read, counts)

    def _finish_single(self, fhs, counts, data, boffsets, chunk_records, start, nb, logits_dev):
        with self.p.timer.stage("infer_wait"):
            logits = np.asarray(logits_dev)[:nb]
        labels = logits.argmax(1)
        sel0 = np.flatnonzero(labels == 0)
        sel1 = np.flatnonzero(labels == 1)
        counts["norrna"] += len(sel0)
        counts["rrna"] += len(sel1)
        if chunk_records is None:
            self._write_sel(fhs["norrna"][0], data, boffsets, sel0)
            if "rrna" in fhs:
                self._write_sel(fhs["rrna"][0], data, boffsets, sel1)
        else:  # dirty chunk: reference-exact rstripped text
            self._write_text(fhs["norrna"][0], chunk_records, sel0 + start)
            if "rrna" in fhs:
                self._write_text(fhs["rrna"][0], chunk_records, sel1 + start)

    @staticmethod
    def _write_text(fh, records, sel):
        if len(sel):
            fh.write(
                ("\n".join("\n".join(records[i]) for i in sel) + "\n").encode(
                    "latin-1"
                )
            )

    # -- paired-end ----------------------------------------------------

    def run_paired(self):
        p = self.p
        resume = ResumeState.maybe(p) if getattr(p.args, "resume", False) else None
        counts = {"norrna": 0, "rrna": 0, "unclf": 0}
        num_read = 0
        bs = self.dbs
        rpc = self._records_per_chunk()
        s1 = FastqChunkStream(p.input[0], p.len, rpc)
        s2 = FastqChunkStream(p.input[1], p.len, rpc)
        it1, it2 = iter(s1), iter(s2)
        if resume:
            num_read, counts = resume.restore(p, [it1, it2])
            fhs = None
        else:
            fhs = p._open_outputs(binary=True)

        timer = p.timer
        pending = None
        ci = resume.chunks_done if resume else 0
        while True:
            with timer.stage("parse"):
                c1 = next(it1, None)
                c2 = next(it2, None)
            if c1 is None or c2 is None:
                break
            d1, o1, t1, l1, cl1, n1 = c1
            d2, o2, t2, l2, cl2, n2 = c2
            n = min(n1, n2)  # quirk #8: truncate to the shorter file
            if resume:
                fhs = resume.open_chunk(p, ci)
            recs1 = records_from_chunk_bytes(d1, o1, n1) if not cl1[:n].all() else None
            recs2 = records_from_chunk_bytes(d2, o2, n2) if not cl2[:n].all() else None
            for start in range(0, n, bs):
                nb = min(bs, n - start)
                with timer.stage("infer_dispatch"):
                    logits_dev = self._infer_tokens(
                        t1[start : start + nb],
                        l1[start : start + nb],
                        t2[start : start + nb],
                        l2[start : start + nb],
                    )
                if pending is not None:
                    self._finish_paired(fhs, counts, *pending)
                # snapshot offsets rows (stream arrays are reused; see
                # run_single)
                pending = (
                    d1,
                    o1[start : start + nb].copy(),
                    recs1,
                    d2,
                    o2[start : start + nb].copy(),
                    recs2,
                    start,
                    nb,
                    logits_dev,
                )
                if resume:
                    self._finish_paired(fhs, counts, *pending)
                    pending = None
            num_read += n
            if resume:
                resume.complete_chunk(p, ci, fhs, num_read, counts)
            ci += 1
            if p.chunk_size is not None:
                p._log_progress(num_read)
        if pending is not None:
            self._finish_paired(fhs, counts, *pending)
        if resume:
            resume.merge(p)
        else:
            p._close_outputs(fhs)
        p._log_summary(num_read, counts)

    def _finish_paired(self, fhs, counts, d1, bo1, recs1, d2, bo2, recs2, start, nb, logits_dev):
        p = self.p
        with p.timer.stage("infer_wait"):
            logits = np.asarray(logits_dev)
        lg1, lg2 = logits[:nb], logits[nb : 2 * nb]
        labels = paired_final_labels(lg1, lg2, p.args.ensure)
        sel = {lab: np.flatnonzero(labels == lab) for lab in (0, 1, -1)}
        counts["norrna"] += len(sel[0])
        counts["rrna"] += len(sel[1])
        for (data, boffsets, recs, side) in ((d1, bo1, recs1, 0), (d2, bo2, recs2, 1)):
            if recs is None:
                w = lambda fh, s: self._write_sel(fh, data, boffsets, s)
            else:
                w = lambda fh, s: self._write_text(fh, recs, s + start)
            w(fhs["norrna"][side], sel[0])
            if "rrna" in fhs:
                w(fhs["rrna"][side], sel[1])
            if "unclf" in fhs:
                w(fhs["unclf"][side], sel[-1])
        if "unclf" in fhs:
            counts["unclf"] += len(sel[-1])

    # ------------------------------------------------------------------

    def _records_per_chunk(self):
        p = self.p
        if p.chunk_size is not None:
            return p.batch_size * p.chunk_size
        # whole-file mode: moderate streaming chunks so the host allocator
        # reuses warm arenas (fresh multi-hundred-MB buffers hit this host's
        # slow first-touch page faults); memory stays bounded either way,
        # strictly better than the reference's load-everything behavior
        # (detect.py:131-132)
        return max(p.batch_size, 131072)

    def run(self):
        if self.p.is_paired:
            self.run_paired()
        else:
            self.run_single()


class ResumeState:
    """Per-chunk completion manifest enabling restartable streaming.

    The reference loses ALL work on a crash mid-run (SURVEY.md 5 "failure
    detection": none). With --resume, every chunk's output goes to part
    files (`<output>.parts/chunk_NNNNNN[.gz]`) and a manifest
    (`<output[0]>.progress.json`) records completed chunks atomically; an
    interrupted run restarts after the last completed chunk, and a finished
    run concatenates the parts (gzip members concatenate losslessly) into
    the final outputs and removes the manifest.
    """

    MANIFEST_SUFFIX = ".progress.json"

    @staticmethod
    def maybe(p):
        return ResumeState(p)

    def __init__(self, p):
        self.manifest_path = p.output[0] + self.MANIFEST_SUFFIX
        self.chunks_done = 0

    # -- layout --------------------------------------------------------

    @staticmethod
    def _groups(p):
        groups = {"norrna": list(p.output)}
        if p.rrna is not None:
            groups["rrna"] = list(p.rrna)
        if p.is_paired and p.args.ensure == "both":
            groups["unclf"] = [f + ".unclassified.gz" for f in p.output]
        return groups

    @staticmethod
    def _part_path(final_path, ci):
        suffix = ".gz" if final_path.endswith("gz") else ""
        return os.path.join(final_path + ".parts", f"chunk_{ci:06d}{suffix}")

    def _config_key(self, p):
        return {
            "inputs": list(p.input),
            "len": p.len,
            "ensure": p.args.ensure,
            "records_per_chunk": p.batch_size * p.chunk_size
            if p.chunk_size is not None
            else None,
        }

    # -- lifecycle -----------------------------------------------------

    def restore(self, p, chunk_iters):
        """Load the manifest (if any), skip completed chunks on every input
        stream, and return (num_read, counts)."""
        counts = {"norrna": 0, "rrna": 0, "unclf": 0}
        num_read = 0
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as fh:
                m = json.load(fh)
            if m.get("config") != self._config_key(p):
                raise RuntimeError(
                    "--resume manifest {} was written by a different run "
                    "configuration; remove it (and any .parts directories) "
                    "to start fresh.".format(self.manifest_path)
                )
            self.chunks_done = int(m["chunks_done"])
            num_read = int(m["records_done"])
            counts.update(m["counts"])
            p.logger.info(
                "Resuming after {} completed chunks ({} records)".format(
                    self.chunks_done, num_read
                )
            )
            for it in chunk_iters:
                for _ in range(self.chunks_done):
                    next(it, None)
        return num_read, counts

    def open_chunk(self, p, ci):
        from ribodetector_tpu.io.writer import open_for_write_bytes

        fhs = {}
        for group, files in self._groups(p).items():
            handles = []
            for f in files:
                os.makedirs(f + ".parts", exist_ok=True)
                handles.append(open_for_write_bytes(self._part_path(f, ci)))
            fhs[group] = handles
        return fhs

    def complete_chunk(self, p, ci, fhs, num_read, counts):
        for group in fhs.values():
            for fh in group:
                fh.close()
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "config": self._config_key(p),
                    "chunks_done": ci + 1,
                    "records_done": num_read,
                    "counts": counts,
                },
                fh,
            )
        os.replace(tmp, self.manifest_path)
        self.chunks_done = ci + 1

    def merge(self, p):
        """Concatenate part files into the final outputs and clean up."""
        import shutil

        for files in self._groups(p).values():
            for f in files:
                parts_dir = f + ".parts"
                with open(f, "wb") as out:
                    if os.path.isdir(parts_dir):
                        for name in sorted(os.listdir(parts_dir)):
                            with open(os.path.join(parts_dir, name), "rb") as part:
                                shutil.copyfileobj(part, out, 8 << 20)
                if os.path.isdir(parts_dir):
                    shutil.rmtree(parts_dir)
        if os.path.exists(self.manifest_path):
            os.remove(self.manifest_path)
