"""Streaming FASTQ/FASTA parsing.

Behavior parity with the reference parser
(reference: ribodetector/data_loader/fastx_parser.py:15-55):

- FASTQ records are yielded as 4-tuples ``(header, seq, plus, qual)``, each
  line ``rstrip()``-ed. The sequence is **not** uppercased (quirk preserved:
  lowercase bases later encode to the zero vector, fastx_parser.py:26-27).
- FASTA records are yielded as 2-tuples ``(header, seq)``; sequence lines are
  ``strip()``-ed, concatenated across lines and **uppercased**
  (fastx_parser.py:53). Blank lines are skipped. A record started mid-file is
  yielded (even with an empty sequence) as soon as the next ``>`` header is
  seen; a trailing record with an empty sequence is dropped
  (fastx_parser.py:54-55).

Divergence (documented): on *malformed* FASTQ (stray blank/junk lines between
records) the reference's state machine produces garbage records or raises
IndexError; this parser skips blank lines at record boundaries and raises a
clear ValueError on truncated records. Well-formed files parse identically.
"""

import gzip
from functools import partial

from ribodetector_tpu.io.format import get_seq_format


def seq_parser(seq_fh, seq_type):
    """Yield records from an open text file handle.

    seq_type: "fastq" -> 4-tuples, anything else -> FASTA 2-tuples.
    """
    if seq_type == "fastq":
        it = iter(seq_fh)
        for header in it:
            header = header.rstrip()
            if not header:
                continue  # skip blank lines at record boundaries
            try:
                seq = next(it).rstrip()
                plus = next(it).rstrip()
                qual = next(it).rstrip()
            except StopIteration:
                raise ValueError(
                    "Truncated FASTQ record at end of file: {!r}".format(header)
                ) from None
            yield header, seq, plus, qual
    else:
        header = None
        parts = []
        for line in seq_fh:
            line = line.strip()
            if not line:
                continue
            if line[0] == ">":
                if header is not None:
                    yield header, "".join(parts)
                header = line
                parts = []
            else:
                parts.append(line.upper())
        if header is not None and parts:
            # parts only ever holds non-empty stripped lines, so the join
            # is non-empty by construction (trailing records with an empty
            # sequence were filtered by `parts` being falsy above)
            yield header, "".join(parts)


def open_seq_file(seq_file):
    """Open a (possibly gzipped) sequence file for text reading.

    Returns (file_handle, seq_type) where seq_type is "fastq" or "fasta".
    Mirrors the open logic used throughout the reference
    (seq_encoder.py:44-47,59-61,77-79).
    """
    seq_format = get_seq_format(seq_file)
    _open = partial(gzip.open, mode="rt") if seq_format.endswith("gz") else open
    seq_type = "fasta" if seq_format.startswith("fa") else "fastq"
    return _open(seq_file), seq_type


def parse_file(seq_file):
    """Stream all records of a sequence file (handles gzip + format sniffing)."""
    fh, seq_type = open_seq_file(seq_file)
    with fh:
        yield from seq_parser(fh, seq_type)
