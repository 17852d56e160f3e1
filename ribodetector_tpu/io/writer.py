"""Deterministic output writers.

Behavior parity with the reference's ``open_for_write``
(reference: ribodetector/detect.py:729-741, detect_cpu.py:742-754):
gzip with compresslevel=5 when the filename ends with "gz", plain text
otherwise. Records are written as '\n'.join(record_lines) batches by the
runtime, preserving original header/+/qual lines verbatim (quirk #11).
"""

import gzip


def open_for_write(read_file: str):
    """Open a plain or gzipped text file for writing based on its extension."""
    if read_file.endswith("gz"):
        return gzip.open(read_file, mode="wt", compresslevel=5)
    return open(read_file, "w")


def open_for_write_bytes(read_file: str):
    """Binary twin of open_for_write (same gzip level; used by the native
    byte-gather writers -- output bytes are identical)."""
    if read_file.endswith("gz"):
        return gzip.open(read_file, mode="wb", compresslevel=5)
    return open(read_file, "wb")
