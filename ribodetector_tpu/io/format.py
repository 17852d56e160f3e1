"""Sequence-file format sniffing by file extension.

Behavior parity with the reference's `get_seq_format`
(reference: ribodetector/data_loader/seq_encoder.py:21-39):

- recognized FASTA extensions: .fasta .fa .fna .fas
- recognized FASTQ extensions: .fq .fastq
- an optional trailing .gz marks gzip encoding (detected via
  mimetypes.guess_type, exactly like the reference). QUIRK kept for
  parity: although the error text promises ".gz or .gzip", mimetypes has
  no ".gzip" entry, so ".gzip" files are rejected -- by the reference
  too (its identical guess_type call returns (None, None) for them)
- any other encoding guess (e.g. .bz2) raises ValueError
- any other sequence extension raises ValueError with the same guidance text
- returns one of: "fa", "fagz", "fq", "fqgz"
"""

from pathlib import Path
from mimetypes import guess_type

FA_EXTS = (".fasta", ".fa", ".fna", ".fas")
FQ_EXTS = (".fq", ".fastq")


def get_seq_format(seq_file: str) -> str:
    """Return "fa"|"fagz"|"fq"|"fqgz" for a sequence file path."""
    encoding = guess_type(str(seq_file))[1]  # uses file extension only
    if encoding is None:
        encoding = ""
    elif encoding == "gzip":
        encoding = "gz"
    else:
        raise ValueError('Unknown file encoding: "{}"'.format(encoding))
    seq_filename = Path(seq_file).stem if encoding == "gz" else Path(seq_file).name
    seq_file_ext = Path(seq_filename).suffix
    if seq_file_ext not in FA_EXTS + FQ_EXTS:
        raise ValueError(
            """Unknown extension {}. Only fastq and fasta sequence formats are supported.
And the file must end with one of ".fasta", ".fa", ".fna", ".fas", ".fq", ".fastq"
and followed by ".gz" or ".gzip" if they are gzipped.""".format(seq_file_ext)
        )
    return ("fa" if seq_file_ext in FA_EXTS else "fq") + encoding
