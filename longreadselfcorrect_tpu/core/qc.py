"""Read QC filtering (`stride filter`).

k-mer QC from Algorithm/QCProcess.cpp:96-205: a read passes when EVERY k-mer
(both strands) occurs strictly more than `threshold` times.  The reference
walks a growing interval window as a speed trick; the accept/reject semantics
equal the all-kmers test, which we evaluate as one vectorised count sweep.

Duplicate/substring removal (QCProcess.h:39-50) needs the sampled suffix
array for read-ID claims; it lands with the SSA component.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import alphabet as ab


@dataclass
class QCParams:
    kmer_length: int = 31
    kmer_threshold: int = 3
    check_kmer: bool = True


def kmer_qc(ix, seq: str, params: QCParams) -> bool:
    """performKmerCheck semantics: all k-mer counts > threshold."""
    k = params.kmer_length
    if len(seq) < k:
        return False
    enc = ab.encode(seq)
    win = np.lib.stride_tricks.sliding_window_view(enc, k)
    lo1, hi1 = ix.bwt.find_interval(win)
    rc = ab.complement(win)[:, ::-1]
    lo2, hi2 = ix.bwt.find_interval(rc)
    counts = np.maximum(hi1 - lo1 + 1, 0) + np.maximum(hi2 - lo2 + 1, 0)
    return bool((counts > params.kmer_threshold).all())


def filter_reads(ix, records, params: QCParams):
    """Yield (record, passed) pairs."""
    for rec in records:
        passed = kmer_qc(ix, rec.seq, params) if params.check_kmer else True
        yield rec, passed
