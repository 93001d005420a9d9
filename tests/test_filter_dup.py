"""Duplicate/substring removal tests (QCProcess::performDuplicateCheck,
Algorithm/QCProcess.cpp:206-266) against a brute-force oracle."""
import numpy as np

from longreadselfcorrect_tpu.core import alphabet as ab
from longreadselfcorrect_tpu.core.qc import QCParams, duplicate_check, filter_reads
from longreadselfcorrect_tpu.index import build
from longreadselfcorrect_tpu.index.host import HostFM, HostIndexSet


def make_ix(reads):
    fwd, rev = build.build_bwt_pair([ab.encode(r) for r in reads])
    return HostIndexSet(
        HostFM(fwd.symbols, fwd.num_strings), HostFM(rev.symbols, rev.num_strings)
    )


class Rec:
    def __init__(self, i, seq):
        self.id = f"r{i}"
        self.seq = seq


def brute_classify(reads):
    """Expected outcome per read, processed in stream order."""
    rc = [ab.revcomp_str(r) for r in reads]
    out = []
    claimed = set()
    for i, r in enumerate(reads):
        # substring of any longer read, either strand
        is_sub = any(
            (r in other or rc[i] in other) and len(other) > len(r)
            for other in reads
        )
        if is_sub:
            out.append("SUBSTRING")
            continue
        key = min(r, rc[i])
        if key in claimed:
            out.append("DUP")
        else:
            claimed.add(key)
            out.append("UNIQUE")
    return out


class TestDuplicateCheck:
    def test_planted_duplicates(self):
        reads = [
            "ACGTACGTACGTACGTAAAACCCC",   # unique
            "ACGTACGTACGTACGTAAAACCCC",   # exact dup of 0
            "CATCATGGGTTTACACACAGGATG",   # unique
            ab.revcomp_str("ACGTACGTACGTACGTAAAACCCC"),  # rc dup of 0
            "CGTACGTACGTACGTAAAACCC",     # substring of 0
            "TTTTGGGGCATCATCATCATCATT",   # unique
        ]
        ix = make_ix(reads)
        bv = np.zeros(ix.bwt.num_strings, bool)
        got = [duplicate_check(ix, r, bv) for r in reads]
        assert got == ["UNIQUE", "DUP", "UNIQUE", "DUP", "SUBSTRING", "UNIQUE"]

    def test_random_corpus_vs_oracle(self, rng):
        base = [
            "".join(rng.choice(list("ACGT"), size=int(rng.integers(15, 40))))
            for _ in range(12)
        ]
        reads = list(base)
        reads.append(base[0])                     # exact dup
        reads.append(ab.revcomp_str(base[1]))     # rc dup
        reads.append(base[2][2:-3])               # substring
        reads.append(ab.revcomp_str(base[3])[1:]) # rc substring
        ix = make_ix(reads)
        bv = np.zeros(ix.bwt.num_strings, bool)
        got = [duplicate_check(ix, r, bv) for r in reads]
        want = brute_classify(reads)
        assert got == want

    def test_filter_pipeline_substring_only(self):
        reads = [
            "ACGTACGTACGTACGTAAAACCCC",
            "ACGTACGTACGTACGTAAAACCCC",
            "CGTACGTACGTACGTAAAACCC",
        ]
        ix = make_ix(reads)
        params = QCParams(check_kmer=False, substring_only=True)
        got = [p for _, p in filter_reads(ix, [Rec(i, r) for i, r in enumerate(reads)], params)]
        assert got == [True, True, False]  # full-length dups kept, substring dropped
        params = QCParams(check_kmer=False, substring_only=False)
        got = [p for _, p in filter_reads(ix, [Rec(i, r) for i, r in enumerate(reads)], params)]
        assert got == [True, False, False]
