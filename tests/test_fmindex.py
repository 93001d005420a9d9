"""M0 tests: BWT construction, rank structure, backward search vs naive oracles."""
import numpy as np
import pytest

from longreadselfcorrect_tpu.core import alphabet as ab
from longreadselfcorrect_tpu.index import build
from longreadselfcorrect_tpu.index.fmindex import FMIndex, IndexSet
from longreadselfcorrect_tpu.ops import rank, scan

import jax.numpy as jnp


def random_reads(rng, n, lo=20, hi=60):
    return ["".join(rng.choice(list("ACGT"), size=rng.integers(lo, hi))) for _ in range(n)]


def make_index_set(reads_str, block=32):
    reads = [ab.encode(r) for r in reads_str]
    fwd, rev = build.build_bwt_pair(reads)
    return IndexSet(
        bwt=FMIndex.from_symbols(fwd.symbols, fwd.num_strings, block),
        rbwt=FMIndex.from_symbols(rev.symbols, rev.num_strings, block),
    )


def naive_count(reads_str, word):
    """# occurrences (overlapping) of word as substring across all reads."""
    k = len(word)
    return sum(
        sum(1 for p in range(len(r) - k + 1) if r[p : p + k] == word)
        for r in reads_str
    )


class TestBWTConstruction:
    def test_matches_naive_bwt(self, rng):
        for trial in range(5):
            reads = random_reads(rng, int(rng.integers(1, 6)), 3, 12)
            got = build.multi_string_bwt([ab.encode(r) for r in reads])
            want = build.naive_bwt(reads)
            assert ab.decode(got.symbols) == want

    def test_single_read(self):
        got = build.multi_string_bwt([ab.encode("ACGT")])
        assert ab.decode(got.symbols) == build.naive_bwt(["ACGT"])

    def test_counts(self, rng):
        reads = random_reads(rng, 4)
        got = build.multi_string_bwt([ab.encode(r) for r in reads])
        cat = "".join(reads)
        assert got.counts[0] == len(reads)
        for i, c in enumerate("ACGT"):
            assert got.counts[i + 1] == cat.count(c)


class TestRank:
    def test_occ_matches_cumsum(self, rng):
        reads = random_reads(rng, 5)
        bwt = build.multi_string_bwt([ab.encode(r) for r in reads])
        fm = FMIndex.from_symbols(bwt.symbols, bwt.num_strings, block=16)
        n = bwt.num_symbols
        sym_np = bwt.symbols.astype(np.int64)
        idx = np.concatenate([[-1, 0, n - 1], rng.integers(-1, n, 50)])
        for s in range(5):
            want = np.array([(sym_np[: i + 1] == s).sum() for i in idx])
            got = rank.occ(fm, jnp.full(len(idx), s, jnp.int32), jnp.asarray(idx, jnp.int32))
            np.testing.assert_array_equal(np.asarray(got), want)

    def test_occ_all(self, rng):
        reads = random_reads(rng, 3)
        bwt = build.multi_string_bwt([ab.encode(r) for r in reads])
        fm = FMIndex.from_symbols(bwt.symbols, bwt.num_strings, block=8)
        idx = jnp.asarray(np.arange(-1, bwt.num_symbols), jnp.int32)
        got = np.asarray(rank.occ_all(fm, idx))
        for s in range(5):
            want = np.asarray(rank.occ(fm, jnp.full(len(idx), s, jnp.int32), idx))
            np.testing.assert_array_equal(got[:, s], want)


class TestBackwardSearch:
    def test_find_interval_counts(self, rng):
        reads = random_reads(rng, 8)
        ix = make_index_set(reads)
        for k in (1, 3, 7, 13):
            for _ in range(20):
                r = reads[rng.integers(len(reads))]
                if len(r) < k:
                    continue
                p = rng.integers(0, len(r) - k + 1)
                word = r[p : p + k]
                lo, hi = rank.find_interval(ix.bwt, jnp.asarray(ab.encode(word))[None])
                assert int(rank.interval_size(lo, hi)[0]) == naive_count(reads, word)

    def test_absent_word_invalid(self, rng):
        reads = ["ACGTACGTACGTAGGG"] * 3
        ix = make_index_set(reads)
        lo, hi = rank.find_interval(ix.bwt, jnp.asarray(ab.encode("TTTTT"))[None])
        assert int(lo[0]) > int(hi[0])

    def test_bi_interval_freq(self, rng):
        reads = random_reads(rng, 6)
        ix = make_index_set(reads)
        for _ in range(25):
            r = reads[rng.integers(len(reads))]
            k = int(rng.integers(2, 9))
            if len(r) < k:
                continue
            p = rng.integers(0, len(r) - k + 1)
            word = r[p : p + k]
            state = rank.find_bi_interval(ix, jnp.asarray(ab.encode(word))[None])
            want = naive_count(reads, word) + naive_count(reads, ab.revcomp_str(word))
            assert int(rank.bi_freq(state)[0]) == want

    def test_count_occurrences_both_strands(self, rng):
        reads = random_reads(rng, 6)
        ix = make_index_set(reads)
        for _ in range(10):
            r = reads[rng.integers(len(reads))]
            k = int(rng.integers(2, 10))
            p = rng.integers(0, len(r) - k + 1)
            word = r[p : p + k]
            got = rank.count_occurrences_both_strands(ix.bwt, jnp.asarray(ab.encode(word))[None])
            want = naive_count(reads, word) + naive_count(reads, ab.revcomp_str(word))
            assert int(got[0]) == want


class TestScan:
    def test_kmer_freq_scan_matches_per_kmer(self, rng):
        reads_str = random_reads(rng, 5, 15, 40)
        ix = make_index_set(reads_str)
        L = max(len(r) for r in reads_str)
        mat = np.full((len(reads_str), L), ab.PAD_RANK, dtype=np.int8)
        lens = np.zeros(len(reads_str), dtype=np.int32)
        for i, r in enumerate(reads_str):
            mat[i, : len(r)] = ab.encode(r)
            lens[i] = len(r)
        pool = (3, 5, 9)
        freqs = np.asarray(
            scan.kmer_freq_scan(ix, jnp.asarray(mat), jnp.asarray(lens), pool)
        )
        for ki, k in enumerate(pool):
            for i, r in enumerate(reads_str):
                for p in range(L):
                    if p + k > len(r):
                        want = -1
                    else:
                        w = r[p : p + k]
                        want = naive_count(reads_str, w) + naive_count(
                            reads_str, ab.revcomp_str(w)
                        )
                    assert freqs[ki, i, p] == want, (k, i, p)
