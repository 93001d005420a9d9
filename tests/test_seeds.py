"""M1 tests: host FM view, threshold table, seed probing."""
import numpy as np
import pytest

from longreadselfcorrect_tpu.core import alphabet as ab
from longreadselfcorrect_tpu.core import seeds as seedmod
from longreadselfcorrect_tpu.core.threshold import KmerThreshold, default_table
from longreadselfcorrect_tpu.index import build
from longreadselfcorrect_tpu.index.host import HostFM, HostIndexSet


def make_host_index(reads_str):
    reads = [ab.encode(r) for r in reads_str]
    fwd, rev = build.build_bwt_pair(reads)
    return HostIndexSet(
        bwt=HostFM(fwd.symbols, fwd.num_strings),
        rbwt=HostFM(rev.symbols, rev.num_strings),
    )


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(42)
    genome = "".join(rng.choice(list("ACGT"), size=8000))
    reads = []
    for i in range(240):  # ~30x coverage of 1kb reads, both orientations
        p = rng.integers(0, len(genome) - 1000)
        r = genome[p : p + 1000]
        reads.append(ab.revcomp_str(r) if i % 2 else r)
    # probe-facing reads are forward strand
    fwd_reads = [r if i % 2 == 0 else ab.revcomp_str(r) for i, r in enumerate(reads)]
    ix = make_host_index(reads)
    return genome, fwd_reads, ix


class TestHostFM:
    def test_matches_device(self, corpus):
        import jax.numpy as jnp
        from longreadselfcorrect_tpu.index.fmindex import FMIndex, IndexSet
        from longreadselfcorrect_tpu.ops import scan

        genome, reads, ix = corpus
        fwd, rev = build.build_bwt_pair([ab.encode(r) for r in reads[:50]])
        hix = HostIndexSet(HostFM(fwd.symbols, fwd.num_strings), HostFM(rev.symbols, rev.num_strings))
        dix = IndexSet(
            bwt=FMIndex.from_symbols(fwd.symbols, fwd.num_strings),
            rbwt=FMIndex.from_symbols(rev.symbols, rev.num_strings),
        )
        read = ab.encode(reads[0])
        freq, valid = hix.kmer_freq_table(read, 21)
        pool = (5, 9, 15, 19, 21)
        mat = jnp.asarray(read[None, :])
        lens = jnp.asarray(np.array([len(read)], np.int32))
        dev = np.asarray(scan.kmer_freq_scan(dix, mat, lens, pool))
        for ki, k in enumerate(pool):
            np.testing.assert_array_equal(dev[ki, 0], freq[k])

    def test_find_interval_matches_naive(self, corpus):
        genome, reads, _ = corpus
        small = reads[:40]
        ix = make_host_index(small)
        rng = np.random.default_rng(3)
        for _ in range(20):
            r = small[rng.integers(len(small))]
            p = rng.integers(0, len(r) - 13)
            w = r[p : p + 13]
            lo, hi = ix.bwt.find_interval(ab.encode(w))
            n = sum(
                sum(1 for q in range(len(x) - 12) if x[q : q + 13] == w) for x in small
            )
            assert int(max(hi - lo + 1, 0)) == n


class TestThreshold:
    def test_monotone_nonincreasing(self):
        t = default_table(90)
        for mode in range(3):
            vals = t.table[mode][15:51]
            assert np.all(np.diff(vals) <= 0)

    def test_floor_two(self):
        t = default_table(90)
        assert np.all(t.table[:, 15:51] >= 2.0)

    def test_reference_values(self):
        # spot values computed by hand from KmerThreshold.cpp formula (cov=90)
        t = default_table(90)
        f = [np.float32(c) for c in
             (0.0003348214286, -0.009112394958, 0.04286714686, 0.240519958, -1.8793367350, 21.29319228)]
        x, y = np.float32(90), np.float32(15)
        # C evaluation order: f0*x*x + f1*x*y + f2*y*y + f3*x + f4*y + f5,
        # each product left-associated
        expect = f[0] * x * x + f[1] * x * y + f[2] * y * y + f[3] * x + f[4] * y + f[5]
        assert t.get(1, 15) == np.fmax(expect, np.float32(2.0))


class TestSeeds:
    def params(self):
        # genome=10m defaults at coverage 30 (PacBioSelfCorrection.cpp:195-206)
        offset = (0, 0, -4)
        pool = tuple(sorted({5, 9, 19, 19 + 0, 19 - 4}))
        return seedmod.ProbeParams(
            start_kmer_len=19, pb_coverage=30, offset=offset, pool=pool
        )

    def test_clean_read_seeds(self, corpus):
        genome, reads, ix = corpus
        thresh = default_table(30)
        params = self.params()
        seeds = seedmod.search_seeds(reads[0], ix, params, thresh)
        assert len(seeds) > 0
        prev_end = -1
        for s in seeds:
            # the seed string is the read substring at its position
            assert reads[0][s.seed_start_pos : s.seed_end_pos + 1] == s.seed_str
            assert s.seed_len >= 15
            assert s.seed_start_pos > prev_end - 200  # roughly ordered
            prev_end = s.seed_end_pos
        # clean read at 30x: seeds should cover a decent fraction
        covered = sum(s.seed_len for s in seeds)
        assert covered > len(reads[0]) * 0.3

    def test_seeds_avoid_error_positions(self, corpus):
        genome, reads, ix = corpus
        thresh = default_table(30)
        params = self.params()
        # corrupt the middle of a read with a burst of errors; the index does
        # not contain this corrupted read, so seeds must avoid the burst
        rng = np.random.default_rng(5)
        r = list(reads[1])
        burst = range(480, 520)
        for i in burst:
            r[i] = "ACGT"[(("ACGT".index(r[i])) + 1) % 4]
        r = "".join(r)
        seeds = seedmod.search_seeds(r, ix, params, thresh)
        assert len(seeds) > 0
        for s in seeds:
            assert not (s.seed_start_pos <= 519 and s.seed_end_pos >= 480), (
                s.seed_start_pos,
                s.seed_end_pos,
            )

    def test_best_kmer_sizes_within_bounds(self, corpus):
        genome, reads, ix = corpus
        thresh = default_table(30)
        seeds = seedmod.search_seeds(reads[2], ix, self.params(), thresh)
        for s in seeds:
            assert s.size_lower_bound <= s.start_best_kmer_size <= s.size_upper_bound
            assert s.size_lower_bound <= s.end_best_kmer_size <= s.size_upper_bound


class TestReadIdLookup:
    def test_read_id_of(self, corpus):
        import numpy as np
        from longreadselfcorrect_tpu.index.host import read_id_of

        genome, reads, ix = corpus
        # reconstruct which read every SA row belongs to by walking from the
        # sentinel rows (row i < num_strings is the '$' suffix of read i)
        fm = ix.bwt
        rng = np.random.default_rng(8)
        # pick rows via find_interval of known unique substrings
        for t in range(10):
            ri = int(rng.integers(len(reads)))
            # even-index corpus reads are forward in the index
            r = reads[ri] if ri % 2 == 0 else ab.revcomp_str(reads[ri])
            p = int(rng.integers(0, len(r) - 25))
            lo, hi = fm.find_interval(ab.encode(r[p : p + 25]))
            assert lo <= hi
            ids = set()
            for row in range(int(lo), int(hi) + 1):
                rid, off = read_id_of(fm, row)
                ids.add((rid, off))
            # our read must be among the hits at the right offset
            assert any(rid == ri and off == p for rid, off in ids), (ri, p, ids)
