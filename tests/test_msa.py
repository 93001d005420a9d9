"""M3 tests: banded overlapper, MSA consensus, full per-read correction."""
import numpy as np
import pytest

from longreadselfcorrect_tpu.core import alphabet as ab
from longreadselfcorrect_tpu.core import msa
from longreadselfcorrect_tpu.core.correct import CorrectionParams, SelfCorrector
from longreadselfcorrect_tpu.core.overlapper import extend_match
from longreadselfcorrect_tpu.index import build
from longreadselfcorrect_tpu.index.host import HostFM, HostIndexSet


class TestOverlapper:
    def test_exact_match(self):
        # the MSA path's explicit {1,-1,-8} scores (LongReadOverlap.cpp:633)
        s = "ACGTACGGTACGTTGACA"
        ovl = extend_match(s, s, 0, 0, 20, 1, -1, -8)
        assert ovl.edit_distance == 0
        assert ovl.total_columns == len(s)
        assert ovl.cigar == "M" * len(s)
        assert ovl.score == len(s)

    def test_single_mismatch(self):
        s1 = "ACGTACGGTACGTTGACA"
        s2 = s1[:8] + "C" + s1[9:]
        ovl = extend_match(s1, s2, 0, 0, 20, 1, -1, -8)
        # with mismatch -8 vs gap -1 the aligner prefers I+D over a
        # substitution (score 16-2 > 17-8), matching the reference scores
        assert ovl.edit_distance == 2
        assert ovl.score == len(s1) - 3
        assert "I" in ovl.cigar and "D" in ovl.cigar

    def test_insertion_in_s2(self):
        s1 = "ACGTACGGTACGTTGACA"
        s2 = s1[:9] + "T" + s1[9:]
        ovl = extend_match(s1, s2, 0, 0, 20)
        assert ovl.edit_distance == 1
        assert "I" in ovl.cigar

    def test_deletion_in_s2(self):
        s1 = "ACGTACGGTACGTTGACA"
        s2 = s1[:9] + s1[10:]
        ovl = extend_match(s1, s2, 0, 0, 20)
        assert ovl.edit_distance == 1
        assert "D" in ovl.cigar

    def test_fill_matches_scalar_transcription(self):
        # compare the vectorised band fill against a direct scalar
        # transcription of the C++ column loop (overlapper.cpp:456-540)
        def scalar_cells(s1, s2, start_1, start_2, band_width, MATCH=1, GAP=-1, MISMATCH=-8):
            num_columns = len(s1) + 1
            num_rows = len(s2) + 1
            half = band_width // 2
            bw = half * 2 + 1
            origin = start_2 - start_1 + 1 - (half + 1)
            INVALID = -(1 << 40)
            cells = np.zeros((num_columns, bw), dtype=np.int64)

            def idx_ok(i, j):
                r = j - (origin + i)
                return 0 <= r < bw

            def get(i, j):
                return cells[i, j - (origin + i)] if idx_ok(i, j) else INVALID

            for i in range(1, num_columns):
                j = origin + i
                end_row = j + bw
                if j < 1:
                    j = 1
                if end_row > num_rows:
                    end_row = num_rows
                if end_row <= 0 or j >= num_rows or j >= end_row:
                    continue
                diag = get(i - 1, j - 1) + (MATCH if s1[i - 1] == s2[j - 1] else MISMATCH)
                left = get(i - 1, j) + GAP if idx_ok(i - 1, j) else INVALID
                cells[i, j - (origin + i)] = max(left, diag)
                j += 1
                while j < end_row - 1:
                    diag = get(i - 1, j - 1) + (MATCH if s1[i - 1] == s2[j - 1] else MISMATCH)
                    left = get(i - 1, j) + GAP
                    up = get(i, j - 1) + GAP
                    cells[i, j - (origin + i)] = max(diag, left, up)
                    j += 1
                if j != end_row:
                    diag = get(i - 1, j - 1) + (MATCH if s1[i - 1] == s2[j - 1] else MISMATCH)
                    up = get(i, j - 1) + GAP
                    cells[i, j - (origin + i)] = max(diag, up)
            return cells

        from longreadselfcorrect_tpu.core import overlapper as ovlmod

        rng = np.random.default_rng(2)
        for trial in range(8):
            n = int(rng.integers(10, 60))
            m = int(rng.integers(10, 60))
            s1 = "".join(rng.choice(list("ACGT"), size=n))
            s2 = "".join(rng.choice(list("ACGT"), size=m))
            for (st1, st2, band) in [(0, 0, 10), (0, 0, 30), (n - 5, m - 5, 12)]:
                ovl = extend_match(s1, s2, st1, st2, band, 1, -1, -8)
                # reconstruct my cells to compare against the scalar oracle
                want = scalar_cells(s1, s2, st1, st2, band)
                half = band // 2
                bw = half * 2 + 1
                origin = st2 - st1 + 1 - (half + 1)
                got = np.zeros_like(want)
                # re-run the vectorised fill via a fresh call path: recompute
                # by invoking extend_match internals indirectly is awkward, so
                # just verify the final score/backtrack agree with an
                # extendMatch run over the scalar cells
                def score_at(i, j):
                    r = j - (origin + i)
                    return int(want[i, r]) if 0 <= r < bw else -(1 << 40)
                best_row = max(
                    (score_at(i, m) for i in range(1, n + 1)),
                )
                best_col = max(
                    (score_at(n, j) for j in range(1, m + 1)),
                )
                want_score = best_col if best_col > best_row else best_row
                assert ovl.score == want_score, (trial, st1, st2, band)


class TestMSA:
    def test_consensus_majority(self):
        # base with one error; 5 clean overlapping rows outvote it
        base = "ACGTACGGTACGTTGACAAC"
        truth = base[:10] + "G" + base[11:]
        ma = msa.MultipleAlignment()
        ma.add_base_sequence("query", base)
        for _ in range(5):
            ovl = extend_match(base, truth, 0, 0, 20)
            ma.add_overlap("row", truth, ovl)
        cons = ma.calculate_base_consensus(2, -1)
        assert cons == truth

    def test_consensus_with_indels(self):
        base = "ACGTACGGTACGTTGACAAC"
        truth = base[:9] + base[10:]  # deletion vs base
        ma = msa.MultipleAlignment()
        ma.add_base_sequence("query", base)
        for _ in range(5):
            ovl = extend_match(base, truth, 0, 0, 20)
            ma.add_overlap("row", truth, ovl)
        cons = ma.calculate_base_consensus(2, -1)
        assert cons == truth


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(77)
    genome = "".join(rng.choice(list("ACGT"), size=9000))
    reads = []
    for i in range(270):
        p = rng.integers(0, len(genome) - 1000)
        r = genome[p : p + 1000]
        reads.append(ab.revcomp_str(r) if i % 2 else r)
    fwd, rev = build.build_bwt_pair([ab.encode(r) for r in reads])
    ix = HostIndexSet(HostFM(fwd.symbols, fwd.num_strings), HostFM(rev.symbols, rev.num_strings))
    return genome, reads, ix, rng


class TestSelfCorrector:
    def test_noisy_read_corrected(self, corpus):
        genome, reads, ix, _ = corpus
        rng = np.random.default_rng(13)
        truth = genome[3000:4100]
        noisy = list(truth)
        for p in rng.choice(len(noisy), size=int(len(noisy) * 0.08), replace=False):
            noisy[p] = "ACGT"[("ACGT".index(noisy[p]) + int(rng.integers(1, 4))) % 4]
        noisy = "".join(noisy)
        params = CorrectionParams(pb_coverage=30, genome=10)
        corrector = SelfCorrector(ix, params)
        result = corrector.process("read1", noisy)
        assert result.merge
        assert result.total_seed_num >= 2
        assert len(result.corrected_strs) == 1
        out = result.corrected_strs[0]
        # corrected string must be a near-exact substring of the genome region
        assert out in genome, f"corrected output not an exact genome substring (len {len(out)})"

    def test_read_without_seeds_discarded(self, corpus):
        genome, reads, ix, _ = corpus
        rng = np.random.default_rng(14)
        junk = "".join(rng.choice(list("ACGT"), size=500))  # not in corpus
        params = CorrectionParams(pb_coverage=30, genome=10)
        corrector = SelfCorrector(ix, params)
        result = corrector.process("junk", junk)
        assert not result.merge
        assert result.corrected_strs == []


class TestDeviceMSAKernels:
    """ops/msa_kernels must be cell- and symbol-identical to the host."""

    @pytest.fixture(scope="class")
    def dix(self):
        from longreadselfcorrect_tpu.index.fmindex import FMIndex, IndexSet

        rng = np.random.default_rng(202)
        genome = "".join(rng.choice(list("ACGT"), size=5000))
        reads = []
        for i in range(120):
            p = int(rng.integers(0, 5000 - 400))
            r = genome[p : p + 400]
            reads.append(ab.revcomp_str(r) if i % 2 else r)
        enc = [ab.encode(r) for r in reads]
        fwd, rev = build.build_bwt_pair(enc)
        hix = HostIndexSet(HostFM(fwd.symbols, fwd.num_strings),
                           HostFM(rev.symbols, rev.num_strings))
        dev = IndexSet(bwt=FMIndex.from_symbols(fwd.symbols, fwd.num_strings),
                       rbwt=FMIndex.from_symbols(rev.symbols, rev.num_strings))
        return genome, hix, dev

    def test_lf_extract_matches_host(self, dix):
        from longreadselfcorrect_tpu.core.msa import _lf_extract
        from longreadselfcorrect_tpu.ops import msa_kernels

        genome, hix, dev = dix
        roots = np.arange(5, 40)
        hm, hl = _lf_extract(hix.bwt, roots, 60)
        dm, dl = msa_kernels.lf_extract(dev.bwt, roots, 60)
        assert np.array_equal(hl, dl)
        assert np.array_equal(hm[:, :60], dm[:, :60])

    def test_banded_fill_matches_host(self, dix):
        from longreadselfcorrect_tpu.core.overlapper import fill_cells
        from longreadselfcorrect_tpu.ops import msa_kernels

        genome, hix, dev = dix
        rng = np.random.default_rng(7)
        queries, targets, s1s, s2s = [], [], [], []
        for i in range(6):
            p = int(rng.integers(0, 4000))
            q = genome[p : p + 150 + i * 17]
            t = list(genome[p : p + 160 + i * 11])
            for j in range(0, len(t), 23):      # plant noise incl. indels
                t[j] = "ACGT"[int(rng.integers(0, 4))]
            if i % 2:
                del t[40]
            targets.append("".join(t))
            queries.append(q)
            if i % 3 == 2:                      # rc-style anchored at ends
                s1s.append(len(q) - 19)
                s2s.append(len(targets[-1]) - 19)
            else:
                s1s.append(0)
                s2s.append(0)
        cells = msa_kernels.banded_fill(queries, targets, s1s, s2s, 200,
                                        (1, -1, -8))
        for n in range(len(queries)):
            host = fill_cells(queries[n], targets[n], s1s[n], s2s[n], 200,
                              1, -1, -8)
            assert np.array_equal(host, cells[n, : len(queries[n]) + 1]), n

    def test_device_msa_consensus_identical(self, dix):
        genome, hix, dev = dix
        p = 1000
        # long query + high coverage so the size gates route the work to
        # the device kernels (rows*steps and candidate-count thresholds)
        query = genome[p : p + 700]
        ma_h = msa.build_multiple_alignment(query, 19, 19, 70, 0.65, 120, hix)
        ma_d = msa.build_multiple_alignment(query, 19, 19, 70, 0.65, 120, hix,
                                            dev=dev)
        assert ma_h.num_rows() == ma_d.num_rows()
        ch = ma_h.calculate_base_consensus(15, -1)
        cd = ma_d.calculate_base_consensus(15, -1)
        assert ch == cd and ch


class TestBatchedHostFill:
    def test_fill_cells_batched_equals_scalar(self):
        import random

        from longreadselfcorrect_tpu.core.overlapper import (
            extend_match, fill_cells, fill_cells_batched)

        random.seed(11)
        rs = lambda n: "".join(random.choice("ACGT") for _ in range(n))
        for bwid in (10, 31, 200):
            grp = []
            for _ in range(8):
                L1, L2 = random.randint(1, 120), random.randint(1, 140)
                grp.append((rs(L1), rs(L2), random.randint(0, L1 - 1),
                            random.randint(0, L2 - 1)))
            cb = fill_cells_batched([c[0] for c in grp], [c[1] for c in grp],
                                    [c[2] for c in grp], [c[3] for c in grp],
                                    bwid, 1, -1, -8)
            for n, (s1, s2, st1, st2) in enumerate(grp):
                ref = fill_cells(s1, s2, st1, st2, bwid, 1, -1, -8)
                got = cb[n, : len(s1) + 1]
                assert np.array_equal(got, ref), (bwid, n)
                o1 = extend_match(s1, s2, st1, st2, bwid, 1, -1, -8)
                o2 = extend_match(s1, s2, st1, st2, bwid, 1, -1, -8,
                                  cells=got)
                assert (o1.cigar, o1.score) == (o2.cigar, o2.score)
