"""M2 tests: seed-to-seed FM-extension walk on synthetic corpora."""
import numpy as np
import pytest

from longreadselfcorrect_tpu.core import alphabet as ab
from longreadselfcorrect_tpu.core import seeds as seedmod
from longreadselfcorrect_tpu.core.extend import FMExtendParams, HostExtendEngine
from longreadselfcorrect_tpu.core.threshold import default_table
from longreadselfcorrect_tpu.index import build
from longreadselfcorrect_tpu.index.host import HostFM, HostIndexSet


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(11)
    genome = "".join(rng.choice(list("ACGT"), size=6000))
    reads = []
    for i in range(180):  # ~30x of 1kb, both strands
        p = rng.integers(0, len(genome) - 1000)
        r = genome[p : p + 1000]
        reads.append(ab.revcomp_str(r) if i % 2 else r)
    enc = [ab.encode(r) for r in reads]
    fwd, rev = build.build_bwt_pair(enc)
    ix = HostIndexSet(HostFM(fwd.symbols, fwd.num_strings), HostFM(rev.symbols, rev.num_strings))
    return genome, reads, ix


def run_gap(ix, read, s_start, s_len, t_start, t_len, coverage=30):
    """Drive one seed-gap walk like correctByFMExtension
    (PacBioSelfCorrectionProcess.cpp:159-206) with non-repeat seeds."""
    source = read[s_start : s_start + s_len]
    target = read[t_start : t_start + t_len]
    interval = t_start - (s_start + s_len - 1) - 1
    extend_kmer_size = 15  # stand-in for min(bestK)-2 on clean data
    src = source[len(source) - extend_kmer_size:]
    path = read[s_start + s_len : t_start]
    params = FMExtendParams(pb_coverage=coverage, error_rate=0.15)
    min_sa = (coverage // 60) * 3 if coverage > 60 else 3
    eng = HostExtendEngine(
        ix, src, path, target, interval, extend_kmer_size,
        extend_kmer_size + 2, params, min_sa,
    )
    return eng.extend()


class TestExtension:
    def test_clean_gap_bridges_exactly(self, corpus):
        genome, reads, ix = corpus
        read = reads[0]
        code, res = run_gap(ix, read, 100, 19, 380, 19)
        assert code == 1
        # merged = src(15) + gap + target; reconstruct the full region
        merged = res.merged_seq
        want = read[100 + 19 - 15 : 380 + 19]
        assert merged == want

    def test_gap_with_read_errors_recovers_truth(self, corpus):
        genome, reads, ix = corpus
        read = reads[2]
        # corrupt the gap region of the query (as a noisy raw read would be);
        # seeds themselves stay clean
        noisy = list(read)
        rng = np.random.default_rng(9)
        for p in range(240, 340, 17):
            noisy[p] = "ACGT"[("ACGT".index(noisy[p]) + 2) % 4]
        noisy = "".join(noisy)
        source = read[180 : 180 + 19]
        target = read[400 : 400 + 19]
        interval = 400 - (180 + 19 - 1) - 1
        src = source[4:]
        path = noisy[199:400]
        params = FMExtendParams(pb_coverage=30, error_rate=0.15)
        eng = HostExtendEngine(ix, src, path, target, interval, 15, 17, params, 3)
        code, res = eng.extend()
        assert code == 1
        assert res.merged_seq == read[184:419]  # errors corrected to the truth

    def test_absent_target_fails(self, corpus):
        genome, reads, ix = corpus
        read = reads[4]
        # target seed that exists nowhere in the corpus
        fake_target = "ACGTTGCATGCAACGTGGA"
        source = read[100 : 100 + 19]
        src = source[4:]
        path = read[119:220]
        params = FMExtendParams(pb_coverage=30, error_rate=0.15)
        eng = HostExtendEngine(ix, src, path, fake_target, 101, 15, 17, params, 3)
        code, res = eng.extend()
        assert code < 0

    def test_long_gap(self, corpus):
        genome, reads, ix = corpus
        read = reads[6]
        code, res = run_gap(ix, read, 50, 19, 700, 19)
        assert code == 1
        assert res.merged_seq == read[50 + 4 : 719]
