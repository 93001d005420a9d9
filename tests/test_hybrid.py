"""pbhc (hybrid correction) tests on synthetic short-read + PacBio data."""
import numpy as np
import pytest

from longreadselfcorrect_tpu.core import alphabet as ab
from longreadselfcorrect_tpu.core.hybrid import HybridCorrector, HybridParams
from longreadselfcorrect_tpu.index import build
from longreadselfcorrect_tpu.index.host import HostFM, HostIndexSet


@pytest.fixture(scope="module")
def sr_index():
    rng = np.random.default_rng(321)
    genome = "".join(rng.choice(list("ACGT"), size=30000))
    reads = []
    for i in range(18000):  # ~60x coverage of 100bp short reads
        p = int(rng.integers(0, len(genome) - 100))
        r = genome[p : p + 100]
        reads.append(ab.revcomp_str(r) if i % 2 else r)
    enc = [ab.encode(r) for r in reads]
    fwd, rev = build.build_bwt_pair(enc)
    ix = HostIndexSet(HostFM(fwd.symbols, fwd.num_strings), HostFM(rev.symbols, rev.num_strings))
    # a small PacBio index (noisy 15%-error long reads over the same genome)
    pb_reads = []
    for i in range(150):  # ~5x of 1kb
        p = int(rng.integers(0, len(genome) - 1000))
        r = list(genome[p : p + 1000])
        for j in range(len(r)):
            if rng.random() < 0.15:
                r[j] = "ACGT"[int(rng.integers(0, 4))]
        pb_reads.append("".join(r))
    enc = [ab.encode(r) for r in pb_reads]
    fwd, rev = build.build_bwt_pair(enc)
    pb_ix = HostIndexSet(HostFM(fwd.symbols, fwd.num_strings), HostFM(rev.symbols, rev.num_strings))
    return genome, ix, pb_ix, rng


def test_hybrid_corrects_noisy_read(sr_index):
    genome, ix, pb_ix, _ = sr_index
    rng = np.random.default_rng(9)
    truth = genome[10000:11200]
    noisy = []
    for ch in truth:
        r = rng.random()
        if r < 0.06:
            noisy.append("ACGT"[("ACGT".index(ch) + int(rng.integers(1, 4))) % 4])
        elif r < 0.09:
            pass
        elif r < 0.13:
            noisy.append(ch)
            noisy.append("ACGT"[int(rng.integers(0, 4))])
        else:
            noisy.append(ch)
    noisy = "".join(noisy)

    corr = HybridCorrector(ix, pb_ix, HybridParams(coverage=60))
    res = corr.correct("pb1", noisy)
    assert res["merge"]
    assert res["total_seed_num"] >= 2
    assert res["walk_num"] >= 1
    # the corrected pieces should be near-exact genome substrings
    joined = res["corrected_strs"]
    assert joined
    good = 0
    for piece in joined:
        if piece in genome or ab.revcomp_str(piece) in genome:
            good += 1
    assert good >= max(1, len(joined) // 2), (good, len(joined))
    assert res["corrected_num"] >= 1


def test_hybrid_junk_no_seeds(sr_index):
    genome, ix, pb_ix, _ = sr_index
    rng = np.random.default_rng(10)
    junk = "".join(rng.choice(list("ACGT"), size=600))
    corr = HybridCorrector(ix, pb_ix, HybridParams(coverage=60))
    res = corr.correct("junk", junk)
    assert not res["merge"]
