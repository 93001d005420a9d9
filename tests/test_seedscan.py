"""Device seed scan == host search_seeds, field for field."""
import numpy as np
import pytest

from longreadselfcorrect_tpu.core import alphabet as ab
from longreadselfcorrect_tpu.core import seeds as seedmod
from longreadselfcorrect_tpu.core.correct import CorrectionParams, SelfCorrector
from longreadselfcorrect_tpu.core.batch_correct import BatchedSelfCorrector
from longreadselfcorrect_tpu.index import build
from longreadselfcorrect_tpu.index.fmindex import FMIndex, IndexSet
from longreadselfcorrect_tpu.index.host import HostFM, HostIndexSet


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(17)
    genome = "".join(rng.choice(list("ACGT"), size=20000))
    reads = []
    for i in range(400):  # ~20x of 1kb
        p = int(rng.integers(0, 20000 - 1000))
        r = list(genome[p : p + 1000])
        out = []
        for ch in r:
            x = rng.random()
            if x < 0.05:
                out.append("ACGT"[int(rng.integers(0, 4))])
            elif x < 0.07:
                pass
            elif x < 0.09:
                out.append(ch)
                out.append("ACGT"[int(rng.integers(0, 4))])
            else:
                out.append(ch)
        r = "".join(out)
        reads.append(ab.revcomp_str(r) if i % 2 else r)
    enc = [ab.encode(r) for r in reads]
    fwd, rev = build.build_bwt_pair(enc)
    hix = HostIndexSet(HostFM(fwd.symbols, fwd.num_strings),
                       HostFM(rev.symbols, rev.num_strings))
    dix = IndexSet(
        bwt=FMIndex.from_symbols(fwd.symbols, fwd.num_strings),
        rbwt=FMIndex.from_symbols(rev.symbols, rev.num_strings),
    )
    return reads, hix, dix


def _sig(s):
    return (s.seed_start_pos, s.seed_len, s.seed_str, s.max_fixed_mer_freq,
            s.is_repeat, s.start_best_kmer_size, s.end_best_kmer_size)


def test_device_seed_scan_matches_host(corpus):
    reads, hix, dix = corpus
    params = CorrectionParams(pb_coverage=20, genome=10)
    dev = BatchedSelfCorrector(hix, dix, params)
    host = SelfCorrector(hix, params)
    items = [(f"r{i}", reads[i]) for i in range(48)]
    got = {}
    for base, chunk, seeds_lists in dev._device_seed_scan(items):
        for (rid, seq), seeds in zip(chunk, seeds_lists):
            got[rid] = [_sig(s) for s in seeds]
    n_seeds = 0
    for rid, seq in items:
        want = [_sig(s) for s in seedmod.search_seeds(
            seq, hix, host.probe_params, host.thresh)]
        assert got[rid] == want, (
            rid, [a for a, b in zip(got[rid], want) if a != b][:2],
            len(got[rid]), len(want))
        n_seeds += len(want)
    assert n_seeds > 100  # the corpus must actually exercise the scan
