"""BatchedSelfCorrector must match the host SelfCorrector exactly."""
import numpy as np
import pytest

from longreadselfcorrect_tpu.core import alphabet as ab
from longreadselfcorrect_tpu.core.batch_correct import BatchedSelfCorrector
from longreadselfcorrect_tpu.core.correct import CorrectionParams, SelfCorrector
from longreadselfcorrect_tpu.index import build
from longreadselfcorrect_tpu.index.fmindex import FMIndex, IndexSet
from longreadselfcorrect_tpu.index.host import HostFM, HostIndexSet
from longreadselfcorrect_tpu.ops import walk


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(99)
    genome = "".join(rng.choice(list("ACGT"), size=9000))
    reads = []
    for i in range(270):
        p = rng.integers(0, len(genome) - 1000)
        r = genome[p : p + 1000]
        reads.append(ab.revcomp_str(r) if i % 2 else r)
    enc = [ab.encode(r) for r in reads]
    fwd, rev = build.build_bwt_pair(enc)
    hix = HostIndexSet(HostFM(fwd.symbols, fwd.num_strings), HostFM(rev.symbols, rev.num_strings))
    dix = IndexSet(
        bwt=FMIndex.from_symbols(fwd.symbols, fwd.num_strings),
        rbwt=FMIndex.from_symbols(rev.symbols, rev.num_strings),
    )
    return genome, reads, hix, dix, rng


def noisy_reads(genome, rng, n, err):
    out = []
    for i in range(n):
        p = int(rng.integers(0, len(genome) - 1200))
        truth = genome[p : p + 1200]
        chars = []
        for ch in truth:
            r = rng.random()
            if r < err * 0.6:
                chars.append("ACGT"[("ACGT".index(ch) + int(rng.integers(1, 4))) % 4])
            elif r < err * 0.8:
                pass
            elif r < err:
                chars.append(ch)
                chars.append("ACGT"[int(rng.integers(0, 4))])
            else:
                chars.append(ch)
        out.append((f"read_{i}", "".join(chars)))
    return out


def test_batched_matches_host(corpus):
    genome, reads, hix, dix, rng = corpus
    items = noisy_reads(genome, np.random.default_rng(7), 6, 0.06)
    params = CorrectionParams(pb_coverage=30, genome=10)
    host = SelfCorrector(hix, params)
    dev = BatchedSelfCorrector(
        hix, dix, params,
        cfg=walk.WalkConfig(G=64, MAXLEN=640, QMAX=640, WSCAN=320),
    )
    got = dev.process_batch(items)
    for (rid, seq), dres in zip(items, got):
        hres = host.process(rid, seq)
        assert dres.merge == hres.merge, rid
        assert dres.corrected_strs == hres.corrected_strs, rid
        assert dres.fm_num == hres.fm_num and dres.dp_num == hres.dp_num, rid
    # the prefetch should have served nearly all gaps
    total = dev.stats["prefetch_hit"] + dev.stats["prefetch_miss"] + dev.stats["host_fallback"]
    assert total > 0
    assert dev.stats["prefetch_hit"] >= 0.8 * total, dev.stats


def test_stream_matches_batch(corpus):
    """process_stream (pipelined batches) must equal process_batch."""
    genome, reads, hix, dix, rng = corpus
    items = noisy_reads(genome, np.random.default_rng(21), 8, 0.06)
    params = CorrectionParams(pb_coverage=30, genome=10)
    dev = BatchedSelfCorrector(
        hix, dix, params,
        cfg=walk.WalkConfig(G=64, MAXLEN=640, QMAX=640, WSCAN=320),
    )
    whole = dev.process_batch(items)
    streamed = []
    for part in dev.process_stream([items[:3], items[3:6], items[6:]]):
        streamed.extend(part)
    assert len(streamed) == len(whole)
    for a, b in zip(whole, streamed):
        assert a.merge == b.merge
        assert a.corrected_strs == b.corrected_strs
        assert (a.fm_num, a.dp_num) == (b.fm_num, b.dp_num)
