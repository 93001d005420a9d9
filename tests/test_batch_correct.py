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


def test_planted_giant_gap_matches_host(corpus):
    """Adversarial: a read whose seeds flank a >3kb gap exceeds every
    device config's windows; the corrector must route it to the host
    engine (or raw fallback) and still match SelfCorrector exactly."""
    genome, reads, hix, dix, rng = corpus
    g2 = np.random.default_rng(33)
    # a read with clean flanks and a 3.5kb middle of near-random sequence
    # (below coverage) so the seed chain breaks across a giant gap
    left = genome[100:700]
    right = genome[5000:5600]
    middle = "".join(g2.choice(list("ACGT"), size=3500))
    items = [("giant", left + middle + right)]
    params = CorrectionParams(pb_coverage=30, genome=10)
    host = SelfCorrector(hix, params)
    dev = BatchedSelfCorrector(
        hix, dix, params,
        cfg=walk.WalkConfig(G=64, MAXLEN=640, QMAX=640, WSCAN=320),
    )
    got = dev.process_batch(items)
    want = host.process(*items[0])
    assert got[0].merge == want.merge
    assert got[0].corrected_strs == want.corrected_strs
    assert got[0].fm_num == want.fm_num and got[0].dp_num == want.dp_num


def test_queue_bank_1024_tasks(corpus):
    """>=1024-task queue-bank round: every task's (code, seq) must equal
    the host extension engine's."""
    from longreadselfcorrect_tpu.core.extend import FMExtendParams, HostExtendEngine

    genome, reads, hix, dix, rng = corpus
    g2 = np.random.default_rng(51)
    dev = BatchedSelfCorrector(
        hix, dix, CorrectionParams(pb_coverage=30, genome=10),
        cfg=walk.WalkConfig(G=64, MAXLEN=640, QMAX=640, WSCAN=320),
    )
    tasks = []
    for t in range(1030):
        p = int(g2.integers(0, len(genome) - 400))
        src = genome[p : p + 17]
        gap = 40 + t % 60
        path = list(genome[p + 17 : p + 17 + gap])
        for j in range(0, len(path), 11):  # ~9% errors in the gap
            path[j] = "ACGT"[int(g2.integers(0, 4))]
        trg = genome[p + 17 + gap : p + 37 + gap]
        tasks.append(walk.GapTask(
            src=src, path="".join(path), trg=trg, dis=gap, init_k=17,
            max_overlap=19, min_overlap=13, min_sa_threshold=3))
    h = walk.submit_queue_batch(hix, dev.wx, tasks, dev.cfg, 0.15, 30)
    res = walk.collect_queue_batch(hix, dev.wx, h, 0.15, 30)
    assert len(res) == len(tasks)
    fm_params = FMExtendParams(pb_coverage=30, error_rate=0.15)
    n_checked = 0
    for t, (code, seq) in zip(tasks[::13], res[::13]):  # spot-check 80
        eng = HostExtendEngine(hix, t.src, t.path, t.trg, t.dis, t.init_k,
                               t.max_overlap, fm_params, t.min_sa_threshold)
        hcode, hres = eng.extend()
        if code == -100:
            continue  # device-declined lanes replay on host by design
        assert code == hcode, (t.dis, code, hcode)
        if code > 0:
            assert seq == hres.merged_seq
        n_checked += 1
    assert n_checked >= 60
