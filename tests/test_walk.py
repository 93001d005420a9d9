"""Device walk engine vs host golden engine."""
import numpy as np
import pytest

import jax.numpy as jnp

from longreadselfcorrect_tpu.core import alphabet as ab
from longreadselfcorrect_tpu.core.extend import FMExtendParams, HostExtendEngine
from longreadselfcorrect_tpu.index import build
from longreadselfcorrect_tpu.index.fmindex import FMIndex, IndexSet
from longreadselfcorrect_tpu.index.host import HostFM, HostIndexSet
from longreadselfcorrect_tpu.ops import walk


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(33)
    genome = "".join(rng.choice(list("ACGT"), size=6000))
    reads = []
    for i in range(180):
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


def make_tasks(reads, rng, n, noisy=False):
    tasks = []
    expects = None
    for t in range(n):
        read = reads[(2 * t) % len(reads)]
        s = 40 + (t * 37) % 200
        gap = 80 + (t * 53) % 250
        src_seed = read[s : s + 19]
        t_start = s + 19 + gap
        trg_seed = read[t_start : t_start + 19]
        path = read[s + 19 : t_start]
        if noisy:
            p = list(path)
            for j in range(3, len(p), 13):
                p[j] = "ACGT"[("ACGT".index(p[j]) + 1) % 4]
            path = "".join(p)
        ek = 15
        tasks.append(
            walk.GapTask(
                src=src_seed[19 - ek:], path=path, trg=trg_seed, dis=gap,
                init_k=ek, max_overlap=ek + 2, min_overlap=13, min_sa_threshold=3,
            )
        )
    return tasks


def host_run(hix, task):
    eng = HostExtendEngine(
        hix, task.src, task.path, task.trg, task.dis, task.init_k,
        task.max_overlap, FMExtendParams(pb_coverage=30, error_rate=0.15),
        task.min_sa_threshold,
    )
    code, res = eng.extend()
    return code, res.merged_seq


class TestDeviceWalk:
    def test_matches_host_clean(self, corpus):
        genome, reads, hix, dix, rng = corpus
        tasks = make_tasks(reads, rng, 12)
        cfg = walk.WalkConfig(G=12, MAXLEN=512, QMAX=512)
        got = walk.run_gap_batch(hix, dix, tasks, cfg, 0.15, 30)
        mismatches = 0
        for task, (dcode, dseq) in zip(tasks, got):
            hcode, hseq = host_run(hix, task)
            if (dcode, dseq) != (hcode, hseq):
                mismatches += 1
                print("MISMATCH", dcode, hcode, len(dseq), len(hseq))
        assert mismatches == 0

    def test_matches_host_noisy(self, corpus):
        genome, reads, hix, dix, rng = corpus
        tasks = make_tasks(reads, rng, 12, noisy=True)
        cfg = walk.WalkConfig(G=12, MAXLEN=512, QMAX=512)
        got = walk.run_gap_batch(hix, dix, tasks, cfg, 0.15, 30)
        mismatches = 0
        for task, (dcode, dseq) in zip(tasks, got):
            hcode, hseq = host_run(hix, task)
            if (dcode, dseq) != (hcode, hseq):
                mismatches += 1
                print("MISMATCH", dcode, hcode, len(dseq), len(hseq))
        assert mismatches == 0


class TestQueueEngine:
    """Queue-refill engine must agree with the batch engine / host oracle."""

    def _run(self, corpus, noisy, slab):
        genome, reads, hix, dix, rng = corpus
        tasks = make_tasks(reads, rng, 24, noisy=noisy)
        cfg = walk.WalkConfig(G=8, MAXLEN=512, QMAX=512, SLAB=slab)
        wx = walk.WalkIndex.build(dix, hix)
        h = walk.submit_queue_batch(hix, wx, tasks, cfg, 0.15, 30)
        got = walk.collect_queue_batch(hix, wx, h, 0.15, 30)
        mismatches = 0
        for task, (dcode, dseq) in zip(tasks, got):
            hcode, hseq = host_run(hix, task)
            if dcode == -100:
                continue  # host-replay flag: scheduler handles it
            if (dcode, dseq) != (hcode, hseq):
                mismatches += 1
                print("MISMATCH", dcode, hcode, len(dseq), len(hseq))
        assert mismatches == 0

    def test_queue_clean(self, corpus):
        self._run(corpus, noisy=False, slab=False)

    def test_queue_noisy_slab(self, corpus):
        self._run(corpus, noisy=True, slab=True)
