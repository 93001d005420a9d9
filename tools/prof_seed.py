"""Seed-scan phase profiler: device kernel vs host seed-building split."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))

import numpy as np
import jax

from longreadselfcorrect_tpu.core.batch_correct import BatchedSelfCorrector
from longreadselfcorrect_tpu.core.correct import CorrectionParams
from longreadselfcorrect_tpu.io import fasta
from longreadselfcorrect_tpu.ops import walk
from longreadselfcorrect_tpu.index.pack import open_index

CACHE = os.path.join(REPO, ".bench_cache")
N = int(os.environ.get("N_READS", "256"))


def main():
    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    items = [(r.id, r.seq) for r in fasta.read_seqs(os.path.join(CACHE, "noisy.fa"))][:N]
    hix, dix = open_index(os.path.join(CACHE, "ours"))
    params = CorrectionParams(pb_coverage=30, genome=10)
    dev = BatchedSelfCorrector(
        hix, dix, params,
        cfg=walk.WalkConfig(G=512, MAXLEN=640, QMAX=640, WSCAN=320))

    # warm up compiles
    for _ in dev._device_seed_scan(items[:64]):
        pass

    for round_i in range(2):
        t0 = time.time()
        t_submit = t_collect = t_build = 0.0
        n_seeds = 0
        # replicate _device_seed_scan structure with phase timers: time the
        # submission loop, then the device_get per chunk, then Seed building
        gen = dev._device_seed_scan(items)
        # the generator submits everything before the first yield; measure
        # that as submit time
        import types
        t1 = time.time()
        out = []
        first = True
        for base, chunk, seeds_lists in gen:
            if first:
                t_submit = time.time() - t1
                first = False
            out.append((base, chunk, seeds_lists))
        total = time.time() - t0
        n_seeds = sum(len(s) for _, _, sl in out for s in sl)
        print(f"round {round_i}: total {total:.2f}s (first-yield {t_submit:.2f}s)"
              f" seeds={n_seeds}", flush=True)

    # split device vs host inside one run using internal timing
    t0 = time.time()
    submitted = 0
    import jax.numpy as jnp
    from longreadselfcorrect_tpu.core import alphabet as ab
    from longreadselfcorrect_tpu.ops import seedscan, scan

    pp = dev.probe_params
    max_k = pp.kmer_len_up_bound + 1
    thr_dev = jnp.asarray(dev.thresh.table[:, : max_k + 1])
    rep_thr = jnp.float32(dev.thresh.get(2, pp.scan_kmer_len))
    R = 64
    L = max(len(seq) for _, seq in items)
    L = 256 * ((L + 255) // 256)
    t_encode = 0.0
    handles = []
    for base in range(0, len(items), R):
        chunk = items[base : base + R]
        te = time.time()
        mat = np.full((R, L), ab.PAD_RANK, np.int8)
        lens = np.zeros(R, np.int32)
        for i, (_, seq) in enumerate(chunk):
            e = ab.encode(seq)
            mat[i, : len(e)] = e
            lens[i] = len(e)
        t_encode += time.time() - te
        dmat = jnp.asarray(mat)
        dlens = jnp.asarray(lens)
        min_probe_k = pp.start_kmer_len + min(pp.offset) - 1
        pix = scan.plane_index_of(dev.ix, dev.wx)
        freq, valid = scan.kmer_table_planes(
            pix, dev.wx.fused.wcache, dmat, dlens, max_k, dev.wx.fused.ck)
        onehot = (dmat[:, :, None] == jnp.arange(1, 5, dtype=jnp.int8))
        prefix = jnp.pad(jnp.cumsum(onehot, axis=1, dtype=jnp.int32),
                         ((0, 0), (1, 0), (0, 0)))
        attr = seedscan._attributes(freq[pp.scan_kmer_len], prefix, dlens,
                                    rep_thr, pp.scan_kmer_len)
        n, starts, sizes, freqs, reps, statics = seedscan._scan_automaton(
            freq, valid, attr, prefix, dlens, thr_dev,
            pp.start_kmer_len, pp.kmer_len_up_bound, tuple(pp.offset),
            float(pp.hh_ratio))
        sk, ek, oor = seedscan._estimate_best(freq, n, starts, sizes, statics,
                                              pp.pb_coverage)
        keep = seedscan._remove_hitchhiking(n, starts, sizes, freqs, reps,
                                            pp.radius, float(pp.hh_ratio))
        handles.append((base, chunk, (n, starts, sizes, freqs, reps, statics,
                                      sk, ek, oor, keep)))
    t_dispatch = time.time() - t0
    jax.block_until_ready(handles[-1][2])
    t_device = time.time() - t0

    t2 = time.time()
    total_seeds = 0
    for base, chunk, devs in handles:
        arrs = [np.asarray(x) for x in devs]
        (n, starts, sizes, freqs, reps, statics, sk, ek, oor, keep) = arrs
        from longreadselfcorrect_tpu.core.seeds import Seed
        for i, (rid, seq) in enumerate(chunk):
            for j in range(int(n[i])):
                st, sz = int(starts[i, j]), int(sizes[i, j])
                s = Seed.make(seq[st : st + sz], st, int(freqs[i, j]),
                              bool(reps[i, j]), int(statics[i, j]),
                              pp.pb_coverage)
                if oor[i, j]:
                    s.estimate_best_kmer_size(dev.ix)
                else:
                    s.start_best_kmer_size = int(sk[i, j])
                    s.end_best_kmer_size = int(ek[i, j])
                s.is_hitchhiked = not bool(keep[i, j])
                total_seeds += 1
    t_host = time.time() - t2
    print(f"split: encode {t_encode:.2f}s dispatch {t_dispatch:.2f}s "
          f"device-complete {t_device:.2f}s host-build {t_host:.2f}s "
          f"seeds={total_seeds}", flush=True)


if __name__ == "__main__":
    main()
