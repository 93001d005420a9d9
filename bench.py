"""Round benchmark: corrected reads/s on the device engine.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The workload is the north-star config: PacBio-style self-correction of noisy
reads against an FM-index of the read set itself (synthetic E. coli-like
corpus; the reference repo publishes no numbers — BASELINE.md).  vs_baseline
compares against the pure-host (numpy) engine measured in the same process,
i.e. the single-thread CPU path with identical semantics.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_corpus(rng, genome_len=30000, n_reads=300, read_len=2000):
    from longreadselfcorrect_tpu.core import alphabet as ab

    genome = "".join(rng.choice(list("ACGT"), size=genome_len))
    reads = []
    for i in range(n_reads):
        p = int(rng.integers(0, genome_len - read_len))
        r = genome[p : p + read_len]
        reads.append(ab.revcomp_str(r) if i % 2 else r)
    return genome, reads


def noisify(rng, s, e):
    out = []
    for ch in s:
        r = rng.random()
        if r < e * 0.6:
            out.append("ACGT"[("ACGT".index(ch) + int(rng.integers(1, 4))) % 4])
        elif r < e * 0.8:
            pass
        elif r < e:
            out.append(ch)
            out.append("ACGT"[int(rng.integers(0, 4))])
        else:
            out.append(ch)
    return "".join(out)


def main():
    import jax

    from longreadselfcorrect_tpu.core import alphabet as ab
    from longreadselfcorrect_tpu.core.batch_correct import BatchedSelfCorrector
    from longreadselfcorrect_tpu.core.correct import CorrectionParams, SelfCorrector
    from longreadselfcorrect_tpu.index import build
    from longreadselfcorrect_tpu.index.fmindex import FMIndex, IndexSet
    from longreadselfcorrect_tpu.index.host import HostFM, HostIndexSet
    from longreadselfcorrect_tpu.ops import walk

    rng = np.random.default_rng(2026)
    log(f"devices: {jax.devices()}")
    genome, reads = make_corpus(rng)
    t0 = time.time()
    enc = [ab.encode(r) for r in reads]
    fwd, rev = build.build_bwt_pair(enc)
    log(f"index: {fwd.num_symbols} symbols in {time.time()-t0:.1f}s")
    hix = HostIndexSet(HostFM(fwd.symbols, fwd.num_strings), HostFM(rev.symbols, rev.num_strings))
    dix = IndexSet(
        bwt=FMIndex.from_symbols(fwd.symbols, fwd.num_strings),
        rbwt=FMIndex.from_symbols(rev.symbols, rev.num_strings),
    )

    # noisy 8%-error reads drawn from the same genome (self-correction setting)
    n_bench = int(os.environ.get("BENCH_READS", "24"))
    items = [(f"r{i}", noisify(rng, genome[p : p + 1500], 0.08))
             for i, p in enumerate(rng.integers(0, len(genome) - 1600, size=n_bench))]

    params = CorrectionParams(pb_coverage=30, genome=10)

    # --- device engine ---
    dev = BatchedSelfCorrector(
        hix, dix, params,
        cfg=walk.WalkConfig(G=256, MAXLEN=640, QMAX=640, WSCAN=320),
    )
    warm = dev.process_batch(items[:2])  # compile
    t0 = time.time()
    out = dev.process_batch(items)
    dt_dev = time.time() - t0
    dev_rps = len(items) / dt_dev
    ok = sum(1 for r in out if r.merge)
    log(f"device: {len(items)} reads in {dt_dev:.1f}s -> {dev_rps:.2f} reads/s "
        f"(merge {ok}/{len(items)}, stats {dev.stats})")

    # --- host baseline on a subset ---
    host = SelfCorrector(hix, params)
    n_host = min(4, len(items))
    t0 = time.time()
    for rid, seq in items[:n_host]:
        host.process(rid, seq)
    dt_host = time.time() - t0
    host_rps = n_host / dt_host
    log(f"host baseline: {n_host} reads in {dt_host:.1f}s -> {host_rps:.2f} reads/s")

    print(json.dumps({
        "metric": "pbcorrect_reads_per_s_per_chip",
        "value": round(dev_rps, 3),
        "unit": "reads/s (1.5kb 8%-err reads, 30x synthetic corpus)",
        "vs_baseline": round(dev_rps / host_rps, 2),
    }))


if __name__ == "__main__":
    main()
