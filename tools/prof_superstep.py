"""Ablation: how much of one superstep is the slab occ sweep vs the rest."""
import os, sys, time, functools

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp

from longreadselfcorrect_tpu.core.batch_correct import BatchedSelfCorrector
from longreadselfcorrect_tpu.core.correct import CorrectionParams
from longreadselfcorrect_tpu.index.pack import open_index
from longreadselfcorrect_tpu.ops import walk

CACHE = os.path.join(REPO, ".bench_cache")


def main():
    import pickle
    print(f"devices: {jax.devices()}", flush=True)
    hix, dix = open_index(os.path.join(CACHE, "ours"))
    params = CorrectionParams(pb_coverage=30, genome=10)
    dev = BatchedSelfCorrector(hix, dix, params,
                               cfg=walk.WalkConfig(G=512, MAXLEN=640, QMAX=640, WSCAN=320))
    with open(os.path.join(CACHE, "prof_tasks.pkl"), "rb") as f:
        tasks = pickle.load(f)
    cfg = dev.cfg
    order = sorted(range(len(tasks)), key=lambda i: tasks[i].dis)
    chunk = [tasks[i] for i in order[: cfg.G]]
    consts, state = walk.build_batch(hix, chunk, cfg, params.error_rate,
                                     params.pb_coverage, dev_ix=dev.wx)
    # advance a few steps to a representative state
    st = state
    for _ in range(20):
        st = walk.superstep(dev.wx, consts, st, cfg)
    jax.block_until_ready(st.code)

    @functools.partial(jax.jit, static_argnames=("cfg", "n"))
    def sweep_only(wx, s, cfg, n):
        fx = wx.fused

        def body(i, acc):
            c0 = s.chain[:, :, :, 0]
            slabF = walk._slab_fetch(fx, cfg, c0[:, :, 0], c0[:, :, 1], rbwt_side=True)
            slabR = walk._slab_fetch(fx, cfg, c0[:, :, 2], c0[:, :, 3], rbwt_side=False)
            BF = walk._slab_B(slabF[0])
            BR = walk._slab_B(slabR[0])
            qFL = jnp.concatenate([s.chain[:, :, 0, :] - 1, s.chain[:, :, 1, :]], axis=-1)
            qRL = jnp.concatenate([s.chain[:, :, 2, :] - 1, s.chain[:, :, 3, :]], axis=-1)
            oF = walk._slab_occ_all(slabF, qFL, BF)
            oR = walk._slab_occ_all(slabR, qRL, BR)
            return acc + oF.sum() + oR.sum() + i

        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    @functools.partial(jax.jit, static_argnames=("cfg", "n"))
    def full_steps(wx, consts, s, cfg, n):
        def body(i, s):
            return walk.superstep(wx, consts, s, cfg)

        return jax.lax.fori_loop(0, n, body, s)

    # distinct states per timed call (the tunnel backend may memoize
    # identical executions); per-step cost from differencing two chained
    # lengths with the same compiled executables
    st_b = walk.superstep(dev.wx, consts, st, cfg)
    st_c = walk.superstep(dev.wx, consts, st_b, cfg)
    for n in (32, 96):
        jax.block_until_ready(sweep_only(dev.wx, st, cfg, n))       # compile
        jax.block_until_ready(full_steps(dev.wx, consts, st, cfg, n).code)
    res = {}
    for name, fn, reader in (
        ("sweep", lambda s, n: sweep_only(dev.wx, s, cfg, n),
         lambda o: int(np.asarray(o))),
        ("full", lambda s, n: full_steps(dev.wx, consts, s, cfg, n),
         lambda o: int(np.asarray(o.code).sum())),
    ):
        ts = {}
        for n, s0 in ((32, st_b), (96, st_c)):
            t0 = time.time()
            reader(fn(s0, n))   # host readback forces execution
            ts[n] = time.time() - t0
        res[name] = (ts[96] - ts[32]) / 64
        print(f"{name}: t32={ts[32]*1e3:.1f}ms t96={ts[96]*1e3:.1f}ms "
              f"-> {res[name]*1e3:.3f} ms/step")
    print(f"G={cfg.G} L={cfg.L} NCHAIN={cfg.NCHAIN} SB={cfg.SB} "
          f"sweep share {res['sweep']/max(res['full'],1e-9)*100:.0f}%")


if __name__ == "__main__":
    main()
