"""Walk-engine profiling harness (bench corpus, real TPU).

Measures: superstep cost at several G, step-count distribution over the
bench's real gap tasks, and optionally a jax profiler trace.
"""
import os, sys, time, json, pickle

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp

from longreadselfcorrect_tpu.core.batch_correct import BatchedSelfCorrector
from longreadselfcorrect_tpu.core.correct import CorrectionParams
from longreadselfcorrect_tpu.index.pack import open_index
from longreadselfcorrect_tpu.io import fasta
from longreadselfcorrect_tpu.ops import walk

CACHE = os.path.join(REPO, ".bench_cache")
TASKS_PKL = os.path.join(CACHE, "prof_tasks.pkl")


def get_tasks(dev):
    if os.path.exists(TASKS_PKL):
        with open(TASKS_PKL, "rb") as f:
            return pickle.load(f)
    items = [(r.id, r.seq) for r in fasta.read_seqs(os.path.join(CACHE, "noisy.fa"))][:256]
    per_read = []
    for base, chunk, seeds_lists in dev._device_seed_scan(items):
        for (rid, seq), seeds in zip(chunk, seeds_lists):
            per_read.append((rid, seq, seeds))
    tasks = []
    for rid, seq, seeds in per_read:
        for i in range(1, len(seeds)):
            src, path, trg, interval, ek, min_sa = dev._plan_gap(seeds[i - 1], seeds[i], seq)
            if not dev._task_fits(src, path, trg, interval, ek, dev.cfg):
                continue
            tasks.append(walk.GapTask(
                src=src, path=path, trg=trg, dis=interval, init_k=ek,
                max_overlap=ek + 2, min_overlap=dev.params.min_kmer_len,
                min_sa_threshold=min_sa))
    with open(TASKS_PKL, "wb") as f:
        pickle.dump(tasks, f)
    return tasks


def main():
    print(f"devices: {jax.devices()}", flush=True)
    hix, dix = open_index(os.path.join(CACHE, "ours"))
    params = CorrectionParams(pb_coverage=30, genome=10)
    dev = BatchedSelfCorrector(hix, dix, params,
                               cfg=walk.WalkConfig(G=512, MAXLEN=640, QMAX=640, WSCAN=320))
    tasks = get_tasks(dev)
    print(f"{len(tasks)} small-bucket tasks; dis stats: "
          f"min={min(t.dis for t in tasks)} med={sorted(t.dis for t in tasks)[len(tasks)//2]} "
          f"max={max(t.dis for t in tasks)}", flush=True)

    cfg = dev.cfg
    order = sorted(range(len(tasks)), key=lambda i: tasks[i].dis)

    # --- per-batch step counts: instrument run_to_completion's loop -------
    import functools
    @functools.partial(jax.jit, static_argnames=("cfg", "max_steps"))
    def run_count(wx, consts, state, cfg, max_steps):
        def cond(c):
            step, st = c
            return (step < max_steps) & jnp.any(st.active & (st.code == 0))
        def body(c):
            step, st = c
            return step + 1, walk.superstep(wx, consts, st, cfg)
        steps, st = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
        # per-gap completion step is unknown; return total + codes
        return steps, st.code, st.res_overflow

    total_steps = 0
    t_all = 0.0
    for base in range(0, len(order), cfg.G):
        sel = order[base:base + cfg.G]
        chunk = [tasks[i] for i in sel]
        consts, state = walk.build_batch(hix, chunk, cfg, params.error_rate,
                                         params.pb_coverage, dev_ix=dev.wx)
        t0 = time.time()
        steps, code, over = run_count(dev.wx, consts, state, cfg, 4096)
        steps = int(steps)
        dt = time.time() - t0
        t_all += dt
        total_steps += steps
        print(f"batch n={len(chunk)} dis[{tasks[sel[0]].dis},{tasks[sel[-1]].dis}] "
              f"steps={steps} time={dt:.3f}s ({dt/max(steps,1)*1e3:.2f} ms/step)", flush=True)
    print(f"total: {total_steps} steps, {t_all:.2f}s", flush=True)

    # --- superstep raw cost at G=512 (steady state) ------------------------
    chunk = [tasks[i] for i in order[:cfg.G]]
    consts, state = walk.build_batch(hix, chunk, cfg, params.error_rate,
                                     params.pb_coverage, dev_ix=dev.wx)
    st = walk.multistep(dev.wx, consts, state, cfg, 8)
    jax.block_until_ready(st.code)
    for n in (64,):
        t0 = time.time()
        st2 = walk.multistep(dev.wx, consts, state, cfg, n)
        jax.block_until_ready(st2.code)
        dt = time.time() - t0
        print(f"multistep n={n} G={cfg.G}: {dt:.3f}s = {dt/n*1e3:.3f} ms/step", flush=True)

    if os.environ.get("PROF_TRACE"):
        d = "/tmp/jaxtrace"
        with jax.profiler.trace(d):
            st2 = walk.multistep(dev.wx, consts, state, cfg, 32)
            jax.block_until_ready(st2.code)
        print(f"trace written to {d}", flush=True)


if __name__ == "__main__" and not os.environ.get("PROF_QUEUE"):
    main()


def queue_prof():
    print(f"devices: {jax.devices()}", flush=True)
    hix, dix = open_index(os.path.join(CACHE, "ours"))
    params = CorrectionParams(pb_coverage=30, genome=10)
    dev = BatchedSelfCorrector(hix, dix, params,
                               cfg=walk.WalkConfig(G=512, MAXLEN=640, QMAX=640, WSCAN=320))
    tasks = get_tasks(dev)
    order = sorted(range(len(tasks)), key=lambda i: tasks[i].dis)
    tasks = [tasks[i] for i in order]
    cfg = dev.cfg
    os.environ["LRSC_DEBUG_TIMING"] = "1"
    for it in range(3):
        t0 = time.time()
        h = walk.submit_queue_batch(hix, dev.wx, tasks, cfg, params.error_rate,
                                    params.pb_coverage)
        t1 = time.time()
        res = walk.collect_queue_batch(hix, dev.wx, h, params.error_rate,
                                       params.pb_coverage)
        print(f"iter {it}: submit {t1-t0:.2f}s total {time.time()-t0:.2f}s "
              f"n={len(tasks)}", flush=True)


if __name__ == "__main__" and os.environ.get("PROF_QUEUE"):
    queue_prof()
    sys.exit(0)


def seed_prof():
    import jax.numpy as jnp
    from longreadselfcorrect_tpu.ops import scan, seedscan
    from longreadselfcorrect_tpu.core import alphabet as abm
    from longreadselfcorrect_tpu.io import fasta
    print(f"devices: {jax.devices()}", flush=True)
    hix, dix = open_index(os.path.join(CACHE, "ours"))
    params = CorrectionParams(pb_coverage=30, genome=10)
    dev = BatchedSelfCorrector(hix, dix, params,
                               cfg=walk.WalkConfig(G=512, MAXLEN=640, QMAX=640, WSCAN=320))
    items = [(r.id, r.seq) for r in fasta.read_seqs(os.path.join(CACHE, "noisy.fa"))][:256]
    pp = dev.probe_params
    max_k = pp.kmer_len_up_bound + 1
    print("max_k =", max_k, "ck =", dev.wx.fused.ck, flush=True)
    thr_dev = jnp.asarray(dev.thresh.table[:, : max_k + 1])
    rep_thr = jnp.float32(dev.thresh.get(2, pp.scan_kmer_len))
    R, L0 = 64, max(len(s) for _, s in items)
    L = 256 * ((L0 + 255) // 256)
    import numpy as np
    chunks = []
    for base in range(0, len(items), R):
        chunk = items[base:base+R]
        mat = np.full((R, L), abm.PAD_RANK, np.int8)
        lens = np.zeros(R, np.int32)
        for i, (_, seq) in enumerate(chunk):
            e = abm.encode(seq); mat[i,:len(e)] = e; lens[i] = len(e)
        chunks.append((jnp.asarray(mat), jnp.asarray(lens)))
    pix = scan.plane_index_of(hix, dev.wx)
    wc = dev.wx.fused.wcache
    ck = dev.wx.fused.ck

    def bench_phase(name, fn):
        outs = [fn(m, l) for m, l in chunks]  # warm
        jax.block_until_ready(outs)
        t0 = time.time()
        outs = [fn(m, l) for m, l in chunks]
        jax.block_until_ready(outs)
        print(f"{name}: {time.time()-t0:.2f}s", flush=True)
        return outs

    tabs = bench_phase("table (planes)", lambda m, l: scan.kmer_table_planes(pix, wc, m, l, max_k, ck))
    bench_phase("table (fusedrow)", lambda m, l: scan.kmer_table_full(dev.wx.ix, m, l, max_k))

    def rest(args):
        (m, l), (freq, valid) = args
        onehot = (m[:, :, None] == jnp.arange(1, 5, dtype=jnp.int8))
        prefix = jnp.pad(jnp.cumsum(onehot, axis=1, dtype=jnp.int32), ((0,0),(1,0),(0,0)))
        attr = seedscan._attributes(freq[pp.scan_kmer_len], prefix, l, rep_thr, pp.scan_kmer_len)
        n, starts, sizes, freqs, reps, statics = seedscan._scan_automaton(
            freq, valid, attr, prefix, l, thr_dev, pp.start_kmer_len,
            pp.kmer_len_up_bound, tuple(pp.offset), float(pp.hh_ratio))
        sk, ek, oor = seedscan._estimate_best(freq, n, starts, sizes, statics, pp.pb_coverage)
        keep = seedscan._remove_hitchhiking(n, starts, sizes, freqs, reps, pp.radius, float(pp.hh_ratio))
        return n, starts, sk, ek, keep

    outs = [rest(a) for a in zip(chunks, tabs)]; jax.block_until_ready(outs)
    t0 = time.time()
    outs = [rest(a) for a in zip(chunks, tabs)]; jax.block_until_ready(outs)
    print(f"automaton+estimate+hitchhike: {time.time()-t0:.2f}s", flush=True)


if __name__ == "__main__" and os.environ.get("PROF_SEED"):
    seed_prof()
    sys.exit(0)


def ablate_prof():
    import functools
    import jax.numpy as jnp
    print(f"devices: {jax.devices()}", flush=True)
    hix, dix = open_index(os.path.join(CACHE, "ours"))
    params = CorrectionParams(pb_coverage=30, genome=10)
    dev = BatchedSelfCorrector(hix, dix, params,
                               cfg=walk.WalkConfig(G=512, MAXLEN=640, QMAX=640, WSCAN=320))
    tasks = get_tasks(dev)
    order = sorted(range(len(tasks)), key=lambda i: tasks[i].dis)
    tasks = [tasks[i] for i in order]
    cfg = dev.cfg
    bank = walk.build_bank(hix, tasks, cfg, params.error_rate,
                           params.pb_coverage, dev_ix=dev.wx.ix, T=8192)
    G = cfg.G
    n = jnp.int32(len(tasks))
    T = 8192

    @functools.partial(jax.jit, static_argnames=("cfg", "nsteps", "mode"))
    def runner(wx, bank, n, cfg, nsteps, mode):
        task0 = jnp.arange(G, dtype=jnp.int32)
        used0 = task0 < n
        g0 = jnp.clip(task0, 0, T - 1)
        st0 = walk._init_state(walk._gather_consts(bank.consts, g0),
                               walk._gather_root(bank.root, g0), used0, cfg)
        o_lab = jnp.full((T + 1, cfg.MAXLEN), 5, jnp.int8)
        o_code = jnp.zeros(T + 1, jnp.int32)
        def body(i, c):
            head, task_id, st, o_code, o_lab = c
            cg = walk._gather_consts(bank.consts, jnp.clip(task_id, 0, T - 1))
            st = walk.superstep(wx, cg, st, cfg)
            if mode in ("reduce", "full"):
                done = st.active & (st.code != 0)
                code_r, over_r, has_r, lab_r, len_r, i_r = walk._reduce_results(st, cfg)
                widx = jnp.where(done, task_id, T)
                o_code = o_code.at[widx].set(code_r)
                o_lab = o_lab.at[widx].set(lab_r)
            if mode == "full":
                new_t = head + jnp.cumsum(done.astype(jnp.int32)) - 1
                has_new = done & (new_t < n)
                nid = jnp.where(done, jnp.where(has_new, new_t, T), task_id)
                gidx = jnp.clip(nid, 0, T - 1)
                fresh = walk._init_state(walk._gather_consts(bank.consts, gidx),
                                         walk._gather_root(bank.root, gidx),
                                         has_new, cfg)
                st = walk._select_state(done, fresh, st)
                head = head + jnp.sum(done, dtype=jnp.int32)
                task_id = nid
            return (head, task_id, st, o_code, o_lab)
        out = jax.lax.fori_loop(0, nsteps, body, (jnp.int32(G), task0, st0, o_code, o_lab))
        return out[2].code, out[3]

    for mode in ("step", "reduce", "full"):
        r = runner(dev.wx, bank, n, cfg, 64, mode)
        jax.block_until_ready(r)
        t0 = time.time()
        r = runner(dev.wx, bank, n, cfg, 64, mode)
        jax.block_until_ready(r)
        dt = time.time() - t0
        print(f"mode={mode}: {dt:.3f}s = {dt/64*1e3:.3f} ms/step", flush=True)

    # fixed-consts superstep baseline
    consts, state = walk.build_batch(hix, tasks[:G], cfg, params.error_rate,
                                     params.pb_coverage, dev_ix=dev.wx)
    st = walk.multistep(dev.wx, consts, state, cfg, 8)
    jax.block_until_ready(st.code)
    t0 = time.time()
    st2 = walk.multistep(dev.wx, consts, state, cfg, 64)
    jax.block_until_ready(st2.code)
    dt = time.time() - t0
    print(f"mode=baseline(fixed consts): {dt:.3f}s = {dt/64*1e3:.3f} ms/step", flush=True)


if __name__ == "__main__" and os.environ.get("PROF_ABLATE"):
    ablate_prof()
    sys.exit(0)


def while_vs_fori():
    import functools
    import jax.numpy as jnp
    print(f"devices: {jax.devices()}", flush=True)
    hix, dix = open_index(os.path.join(CACHE, "ours"))
    params = CorrectionParams(pb_coverage=30, genome=10)
    dev = BatchedSelfCorrector(hix, dix, params,
                               cfg=walk.WalkConfig(G=512, MAXLEN=640, QMAX=640, WSCAN=320))
    tasks = get_tasks(dev)
    order = sorted(range(len(tasks)), key=lambda i: tasks[i].dis)
    tasks = [tasks[i] for i in order]
    cfg = dev.cfg
    bank = walk.build_bank(hix, tasks, cfg, params.error_rate,
                           params.pb_coverage, dev_ix=dev.wx.ix, T=8192)
    G, T = cfg.G, 8192
    n = jnp.int32(len(tasks))

    @functools.partial(jax.jit, static_argnames=("cfg", "nsteps", "use_while"))
    def runner(wx, bank, n, cfg, nsteps, use_while):
        task0 = jnp.arange(G, dtype=jnp.int32)
        used0 = task0 < n
        g0 = jnp.clip(task0, 0, T - 1)
        st0 = walk._init_state(walk._gather_consts(bank.consts, g0),
                               walk._gather_root(bank.root, g0), used0, cfg)
        o_lab = jnp.full((T + 1, cfg.MAXLEN), 5, jnp.int8)
        o_code = jnp.zeros(T + 1, jnp.int32)
        def body(c):
            step, head, task_id, st, o_code, o_lab = c
            cg = walk._gather_consts(bank.consts, jnp.clip(task_id, 0, T - 1))
            st = walk.superstep(wx, cg, st, cfg)
            done = st.active & (st.code != 0)
            code_r, over_r, has_r, lab_r, len_r, i_r = walk._reduce_results(st, cfg)
            widx = jnp.where(done, task_id, T)
            o_code = o_code.at[widx].set(code_r)
            o_lab = o_lab.at[widx].set(lab_r)
            new_t = head + jnp.cumsum(done.astype(jnp.int32)) - 1
            has_new = done & (new_t < n)
            nid = jnp.where(done, jnp.where(has_new, new_t, T), task_id)
            gidx = jnp.clip(nid, 0, T - 1)
            fresh = walk._init_state(walk._gather_consts(bank.consts, gidx),
                                     walk._gather_root(bank.root, gidx),
                                     has_new, cfg)
            st = walk._select_state(done, fresh, st)
            head = head + jnp.sum(done, dtype=jnp.int32)
            return (step + 1, head, nid, st, o_code, o_lab)
        carry = (jnp.int32(0), jnp.int32(G), task0, st0, o_code, o_lab)
        if use_while:
            out = jax.lax.while_loop(
                lambda c: (c[0] < nsteps) & jnp.any(c[3].active & (c[3].code == 0)),
                body, carry)
        else:
            out = jax.lax.fori_loop(0, nsteps, lambda i, c: body(c), carry)
        return out[0], out[4]

    for use_while in (False, True):
        r = runner(dev.wx, bank, n, cfg, 1110, use_while)
        jax.block_until_ready(r)
        t0 = time.time()
        r = runner(dev.wx, bank, n, cfg, 1110, use_while)
        jax.block_until_ready(r)
        dt = time.time() - t0
        print(f"use_while={use_while}: steps={int(r[0])} {dt:.3f}s = {dt/int(r[0])*1e3:.3f} ms/step", flush=True)


if __name__ == "__main__" and os.environ.get("PROF_WVF"):
    while_vs_fori()
    sys.exit(0)


def split_prof():
    import jax.numpy as jnp
    print(f"devices: {jax.devices()}", flush=True)
    hix, dix = open_index(os.path.join(CACHE, "ours"))
    params = CorrectionParams(pb_coverage=30, genome=10)
    dev = BatchedSelfCorrector(hix, dix, params,
                               cfg=walk.WalkConfig(G=512, MAXLEN=640, QMAX=640, WSCAN=320))
    tasks = get_tasks(dev)
    tasks = [tasks[i] for i in sorted(range(len(tasks)), key=lambda i: tasks[i].dis)]
    cfg = dev.cfg
    for it in range(3):
        t0 = time.time()
        bank = walk.build_bank(hix, tasks, cfg, params.error_rate,
                               params.pb_coverage, dev_ix=dev.wx, T=8192)
        jax.block_until_ready(bank.consts.qcode9)
        t1 = time.time()
        outs = walk.queue_run(dev.wx, bank, jnp.int32(len(tasks)), cfg, 4096, 1 << 18)
        jax.block_until_ready(outs)
        t2 = time.time()
        o = jax.device_get(outs)
        t3 = time.time()
        print(f"iter {it}: prep {t1-t0:.2f}s loop {t2-t1:.2f}s readback {t3-t2:.2f}s steps={int(o[0])}", flush=True)


if __name__ == "__main__" and os.environ.get("PROF_SPLIT"):
    split_prof()
    sys.exit(0)
