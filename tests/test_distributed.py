"""Two-process jax.distributed smoke: sharded correction + ordered merge.

Mirrors the reference's multi-worker semantics (one ordered output sink,
Concurrency/SequenceProcessFramework.h:183-195) across PROCESSES: each
rank corrects a contiguous shard of the reads on its own devices, writes
a part file, and rank 0's ordered merge must equal the single-process
output byte-for-byte."""
import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, %(repo)r)
    import jax
    jax.config.update("jax_platforms", "cpu")
    rank = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    from longreadselfcorrect_tpu.parallel import distributed as dist
    dist.init(f"127.0.0.1:{port}", nproc, rank)
    assert jax.process_count() == nproc

    # tiny deterministic corpus, corrected with the host engine (the engine
    # choice is irrelevant to the ordered-sink semantics under test)
    import numpy as np
    from longreadselfcorrect_tpu.core import alphabet as ab
    rng = np.random.default_rng(5)
    genome = "".join(rng.choice(list("ACGT"), size=400))
    reads = [genome[i:i+60] for i in range(0, 340, 20)]
    reads = [ab.revcomp_str(r) if i %% 2 else r for i, r in enumerate(reads)]

    out = sys.argv[4]
    lo, hi = dist.shard_bounds(len(reads), nproc, rank)
    with open(dist.part_path(out, rank), "w") as fh:
        for i in range(lo, hi):
            fh.write(f">r{i}\\n{reads[i]}\\n")

    total = dist.global_counter_sum(np.array([hi - lo, 1.0]))
    assert int(total[0]) == len(reads), total
    assert int(total[1]) == nproc, total

    # global barrier before the rank-0 merge
    import jax.experimental.multihost_utils as mhu
    mhu.sync_global_devices("parts-done")
    if rank == 0:
        dist.merge_ordered_parts(out, nproc)
    print("WORKER-OK", rank)
""")



def test_two_process_ordered_merge(tmp_path):
    out = str(tmp_path / "merged.fa")
    script = tmp_path / "worker.py"
    script.write_text(WORKER % {"repo": REPO})
    port = "39117"
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    procs = [
        subprocess.Popen([sys.executable, str(script), str(r), "2", port, out],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for r in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for r, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{o}"
        assert f"WORKER-OK {r}" in o
    # the merged file must equal the single-process order
    merged = open(out).read()
    ids = [line[1:].strip() for line in merged.splitlines() if line.startswith(">")]
    assert ids == [f"r{i}" for i in range(17)]


def _make_pb_corpus(tmp_path):
    """Small PacBio-style corpus + index for the CLI device-engine test."""
    import numpy as np

    from longreadselfcorrect_tpu.core import alphabet as ab

    rng = np.random.default_rng(44)
    genome = "".join(rng.choice(list("ACGT"), size=6000))
    corpus = tmp_path / "corpus.fa"
    with open(corpus, "w") as f:
        for i in range(180):
            p = int(rng.integers(0, 6000 - 600))
            r = genome[p : p + 600]
            if i % 2:
                r = ab.revcomp_str(r)
            f.write(f">c{i}\n{r}\n")
    noisy = tmp_path / "noisy.fa"
    with open(noisy, "w") as f:
        for i, p in enumerate(rng.integers(0, 6000 - 650, size=8)):
            truth = genome[p : p + 600]
            chars = []
            for ch in truth:
                r = rng.random()
                if r < 0.03:
                    chars.append("ACGT"[("ACGT".index(ch) + int(rng.integers(1, 4))) % 4])
                else:
                    chars.append(ch)
            f.write(f">r{i}\n{''.join(chars)}\n")
    return corpus, noisy


def test_two_process_cli_device_engine(tmp_path):
    """End-to-end: `pbcorrect --engine device --num-processes 2` per rank
    on the virtual CPU mesh must byte-equal the single-process run after
    the rank-0 ordered merge."""
    corpus, noisy = _make_pb_corpus(tmp_path)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               JAX_COMPILATION_CACHE_DIR=os.path.join(REPO, ".jax_cache"),
               PYTHONPATH=REPO)
    wrap = (
        "import jax, sys, runpy; jax.config.update('jax_platforms', 'cpu');"
        "sys.argv = ['cli'] + sys.argv[1:];"
        "runpy.run_module('longreadselfcorrect_tpu.cli', run_name='__main__')"
    )

    def cli(extra, cwd):
        return [sys.executable, "-c", wrap] + extra

    subprocess.run(cli(["index", str(corpus), "-p", str(tmp_path / "ix")],
                       tmp_path), env=env, check=True, capture_output=True)
    base = ["pbcorrect", str(noisy), "-p", str(tmp_path / "ix"), "-c", "30",
            "--engine", "device", "--walk-config", "64,640,640,320",
            "--batch-reads", "8"]
    # single-process reference output
    single = tmp_path / "single"
    subprocess.run(cli(base + ["-o", str(single)], tmp_path), env=env,
                   check=True, capture_output=True)
    # two ranks
    multi = tmp_path / "multi"
    port = "39481"
    procs = [
        subprocess.Popen(
            cli(base + ["-o", str(multi), "--num-processes", "2",
                        "--process-id", str(r), "--coordinator",
                        f"127.0.0.1:{port}"], tmp_path),
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for r in range(2)
    ]
    outs = [p.communicate(timeout=1500)[0] for p in procs]
    for r, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{o[-3000:]}"
    for name in ("correct.fa", "discard.fa"):
        a = (single / name).read_text()
        b = (multi / name).read_text()
        assert a == b, f"{name} differs between 1-proc and 2-proc runs"
    assert (single / "correct.fa").read_text().count(">") > 0
