"""Multi-chip correctness: the sharded walk must be bit-identical to the
unsharded run (reference semantics: a thread pool changes nothing about
per-read results, Concurrency/SequenceProcessFramework.h:90-230)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from longreadselfcorrect_tpu.ops import walk
from longreadselfcorrect_tpu.parallel import mesh as meshmod

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from __graft_entry__ import _tiny_setup, _tiny_walk_batch  # noqa: E402


def _noisy_setup(seed=3):
    """Corpus with substitution noise so walks branch and relax."""
    from longreadselfcorrect_tpu.core import alphabet as ab
    from longreadselfcorrect_tpu.index import build
    from longreadselfcorrect_tpu.index.fmindex import FMIndex, IndexSet
    from longreadselfcorrect_tpu.index.host import HostFM, HostIndexSet

    rng = np.random.default_rng(seed)
    genome = "".join(rng.choice(list("ACGT"), size=3000))
    reads = []
    for i in range(80):
        p = int(rng.integers(0, 3000 - 300))
        r = list(genome[p : p + 300])
        for j in range(len(r)):
            if rng.random() < 0.03:
                r[j] = "ACGT"[int(rng.integers(0, 4))]
        r = "".join(r)
        reads.append(ab.revcomp_str(r) if i % 2 else r)
    enc = [ab.encode(r) for r in reads]
    fwd, rev = build.build_bwt_pair(enc)
    hix = HostIndexSet(HostFM(fwd.symbols, fwd.num_strings),
                       HostFM(rev.symbols, rev.num_strings))
    dix = IndexSet(
        bwt=FMIndex.from_symbols(fwd.symbols, fwd.num_strings),
        rbwt=FMIndex.from_symbols(rev.symbols, rev.num_strings),
    )
    return genome, reads, hix, dix


def _run_both(hix, dix, reads, G=16, max_steps=256):
    wx, consts, state, cfg = _tiny_walk_batch(hix, dix, reads, G=G)
    ref_state = walk.run_to_completion(wx, consts, state, cfg, max_steps)
    ref = walk._reduce_results(ref_state, cfg)

    m = meshmod.make_mesh(jax.devices()[:8])
    swx, sconsts, sstate = meshmod.shard_walk_batch(m, wx, consts, state)
    sh_state = walk.run_to_completion(swx, sconsts, sstate, cfg, max_steps)
    sh = walk._reduce_results(sh_state, cfg)
    return ref, sh


@pytest.mark.parametrize("setup", ["clean", "noisy"])
def test_sharded_walk_bit_identical(setup):
    if setup == "clean":
        genome, reads, hix, dix = _tiny_setup()
    else:
        genome, reads, hix, dix = _noisy_setup()
    ref, sh = _run_both(hix, dix, reads)
    names = ("code", "res_overflow", "has", "lab", "len", "i")
    for name, a, b in zip(names, ref, sh):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)


def test_counter_allreduce():
    m = meshmod.make_mesh(jax.devices()[:8])
    counters = jnp.arange(8 * 4, dtype=jnp.float32).reshape(8, 4)
    counters = jax.device_put(
        counters,
        jax.sharding.NamedSharding(m, jax.sharding.PartitionSpec("dp", None)),
    )
    total = np.asarray(meshmod.all_reduce_counters(m, counters))
    np.testing.assert_array_equal(total[0], np.arange(8 * 4).reshape(8, 4).sum(0))
