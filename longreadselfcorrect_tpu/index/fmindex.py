"""HBM-resident FM-index rank structure.

TPU-first replacement for the reference's run-length BWT with two-level occ
markers (SuffixTools/RLBWT.h:121-161, SuffixTools/FMMarkers.h).  Instead of a
data-dependent run scan, the BWT is stored as fixed-size symbol blocks plus an
absolute occurrence checkpoint per block, so a rank query is

    occ(b, i) = ckpt[i // B, b]  +  popcount(block[i // B][:i % B] == b)

i.e. one checkpoint gather + one aligned block gather + a masked compare-sum —
branch-free, constant work, batchable over thousands of query lanes.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import alphabet as ab

DEFAULT_BLOCK = 128


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["blocks", "ckpt", "C"],
    meta_fields=["n", "num_strings", "block"],
)
@dataclass(frozen=True)
class FMIndex:
    """One BWT as device tensors.

    blocks : int8  [nb, block]   BWT symbols, padded with PAD_RANK
    ckpt   : int32 [nb, 5]       occ counts of each symbol before block start
    C      : int32 [6]           C[s] = #symbols < s over the whole BWT (getPC)
    """

    blocks: jax.Array
    ckpt: jax.Array
    C: jax.Array
    n: int
    num_strings: int
    block: int

    @staticmethod
    def from_symbols(
        symbols: np.ndarray, num_strings: int, block: int = DEFAULT_BLOCK
    ) -> "FMIndex":
        symbols = np.asarray(symbols, dtype=np.int8)
        n = len(symbols)
        assert n < 2**31, "int32 interval space exceeded; enable 64-bit build"
        # one extra block row so that a query at i == n-1 (p == n) can gather
        # checkpoint row p // B even when n % B == 0
        nb = n // block + 1
        padded = np.full(nb * block, ab.PAD_RANK, dtype=np.int8)
        padded[:n] = symbols
        blocks = padded.reshape(nb, block)
        per_block = np.empty((nb, ab.ALPHABET_SIZE), dtype=np.int64)
        for s in range(ab.ALPHABET_SIZE):
            per_block[:, s] = (blocks == s).sum(axis=1)
        csum = per_block.cumsum(axis=0)
        ckpt = np.zeros((nb, ab.ALPHABET_SIZE), dtype=np.int32)
        ckpt[1:] = csum[:-1]
        counts = csum[-1]
        C = np.zeros(ab.ALPHABET_SIZE + 1, dtype=np.int32)
        C[1:] = np.cumsum(counts)
        return FMIndex(
            blocks=jnp.asarray(blocks),
            ckpt=jnp.asarray(ckpt),
            C=jnp.asarray(C),
            n=n,
            num_strings=num_strings,
            block=block,
        )

    def symbol_counts(self) -> jax.Array:
        return self.C[1:] - self.C[:-1]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["bwt", "rbwt"],
    meta_fields=[],
)
@dataclass(frozen=True)
class IndexSet:
    """The {BWT, RBWT} bundle threaded through every algorithm.

    Mirrors BWTIndexSet (SuffixTools/BWTIndexSet.h:23-34); the sampled SA and
    interval cache are separate optional components.
    """

    bwt: FMIndex
    rbwt: FMIndex
