"""Batched per-position multi-k k-mer frequency scan.

The reference computes, for every position of a read and every k in the pool
(e.g. {5, 9, 19, 21}), the both-strand frequency of the k-mer starting there
(LongReadProbe.cpp:136-158 filling KmerFeature::Log()[k][pos] via incremental
``expand`` — KmerFeature.h:37-64).  Both component searches of a k-mer consume
the word left-to-right, so the (k in pool) family at one position shares one
incremental chain of LF steps.

Here that chain is run simultaneously for *all* positions of *all* reads in a
batch: lane (r, p) holds the bi-interval of reads[r, p : p+j] after step j.
One step is four batched occ gathers over R*L lanes — this is the hot seeding
kernel.  Frequencies are snapshot at each pool size.

A k-mer whose window runs past the end of the read is "fake" and reports
freq = -1 (KmerFeature.h:62,90); positions past the read end also report -1.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import alphabet as ab
from ..index.fmindex import IndexSet
from . import rank

I32 = jnp.int32


@partial(jax.jit, static_argnames=("pool",))
def kmer_freq_scan(ix: IndexSet, reads: jax.Array, lengths: jax.Array, pool: tuple[int, ...]):
    """Bi-strand k-mer frequencies at every position for every k in pool.

    reads   : int8 [R, L] rank symbols, padded with PAD_RANK
    lengths : int32 [R]
    pool    : static ascending k sizes
    returns : freqs int32 [len(pool), R, L]; -1 where the k-mer is fake
              (pos + k > read length)
    """
    assert tuple(sorted(pool)) == tuple(pool)
    R, L = reads.shape
    sym0 = reads.astype(I32)
    state = rank.init_bi(ix, jnp.clip(sym0, 0, 4))
    max_k = pool[-1]
    freqs = []
    pos = jnp.arange(L, dtype=I32)[None, :]
    for j in range(1, max_k + 1):
        if j in pool:
            fake = pos + j > lengths[:, None]
            freqs.append(jnp.where(fake, -1, rank.bi_freq(state)))
        if j == max_k:
            break
        # expand every lane by the character at pos + j; lanes whose window
        # already left the read would produce garbage — freeze them instead
        # (their snapshots are fake at all larger k anyway)
        nxt = jnp.pad(sym0[:, j:], ((0, 0), (0, j)), constant_values=ab.PAD_RANK)
        live = nxt < 5
        new_state = rank.extend_bi(ix, state, jnp.clip(nxt, 0, 4))
        state = tuple(jnp.where(live, n, o) for n, o in zip(new_state, state))
    return jnp.stack(freqs)


@partial(jax.jit, static_argnames=("k",))
def kmer_freq_single(ix: IndexSet, reads: jax.Array, lengths: jax.Array, k: int):
    """Frequencies for one k (convenience wrapper, [R, L])."""
    return kmer_freq_scan(ix, reads, lengths, (k,))[0]


def _fused_rows(fm):
    """Symbols + checkpoint counts in ONE gatherable row: [nb, block+20] i8.

    The scan's extend step needs a block row AND its ckpt row per query —
    gathering them separately doubles the random-row traffic that
    dominates the table build.  The 5 int32 ckpt counts ride as 20 extra
    int8 lanes, bitcast back after the gather."""
    ck8 = jax.lax.bitcast_convert_type(fm.ckpt, jnp.int8)
    return jnp.concatenate([fm.blocks, ck8.reshape(fm.ckpt.shape[0], -1)],
                           axis=1)


def _occ_fusedrow(rows, block, sym, idx):
    """occ(sym, BWT[0..idx]) with one fused-row gather per query."""
    p = (idx + 1).astype(I32)
    q = p // block
    r = p - q * block
    g = rows[q]                                     # [..., block+20]
    row = g[..., :block]
    ck = jax.lax.bitcast_convert_type(
        g[..., block : block + 20].reshape(*g.shape[:-1], 5, 4), jnp.int32)
    lane = jax.lax.broadcasted_iota(I32, row.shape, row.ndim - 1)
    hits = (row == sym[..., None].astype(jnp.int8)) & (lane < r[..., None])
    # one-hot ckpt select: a take_along_axis here is a per-query hw gather
    sym32 = sym.astype(I32)
    base = jnp.zeros(p.shape, I32)
    for b in range(5):
        base = base + jnp.where(sym32 == b, ck[..., b], 0)
    return base + hits.sum(axis=-1, dtype=I32)


def _update_fusedrow(rows, block, C, lo, hi, sym):
    pb = C[sym]
    return (pb + _occ_fusedrow(rows, block, sym, lo - 1),
            pb + _occ_fusedrow(rows, block, sym, hi) - 1)


@partial(jax.jit, static_argnames=("max_k",))
def kmer_table_full(ix: IndexSet, reads: jax.Array, lengths: jax.Array, max_k: int):
    """freq + validity for EVERY k in 1..max_k at every position.

    The device version of HostIndexSet.kmer_freq_table (all intermediate
    sizes recorded, feeding the dynamic-kmer seed scan).
    Returns (freq int32 [max_k+1, R, L], valid bool [max_k+1, R, L]).
    """
    R, L = reads.shape
    sym0 = reads.astype(I32)
    state = rank.init_bi(ix, jnp.clip(sym0, 0, 4))
    rows_f = _fused_rows(ix.rbwt)
    rows_r = _fused_rows(ix.bwt)
    pos = jnp.arange(L, dtype=I32)[None, :]
    freqs = [jnp.full((R, L), -1, I32)]
    valids = [jnp.zeros((R, L), bool)]
    for j in range(1, max_k + 1):
        fake = pos + j > lengths[:, None]
        f_lo, f_hi, r_lo, r_hi = state
        bival = (f_lo <= f_hi) & (r_lo <= r_hi)
        freqs.append(jnp.where(fake, -1, rank.bi_freq(state)))
        valids.append(jnp.where(fake, False, bival))
        if j == max_k:
            break
        nxt = jnp.pad(sym0[:, j:], ((0, 0), (0, j)), constant_values=ab.PAD_RANK)
        live = nxt < 5
        s = jnp.clip(nxt, 0, 4)
        nf = _update_fusedrow(rows_f, ix.rbwt.block, ix.rbwt.C, f_lo, f_hi, s)
        nr = _update_fusedrow(rows_r, ix.bwt.block, ix.bwt.C, r_lo, r_hi,
                              rank.comp(s))
        new_state = (nf[0], nf[1], nr[0], nr[1])
        state = tuple(jnp.where(live, n, o) for n, o in zip(new_state, state))
    return jnp.stack(freqs), jnp.stack(valids)


@partial(jax.jit, static_argnames=("max_k",))
def kmer_table_wire(ix: IndexSet, reads: jax.Array, lengths: jax.Array, max_k: int):
    """kmer_table_full in wire format for the host seed scan.

    Device->host readback of the full int32 table dominated the seed phase
    (30+ MB per 64-read chunk through the device tunnel), so ship freq as
    int16 (clipped at 32767 — the dynamic-kmer thresholds top out around
    ~700, so the clip can only matter for freq-vs-freq ratios of extreme
    repeats) and validity packed 8 k-levels per byte.
    Returns (freq int16 [max_k+1, R, L], vbits uint8 [ceil((max_k+1)/8), R, L]).
    """
    freq, valid = kmer_table_full(ix, reads, lengths, max_k)
    f16 = jnp.clip(freq, -1, 32767).astype(jnp.int16)
    K = valid.shape[0]
    pad = (-K) % 8
    v = jnp.pad(valid, ((0, pad), (0, 0), (0, 0)))
    v = v.reshape(-1, 8, *valid.shape[1:]).astype(jnp.uint8)
    bits = jnp.arange(8, dtype=jnp.uint8)[None, :, None, None]
    vbits = jnp.sum(v << bits, axis=1).astype(jnp.uint8)
    return f16, vbits


def unpack_valid_bits(vbits: "np.ndarray", n_k: int):
    """Host-side inverse of kmer_table_wire's bit packing -> bool [n_k, R, L]."""
    import numpy as np

    b = np.unpackbits(vbits[:, None], axis=1, bitorder="little")
    return b.reshape(-1, *vbits.shape[1:])[:n_k].astype(bool)


# ---------------------------------------------------------------------------
# bit-plane occ: the seed-table build at ~5x less VPU work per rank query
# ---------------------------------------------------------------------------
#
# The fused-row occ above fetches a 148-byte row and runs a 128-lane compare
# per query; over the ~50 levels x R*L lanes of the table build that compare
# is the VPU hot spot.  Pack each 128-symbol block as 3 bit-planes (4 int32
# words each) + its 5 checkpoint counts into one 68-byte row: occ is then
# XOR/AND word math + population_count over 4 words — exact integer counts,
# ~5x fewer vector ops and half the gather bytes.

from dataclasses import dataclass


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["prows", "C"],
    meta_fields=["block"],
)
@dataclass(frozen=True)
class PlaneFM:
    """One BWT as bit-plane rows: [nb, 17] i32 = 3 planes x 4 words + ckpt."""

    prows: jax.Array
    C: jax.Array
    block: int


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["fwd", "rev"],
    meta_fields=[],
)
@dataclass(frozen=True)
class PlaneIndexSet:
    fwd: PlaneFM   # RBWT (fwd-extension side)
    rev: PlaneFM   # BWT


@jax.jit
def _build_plane_rows(blocks, ckpt):
    nb, B = blocks.shape
    assert B % 32 == 0
    W = B // 32
    sh = jnp.arange(32, dtype=jnp.uint32)
    words = []
    for i in range(3):
        bits = ((blocks >> i) & 1).astype(jnp.uint32).reshape(nb, W, 32)
        words.append(jnp.sum(bits << sh, axis=-1).astype(jnp.int32))
    return jnp.concatenate(words + [ckpt.astype(jnp.int32)], axis=1)


def build_planes(ix: IndexSet) -> PlaneIndexSet:
    return PlaneIndexSet(
        fwd=PlaneFM(prows=_build_plane_rows(ix.rbwt.blocks, ix.rbwt.ckpt),
                    C=ix.rbwt.C, block=ix.rbwt.block),
        rev=PlaneFM(prows=_build_plane_rows(ix.bwt.blocks, ix.bwt.ckpt),
                    C=ix.bwt.C, block=ix.bwt.block),
    )


def plane_index_of(host_ix, dev_ix) -> PlaneIndexSet:
    """Cached PlaneIndexSet for a host/device index pair."""
    pix = getattr(host_ix, "_plane_ix", None)
    if pix is None:
        ix = dev_ix.ix if hasattr(dev_ix, "ix") else dev_ix
        pix = host_ix._plane_ix = build_planes(ix)
    return pix


def _occ_planes(pf: PlaneFM, sym, idx):
    """#occurrences of sym in BWT[0..idx]; same contract as rank.occ."""
    B = pf.block
    W = B // 32
    p = (idx + 1).astype(I32)
    q = p // B
    r = p - q * B
    row = pf.prows[q]                                   # [..., 17] one gather
    sym32 = sym.astype(I32)
    # ckpt select without a hardware gather
    ck = jnp.zeros(p.shape, I32)
    for b in range(5):
        ck = ck + jnp.where(sym32 == b, row[..., 3 * W + b], 0)
    e = [-((sym32 >> i) & 1) for i in range(3)]
    cnt = jnp.zeros(p.shape, I32)
    for w in range(W):
        match = ~((row[..., w] ^ e[0])
                  | (row[..., W + w] ^ e[1])
                  | (row[..., 2 * W + w] ^ e[2]))
        k = r - 32 * w
        mask = jnp.where(
            k <= 0, 0,
            jnp.where(k >= 32, -1, (1 << jnp.clip(k, 0, 31)) - 1))
        cnt = cnt + jax.lax.population_count(match & mask)
    return ck + cnt


def _update_planes(pf: PlaneFM, lo, hi, sym):
    pb = pf.C[sym.astype(I32)]
    return (pb + _occ_planes(pf, sym, lo - 1),
            pb + _occ_planes(pf, sym, hi) - 1)


@partial(jax.jit, static_argnames=("max_k", "ck"))
def kmer_table_planes(pix: PlaneIndexSet, wcache, reads, lengths,
                      max_k: int, ck: int):
    """kmer_table_full via bit-plane occ, chain-seeded at k = ck.

    The walk's ck-mer interval cache (walk.FusedFM.wcache, exact by
    construction) supplies the state at level ck directly, skipping levels
    1..ck-1 entirely; rows below ck report freq -1 / valid False.  Callers
    must guarantee no k < ck is ever consumed (pbcorrect's smallest probed
    k is start_kmer_len + min(offset) - 1 >= 14, core/correct.py:42-50).
    Returns (freq int32 [max_k+1, R, L], valid bool [max_k+1, R, L]).
    """
    R, L = reads.shape
    sym0 = reads.astype(I32)
    pos = jnp.arange(L, dtype=I32)[None, :]

    # 2-bit pack of reads[p : p+ck] per position (garbage where any char is
    # padding — those lanes are fake for every k >= ck and masked below)
    code = jnp.zeros((R, L), I32)
    for j in range(ck):
        nxt = jnp.pad(sym0[:, j:], ((0, 0), (0, j)), constant_values=1)
        code = ((code << 2) | (jnp.clip(nxt, 1, 4) - 1)) & ((1 << (2 * ck)) - 1)
    st = wcache[code]                                   # [R, L, 4]
    state = (st[..., 0], st[..., 1], st[..., 2], st[..., 3])

    empty = jnp.full((R, L), -1, I32)
    never = jnp.zeros((R, L), bool)
    freqs = [empty] * ck
    valids = [never] * ck
    for j in range(ck, max_k + 1):
        fake = pos + j > lengths[:, None]
        f_lo, f_hi, r_lo, r_hi = state
        bival = (f_lo <= f_hi) & (r_lo <= r_hi)
        freqs.append(jnp.where(fake, -1, rank.bi_freq(state)))
        valids.append(jnp.where(fake, False, bival))
        if j == max_k:
            break
        nxt = jnp.pad(sym0[:, j:], ((0, 0), (0, j)), constant_values=ab.PAD_RANK)
        live = nxt < 5
        s = jnp.clip(nxt, 0, 4)
        nf = _update_planes(pix.fwd, f_lo, f_hi, s)
        nr = _update_planes(pix.rev, r_lo, r_hi, rank.comp(s))
        new_state = (nf[0], nf[1], nr[0], nr[1])
        state = tuple(jnp.where(live, n, o) for n, o in zip(new_state, state))
    return jnp.stack(freqs), jnp.stack(valids)
