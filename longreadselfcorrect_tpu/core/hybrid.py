"""PacBio hybrid correction (`stride pbhc`) — initial engine.

Corrects PacBio reads using a SHORT-READ FM-index: dynamic-kmer seeding on
the short-read index (seedingByDynamicKmer_v2 semantics,
PacBioHybridCorrectionProcess.cpp:325-443), then per seed-pair bidirectional
two-seed FM walks (SAIntervalPBHybridCTree.cpp) with iterative minOverlap
reduction and forward/reverse agreement (extendBetweenSeeds :872-965).

Round-1 scope notes (documented deviations, to be tightened against golden
outputs):
* the reference defaults to seedingByDynamicKmer_v3; this implements the v2
  scheme (the v3 refinements: PB-index seed rescue for >7kb gaps, seed
  re-scanning tweaks);
* candidate scoring uses a banded global aligner with the pacbio scoring
  matrix (match 1 / mismatch -8 / gap open+ext 1, free end gaps) rather than
  a byte-exact stdaln port;
* the ShortReadOverlapTree retry and the MSA gap fallback are not yet wired.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from . import alphabet as ab
from .pe_merge import SAIntervalTree, _find, _size
from .seeds import Seed


@dataclass
class HybridParams:
    """PacBioHybridCorrectionParameters (driver defaults,
    StriDe/PacBioHybridCorrection.cpp)."""

    kmer_length: int = 31           # large seed kmer
    min_kmer_length: int = 21       # smallest dynamic kmer
    seed_kmer_threshold: int = 30   # solid kmer freq threshold
    max_overlap: int = 81
    max_leaves: int = 32
    fmw_kmer_threshold: int = 3     # SA threshold in walks
    coverage: int = 60              # short-read coverage


def aln_score_global(s1: str, s2: str, band: int = 50) -> int:
    """Banded global-overlap alignment score used to RANK candidate paths
    (stdaln pacbio params approximated: match 1, mismatch -8, linear gap -2,
    free end gaps).  The reference uses stdaln's affine global aligner
    (aln_param_pacbio, stdaln.c:248); ranking behaviour matches in practice
    and is flagged for golden-diff tightening."""
    n, m = len(s1), len(s2)
    if n == 0 or m == 0:
        return 0
    half = max(band, abs(n - m) + 10)
    NEG = -(1 << 30)
    GAP = 2
    a1 = np.frombuffer(s1.encode(), np.uint8)
    a2 = np.frombuffer(s2.encode(), np.uint8)
    prev = np.zeros(m + 1, dtype=np.int64)  # free leading gaps in s2
    best = NEG
    for i in range(1, n + 1):
        cur = np.full(m + 1, NEG, dtype=np.int64)
        cur[0] = 0  # free leading gaps in s1
        lo = max(1, i - half)
        hi = min(m, i + half)
        if lo > hi:
            prev = cur
            continue
        sub = np.where(a2[lo - 1 : hi] == a1[i - 1], 1, -8)
        diag = prev[lo - 1 : hi] + sub
        up = prev[lo : hi + 1] - GAP
        base = np.maximum(diag, up)
        base[0] = max(base[0], cur[lo - 1] - GAP)
        k = np.arange(hi - lo + 1)
        cur[lo : hi + 1] = np.maximum.accumulate(base - k * GAP) + k * GAP
        prev = cur
        best = max(best, int(cur[hi]) if hi == m else NEG)
    return max(best, int(prev[1:].max()))


@dataclass
class HybridSeed(Seed):
    is_pb_seed: bool = False
    is_super_repeat: bool = False


class HybridWalkTree(SAIntervalTree):
    """SAIntervalPBHybridCTree: two-seed walk with the hybrid length window
    and alignment-scored best path (SAIPBHybridCTree.cpp:15-226)."""

    def __init__(self, ix, source_seed: str, target_seed: str, raw_between: str,
                 dis: int, min_overlap: int, max_overlap: int, max_leaves: int,
                 sa_threshold: int):
        ending = target_seed[:min_overlap]
        max_length = int(1.1 * (dis + 10)) + len(ending) + len(source_seed)
        min_length = int(0.9 * (dis - 30)) + len(ending) + len(source_seed)
        super().__init__(ix, source_seed, min_overlap, max_overlap, max_length,
                         max_leaves, second_read=target_seed,
                         sa_threshold=sa_threshold)
        self.min_length = max(min_length, 0)
        self.raw_between = raw_between
        self.source_len = len(source_seed)
        self.target_seed = target_seed

    def merge_two_seeds(self) -> tuple[int, str, int]:
        """Walk + alignment-scored best path; returns (code, seq, score)."""
        results = []
        while self.leaves and len(self.leaves) <= self.max_leaves and \
                self.current_length <= self.max_length:
            self._extend_leaves()
            if self.current_length >= self.min_length:
                self._is_terminated(results)
        if results:
            best_score = -100
            best = ""
            for thread, _cov in results:
                if len(self.target_seed) > self.min_overlap:
                    cand = thread + self.target_seed[self.min_overlap:]
                else:
                    cand = thread
                mid = cand[self.source_len - 10 :
                           len(cand) - len(self.target_seed) + 10]
                score = aln_score_global(self.raw_between, mid)
                if score > best_score:
                    best_score = score
                    best = cand
            if best:
                return 1, best, best_score
            return -4, "", -100
        if not self.leaves:
            return -1, "", -100
        if self.current_length > self.max_length:
            return -2, "", -100
        if len(self.leaves) > self.max_leaves:
            return -3, "", -100
        return -4, "", -100


class HybridCorrector:
    """PacBioHybridCorrectionProcess equivalent (initial version)."""

    def __init__(self, sr_ix, params: HybridParams):
        self.ix = sr_ix     # short-read index set
        self.params = params

    # ------------------------------------------------------------------
    def _pos_kmer_chains(self, read: str):
        """calculateKmerFreqsEachPBPos (:445-492): per position, the chain of
        freqs for k = minK .. maxK while freq >= (threshold - 2*(k-minK))."""
        p = self.params
        L = len(read)
        chains = [[] for _ in range(L)]
        if L < p.kmer_length:
            return chains, 0
        enc = ab.encode(read)
        n = L - p.kmer_length + 1
        win = np.lib.stride_tricks.sliding_window_view(enc, p.min_kmer_length)[:n]
        f_lo, f_hi = self.ix.rbwt.find_interval(win[:, ::-1])
        r_lo, r_hi = self.ix.bwt.find_interval(ab.complement(win)[:, ::-1])
        freqs = (f_hi - f_lo + 1) + (r_hi - r_lo + 1)  # unclamped .size() sums
        valid = freqs >= p.seed_kmer_threshold
        n_valid = int(valid.sum())
        # extend chains only for valid positions (vectorised per k step)
        state = (f_lo.copy(), f_hi.copy(), r_lo.copy(), r_hi.copy())
        alive = valid.copy()
        for i in np.flatnonzero(valid):
            chains[i].append(int(freqs[i]))
        thr = p.seed_kmer_threshold
        for j in range(p.min_kmer_length, p.kmer_length):
            thr -= 2
            pos = np.arange(n) + j
            sym = np.where(pos < L, enc[np.minimum(pos, L - 1)], 1).astype(np.int64)
            nf = self.ix.rbwt.update_interval(state[0], state[1], sym)
            nr = self.ix.bwt.update_interval(state[2], state[3],
                                             np.where(sym == 0, 0, 5 - sym))
            state = (np.where(alive, nf[0], state[0]), np.where(alive, nf[1], state[1]),
                     np.where(alive, nr[0], state[2]), np.where(alive, nr[1], state[3]))
            fr = (state[1] - state[0] + 1) + (state[3] - state[2] + 1)
            ok = alive & (pos < L) & (fr >= thr)
            for i in np.flatnonzero(ok):
                chains[i].append(int(fr[i]))
            alive = ok
        return chains, n_valid

    def seeding(self, read: str) -> list[HybridSeed]:
        """seedingByDynamicKmer_v2 (:325-443)."""
        p = self.params
        seeds: list[HybridSeed] = []
        if len(read) < p.kmer_length:
            return seeds
        max_interval = [int(2 * 3.8649 * math.pow(2.7183, 0.1239 * i))
                        for i in range(p.kmer_length + 1)]
        chains, n_valid = self._pos_kmer_chains(read)
        if n_valid < 2:
            return seeds
        dyn = p.kmer_length
        seed_end_positions: list[int] = []
        i = 0
        while i + dyn <= len(read):
            pb_size = p.min_kmer_length + len(chains[i]) - 1
            if pb_size >= dyn:
                seed_start = i
                max_freq = chains[i][-1]
                i += 1
                while i + dyn <= len(read):
                    pb_size = p.min_kmer_length + len(chains[i]) - 1
                    if pb_size >= dyn:
                        max_freq = max(max_freq, chains[i][-1])
                        i += 1
                    else:
                        pb_size = p.min_kmer_length + len(chains[i - 1]) - 1
                        break
                else:
                    pb_size = p.min_kmer_length + len(chains[i - 1]) - 1
                if (i - seed_start) < 2 and seeds and \
                        i - seeds[-1].seed_end_pos <= 30:
                    i += 1
                    continue
                seed_end = i + pb_size - 2
                is_super = max_freq > p.coverage * 15
                word = read[seed_start : seed_end + 1]
                s = HybridSeed.make(word, seed_start, max_freq, is_super,
                                    pb_size, p.seed_kmer_threshold * 8)
                s.is_super_repeat = is_super
                if not self._low_complexity(word, 0.9):
                    seeds.append(s)
                seed_end_positions.append(seed_end)
                i = seed_end
                dyn = p.kmer_length
            prev_end = seed_end_positions[-1] + 1 if seed_end_positions else 0
            dist = i + 1 - prev_end
            if dist >= max_interval[dyn]:
                if dyn > p.min_kmer_length:
                    i = prev_end
                    dyn -= 2
            i += 1
        return seeds

    @staticmethod
    def _low_complexity(seq: str, threshold: float) -> bool:
        counts = [seq.count(c) for c in "ACGT"]
        return any(c / len(seq) >= threshold for c in counts)

    # ------------------------------------------------------------------
    def extend_between_seeds(self, source: HybridSeed, target: HybridSeed,
                             raw_between: str, dis: int) -> tuple[int, str]:
        """extendBetweenSeeds (:872-965): iterative minOverlap reduction with
        forward/reverse agreement."""
        p = self.params
        min_overlap = min(source.seed_len, target.seed_len, p.max_overlap)
        init_min_overlap = min_overlap
        code = -2
        prev_code = 0
        merged = ""
        while code in (-1, -2) and min_overlap >= p.min_kmer_length:
            t1 = HybridWalkTree(self.ix, source.seed_str, target.seed_str,
                                raw_between, dis, min_overlap, p.max_overlap,
                                p.max_leaves, p.fmw_kmer_threshold)
            code, merged, score = t1.merge_two_seeds()
            if code > 0:
                t2 = HybridWalkTree(
                    self.ix, ab.revcomp_str(target.seed_str),
                    ab.revcomp_str(source.seed_str),
                    ab.revcomp_str(raw_between), dis, min_overlap,
                    p.max_overlap, p.max_leaves, p.fmw_kmer_threshold,
                )
                code2, merged2, score2 = t2.merge_two_seeds()
                code = code2
                if len(merged) == len(merged2):
                    if score < score2:
                        merged = ab.revcomp_str(merged2)
                    return 1, merged
                if code2 > 0:
                    code = -4
            if code == -3 and prev_code == -1:
                code = prev_code
                break
            prev_code = code
            min_overlap -= 1
            if source.is_repeat and min_overlap < p.kmer_length - 1:
                break
        _ = init_min_overlap
        if code > 0:
            return 1, merged
        return code if code < 0 else -4, ""

    # ------------------------------------------------------------------
    def correct(self, read_id: str, read: str):
        """PBHybridCorrection (:33-200): walk seed pairs, append gains."""
        seeds = self.seeding(read)
        result = {
            "read_id": read_id, "merge": False, "corrected_strs": [],
            "total_seed_num": len(seeds), "corrected_num": 0, "walk_num": 0,
        }
        if len(seeds) < 2:
            return result
        pieces = [HybridSeed.make(seeds[0].seed_str, seeds[0].seed_start_pos,
                                  seeds[0].max_fixed_mer_freq, seeds[0].is_repeat,
                                  seeds[0].start_best_kmer_size, 1)]
        for t in range(1, len(seeds)):
            pre = seeds[t - 1]
            source = pieces[-1]
            target = seeds[t]
            dis = target.seed_start_pos - pre.seed_end_pos - 1
            lo = max(pre.seed_end_pos + 1 - 10, 0)
            raw = read[lo : pre.seed_end_pos + 1 + dis + 10]
            code, merged = self.extend_between_seeds(source, target, raw, dis)
            result["walk_num"] += 1
            if code == 1 and len(merged) > source.seed_len:
                gain = merged[source.seed_len:]
                source.seed_str += gain
                source.seed_len += len(gain)
                source.is_repeat = target.is_repeat
                source.start_best_kmer_size = target.start_best_kmer_size
                source.end_best_kmer_size = target.end_best_kmer_size
                source.seed_end_pos = target.seed_end_pos
                source.seed_start_pos = target.seed_start_pos
                result["corrected_num"] += 1
            else:
                pieces.append(HybridSeed.make(
                    target.seed_str, target.seed_start_pos,
                    target.max_fixed_mer_freq, target.is_repeat,
                    target.start_best_kmer_size, 1))
        result["merge"] = True
        result["corrected_strs"] = [p.seed_str for p in pieces]
        return result
