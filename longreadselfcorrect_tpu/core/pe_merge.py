"""Paired-end FM-walk merge / validate (`stride fmwalk`).

Re-implementation of FMIndexWalk/SAIntervalTree.{h,cpp}: BFS FM-index walk
from the suffix kmer of one read toward the prefix kmer of a second read
(merge), or re-walk of a corrected long read against the index to confirm
minimum-overlap support of every segment (validate).
"""
from __future__ import annotations

from dataclasses import dataclass, field

from . import alphabet as ab

RANK_CHARS = "$ACGT"


def _find(fm, word: str):
    lo, hi = fm.find_interval(ab.encode(word))
    return int(lo), int(hi)


def _size(lo, hi):
    return hi - lo + 1 if lo <= hi else 0


@dataclass
class _Leaf:
    full: str
    fwd_lo: int
    fwd_hi: int
    rvc_lo: int
    rvc_hi: int
    kmer_count: int = 0


class SAIntervalTree:
    """One PE-merge / validation walk (SAIntervalTree.cpp:20-120)."""

    def __init__(self, ix, query: str, min_overlap: int, max_overlap: int,
                 max_length: int, max_leaves: int, second_read: str = "",
                 sa_threshold: int = 1, kmer_mode: bool = False,
                 from_prefix: bool = False):
        self.ix = ix
        self.query = query
        self.min_overlap = min_overlap
        self.max_overlap = max_overlap
        self.max_length = max_length
        self.max_leaves = max_leaves
        self.second = second_read
        self.threshold = sa_threshold
        self.kmer_mode = kmer_mode
        self.max_kmer_coverage = 0
        self.max_used_leaves = 0
        self.bubble_collapsed = False

        if not from_prefix:
            root_str = query
            beginning = query[len(query) - min_overlap:]
            ending = second_read[:min_overlap]
        else:
            # validate-style root: walk from the query prefix to its suffix
            # (2nd constructor, SAIntervalTree.cpp:59-95)
            root_str = query[:min_overlap]
            beginning = root_str
            ending = query[len(query) - min_overlap:]

        f = _find(ix.rbwt, beginning[::-1])
        r = _find(ix.bwt, ab.revcomp_str(beginning))
        self.leaves = [_Leaf(root_str, f[0], f[1], r[0], r[1])]
        self.current_length = len(root_str)
        self.current_kmer_size = min_overlap
        self.fwd_term = _find(ix.rbwt, ending[::-1])
        self.rvc_term = _find(ix.bwt, ab.revcomp_str(ending))

    # ------------------------------------------------------------------
    def merge_two_reads(self) -> tuple[int, str]:
        """mergeTwoReads (:103-170)."""
        direct = self._is_two_reads_overlap()
        if direct is not None:
            return 1, direct
        return self._walk()

    def validate(self) -> tuple[int, str]:
        """validate (:173-240): same walk, no direct-overlap shortcut."""
        return self._walk()

    def _walk(self) -> tuple[int, str]:
        results = []
        while self.leaves and len(self.leaves) <= self.max_leaves and \
                self.current_length <= self.max_length:
            self._extend_leaves()
            if len(self.leaves) > self.max_used_leaves:
                self.max_used_leaves = len(self.leaves)
            if self._is_terminated(results):
                break

        if results:
            if len(results) == len(self.leaves):
                self.bubble_collapsed = True
            merged = ""
            for thread, _cov in results:
                if len(self.second) > self.min_overlap:
                    tmp = thread + self.second[self.min_overlap:]
                else:
                    tmp = thread
                cov = self._kmer_coverage(tmp, self.min_overlap)
                if cov > self.max_kmer_coverage:
                    merged = tmp
                    self.max_kmer_coverage = cov
            return 1, merged
        if not self.leaves:
            return -1, ""
        if self.current_length > self.max_length:
            return -2, ""
        if len(self.leaves) > self.max_leaves:
            return -3, ""
        return -4, ""

    # ------------------------------------------------------------------
    def _extend_leaves(self) -> None:
        new_leaves = self._attempt_to_extend()
        if not self.kmer_mode and not new_leaves:
            self._refine_sa_interval(self.min_overlap)
            new_leaves = self._attempt_to_extend()
        if new_leaves:
            self.current_kmer_size += 1
            self.current_length += 1
        self.leaves = new_leaves
        if self.leaves and (self.kmer_mode or self.current_kmer_size >= self.max_overlap):
            self._refine_sa_interval(self.min_overlap)

    def _attempt_to_extend(self) -> list[_Leaf]:
        out = []
        for leaf in self.leaves:
            exts = self._fm_extensions(leaf)
            if len(exts) == 1:
                ch, f_lo, f_hi, r_lo, r_hi = exts[0]
                leaf.full += ch
                leaf.fwd_lo, leaf.fwd_hi, leaf.rvc_lo, leaf.rvc_hi = f_lo, f_hi, r_lo, r_hi
                leaf.kmer_count += _size(f_lo, f_hi) + _size(r_lo, r_hi)
                out.append(leaf)
            else:
                for (ch, f_lo, f_hi, r_lo, r_hi) in exts:
                    child = _Leaf(leaf.full + ch, f_lo, f_hi, r_lo, r_hi,
                                  leaf.kmer_count + _size(f_lo, f_hi) + _size(r_lo, r_hi))
                    out.append(child)
        return out

    def _fm_extensions(self, leaf: _Leaf):
        out = []
        for i in range(1, 5):
            b = RANK_CHARS[i]
            f_lo, f_hi = leaf.fwd_lo, leaf.fwd_hi
            if f_lo <= f_hi:
                f_lo, f_hi = (int(x) for x in self.ix.rbwt.update_interval(f_lo, f_hi, i))
            r_lo, r_hi = leaf.rvc_lo, leaf.rvc_hi
            if r_lo <= r_hi:
                r_lo, r_hi = (int(x) for x in self.ix.bwt.update_interval(r_lo, r_hi, 5 - i))
            bcount = _size(f_lo, f_hi) + _size(r_lo, r_hi)
            if bcount >= self.threshold:
                out.append((b, f_lo, f_hi, r_lo, r_hi))
        return out

    def _refine_sa_interval(self, new_k: int) -> None:
        for leaf in self.leaves:
            reduced = leaf.full[len(leaf.full) - new_k:]
            leaf.fwd_lo, leaf.fwd_hi = _find(self.ix.rbwt, reduced[::-1])
            leaf.rvc_lo, leaf.rvc_hi = _find(self.ix.bwt, ab.revcomp_str(reduced))
        self.current_kmer_size = new_k

    def _is_terminated(self, results) -> bool:
        found = False
        for leaf in self.leaves:
            fwd_ok = (
                leaf.fwd_lo <= leaf.fwd_hi
                and leaf.fwd_lo >= self.fwd_term[0]
                and leaf.fwd_hi <= self.fwd_term[1]
            )
            rvc_ok = (
                leaf.rvc_lo <= leaf.rvc_hi
                and leaf.rvc_lo >= self.rvc_term[0]
                and leaf.rvc_hi <= self.rvc_term[1]
            )
            if fwd_ok or rvc_ok:
                results.append((leaf.full, leaf.kmer_count))
                found = True
        return found

    # ------------------------------------------------------------------
    def _is_two_reads_overlap(self) -> str | None:
        """isTwoReadsOverlap (:352-395)."""
        q, second, mo = self.query, self.second, self.min_overlap
        root = self.leaves[0]
        if (root.fwd_lo, root.fwd_hi) == self.fwd_term:
            return q + second[mo:]
        second_left = second[:mo]
        start = len(q) - 200 if len(q) >= 200 else 0
        pos = q.find(second_left, start)
        if pos != -1 and q[pos:] == second[: len(q) - pos]:
            return q[:pos] + second
        if self.kmer_mode:
            return None
        first_left = q[:mo]
        pos = second.find(first_left)
        if pos != -1 and pos <= 50 and second[pos:] == q[: len(second) - pos]:
            return second[pos:]
        return None

    def _kmer_coverage(self, seq: str, k: int) -> int:
        """calculateKmerCoverage (:442-451)."""
        if len(seq) < k:
            return 0
        cov = 0
        i = 0
        while i <= len(seq) - k:
            cov += self.ix.bwt.count_occurrences_both_strands(ab.encode(seq[i : i + k]))
            i += k // 2
        return cov


def merge_pair(ix, read1: str, read2_rc: str, min_overlap: int, max_overlap: int,
               max_insert: int, max_leaves: int = 32, sa_threshold: int = 1):
    """Merge a PE pair (read2 already reverse-complemented into read1's
    orientation), FMIndexWalkProcess::MergeAndKmerize walk portion."""
    tree = SAIntervalTree(
        ix, read1, min_overlap, max_overlap, max_insert, max_leaves,
        second_read=read2_rc, sa_threshold=sa_threshold,
    )
    return tree.merge_two_reads()


def validate_read(ix, seq: str, min_overlap: int, max_leaves: int = 256,
                  sa_threshold: int = 1, max_overlap: int = -1):
    """Re-walk a corrected read to confirm min-overlap support
    (`fmwalk -a validate`, FMIndexWalkProcess.cpp:295-312: maxOverlap caps at
    90% of length, search depth 1.1x length, empty second read)."""
    mo = max_overlap if max_overlap != -1 else int(len(seq) * 0.9)
    tree = SAIntervalTree(
        ix, seq, min_overlap, mo, int(len(seq) * 1.1), max_leaves,
        second_read="", sa_threshold=sa_threshold, from_prefix=True,
    )
    return tree.validate()
