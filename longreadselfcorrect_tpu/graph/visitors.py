"""String-graph visitor passes used by `assemble` / `asmlong`.

Re-implementations of the reference visitors (StringGraph/SGVisitors.cpp;
per-class citations below).  Each visitor follows the reference protocol:
previsit(graph) -> visit(graph, vertex) per vertex -> postvisit(graph),
with GC_BLACK marking + sweep in postvisit.
"""
from __future__ import annotations

import numpy as np

from ..core import alphabet as ab
from .core import (ED_ANTISENSE, ED_SENSE, GC_BLACK, GC_GRAY, GC_WHITE,
                   StringGraph, Vertex)


class GraphStatsVisitor:
    """SGGraphStatsVisitor (SGVisitors.cpp:545-)."""

    def previsit(self, g):
        self.num_terminal = 0
        self.num_island = 0
        self.num_monobranch = 0
        self.num_dibranch = 0
        self.num_simple = 0
        self.num_edges = 0
        self.num_vertex = 0
        self.sum_len = 0

    def visit(self, g, v: Vertex):
        s_count = v.count_edges(ED_SENSE)
        as_count = v.count_edges(ED_ANTISENSE)
        if s_count == 0 and as_count == 0:
            self.num_island += 1
        elif s_count == 0 or as_count == 0:
            self.num_terminal += 1
        if s_count > 1 and as_count > 1:
            self.num_dibranch += 1
        elif s_count > 1 or as_count > 1:
            self.num_monobranch += 1
        if s_count == 1 or as_count == 1:
            self.num_simple += 1
        self.num_edges += v.count_edges()
        self.num_vertex += 1
        self.sum_len += len(v.seq)
        return False

    def postvisit(self, g):
        print(f"[SGStats] Vertices: {self.num_vertex} Edges: {self.num_edges} "
              f"Islands: {self.num_island} Tips: {self.num_terminal} "
              f"Monobranch: {self.num_monobranch} Dibranch: {self.num_dibranch} "
              f"Simple: {self.num_simple} SumLen: {self.sum_len}")


class ContainRemoveVisitor:
    """SGContainRemoveVisitor (SGVisitors.cpp:190-240): drop contained
    vertices and their edges.  The exhaustive-graph path needs no edge
    remodelling (the reference remodels only for irreducible graphs)."""

    def previsit(self, g: StringGraph):
        g.has_containment = False

    def visit(self, g, v: Vertex):
        if not v.contained:
            return False
        for e in list(v.edges):
            if e.twin in e.end.edges:
                e.end.remove_edge(e.twin)
        v.edges.clear()
        v.color = GC_BLACK
        return False

    def postvisit(self, g: StringGraph):
        g.sweep_vertices(GC_BLACK)


class TransitiveReductionVisitor:
    """SGTransitiveReductionVisitor (SGVisitors.cpp:64-160): Myers'
    transitive reduction with FUZZ=10."""

    FUZZ = 10

    def previsit(self, g):
        self.marked = 0

    def visit(self, g, v: Vertex):
        for dir in (ED_SENSE, ED_ANTISENSE):
            edges = v.get_edges(dir, sort_by_seqlen=True)
            if not edges:
                continue
            for e in edges:
                e.end.color = GC_GRAY
            longest_len = edges[-1].seq_len() + self.FUZZ
            # stage 1
            for vw in edges:
                w = vw.end
                if w.color != GC_GRAY:
                    continue
                for wx in w.get_edges(vw.transitive_dir(), sort_by_seqlen=True):
                    if vw.seq_len() + wx.seq_len() > longest_len:
                        break
                    if wx.end.color == GC_GRAY:
                        wx.end.color = GC_BLACK
            # stage 2
            for vw in edges:
                w = vw.end
                for j, wx in enumerate(w.get_edges(vw.transitive_dir(),
                                                   sort_by_seqlen=True)):
                    if wx.seq_len() < self.FUZZ or j == 0:
                        if wx.end.color == GC_GRAY:
                            wx.end.color = GC_BLACK
                    else:
                        break
            for e in edges:
                if e.end.color == GC_BLACK:
                    if e.color != GC_BLACK or e.twin.color != GC_BLACK:
                        e.color = GC_BLACK
                        e.twin.color = GC_BLACK
                        self.marked += 2
                e.end.color = GC_WHITE
        return False

    def postvisit(self, g: StringGraph):
        g.sweep_edges(GC_BLACK)


class TrimVisitor:
    """SGTrimVisitor (SGVisitors.cpp:260-320): remove short islands and
    dead-end tips."""

    def __init__(self, min_length: int):
        self.min_length = min_length

    def previsit(self, g):
        self.num_island = 0
        self.num_terminal = 0

    def visit(self, g, v: Vertex):
        if v.count_edges() == 0:
            if len(v.seq) < self.min_length:
                v.color = GC_BLACK
                self.num_island += 1
            return False
        for dir in (ED_SENSE, ED_ANTISENSE):
            if v.count_edges(dir) == 0 and len(v.seq) < self.min_length:
                v.color = GC_BLACK
                self.num_terminal += 1
                return True
        return False

    def postvisit(self, g: StringGraph):
        g.sweep_vertices(GC_BLACK)


class IllegalKmerEdgeVisitor:
    """SGRemoveIllegalKmerEdgeVisitor (SGVisitors.cpp:678-740): remove
    matchLen == k-1 edges whose flanking k-mers are strong on both sides
    (kmerized repeat joins)."""

    def __init__(self, host_ix, kmer_length: int, threshold: float,
                 credible_overlap: int):
        self.ix = host_ix
        self.k = kmer_length
        self.threshold = threshold
        self.credible_overlap = credible_overlap

    def _count_single(self, s: str) -> int:
        lo, hi = self.ix.bwt.find_interval(ab.encode(s))
        return int(max(hi - lo + 1, 0))

    def _strong(self, kmer: str) -> bool:
        return (self._count_single(kmer) >= self.threshold
                and self._count_single(ab.revcomp_str(kmer)) >= self.threshold)

    def _edge_kmer(self, seq: str, dir: int, match_len: int) -> str:
        if dir == ED_SENSE:
            return seq[len(seq) - match_len - 1 : len(seq) - match_len - 1 + self.k]
        return seq[match_len + 1 - self.k : match_len + 1]

    def visit(self, g, v: Vertex):
        changed = False
        for e in v.edges:
            match_len = e.match_length()
            if match_len != self.k - 1:
                continue
            kmer = self._edge_kmer(v.seq, e.dir, match_len)
            if len(kmer) < self.k:
                continue
            if not self._strong(kmer):
                continue  # weak kmer: edge explained by kmerization, keep
            other = self._edge_kmer(e.end.seq, e.twin.dir, match_len)
            if len(other) == self.k and self._strong(other):
                e.color = GC_BLACK
                e.twin.color = GC_BLACK
                changed = True
        return changed

    def postvisit(self, g: StringGraph):
        g.sweep_edges(GC_BLACK)


class BothShortEdgesRemoveVisitor:
    """SGBothShortEdgesRemoveVisitor (SGVisitors.cpp:755-830): remove small
    vertices whose best overlap on BOTH sides is short (chimera signature),
    optionally rescued by high average k-mer frequency."""

    def __init__(self, vertex_length: int, overlap_length: int, host_ix=None,
                 kmer_length: int = 0, threshold: float = 0):
        self.vertex_length = vertex_length
        self.overlap_length = overlap_length
        self.ix = host_ix
        self.k = kmer_length
        self.threshold = threshold

    def visit(self, g, v: Vertex):
        if (len(v.seq) > self.vertex_length or len(v.seq) < max(self.k, 1)
                or v.count_edges(ED_ANTISENSE) == 0
                or v.count_edges(ED_SENSE) == 0):
            return False
        maxes = {}
        for dir in (ED_SENSE, ED_ANTISENSE):
            maxes[dir] = max(e.match_length() for e in v.get_edges(dir))
        if not (maxes[ED_SENSE] <= self.overlap_length
                and maxes[ED_ANTISENSE] <= self.overlap_length):
            return False
        avg = -1.0
        if self.ix is not None and self.k > 0 and self.threshold > 0:
            enc = ab.encode(v.seq)
            if len(enc) >= self.k:
                win = np.lib.stride_tricks.sliding_window_view(enc, self.k)
                lo1, hi1 = self.ix.bwt.find_interval(win)
                rc = ab.complement(win)[:, ::-1]
                lo2, hi2 = self.ix.bwt.find_interval(rc)
                counts = (np.maximum(hi1 - lo1 + 1, 0)
                          + np.maximum(hi2 - lo2 + 1, 0))
                avg = float(counts.sum()) / len(counts)
        if avg < 0 or avg <= self.threshold:
            v.color = GC_BLACK
            return True
        return False

    def postvisit(self, g: StringGraph):
        g.sweep_vertices(GC_BLACK)


class RemoveByOverlapLenDiffVisitor:
    """SGRemoveByOverlapLenDiffVisitor (SGVisitors.cpp:1290-1360): from
    large vertices, cut edges whose overlap is much shorter than the best
    edge (chimeric/repeat edges); island-protect restores if all edges of a
    direction would vanish."""

    def __init__(self, min_vertex_size: int, min_overlap: int,
                 max_overlap_diff: int, island_protect: bool = True):
        self.min_vertex_size = min_vertex_size
        self.min_overlap = min_overlap
        self.max_overlap_diff = max_overlap_diff
        self.island_protect = island_protect

    def visit(self, g, v: Vertex):
        changed = False
        if len(v.seq) < self.min_vertex_size:
            return False
        for dir in (ED_SENSE, ED_ANTISENSE):
            edges = sorted(v.get_edges(dir), key=lambda e: e.match_length())
            if len(edges) <= 1:
                continue
            maxlen = edges[-1].match_length()
            if self.min_overlap > 0 and maxlen > self.min_overlap:
                for e in edges:
                    if e.match_length() < self.min_overlap:
                        e.color = GC_BLACK
                        e.twin.color = GC_BLACK
                        changed = True
            if (self.max_overlap_diff > 0
                    and maxlen - edges[0].match_length() >= self.max_overlap_diff):
                for e in edges[:-1]:
                    if maxlen - e.match_length() >= self.max_overlap_diff:
                        e.color = GC_BLACK
                        e.twin.color = GC_BLACK
                        changed = True
            if self.island_protect:
                if all(e.color != GC_WHITE for e in edges):
                    for e in edges:
                        e.color = GC_WHITE
                        e.twin.color = GC_WHITE
                    changed = False
        return changed

    def postvisit(self, g: StringGraph):
        g.sweep_edges(GC_BLACK)


class SmoothingVisitor:
    """Bubble smoothing, simplified from SGSmoothingVisitor
    (SGVisitors.cpp:390-470): when a vertex branches into exactly two
    single-edge paths that reconverge, keep the higher-coverage branch if
    the branch lengths diverge by at most max_indel.  (The reference
    additionally gap-validates variant walks against the BWT; this
    length+coverage criterion covers the assemble pipeline's use.)"""

    def __init__(self, max_indel: int = 9):
        self.max_indel = max_indel
        self.removed = 0

    def visit(self, g, v: Vertex):
        changed = False
        for dir in (ED_SENSE, ED_ANTISENSE):
            edges = v.get_edges(dir)
            if len(edges) != 2:
                continue
            a, b = edges
            ends = []
            for e in (a, b):
                w = e.end
                if w.count_edges(e.twin.dir) != 1 or w.count_edges(1 - e.twin.dir) != 1:
                    ends.append(None)
                    continue
                nxt = w.get_edges(1 - e.twin.dir)[0]
                ends.append((w, nxt.end, nxt))
            if ends[0] is None or ends[1] is None:
                continue
            if ends[0][1] is not ends[1][1]:
                continue  # paths do not reconverge
            la = len(ends[0][0].seq)
            lb = len(ends[1][0].seq)
            if abs(la - lb) > self.max_indel:
                continue
            drop = ends[0][0] if ends[0][0].coverage <= ends[1][0].coverage else ends[1][0]
            g.remove_vertex(drop)
            self.removed += 1
            changed = True
        return changed


class FastaVisitor:
    """SGFastaVisitor: contig emission."""

    def __init__(self, fh):
        self.fh = fh
        self.n = 0

    def visit(self, g, v: Vertex):
        self.fh.write(f">{v.id} {len(v.seq)} {v.coverage}\n{v.seq}\n")
        self.n += 1
        return False


def graph_trim_and_smooth(g: StringGraph, trim_length: int, host_ix=None,
                          max_indel: int = 9) -> None:
    """graphTrimAndSmooth (StriDe/assemble.cpp:461-490)."""
    g.simplify()
    trim = TrimVisitor(trim_length)
    smooth = SmoothingVisitor(max_indel)
    if g.visit(trim):
        g.simplify()
    if g.visit(smooth):
        g.simplify()
        if g.visit(trim):
            g.simplify()


def contig_stats(g: StringGraph) -> dict:
    lens = sorted((len(v.seq) for v in g.vertices.values()), reverse=True)
    if not lens:
        return {"contigs": 0, "total": 0, "n50": 0, "max": 0}
    total = sum(lens)
    acc = 0
    n50 = 0
    for ln in lens:
        acc += ln
        if acc >= total / 2:
            n50 = ln
            break
    return {"contigs": len(lens), "total": total, "n50": n50, "max": lens[0]}
