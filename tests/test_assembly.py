"""Overlap + string-graph assembly tests: synthetic error-free reads must
assemble back into the source sequence (overlap -> ASQG -> assemble passes
mirror StriDe/overlap.cpp + StriDe/assemble.cpp)."""
import numpy as np
import pytest

from longreadselfcorrect_tpu.core import alphabet as ab
from longreadselfcorrect_tpu.graph import asqg, overlap as ovl
from longreadselfcorrect_tpu.graph.core import Overlap, StringGraph
from longreadselfcorrect_tpu.graph.visitors import (
    ContainRemoveVisitor, GraphStatsVisitor, TransitiveReductionVisitor,
    TrimVisitor, contig_stats)
from longreadselfcorrect_tpu.index import build
from longreadselfcorrect_tpu.index.host import HostFM, HostIndexSet


def make_corpus(rng, genome_len=600, read_len=80, step=20):
    genome = "".join(rng.choice(list("ACGT"), size=genome_len))
    reads = []
    for i, p in enumerate(range(0, genome_len - read_len + 1, step)):
        r = genome[p : p + read_len]
        if i % 3 == 1:
            r = ab.revcomp_str(r)
        reads.append((f"r{i}", r))
    return genome, reads


def build_ix(reads):
    fwd, rev = build.build_bwt_pair([ab.encode(s) for _, s in reads])
    ix = HostIndexSet(HostFM(fwd.symbols, fwd.num_strings),
                      HostFM(rev.symbols, rev.num_strings))
    return ix, fwd.lex, rev.lex


def naive_overlaps(reads, min_overlap):
    """Brute-force suffix/prefix overlap oracle over both strands.

    Returns the set of canonical (idA, idB, overlap_len, rc) tuples with
    id0 > id1 (the reference's duplicate filter keeps id[0] > id[1],
    StriDe/OverlapCommon.cpp:66)."""
    out = set()
    seqs = dict(reads)
    for ida, a in reads:
        for idb, b in reads:
            if ida == idb:
                continue
            for brc, rc in ((b, False), (ab.revcomp_str(b), True)):
                for ol in range(min_overlap, min(len(a), len(brc)) + 1):
                    if ol == len(a) or ol == len(brc):
                        continue  # containment handled separately
                    if a[-ol:] == brc[:ol]:       # suffix(a) = prefix(b')
                        if ida > idb:
                            out.add((ida, idb, ol, rc, "sp"))
                    if brc[-ol:] == a[:ol]:       # prefix(a) = suffix(b')
                        if ida > idb:
                            out.add((ida, idb, ol, rc, "ps"))
    return out


class TestOverlapDiscovery:
    def test_matches_naive_oracle(self, rng):
        _, reads = make_corpus(rng, 400, 60, 25)
        ix, lex_f, lex_r = build_ix(reads)
        got = set()

        def on_edge(o):
            m = o.match
            ol = m.coord[0].length()
            side = "sp" if m.coord[0].is_right_extreme() != False and m.coord[0].start > 0 else "ps"
            # classify by which end of the query the overlap touches
            side = "sp" if (m.coord[0].start > 0) else "ps"
            got.add((o.id[0], o.id[1], ol, m.is_rc, side))

        ovl.overlap_all(ix, reads, 20, lex_f, lex_r, on_edge=on_edge)
        want = naive_overlaps(reads, 20)
        assert got == want

    def test_substring_detection(self, rng):
        _, reads = make_corpus(rng, 300, 70, 35)
        reads.append(("sub0", reads[0][1][5:60]))
        ix, lex_f, lex_r = build_ix(reads)
        subs = []
        ovl.overlap_all(ix, reads, 20, lex_f, lex_r,
                        on_vertex=lambda rid, seq, is_sub: subs.append(rid) if is_sub else None)
        assert subs == ["sub0"]


class TestAssembleEndToEnd:
    def test_error_free_reads_assemble_to_genome(self, rng, tmp_path):
        genome, reads = make_corpus(rng, 800, 100, 20)
        ix, lex_f, lex_r = build_ix(reads)
        path = str(tmp_path / "g.asqg.gz")
        from longreadselfcorrect_tpu.graph.asqg import Header, _open
        with _open(path, "w") as fh:
            fh.write(Header(min_overlap=40).to_line() + "\n")
            edges = []
            ovl.overlap_all(
                ix, reads, 40, lex_f, lex_r,
                on_vertex=lambda rid, seq, is_sub: asqg.write_vertex(fh, rid, seq, is_sub),
                on_edge=edges.append)
            for o in edges:
                asqg.write_edge(fh, o)

        g = asqg.load(path, 40)
        contain = ContainRemoveVisitor()
        while g.has_containment:
            g.visit(contain)
        g.visit(TransitiveReductionVisitor())
        g.simplify()
        g.visit(TrimVisitor(150))
        g.simplify()
        cs = contig_stats(g)
        assert cs["contigs"] == 1, cs
        contig = next(iter(g.vertices.values())).seq
        assert contig in (genome, ab.revcomp_str(genome)), (len(contig), len(genome))


class TestAsmlongCLI:
    def test_asmlong_reconstructs_genome(self, rng, tmp_path, monkeypatch, capsys):
        """asmlong CLI pipeline (StriDe/asmlong.cpp:131-226) on long
        error-free 'corrected' reads."""
        genome, reads = make_corpus(rng, 2000, 400, 100)
        ix, lex_f, lex_r = build_ix(reads)
        path = str(tmp_path / "g.asqg.gz")
        from longreadselfcorrect_tpu.graph.asqg import Header, _open
        with _open(path, "w") as fh:
            fh.write(Header(min_overlap=50).to_line() + "\n")
            edges = []
            ovl.overlap_all(
                ix, reads, 50, lex_f, lex_r,
                on_vertex=lambda rid, seq, is_sub: asqg.write_vertex(fh, rid, seq, is_sub),
                on_edge=edges.append)
            for o in edges:
                asqg.write_edge(fh, o)

        from longreadselfcorrect_tpu import cli
        monkeypatch.chdir(tmp_path)
        rc = cli.main(["asmlong", path, "-i", "400", "-m", "50",
                       "-o", str(tmp_path / "out")])
        assert rc == 0
        contigs = {}
        with open(tmp_path / "out-contigs.fa") as fh:
            cid = None
            for line in fh:
                if line.startswith(">"):
                    cid = line[1:].split()[0]
                    contigs[cid] = ""
                else:
                    contigs[cid] += line.strip()
        assert len(contigs) == 1, contigs.keys()
        contig = next(iter(contigs.values()))
        assert contig in (genome, ab.revcomp_str(genome))
        assert (tmp_path / "out-graph.asqg.gz").exists()
        assert (tmp_path / "StriDe-graph.dot").exists()


class TestOviewSubgraph:
    def _make_asqg(self, rng, tmp_path):
        genome, reads = make_corpus(rng, 800, 100, 20)
        ix, lex_f, lex_r = build_ix(reads)
        path = str(tmp_path / "g.asqg.gz")
        from longreadselfcorrect_tpu.graph.asqg import Header, _open
        with _open(path, "w") as fh:
            fh.write(Header(min_overlap=40).to_line() + "\n")
            edges = []
            ovl.overlap_all(
                ix, reads, 40, lex_f, lex_r,
                on_vertex=lambda rid, seq, is_sub: asqg.write_vertex(fh, rid, seq, is_sub),
                on_edge=edges.append)
            for o in edges:
                asqg.write_edge(fh, o)
        return genome, reads, path

    def test_oview_rows_align_to_root(self, rng, tmp_path):
        import io
        from longreadselfcorrect_tpu.graph import oview
        genome, reads, path = self._make_asqg(rng, tmp_path)
        rd, omap = oview.parse_asqg(path)
        assert len(rd) == len(reads)
        root = "r5"
        out = io.StringIO()
        oview.draw_alignment(out, root, rd, omap, 20, 20)
        lines = [l for l in out.getvalue().splitlines() if "ID:" in l]
        assert lines[0].endswith(f"ID:{root}")
        assert len(lines) > 1
        # error-free corpus: every overlap row reports 0 differences and the
        # clipped sequences line up with the root row column-for-column
        rootpad = lines[0].split("\t")[0]
        rstart = len(rootpad) - len(rootpad.lstrip())
        for row in lines[1:]:
            seqf, olen, nd, score = row.split("\t")[:4]
            assert nd == "0" and float(score) == 0.0
            body = seqf.strip().strip(".")
            start = len(seqf) - len(seqf.lstrip())
            for k, ch in enumerate(body):
                gpos = start + k - rstart
                if 0 <= gpos < len(rd[root]):
                    assert ch == rd[root][gpos]

    def test_subgraph_extracts_neighborhood(self, rng, tmp_path, monkeypatch):
        genome, reads, path = self._make_asqg(rng, tmp_path)
        from longreadselfcorrect_tpu import cli
        monkeypatch.chdir(tmp_path)
        out = str(tmp_path / "sub.asqg.gz")
        rc = cli.main(["subgraph", "r5", path, "-s", "1", "-o", out])
        assert rc == 0
        g = asqg.load(out, 0)
        assert "r5" in g.vertices
        assert 1 < len(g.vertices) < len(reads)
        # span-1 neighborhood: every vertex overlaps r5 in the full graph
        full = asqg.load(path, 0)
        nbrs = {e.end.id for e in full.vertices["r5"].edges} | {"r5"}
        assert set(g.vertices) <= nbrs


class TestIslandJoin:
    """Erosion / island-collect / PE island-join visitors
    (assemble.cpp:337-360, SGVisitors.cpp:606-668,1371-1740)."""

    def _pe_setup(self, _rng=None):
        rng = np.random.default_rng(7)   # independent of fixture draw order
        genome = "".join(rng.choice(list("ACGT"), size=2000))
        # interleaved exact PE pairs: R1 = g[p:p+50], R2 = rc(g[p+100:p+150]);
        # random start positions so kmer counts vary (a uniform grid puts
        # every seed exactly at the 75th-percentile repeat cutoff)
        reads = []
        for i, p in enumerate(sorted(rng.integers(0, 1850, size=400).tolist())):
            reads.append((f"p{i}/1", genome[p : p + 50]))
            reads.append((f"p{i}/2", ab.revcomp_str(genome[p + 100 : p + 150])))
        ix, lex_f, _ = build_ix(reads)
        from longreadselfcorrect_tpu.index.ssa import SampledSA

        ssa = SampledSA(ix.bwt, lex_f)
        return genome, reads, ix, ssa

    def test_sample_kmer_counts(self, rng):
        _, reads, ix, _ = self._pe_setup(rng)
        from longreadselfcorrect_tpu.graph.visitors import sample_kmer_counts

        kd = sample_kmer_counts(ix.bwt, 21, 500)
        assert kd.total == 500
        kd.compute_attributes()
        assert kd.q2 >= 1   # every sampled kmer occurs at least once

    def test_erosion_trims_bad_island_end(self, rng):
        genome, reads, ix, _ = self._pe_setup(rng)
        from longreadselfcorrect_tpu.graph.visitors import FastaErosionVisitor

        g = StringGraph()
        junk = "A" * 30  # unsupported tail
        g.add_vertex("A", genome[100:600] + junk)
        g.visit(FastaErosionVisitor(ix.bwt, 21, 2, min_island=300))
        out = g.get_vertex("A").seq
        # unsupported junk tail gone; survivor is a genuine genome substring
        # (random coverage may also erode a thin prefix)
        assert out.endswith(genome[560:600])
        assert "A" * 30 not in out
        assert out in genome[100:600]

    def test_join_islands_across_gap(self, rng):
        genome, reads, ix, ssa = self._pe_setup(rng)
        from longreadselfcorrect_tpu.graph.visitors import (
            IslandCollectVisitor, JoinIslandVisitor, graph_trim_and_smooth)

        g = StringGraph()
        g.add_vertex("A", genome[200:800])
        g.add_vertex("B", genome[840:1400])

        collect = IslandCollectVisitor(ix, ssa, insert_size=150,
                                       kmer_size=21, island_size=300)
        g.visit(collect)
        assert collect.island_count == 2
        assert collect.tslv  # read ids mapped

        join = JoinIslandVisitor(100, 4000, 21, 300, collect, ix,
                                 min_pe_count=2)
        g.visit(join)
        assert join.island_count >= 1
        g.simplify()
        # the two islands must merge across the 40bp gap into one contig
        assert len(g.vertices) == 1
        (v,) = g.vertices.values()
        assert v.seq == genome[200:1400] or v.seq == ab.revcomp_str(
            genome[200:1400])


class TestSGSearch:
    def test_tree_walks_and_find_walks(self, rng):
        genome, reads = make_corpus(rng, genome_len=400, read_len=80, step=40)
        ix, lex_f, lex_r = build_ix(reads)
        g = StringGraph()
        edges = []
        ovl.overlap_all(ix, reads, 40, lex_f, lex_r, irreducible=True,
                        on_vertex=lambda rid, seq, is_sub: g.add_vertex(rid, seq),
                        on_edge=edges.append)
        for o in edges:
            g.add_edges_from_overlap(o)
        from longreadselfcorrect_tpu.graph import search as sgs
        from longreadselfcorrect_tpu.graph.core import ED_SENSE, ED_ANTISENSE

        # the irreducible chain r0 - r1 - ... : walk from r0 along SENSE
        v0 = g.get_vertex("r0")
        dir0 = ED_SENSE if v0.count_edges(ED_SENSE) else ED_ANTISENSE
        walks = sgs.get_tree_walks(v0, dir0, 1000, 64)
        assert walks
        longest = max(walks, key=lambda w: len(w.edges))
        s = longest.get_string()
        # the walk string reconstructs a genome substring (either strand)
        assert s in genome or ab.revcomp_str(s) in genome
        assert len(s) > len(v0.seq)

        # find_walks between r0 and the last vertex of the longest walk
        target = longest.last_vertex()
        found, complete = sgs.find_walks(v0, target, dir0, 1000, 64)
        assert complete and found
        assert any(w.get_string() == s for w in found)
