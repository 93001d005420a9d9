"""Inexact (-e) overlap engine: planted SNP/indel overlaps must be found
with the reference's accounting (SAIOverlapTree / overlapReadInexactFMWalk;
golden-diffed byte-identical vs the reference binary in
tools/golden_overlap_e.sh — see docs/PARITY.md)."""
import numpy as np
import pytest

from longreadselfcorrect_tpu.core import alphabet as ab
from longreadselfcorrect_tpu.graph import overlap as ovl
from longreadselfcorrect_tpu.graph.overlap_inexact import overlap_read_inexact_fmwalk
from longreadselfcorrect_tpu.index import build
from longreadselfcorrect_tpu.index.host import HostFM, HostIndexSet


def build_ix(seqs):
    fwd, rev = build.build_bwt_pair([ab.encode(s) for s in seqs])
    return (HostIndexSet(HostFM(fwd.symbols, fwd.num_strings),
                         HostFM(rev.symbols, rev.num_strings)),
            fwd.lex, rev.lex)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(5)
    g = "".join(rng.choice(list("ACGT"), size=600))
    r0 = g[0:100]
    r1 = list(g[40:140])
    r1[30] = "ACGT"[("ACGT".index(r1[30]) + 1) % 4]      # SNP in overlap
    r2 = list(g[80:180])
    del r2[70]                                            # 1bp deletion mid-overlap
    r3 = g[120:220]
    seqs = [r0, "".join(r1), "".join(r2), r3]
    return seqs, build_ix(seqs)


class TestInexactOverlap:
    def test_snp_overlap_found(self, corpus):
        seqs, (ix, lex_f, lex_r) = corpus
        blocks, is_sub = overlap_read_inexact_fmwalk(ix, seqs[0], 40, 0.05, 2)
        assert not is_sub
        ols = {(b.overlap_len, b.flags) for b in blocks if b.overlap_len < 100}
        assert (60, ovl.SUF_PRE_AF) in ols  # SNP'd suffix-prefix overlap

    def test_exact_engine_misses_snp(self, corpus):
        seqs, (ix, _, _) = corpus
        blocks, _, _ = ovl.overlap_read_exact(ix, seqs[0], 40)
        assert all(b.overlap_len >= 100 for b in blocks)  # only self/containment

    def test_indel_overlap_found_with_coords(self, corpus):
        seqs, (ix, lex_f, lex_r) = corpus
        ids = [f"r{i}" for i in range(len(seqs))]
        lens = [len(s) for s in seqs]
        blocks, is_sub = overlap_read_inexact_fmwalk(ix, seqs[3], 40, 0.05, 2)
        assert not is_sub
        hits = []
        for b in blocks:
            hits += ovl.block_to_overlaps(b, "r3", lens[3], lex_f, lex_r, ids, lens)
        # r3 overlaps the deletion read r2: target-side span differs by 1
        r2_hits = [o for o in hits if "r2" in o.id]
        assert r2_hits
        o = r2_hits[0]
        c1, c2 = o.match.coord
        assert abs(c1.length() - c2.length()) == 1

    def test_no_inexact_edges_on_clean_exact(self, corpus):
        # a clean exact overlap must also be found by the inexact engine
        seqs, (ix, _, _) = corpus
        blocks, _ = overlap_read_inexact_fmwalk(ix, seqs[2], 40, 0.05, 2)
        assert any(b.overlap_len < 100 and b.num_diff <= 0 for b in blocks)
