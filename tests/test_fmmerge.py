"""fm-merge tests: unambiguous tiling reads collapse into one unitig;
branching reads stay unmerged (FMMergeProcess semantics)."""
from longreadselfcorrect_tpu.core import alphabet as ab
from longreadselfcorrect_tpu.graph.fmmerge import FMMerger
from longreadselfcorrect_tpu.index import build
from longreadselfcorrect_tpu.index.host import HostFM, HostIndexSet


def build_ix(reads):
    fwd, rev = build.build_bwt_pair([ab.encode(s) for _, s in reads])
    return (HostIndexSet(HostFM(fwd.symbols, fwd.num_strings),
                         HostFM(rev.symbols, rev.num_strings)),
            fwd.lex, rev.lex)


class TestFMMerge:
    def test_linear_tiling_merges_to_one(self, rng):
        genome = "".join(rng.choice(list("ACGT"), size=300))
        reads = []
        for i, p in enumerate(range(0, 241, 20)):
            r = genome[p : p + 60]
            if i % 2:
                r = ab.revcomp_str(r)
            reads.append((f"r{i}", r))
        ix, lex_f, lex_r = build_ix(reads)
        m = FMMerger(ix, reads, lex_f, lex_r, 30)
        out = list(m.merge_all())
        assert len(out) == 1, [len(s) for _, s in out]
        merged = out[0][1]
        assert merged in (genome, ab.revcomp_str(genome))
        assert m.marked.all()

    def test_branch_stops_merge(self, rng):
        # two genomes sharing a middle segment: reads through the junction
        # cannot merge past it
        core = "".join(rng.choice(list("ACGT"), size=100))
        left_a = "".join(rng.choice(list("ACGT"), size=100))
        left_b = "".join(rng.choice(list("ACGT"), size=100))
        ga = left_a + core
        gb = left_b + core
        reads = []
        k = 0
        for g in (ga, gb):
            for p in range(0, len(g) - 59, 20):
                reads.append((f"r{k}", g[p : p + 60]))
                k += 1
        ix, lex_f, lex_r = build_ix(reads)
        m = FMMerger(ix, reads, lex_f, lex_r, 30)
        out = list(m.merge_all())
        # nothing may span both left_a and left_b
        for _, s in out:
            has_a = any(s.find(left_a[i:i+40]) >= 0 for i in (0, 30, 60))
            has_b = any(s.find(left_b[i:i+40]) >= 0 for i in (0, 30, 60))
            assert not (has_a and has_b)
        # all reads claimed except possibly exact-duplicate strings (the
        # reference pipeline removes those in `filter` before fm-merge;
        # its CAS-discard leaves them unclaimed too, FMMergeProcess.cpp:190)
        unclaimed = [i for i in range(len(reads)) if not m.marked[m.fwd_rank[i]]]
        seqs = [s for _, s in reads]
        for i in unclaimed:
            assert seqs.count(seqs[i]) > 1
