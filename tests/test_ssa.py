"""Sampled-SA / lexicographic-index tests: python builder vs fmbuild vs a
brute-force suffix sort oracle (SampledSuffixArray semantics,
SuffixTools/SampledSuffixArray.cpp:40-130)."""
import os
import subprocess

import numpy as np
import pytest

from longreadselfcorrect_tpu.core import alphabet as ab
from longreadselfcorrect_tpu.index import build, store
from longreadselfcorrect_tpu.index.host import HostFM
from longreadselfcorrect_tpu.index.ssa import SampledSA

FMBUILD = os.path.join(os.path.dirname(__file__), "..", "native", "fmbuild")


def brute_sa(reads):
    """(read_id, offset) per SA rank via explicit suffix sort (naive oracle)."""
    suffixes = []
    for i, r in enumerate(reads):
        s = r + "$"
        for p in range(len(s)):
            key = tuple(
                (0, i) if ch == "$" else ("$ACGT".index(ch), -1) for ch in s[p:]
            )
            suffixes.append((key, i, p))
    suffixes.sort()
    return [(i, p) for _, i, p in suffixes]


def random_reads(rng, n, lo=8, hi=30):
    return ["".join(rng.choice(list("ACGT"), size=rng.integers(lo, hi))) for _ in range(n)]


class TestPythonBuilderSSA:
    def test_lex_and_samples_match_brute(self, rng):
        reads = random_reads(rng, 12)
        data = build.multi_string_bwt([ab.encode(r) for r in reads])
        oracle = brute_sa(reads)
        # lex: k-th whole-read suffix (offset 0) in rank order -> read id
        lex_oracle = [i for (i, p) in oracle if p == 0]
        assert list(data.lex) == lex_oracle
        # row samples
        for row in range(0, data.num_symbols, build.SSA_SAMPLE_RATE):
            rid, off = data.ssa[row // build.SSA_SAMPLE_RATE]
            assert (rid, off) == oracle[row]

    def test_calc_sa_every_row(self, rng):
        reads = random_reads(rng, 10)
        data = build.multi_string_bwt([ab.encode(r) for r in reads])
        fm = HostFM(data.symbols, data.num_strings)
        ssa = SampledSA(fm, data.lex, data.ssa, build.SSA_SAMPLE_RATE)
        oracle = brute_sa(reads)
        rows = np.arange(data.num_symbols)
        ids, offs = ssa.calc_sa(rows)
        assert [(int(i), int(o)) for i, o in zip(ids, offs)] == oracle

    def test_calc_sa_without_samples(self, rng):
        """Lexico-only fallback walks to the sentinel; same answers."""
        reads = random_reads(rng, 6)
        data = build.multi_string_bwt([ab.encode(r) for r in reads])
        fm = HostFM(data.symbols, data.num_strings)
        ssa = SampledSA(fm, data.lex)
        oracle = brute_sa(reads)
        rows = np.arange(data.num_symbols)
        ids, offs = ssa.calc_sa(rows)
        assert [(int(i), int(o)) for i, o in zip(ids, offs)] == oracle


@pytest.mark.skipif(not os.path.exists(FMBUILD), reason="native fmbuild not built")
class TestFmbuildSSA:
    def test_matches_python_builder(self, rng, tmp_path):
        reads = random_reads(rng, 20, 10, 40)
        fa = tmp_path / "reads.fa"
        fa.write_text("".join(f">r{i}\n{r}\n" for i, r in enumerate(reads)))
        prefix = str(tmp_path / "idx")
        subprocess.run([FMBUILD, str(fa), prefix], check=True, capture_output=True)
        data = build.multi_string_bwt([ab.encode(r) for r in reads])
        nf = store.load_raw(prefix + ".bwtraw")
        assert np.array_equal(nf.symbols, data.symbols)
        fm = HostFM(nf.symbols, nf.num_strings)
        nssa = store.load_sampled_sa(prefix, fm)
        assert list(nssa.lex) == list(data.lex)
        oracle = brute_sa(reads)
        ids, offs = nssa.calc_sa(np.arange(nf.num_symbols))
        assert [(int(i), int(o)) for i, o in zip(ids, offs)] == oracle
        # reverse-strand artifacts load and resolve too
        nr = store.load_raw(prefix + ".rbwtraw")
        rfm = HostFM(nr.symbols, nr.num_strings)
        rssa = store.load_sampled_sa(prefix, rfm, reverse=True)
        roracle = brute_sa([r[::-1] for r in reads])
        ids, offs = rssa.calc_sa(np.arange(nr.num_symbols))
        assert [(int(i), int(o)) for i, o in zip(ids, offs)] == roracle
