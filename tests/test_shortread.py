"""Short-read pipeline pieces: preprocess, kmer correction, PE merge/validate."""
import random

import numpy as np
import pytest

from longreadselfcorrect_tpu.core import alphabet as ab
from longreadselfcorrect_tpu.core import preprocess as pp
from longreadselfcorrect_tpu.core.kmer_correct import KmerCorrectParams, kmer_correct
from longreadselfcorrect_tpu.core.pe_merge import merge_pair, validate_read
from longreadselfcorrect_tpu.index import build
from longreadselfcorrect_tpu.index.host import HostFM, HostIndexSet


class TestPreprocess:
    def params(self, **kw):
        return pp.PreprocessParams(**kw)

    def test_clean_read_passes(self):
        stats = pp.PreprocessStats()
        out = pp.process_read("ACGT" * 20, "I" * 80, self.params(), stats, random.Random(1))
        assert out == ("ACGT" * 20, "I" * 80)

    def test_short_read_dropped(self):
        stats = pp.PreprocessStats()
        out = pp.process_read("ACGTACGT", "I" * 8, self.params(), stats, random.Random(1))
        assert out is None

    def test_quality_soft_clip(self):
        seq = "ACGT" * 20
        qual = "I" * 60 + "#" * 20  # low-quality tail
        stats = pp.PreprocessStats()
        out = pp.process_read(seq, qual, self.params(quality_trim=20), stats, random.Random(1))
        assert out is not None
        assert len(out[0]) == 60

    def test_dust_filters_low_complexity(self):
        stats = pp.PreprocessStats()
        out = pp.process_read("A" * 80, "", self.params(dust=True), stats, random.Random(1))
        assert out is None
        assert stats.failed_dust == 1

    def test_ambiguity_resolved(self):
        stats = pp.PreprocessStats()
        out = pp.process_read("ACGTN" * 10 + "ACGTACGTAC", "",
                              self.params(), stats, random.Random(1))
        assert out is not None
        assert "N" not in out[0]

    def test_ambiguity_discarded_by_default_flag(self):
        stats = pp.PreprocessStats()
        out = pp.process_read("ACGTN" * 10 + "ACGTACGTAC", "",
                              self.params(discard_ambiguous=True), stats,
                              random.Random(1))
        assert out is None

    def test_primer_screen(self):
        stats = pp.PreprocessStats()
        seq = "AATGATACGGCGAC" + "ACGT" * 20  # 14bp prefix of primer A
        out = pp.process_read(seq, "", self.params(primer_check=True),
                              stats, random.Random(1))
        assert out is None
        assert stats.reads_primer == 1

    def test_get_pair_id(self):
        assert pp.get_pair_id("read/1") == "read/2"
        assert pp.get_pair_id("read/B") == "read/A"
        assert pp.get_pair_id("readf") == "readr"
        assert pp.get_pair_id("readX") == ""


class TestPreprocessPE:
    """PE interleave/orphan routing via the CLI (preprocess.cpp:233-321)."""

    def _write_pairs(self, tmp_path):
        rng = random.Random(5)
        r1 = tmp_path / "r1.fq"
        r2 = tmp_path / "r2.fq"
        il = tmp_path / "il.fq"
        with open(r1, "w") as f1, open(r2, "w") as f2, open(il, "w") as fi:
            for i in range(8):
                s1 = "".join(rng.choice("ACGT") for _ in range(60))
                s2 = "".join(rng.choice("ACGT") for _ in range(60))
                q2 = "#" * 60 if i == 2 else "I" * 60  # pair 2: mate fails
                f1.write(f"@p{i}/1\n{s1}\n+\n{'I' * 60}\n")
                f2.write(f"@p{i}/2\n{s2}\n+\n{q2}\n")
                fi.write(f"@p{i}/1\n{s1}\n+\n{'I' * 60}\n")
                fi.write(f"@p{i}/2\n{s2}\n+\n{q2}\n")
        return r1, r2, il

    def _run(self, argv):
        from longreadselfcorrect_tpu import cli

        return cli.main(argv)

    def test_pe_mode1_and_mode2_agree(self, tmp_path):
        r1, r2, il = self._write_pairs(tmp_path)
        out1 = tmp_path / "out1.fq"
        out2 = tmp_path / "out2.fq"
        orph1 = tmp_path / "orph1.fq"
        orph2 = tmp_path / "orph2.fq"
        assert self._run(["preprocess", "-p", "1", "-q", "20",
                          "--pe-orphans", str(orph1), "-o", str(out1),
                          str(r1), str(r2)]) == 0
        assert self._run(["preprocess", "-p", "2", "-q", "20",
                          "--pe-orphans", str(orph2), "-o", str(out2),
                          str(il)]) == 0
        assert out1.read_text() == out2.read_text()
        assert orph1.read_text() == orph2.read_text()
        body = out1.read_text()
        # pair 2 dropped from the main output, its good half orphaned
        assert "@p2/1" not in body and "@p2/2" not in body
        assert "@p2/1" in orph1.read_text()
        # survivors are interleaved /1,/2
        ids = [l for l in body.splitlines() if l.startswith("@p")]
        assert ids[0].endswith("/1") and ids[1].endswith("/2")
        assert ids[0][:-2] == ids[1][:-2]


@pytest.fixture(scope="module")
def sr_corpus():
    rng = np.random.default_rng(123)
    genome = "".join(rng.choice(list("ACGT"), size=20000))
    reads = []
    for i in range(4000):  # ~20x coverage of 100bp reads
        p = int(rng.integers(0, len(genome) - 100))
        r = genome[p : p + 100]
        reads.append(ab.revcomp_str(r) if i % 2 else r)
    enc = [ab.encode(r) for r in reads]
    fwd, rev = build.build_bwt_pair(enc)
    ix = HostIndexSet(HostFM(fwd.symbols, fwd.num_strings), HostFM(rev.symbols, rev.num_strings))
    return genome, reads, ix, rng


class TestKmerCorrect:
    def test_single_error_corrected(self, sr_corpus):
        genome, reads, ix, rng = sr_corpus
        truth = genome[5000:5100]
        noisy = truth[:50] + "ACGT"[("ACGT".index(truth[50]) + 1) % 4] + truth[51:]
        out, qc = kmer_correct(ix, noisy, "", KmerCorrectParams(kmer_length=21))
        assert qc
        assert out == truth

    def test_clean_read_untouched(self, sr_corpus):
        genome, reads, ix, rng = sr_corpus
        truth = genome[8000:8100]
        out, qc = kmer_correct(ix, truth, "", KmerCorrectParams(kmer_length=21))
        assert qc
        assert out == truth


class TestOverlapCorrect:
    def _lex(self, ix):
        # rank -> read-id map; without it the LF backtrack's $-rank would be
        # misread as a read id and the wrong sequences extracted
        from longreadselfcorrect_tpu.index.host import build_lexico_index
        return build_lexico_index(ix.bwt)

    def test_clean_read_untouched(self, sr_corpus):
        from longreadselfcorrect_tpu.core.overlap_correct import overlap_correction
        genome, reads, ix, rng = sr_corpus
        truth = genome[4000:4100]
        out, qc = overlap_correction(ix, self._lex(ix), None, truth, 31, 1, 0.96, 3)
        assert qc
        assert out == truth

    def test_clustered_errors_corrected(self, sr_corpus):
        # two nearby substitutions defeat the single-base k-mer fix and force
        # the MSA consensus path (ErrorCorrectProcess.cpp:83-283)
        from longreadselfcorrect_tpu.core.overlap_correct import overlap_correction
        genome, reads, ix, rng = sr_corpus
        truth = genome[7000:7100]
        bad = list(truth)
        for p in (48, 52):
            bad[p] = "ACGT"[("ACGT".index(bad[p]) + 1) % 4]
        out, qc = overlap_correction(ix, self._lex(ix), None, "".join(bad),
                                     31, 1, 0.96, 3)
        assert qc
        assert out == truth

    def test_extract_read_inverts_bwt(self, sr_corpus):
        from longreadselfcorrect_tpu.core.overlap_correct import extract_read
        genome, reads, ix, rng = sr_corpus
        # $-sector row i is read i's own terminator (distinct sentinels)
        for rid in (0, 1, 17, 3999):
            assert extract_read(ix, rid) == reads[rid]


class TestPEMerge:
    def test_merge_gap_pair(self, sr_corpus):
        genome, reads, ix, rng = sr_corpus
        # fragment of 260bp: read1 = first 100, read2 = last 100 (fwd orientation)
        frag = genome[3000:3260]
        r1 = frag[:100]
        r2_rc = frag[160:260]  # already in read1 orientation
        code, merged = merge_pair(ix, r1, r2_rc, min_overlap=31, max_overlap=61,
                                  max_insert=400, sa_threshold=3)
        assert code == 1
        assert merged == frag

    def test_validate_good_read(self, sr_corpus):
        genome, reads, ix, rng = sr_corpus
        code, out = validate_read(ix, genome[6000:6200], min_overlap=31, sa_threshold=3)
        assert code == 1
        assert out == genome[6000:6200]

    def test_validate_bad_read_fails(self, sr_corpus):
        genome, reads, ix, rng = sr_corpus
        bad = genome[6000:6100] + "T" + genome[6101:6200]
        bad = genome[6000:6090] + ab.revcomp_str(genome[9000:9110])  # chimera
        code, out = validate_read(ix, bad, min_overlap=31, sa_threshold=3)
        assert code != 1 or out != bad


class TestKmerizeHybrid:
    def _ix(self, rng):
        from longreadselfcorrect_tpu.index import build
        from longreadselfcorrect_tpu.index.host import HostFM, HostIndexSet
        genome = "".join(rng.choice(list("ACGT"), size=5000))
        reads = []
        for i in range(1500):  # 30x of 100bp
            p = int(rng.integers(0, 5000 - 100))
            r = genome[p : p + 100]
            reads.append(ab.revcomp_str(r) if i % 2 else r)
        enc = [ab.encode(r) for r in reads]
        fwd, rev = build.build_bwt_pair(enc)
        return genome, HostIndexSet(HostFM(fwd.symbols, fwd.num_strings),
                                    HostFM(rev.symbols, rev.num_strings))

    def test_split_read_clean_read_stays_whole(self):
        import numpy as np
        from longreadselfcorrect_tpu.core.pe_merge import split_read
        rng = np.random.default_rng(77)
        genome, ix = self._ix(rng)
        clean = genome[1000:1100]
        main_idx, pieces = split_read(ix, clean, 31, 2)
        assert len(pieces) == 1 and main_idx == 0
        assert pieces[0] == clean

    def test_split_read_error_read_splits(self):
        import numpy as np
        from longreadselfcorrect_tpu.core.pe_merge import kmerize_read
        rng = np.random.default_rng(78)
        genome, ix = self._ix(rng)
        bad = list(genome[2000:2100])
        bad[50] = "ACGT"[("ACGT".index(bad[50]) + 1) % 4]
        ok, main, others = kmerize_read(ix, "".join(bad), 31, 2)
        assert ok
        pieces = ([main] if main else []) + others
        assert len(pieces) >= 2
        # every piece must be a genomic substring after the error split
        for p in pieces:
            ing = p in genome or ab.revcomp_str(p) in genome
            has_err = genome[2000:2100][:len(p)] != p
            assert ing or has_err

    def test_merge_and_kmerize_merges_clean_pair(self):
        import numpy as np
        from longreadselfcorrect_tpu.core.pe_merge import merge_and_kmerize
        rng = np.random.default_rng(79)
        genome, ix = self._ix(rng)
        frag = genome[3000:3300]  # insert 300
        r1 = frag[:100]
        r2 = ab.revcomp_str(frag[-100:])
        res = merge_and_kmerize(ix, r1, r2, 31, 2, 31, 95, 500, 32,
                                repeat_freq=1000)
        assert res["merge"], res
        got = res["seq"]
        assert got in (frag, ab.revcomp_str(frag)) or frag in got
