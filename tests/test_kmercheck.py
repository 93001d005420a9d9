"""kmercheck: ground-truth k-mer classification + distribution summaries
(reference: PacBio/KmerCheckProcess.cpp, Util/KmerDistribution.cpp)."""
import numpy as np

from longreadselfcorrect_tpu.core import bcode as bc
from longreadselfcorrect_tpu.core import kmercheck as kc


def test_kd_attributes_quartiles():
    kd = kc.KmerDistribution()
    for v, n in ((2, 2), (5, 3), (6, 4), (7, 3), (30, 1)):
        for _ in range(n):
            kd.add(v)
    kd.compute_attributes()
    # cumulative: 2->2, 5->5, 6->9, 7->12, 30->13; quartile targets 3/6/9.
    # The reference writes a quartile at BOTH bins when the target lands on
    # a bin boundary (prev <= t <= curr twice); last write wins -> q3=7.
    assert (kd.q1, kd.q2, kd.q3) == (5, 6, 7)
    assert kd.mode == 6
    # iqr=2 -> whiskers [2, 10]: min=2, max=7 (30 is an outlier)
    assert (kd.min, kd.max) == (2, 7)
    assert str(kd) == "2 5 6 7 7"


def test_compare_lines_threshold_pick():
    crt = kc.KmerDistribution()
    err = kc.KmerDistribution()
    for v in (8, 9, 10, 11):
        crt.add(v)
    for v in (2, 2, 3, 3):
        err.add(v)
    tline, vline = kc.compare_lines(30, 17, crt, err)
    # correct distribution entirely above the error one: value = crt.min
    assert vline == f"30 17 {crt.min}"
    assert tline.startswith("30 17 | ")


def test_scan_read_classifies_error_windows():
    # perfect alignment block: all-zero code -> every window validates
    seq = "ACGTACGGTTACGATCGATT"
    block_ok = bc.BCode(0, len(seq), "00" * len(seq), False)
    crt, err = {}, {}
    kc.scan_read(lambda k, pos: 5, seq, [block_ok], 5, 5, 1, crt, err)
    assert 5 in crt and 5 not in err
    assert crt[5].total == len(seq) - 5 + 1

    # an insertion marked at base 10 (upper nibble = 1): windows that cross
    # it without the matching bookkeeping must classify as erroneous
    code = ["00"] * len(seq)
    code[10] = "10"
    block_bad = bc.BCode(0, len(seq), "".join(code), False)
    crt2, err2 = {}, {}
    kc.scan_read(lambda k, pos: 5, seq, [block_bad], 5, 5, 1, crt2, err2)
    assert 5 in err2 and err2[5].total > 0
    assert crt2[5].total + err2[5].total == len(seq) - 5 + 1

    # freq 1 windows are skipped entirely (the read itself)
    crt3, err3 = {}, {}
    kc.scan_read(lambda k, pos: 1, seq, [block_ok], 5, 5, 1, crt3, err3)
    assert not crt3 and not err3
