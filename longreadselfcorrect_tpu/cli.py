"""stride-compatible command line interface.

Subcommand surface mirrors StriDe/StriDe.cpp:38-121; implemented so far:

  preprocess  quality filter/trim reads           (StriDe/preprocess.cpp)
  index       build BWT/RBWT of a read set        (StriDe/index.cpp)
  correct     short-read error correction (kmer)  (StriDe/correct.cpp)
  fmwalk      PE merge / validate walks           (StriDe/FMIndexWalk.cpp)
  filter      k-mer QC filtering                  (StriDe/filter.cpp)
  pbcorrect   PacBio self-correction              (StriDe/PacBioSelfCorrection.cpp)
  pbhc        PacBio hybrid correction            (StriDe/PacBioHybridCorrection.cpp)
  kmerfreq    interactive k-mer frequency probe   (StriDe/kmerfreq.cpp)

  grep        locate a pattern's reads via the index (StriDe/grep.cpp)

Remaining subcommands (overlap, assemble, asmlong, oview, subgraph, merge,
kmercheck) land as their engines are built.
"""
from __future__ import annotations

import argparse
import os
import sys
import time


def cmd_index(args) -> int:
    import numpy as np

    from .core import alphabet as ab
    from .index import build, store
    from .io import fasta

    prefix = args.prefix or os.path.splitext(args.readsfile)[0]
    t0 = time.time()
    if store.fmbuild_path() and not args.pure_python:
        fwd, rev = store.build_with_fmbuild(args.readsfile, prefix)
        print(f"fmbuild: BWT/RBWT ({fwd.num_symbols} symbols) in {time.time()-t0:.1f}s",
              file=sys.stderr)
    else:
        reads = []
        for rec in fasta.read_seqs(args.readsfile):
            reads.append(ab.encode(rec.seq))
        print(f"Read {len(reads)} sequences", file=sys.stderr)
        fwd, rev = build.build_bwt_pair(reads)
        print(f"Built BWT/RBWT ({fwd.num_symbols} symbols) in {time.time()-t0:.1f}s",
              file=sys.stderr)
    store.save_native(prefix, fwd, rev)
    if args.ref_format:
        store.save_reference_bwt(prefix + ".bwt", fwd)
        store.save_reference_bwt(prefix + ".rbwt", rev)
    print(f"Wrote {prefix}{store.NATIVE_SUFFIX} / {prefix}{store.RNATIVE_SUFFIX}",
          file=sys.stderr)
    return 0


def _load_host_index(prefix: str):
    from .index import store
    from .index.host import HostFM, HostIndexSet

    fwd, rev = store.load_any(prefix)
    return HostIndexSet(
        HostFM(fwd.symbols, fwd.num_strings), HostFM(rev.symbols, rev.num_strings)
    )


def cmd_pbcorrect(args) -> int:
    from .core.correct import CorrectionParams, SelfCorrector
    from .io import fasta

    ix = _load_host_index(args.prefix)
    use_device = args.engine == "device"
    params = CorrectionParams(
        pb_coverage=args.PBcoverage,
        error_rate=args.error_rate,
        next_target=args.next_target,
        max_leaves=args.max_leaves,
        idmer_len=args.idmer_length,
        min_kmer_len=args.min_kmer_size,
        genome=args.genome,
        mode=args.mode if args.mode is not None else 1,
        manual=args.mode is not None,
        adjust=args.kmer_size is not None,
        start_kmer_len=args.kmer_size or 19,
        split=args.split,
        no_dp=args.nodp,
    )
    if use_device:
        from .core.batch_correct import BatchedSelfCorrector
        from .index.fmindex import FMIndex, IndexSet
        from .index import store

        fwd, rev = store.load_any(args.prefix)
        dix = IndexSet(
            bwt=FMIndex.from_symbols(fwd.symbols, fwd.num_strings),
            rbwt=FMIndex.from_symbols(rev.symbols, rev.num_strings),
        )
        corrector = BatchedSelfCorrector(ix, dix, params)
    else:
        corrector = SelfCorrector(ix, params)
    os.makedirs(args.output, exist_ok=True)

    totals = dict(
        reads_len=0, corrected_len=0, seed_num=0, walk_num=0, high_error=0,
        exceed_depth=0, exceed_leave=0, fm=0, dp=0, seed_dis=0,
    )
    t0 = time.time()
    n = 0
    def result_stream():
        nonlocal n
        if use_device:
            batch = []
            for rec in fasta.read_seqs(args.readsfile):
                batch.append((rec.id, rec.seq))
                if len(batch) == args.batch_reads:
                    yield from zip(batch, corrector.process_batch(batch))
                    batch = []
            if batch:
                yield from zip(batch, corrector.process_batch(batch))
        else:
            for rec in fasta.read_seqs(args.readsfile):
                yield (rec.id, rec.seq), corrector.process(rec.id, rec.seq)

    with open(os.path.join(args.output, "correct.fa"), "w") as fcorrect, open(
        os.path.join(args.output, "discard.fa"), "w"
    ) as fdiscard:
        for (rec_id, rec_seq), result in result_stream():
            rec = type("R", (), {"id": rec_id, "seq": rec_seq})()
            n += 1
            if result.merge:
                totals["reads_len"] += result.total_reads_len
                totals["corrected_len"] += result.corrected_len
                totals["seed_num"] += result.total_seed_num
                totals["walk_num"] += result.total_walk_num
                totals["high_error"] += result.high_error_num
                totals["exceed_depth"] += result.exceed_depth_num
                totals["exceed_leave"] += result.exceed_leave_num
                totals["fm"] += result.fm_num
                totals["dp"] += result.dp_num
                totals["seed_dis"] += result.seed_dis
                for i, s in enumerate(result.corrected_strs):
                    flag = f"_{i}" if params.split else ""
                    fasta.write_fasta(fcorrect, rec.id + flag, s)
            else:
                fasta.write_fasta(fdiscard, rec.id, rec.seq)
            if n % 100 == 0:
                dt = time.time() - t0
                print(f"Processed {n} sequences in {dt:.1f}s ({n/dt:.1f} sequences/s)",
                      file=sys.stderr)

    # summary mirrors PacBioSelfCorrectionPostProcess dtor (:288-306)
    if totals["walk_num"] > 0 and totals["reads_len"] > 0:
        outcast = totals["walk_num"] - totals["fm"] - totals["dp"]
        dp_outcast = totals["dp"] + outcast
        print(
            f"\nTotalReadsLen: {totals['reads_len']}\n"
            f"CorrectedLen: {totals['corrected_len']}, ratio: "
            f"{totals['corrected_len']/totals['reads_len']:g}\n"
            f"TotalSeedNum: {totals['seed_num']}\n"
            f"TotalWalkNum: {totals['walk_num']}\n"
            f"FMNum: {totals['fm']}, ratio: {totals['fm']*100/totals['walk_num']:g}%\n"
            f"DPNum: {totals['dp']}, ratio: {totals['dp']*100/totals['walk_num']:g}%\n"
            f"OutcastNum: {outcast}, ratio: {outcast*100/totals['walk_num']:g}%"
        )
        if dp_outcast > 0:
            print(
                f"HighErrorNum: {totals['high_error']}, ratio: "
                f"{totals['high_error']*100/dp_outcast:g}%\n"
                f"ExceedDepthNum: {totals['exceed_depth']}, ratio: "
                f"{totals['exceed_depth']*100/dp_outcast:g}%\n"
                f"ExceedLeaveNum: {totals['exceed_leave']}, ratio: "
                f"{totals['exceed_leave']*100/dp_outcast:g}%"
            )
        print(f"DisBetweenSeeds: {totals['seed_dis']//totals['walk_num']}")
    return 0


def cmd_grep(args) -> int:
    """Pattern search in the index with read-ID resolution (grep.cpp:56)."""
    from .core import alphabet as ab
    from .index.host import read_id_of
    from .io import fasta

    ix = _load_host_index(args.prefix)
    reads = [rec for rec in fasta.read_seqs(args.readsfile)]
    for query in sys.stdin.read().split():
        print("--")
        lo, hi = ix.bwt.find_interval(ab.encode(query))
        if lo <= hi:
            for row in range(int(lo), int(hi) + 1):
                rid, off = read_id_of(ix.bwt, row)
                rec = reads[rid]
                print(rec.id)
                print(f"{rec.seq[:off]}[{rec.seq[off:off+len(query)]}]"
                      f"{rec.seq[off+len(query):]}")
        print("--")
    return 0


def cmd_pbhc(args) -> int:
    from .core.hybrid import HybridCorrector, HybridParams
    from .io import fasta

    ix = _load_host_index(args.prefix)
    params = HybridParams(
        kmer_length=args.kmer_size,
        min_kmer_length=args.min_kmer_size,
        seed_kmer_threshold=args.seed_threshold,
        max_overlap=args.max_overlap,
        max_leaves=args.max_leaves,
        fmw_kmer_threshold=args.fmw_threshold,
        coverage=args.coverage,
    )
    corr = HybridCorrector(ix, params)
    os.makedirs(args.output, exist_ok=True)
    n = merged = 0
    with open(os.path.join(args.output, "correct.fa"), "w") as fc, open(
        os.path.join(args.output, "discard.fa"), "w"
    ) as fd:
        for rec in fasta.read_seqs(args.readsfile):
            res = corr.correct(rec.id, rec.seq)
            n += 1
            if res["merge"]:
                merged += 1
                for i, s_ in enumerate(res["corrected_strs"]):
                    fasta.write_fasta(fc, f"{rec.id}_{i}", s_)
            else:
                fasta.write_fasta(fd, rec.id, rec.seq)
    print(f"reads: {n}, merged: {merged}", file=sys.stderr)
    return 0


def cmd_kmerfreq(args) -> int:
    from .core import alphabet as ab
    from .core.threshold import KmerThreshold

    ix = _load_host_index(args.prefix)
    thresh = KmerThreshold(-1, 100, args.PBcoverage)
    print("Please enter query sequence, kmer size and mode:", file=sys.stderr)
    tokens = sys.stdin.read().split()
    it = iter(tokens)
    while True:
        try:
            query = next(it)
            static_size = int(next(it))
            mode = int(next(it))
        except StopIteration:
            break
        qlen = len(query)
        freq, valid = ix.kmer_freq_table(ab.encode(query), min(qlen, 150))
        dynamic_size = static_size
        for pos in range(0, qlen - static_size + 1):
            sw = query[pos : pos + static_size]
            sfreq = int(freq[static_size][pos])
            dsize = dynamic_size
            dw = query[0 : dsize]
            dfreq = int(freq[dsize][0]) if dsize <= min(qlen, 150) else -1
            print(
                f"{pos}\t{sw}\t{sfreq} <-> {thresh.get(mode, static_size):g}\t"
                f"{dw}\t{dfreq} <-> {thresh.get(mode, dsize):g}"
            )
            dynamic_size += 1
        print("-")
    print("Exit successfully!", file=sys.stderr)
    return 0


def cmd_preprocess(args) -> int:
    import random

    from .core import preprocess as pp
    from .io import fasta

    params = pp.PreprocessParams(
        quality_trim=args.quality_trim,
        hard_clip=args.hard_clip,
        min_length=args.min_length,
        quality_filter=args.quality_filter,
        discard_quality=args.no_quality,
        dust=args.dust,
        dust_threshold=args.dust_threshold,
        phred64=args.phred64,
    )
    stats = pp.PreprocessStats()
    rng = random.Random(0)
    out = sys.stdout if args.out == "-" else open(args.out, "w")
    for rec in fasta.read_seqs(args.readsfile):
        res = pp.process_read(rec.seq, rec.qual, params, stats, rng)
        if res is None:
            continue
        seq, qual = res
        if qual:
            out.write(f"@{rec.id}\n{seq}\n+\n{qual}\n")
        else:
            out.write(f">{rec.id}\n{seq}\n")
    print(
        f"Reads parsed:\t{stats.reads_read}\nReads kept:\t{stats.reads_kept}\n"
        f"Bases parsed:\t{stats.bases_read}\nBases kept:\t{stats.bases_kept}",
        file=sys.stderr,
    )
    return 0


def cmd_correct(args) -> int:
    from .core.kmer_correct import CorrectionThresholds, KmerCorrectParams, kmer_correct
    from .io import fasta

    ix = _load_host_index(args.prefix)
    th = CorrectionThresholds()
    if args.kmer_threshold is not None:
        th.set_base_min_support(args.kmer_threshold)
    params = KmerCorrectParams(
        kmer_length=args.kmer_size, num_kmer_rounds=args.kmer_rounds, thresholds=th
    )
    kept = dropped = 0
    with open(args.out, "w") as f:
        for rec in fasta.read_seqs(args.readsfile):
            seq, qc = kmer_correct(ix, rec.seq, rec.qual, params)
            if qc:
                fasta.write_fasta(f, rec.id, seq)
                kept += 1
            else:
                dropped += 1
    print(f"corrected/kept: {kept}, failed QC: {dropped}", file=sys.stderr)
    return 0


def cmd_fmwalk(args) -> int:
    from .core.pe_merge import merge_pair, validate_read
    from .io import fasta

    ix = _load_host_index(args.prefix)
    recs = list(fasta.read_seqs(args.readsfile))
    n_ok = n_fail = 0
    with open(args.out, "w") as f:
        if args.algorithm == "validate":
            for rec in recs:
                code, seq = validate_read(ix, rec.seq, args.min_overlap,
                                          sa_threshold=args.kmer_threshold)
                if code == 1:
                    fasta.write_fasta(f, rec.id, seq)
                    n_ok += 1
                else:
                    n_fail += 1
        else:  # merge: consecutive pairs, 2nd read reverse-complemented
            from .core import alphabet as ab

            for i in range(0, len(recs) - 1, 2):
                r1, r2 = recs[i], recs[i + 1]
                code, seq = merge_pair(
                    ix, r1.seq, ab.revcomp_str(r2.seq), args.min_overlap,
                    args.max_overlap, args.max_insert,
                    sa_threshold=args.kmer_threshold,
                )
                if code == 1:
                    fasta.write_fasta(f, r1.id + ":merged", seq)
                    n_ok += 1
                else:
                    n_fail += 1
    print(f"walk success: {n_ok}, failed: {n_fail}", file=sys.stderr)
    return 0


def cmd_filter(args) -> int:
    from .core.qc import QCParams, kmer_qc
    from .io import fasta

    ix = _load_host_index(args.prefix)
    params = QCParams(kmer_length=args.kmer_size, kmer_threshold=args.kmer_threshold)
    kept = dropped = 0
    with open(args.out, "w") as f:
        for rec in fasta.read_seqs(args.readsfile):
            if kmer_qc(ix, rec.seq, params):
                fasta.write_fasta(f, rec.id, rec.seq)
                kept += 1
            else:
                dropped += 1
    print(f"kept: {kept}, filtered: {dropped}", file=sys.stderr)
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="lrsc", description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("index", help="build FM-index of a read set")
    p.add_argument("readsfile")
    p.add_argument("-p", "--prefix", default=None)
    p.add_argument("--ref-format", action="store_true",
                   help="also write reference-compatible .bwt/.rbwt binaries")
    p.add_argument("--pure-python", action="store_true",
                   help="force the numpy builder even if native/fmbuild exists")
    p.set_defaults(func=cmd_index)

    p = sub.add_parser("pbcorrect", help="PacBio self-correction")
    p.add_argument("readsfile")
    p.add_argument("-p", "--prefix", required=True)
    p.add_argument("-o", "--output", required=True)
    p.add_argument("-c", "--PBcoverage", type=int, default=90)
    p.add_argument("-e", "--error-rate", type=float, default=0.15, dest="error_rate")
    p.add_argument("-k", "--kmer-size", type=int, default=None, dest="kmer_size")
    p.add_argument("-n", "--next-target", type=int, default=1, dest="next_target")
    p.add_argument("-l", "--max-leaves", type=int, default=32, dest="max_leaves")
    p.add_argument("-i", "--idmer-length", type=int, default=9, dest="idmer_length")
    p.add_argument("-s", "--min-kmer-size", type=int, default=13, dest="min_kmer_size")
    p.add_argument("-g", "--genome", type=int, default=10, choices=(5, 10, 100))
    p.add_argument("-m", "--mode", type=int, default=None, choices=(0, 1, 2))
    p.add_argument("--split", action="store_true")
    p.add_argument("--nodp", action="store_true")
    p.add_argument("--engine", choices=("host", "device"), default="host",
                   help="host: single-thread numpy engine; device: batched TPU engine")
    p.add_argument("--batch-reads", type=int, default=32)
    p.set_defaults(func=cmd_pbcorrect)

    p = sub.add_parser("preprocess", help="quality filter/trim reads")
    p.add_argument("readsfile")
    p.add_argument("-o", "--out", default="-")
    p.add_argument("-q", "--quality-trim", type=int, default=0, dest="quality_trim")
    p.add_argument("--hard-clip", type=int, default=0, dest="hard_clip")
    p.add_argument("-m", "--min-length", type=int, default=31, dest="min_length")
    p.add_argument("-f", "--quality-filter", type=int, default=-1, dest="quality_filter")
    p.add_argument("--no-quality", action="store_true", dest="no_quality")
    p.add_argument("--dust", action="store_true")
    p.add_argument("--dust-threshold", type=float, default=4.0, dest="dust_threshold")
    p.add_argument("--phred64", action="store_true")
    p.set_defaults(func=cmd_preprocess)

    p = sub.add_parser("correct", help="short-read kmer error correction")
    p.add_argument("readsfile")
    p.add_argument("-p", "--prefix", required=True)
    p.add_argument("-o", "--out", default="reads.ec.fa")
    p.add_argument("-k", "--kmer-size", type=int, default=31, dest="kmer_size")
    p.add_argument("-x", "--kmer-threshold", type=int, default=None, dest="kmer_threshold")
    p.add_argument("-r", "--kmer-rounds", type=int, default=10, dest="kmer_rounds")
    p.set_defaults(func=cmd_correct)

    p = sub.add_parser("fmwalk", help="PE-merge / validate FM-index walks")
    p.add_argument("readsfile")
    p.add_argument("-p", "--prefix", required=True)
    p.add_argument("-o", "--out", default="fmwalk.fa")
    p.add_argument("-a", "--algorithm", choices=("merge", "validate"), default="merge")
    p.add_argument("-m", "--min-overlap", type=int, default=31, dest="min_overlap")
    p.add_argument("-M", "--max-overlap", type=int, default=65, dest="max_overlap")
    p.add_argument("-L", "--max-insert", type=int, default=500, dest="max_insert")
    p.add_argument("-x", "--kmer-threshold", type=int, default=3, dest="kmer_threshold")
    p.set_defaults(func=cmd_fmwalk)

    p = sub.add_parser("filter", help="k-mer QC filtering")
    p.add_argument("readsfile")
    p.add_argument("-p", "--prefix", required=True)
    p.add_argument("-o", "--out", default="filter.pass.fa")
    p.add_argument("-k", "--kmer-size", type=int, default=31, dest="kmer_size")
    p.add_argument("-x", "--kmer-threshold", type=int, default=3, dest="kmer_threshold")
    p.set_defaults(func=cmd_filter)

    p = sub.add_parser("grep", help="locate a pattern's reads via the index")
    p.add_argument("readsfile")
    p.add_argument("-p", "--prefix", required=True)
    p.set_defaults(func=cmd_grep)

    p = sub.add_parser("pbhc", help="PacBio hybrid correction (short-read index)")
    p.add_argument("readsfile")
    p.add_argument("-p", "--prefix", required=True, help="short-read index prefix")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("-k", "--kmer-size", type=int, default=31, dest="kmer_size")
    p.add_argument("-s", "--min-kmer-size", type=int, default=21, dest="min_kmer_size")
    p.add_argument("-x", "--seed-threshold", type=int, default=30, dest="seed_threshold")
    p.add_argument("-M", "--max-overlap", type=int, default=81, dest="max_overlap")
    p.add_argument("-l", "--max-leaves", type=int, default=32, dest="max_leaves")
    p.add_argument("-y", "--fmw-threshold", type=int, default=3, dest="fmw_threshold")
    p.add_argument("-c", "--coverage", type=int, default=60)
    p.set_defaults(func=cmd_pbhc)

    p = sub.add_parser("kmerfreq", help="interactive k-mer frequency probe")
    p.add_argument("-p", "--prefix", required=True)
    p.add_argument("-c", "--PBcoverage", type=int, default=90)
    p.set_defaults(func=cmd_kmerfreq)

    args = parser.parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
