"""Command-line driver, mirroring the reference CLI (main.c:24-526).

Two-pass parsing: presets (-x) are applied first, then individual flags
override (main.c:150-163, 166-351). Output and telemetry formats match the
reference so golden diffs are meaningful.
"""
from __future__ import annotations

import sys
import time

from . import config as C
from .config import IndexOptions, MapOptions, check_opt, mapopt_update, set_opt
from .index.index import MiniIndex
from .io import format as fmt
from .io.fastx import FastxReader, read_fasta
from .map.pipeline import map_frag_core

REALTIME0 = time.time()


def _set_dbg_qname():
    from .map import pipeline as _pl
    _pl.DBG_PRINT_QNAME = True


def parse_num(s: str) -> int:
    s = s.strip()
    mult = 1
    if s and s[-1] in "kKmMgG":
        mult = {"k": 10 ** 3, "m": 10 ** 6, "g": 10 ** 9}[s[-1].lower()]
        s = s[:-1]
    return int(float(s) * mult)


def _perf_line() -> str:
    """Real/CPU/PeakRSS epilogue (misc.c:96-121, main.c:523)."""
    import resource
    el = time.time() - REALTIME0
    ru = resource.getrusage(resource.RUSAGE_SELF)
    rc = resource.getrusage(resource.RUSAGE_CHILDREN)   # fork-pool workers
    cpu = ru.ru_utime + ru.ru_stime + rc.ru_utime + rc.ru_stime
    rss = max(ru.ru_maxrss, rc.ru_maxrss) * 1024        # KB on linux
    return (f"[M::main] Real time: {el:.3f} sec; CPU: {cpu:.3f} sec; "
            f"Peak RSS: {rss / 1024.0 / 1024.0 / 1024.0:.3f} GB")


def log(msg: str, verbose=3, level=3):
    if verbose >= level:
        el = time.time() - REALTIME0
        print(f"[M::{msg.split('::')[0] if '::' in msg else 'main'}::{el:.3f}*1.00] "
              if False else f"[M::main::{el:.3f}*1.00] {msg}", file=sys.stderr)


class Args:
    def __init__(self, argv):
        self.argv = argv
        self.pos = []
        self.sam = False
        self.verbose = 3
        self.idx_out = None
        self.rg = None
        self.junc_bed = None
        self.alt_list = None
        self.n_threads = 3
        self.seed_dump = False
        self.batch = False
        self.split_prefix = None
        self.spsc = None
        self.spsc_scale = 0.7
        self.jump_bed = None
        self.pass1 = None
        self.out_file = None


LONG_FLAG_OPTS = {
    "--cs": lambda io, mo, v: setattr(mo, "flag", mo.flag | C.MM_F_OUT_CS
                                      | (C.MM_F_OUT_CS_LONG if v == "long" else 0)),
    "--MD": lambda io, mo, v: setattr(mo, "flag", mo.flag | C.MM_F_OUT_MD),
    "--ds": lambda io, mo, v: setattr(mo, "flag", mo.flag | C.MM_F_OUT_DS),
    "--eqx": lambda io, mo, v: setattr(mo, "flag", mo.flag | C.MM_F_EQX),
    "--paf-no-hit": lambda io, mo, v: setattr(mo, "flag", mo.flag | C.MM_F_PAF_NO_HIT),
    "--sam-hit-only": lambda io, mo, v: setattr(mo, "flag", mo.flag | C.MM_F_SAM_HIT_ONLY),
    "--softclip": lambda io, mo, v: setattr(mo, "flag", mo.flag | C.MM_F_SOFTCLIP),
    "--no-end-flt": lambda io, mo, v: setattr(mo, "flag", mo.flag | C.MM_F_NO_END_FLT),
    "--for-only": lambda io, mo, v: setattr(mo, "flag", mo.flag | C.MM_F_FOR_ONLY),
    "--rev-only": lambda io, mo, v: setattr(mo, "flag", mo.flag | C.MM_F_REV_ONLY),
    "--rmq": lambda io, mo, v: setattr(mo, "flag", mo.flag | C.MM_F_RMQ),
    "--hard-mask-level": lambda io, mo, v: setattr(mo, "flag", mo.flag | C.MM_F_HARD_MLEVEL),
    "--no-kalloc": lambda io, mo, v: None,
    "--print-qname": lambda io, mo, v: _set_dbg_qname(),
    "--qstrand": lambda io, mo, v: setattr(mo, "flag", mo.flag | C.MM_F_QSTRAND),
    "--no-inv": lambda io, mo, v: setattr(mo, "flag", mo.flag | C.MM_F_NO_INV),
    "--no-hash-name": lambda io, mo, v: setattr(mo, "flag", mo.flag | C.MM_F_NO_HASH_NAME),
    "--secondary-seq": lambda io, mo, v: setattr(mo, "flag", mo.flag | C.MM_F_SECONDARY_SEQ),
}


_OPTS_WITH_ARG = set("kwIdtfUgGFNpMnmABOErzsKuRTqxvoJCe")
_OPTS_FLAG = set("acHXPD2LQySYh")


def _expand_short(argv):
    """ketopt-style combined short options: -cx splice == -c -x splice."""
    out = []
    for a in argv:
        if len(a) > 2 and a[0] == "-" and a[1] != "-" and a[1] in (_OPTS_FLAG | _OPTS_WITH_ARG):
            j = 1
            ok = True
            parts = []
            while j < len(a):
                ch = a[j]
                if ch in _OPTS_FLAG:
                    parts.append(f"-{ch}")
                    j += 1
                elif ch in _OPTS_WITH_ARG:
                    val = a[j + 1:]
                    parts.append(f"-{ch}")
                    if val:
                        parts.append(val)
                    j = len(a)
                else:
                    ok = False
                    break
            if ok:
                out.extend(parts)
                continue
        out.append(a)
    return out


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    orig_argv = list(argv)
    argv = _expand_short(argv)
    io = IndexOptions()
    mo = MapOptions()
    args = Args(argv)
    dbg_print_seed = dbg_print_chain = False
    from .map import pipeline as _pl0
    _pl0.DBG_PRINT_SEED = _pl0.DBG_PRINT_CHAIN = False
    _pl0.DBG_PRINT_ALN_SEQ = _pl0.DBG_SEED_FREQ = False
    _pl0.DBG_PRINT_QNAME = False

    # pass 1: preset
    it = iter(range(len(argv)))
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "-x" or a.startswith("--preset"):
            preset = argv[i + 1] if a == "-x" else a.split("=", 1)[1]
            if set_opt(preset, io, mo) < 0:
                print(f"[ERROR] unknown preset '{preset}'", file=sys.stderr)
                return 1
            i += 2 if a == "-x" else 1
        else:
            i += 1

    # pass 2: everything else
    i = 0
    while i < len(argv):
        a = argv[i]

        def val():
            nonlocal i
            i += 1
            return argv[i]

        def oval():
            # long option value: --opt=val or --opt val (main.c ketopt)
            return a.split("=", 1)[1] if "=" in a else val()

        def yes_no(flag, yes_sets=True):
            # yes_or_no helper (main.c:119-131)
            v = oval()
            if v in ("yes", "y"):
                mo.flag = (mo.flag | flag) if yes_sets else (mo.flag & ~flag)
            elif v in ("no", "n"):
                mo.flag = (mo.flag & ~flag) if yes_sets else (mo.flag | flag)
            else:
                print(f"[WARNING] option '{a.split('=')[0]}' only accepts "
                      "'yes' or 'no'.", file=sys.stderr)

        abase = a.split("=", 1)[0] if a.startswith("--") else a
        if a == "-x":
            i += 1  # already applied
        elif a == "-a":
            mo.flag |= C.MM_F_OUT_SAM | C.MM_F_CIGAR
            args.sam = True
        elif a == "-c":
            mo.flag |= C.MM_F_CIGAR | C.MM_F_OUT_CG
        elif a == "-k":
            io.k = int(val())
        elif a == "-w":
            io.w = int(val())
        elif a == "-H":
            io.flag |= C.MM_I_HPC
        elif a == "-I":
            io.batch_size = parse_num(val())
        elif a == "-d":
            args.idx_out = val()
        elif a == "-t":
            args.n_threads = int(val())
        elif a == "-v":
            args.verbose = int(val())
        elif a == "--version" or a == "-V":
            print(C.MM_VERSION.split("-")[0])
            return 0
        elif a == "-f":
            v = val()
            parts = v.split(",")
            mo.mid_occ_frac = float(parts[0]) if float(parts[0]) < 1 else 0
            if float(parts[0]) >= 1:
                mo.mid_occ = int(float(parts[0]))
            if len(parts) > 1:
                mo.max_mid_occ = int(float(parts[1]))
        elif a == "-U":
            v = val().split(",")
            mo.min_mid_occ = int(v[0])
            if len(v) > 1:
                mo.max_mid_occ = int(v[1])
        elif a == "-g":
            mo.max_gap = parse_num(val())
        elif a == "-G":
            v = parse_num(val())
            mo.max_gap_ref = mo.bw = mo.bw_long = v  # mm_mapopt_max_intron_len
        elif a == "-F":
            mo.max_frag_len = parse_num(val())
        elif a == "-N":
            mo.best_n = int(val())
        elif a == "-p":
            mo.pri_ratio = float(val())
        elif a == "-M":
            mo.mask_level = float(val())
        elif a == "-n":
            mo.min_cnt = int(val())
        elif a == "-m":
            mo.min_chain_score = int(val())
        elif a == "-A":
            mo.a = int(val())
        elif a == "-B":
            mo.b = int(val())
        elif a == "-O":
            v = val().split(",")
            mo.q = int(v[0])
            mo.q2 = int(v[1]) if len(v) > 1 else mo.q
        elif a == "-E":
            v = val().split(",")
            mo.e = int(v[0])
            mo.e2 = int(v[1]) if len(v) > 1 else mo.e
        elif a == "-r":
            v = val().split(",")
            mo.bw = parse_num(v[0])
            if len(v) > 1:
                mo.bw_long = parse_num(v[1])
        elif a == "-z":
            v = val().split(",")
            mo.zdrop = parse_num(v[0])
            mo.zdrop_inv = parse_num(v[1]) if len(v) > 1 else mo.zdrop
        elif a == "-s":
            mo.min_dp_max = parse_num(val())
        elif a == "-K":
            mo.mini_batch_size = parse_num(val())
        elif a == "-X":
            mo.flag |= C.MM_F_ALL_CHAINS | C.MM_F_NO_DIAG | C.MM_F_NO_DUAL | C.MM_F_NO_LJOIN
        elif a == "-P":
            mo.flag |= C.MM_F_ALL_CHAINS | C.MM_F_NO_LJOIN
        elif a == "-D":
            mo.flag |= C.MM_F_NO_DIAG
        elif a == "-2":
            mo.flag |= C.MM_F_2_IO_THREADS
        elif a == "-u":
            v = val()
            for ch in v:
                if ch == "f":
                    mo.flag |= C.MM_F_SPLICE_FOR
                    mo.flag &= ~C.MM_F_SPLICE_REV
                elif ch == "b":
                    mo.flag |= C.MM_F_SPLICE_FOR | C.MM_F_SPLICE_REV
                elif ch == "r":
                    mo.flag |= C.MM_F_SPLICE_REV
                    mo.flag &= ~C.MM_F_SPLICE_FOR
                elif ch == "n":
                    mo.flag &= ~(C.MM_F_SPLICE_FOR | C.MM_F_SPLICE_REV)
        elif a == "-Y":
            mo.flag |= C.MM_F_SOFTCLIP
        elif a == "-L":
            mo.flag |= C.MM_F_LONG_CIGAR
        elif a == "-Q":
            mo.flag |= C.MM_F_NO_QUAL
        elif a == "-y":
            mo.flag |= C.MM_F_COPY_COMMENT
        elif a == "-R":
            args.rg = val()
        elif a == "-T":
            mo.sdust_thres = int(val())
        elif a == "-q":
            v = val()
            mo.q_occ_frac = float(v)
        elif a == "--secondary":
            if val() == "no":
                mo.flag |= C.MM_F_NO_PRINT_2ND
        elif a.startswith("--secondary="):
            if a.split("=", 1)[1] == "no":
                mo.flag |= C.MM_F_NO_PRINT_2ND
        elif a == "--batch":
            args.batch = True
        elif a == "--print-seeds":
            dbg_print_seed = True
            from .map import pipeline as _pl
            _pl.DBG_PRINT_SEED = True
        elif a == "--print-chains":
            dbg_print_chain = True
            from .map import pipeline as _pl
            _pl.DBG_PRINT_CHAIN = True
        elif a == "--print-aln-seq":    # main.c:224 (forces 1 thread)
            from .map import pipeline as _pl
            _pl.DBG_PRINT_ALN_SEQ = True
            args.n_threads = 1
        elif a == "--dbg-seed-occ":     # main.c:264
            from .map import pipeline as _pl
            _pl.DBG_SEED_FREQ = True
        elif a == "--junc-bed" or a == "--bed":
            args.junc_bed = val()
        elif a == "-j" or a == "--jump":
            args.jump_bed = val()
        elif a == "--pass1":
            args.pass1 = val()
        elif a == "--write-junc":
            mo.flag |= C.MM_F_OUT_JUNC | C.MM_F_CIGAR
        elif a == "--jump-min-match":
            mo.jump_min_match = int(val())
        elif a == "--spsc":
            args.spsc = val()
        elif a == "--spsc-scale":
            args.spsc_scale = float(val())
        elif a == "--spsc0" or a == "--junc-pen":
            mo.junc_pen = int(val())
        elif a == "--junc-bonus":
            mo.junc_bonus = int(val())
        elif a == "--alt":
            args.alt_list = val()
        elif a == "--alt-drop":
            mo.alt_drop = float(val())
        elif a == "--split-prefix":
            args.split_prefix = val()
        elif a == "--cs":
            mo.flag |= C.MM_F_OUT_CS | C.MM_F_CIGAR
        elif a.startswith("--cs="):
            mo.flag |= C.MM_F_OUT_CS | C.MM_F_CIGAR
            if a.split("=", 1)[1] == "long":
                mo.flag |= C.MM_F_OUT_CS_LONG
        elif a == "-o":                     # main.c:208-215
            args.out_file = val()
        elif a == "-J":                     # main.c:203-208 splice model
            t = int(val())
            if t == 0:
                mo.flag |= C.MM_F_SPLICE_OLD
            elif t == 1:
                mo.flag &= ~C.MM_F_SPLICE_OLD
        elif a == "-C":                     # main.c:195 noncan penalty
            mo.noncan = int(val())
        elif a == "-e":                     # main.c:198 occ distance
            mo.occ_dist = parse_num(val())
        elif a == "-S":                     # deprecated --cs=long alias
            mo.flag |= C.MM_F_OUT_CS | C.MM_F_CIGAR | C.MM_F_OUT_CS_LONG
            print("[WARNING] option -S is deprecated and may be removed in "
                  "future. Please use --cs=long instead.", file=sys.stderr)
        elif abase == "--seed":             # main.c:217
            mo.seed = int(oval())
        elif abase == "--max-chain-skip":   # main.c:221
            mo.max_chain_skip = int(oval())
        elif abase == "--max-chain-iter":   # main.c:222
            mo.max_chain_iter = int(oval())
        elif abase == "--chain-gap-scale":  # main.c:247
            mo.chain_gap_scale = float(oval())
        elif abase == "--chain-skip-scale":  # main.c:248
            mo.chain_skip_scale = float(oval())
        elif abase == "--mask-len":         # main.c:251
            mo.mask_len = parse_num(oval())
        elif abase == "--min-dp-len":       # main.c:223
            mo.min_ksw_len = int(oval())
        elif abase == "--end-bonus":        # main.c:227
            mo.end_bonus = int(oval())
        elif abase == "--end-seed-pen":     # main.c:230
            mo.anchor_ext_shift = int(oval())
        elif abase == "--max-clip-ratio":   # main.c:233
            mo.max_clip_ratio = float(oval())
        elif abase == "--min-occ-floor":    # main.c:234
            mo.min_mid_occ = int(oval())
        elif abase == "--score-N":          # main.c:236
            mo.sc_ambi = int(oval())
        elif abase == "--max-qlen":         # main.c:243
            mo.max_qlen = parse_num(oval())
        elif abase == "--cap-sw-mem":       # main.c:242 (--cap-sw-mat)
            mo.max_sw_mat = parse_num(oval())
        elif abase == "--cap-kalloc":       # main.c:253 (budget guard)
            mo.cap_kalloc = parse_num(oval())
        elif abase == "--rmq-inner":        # main.c:260
            mo.rmq_inner_dist = parse_num(oval())
        elif abase == "--bucket-bits":      # main.c:216
            io.bucket_bits = int(oval())
        elif abase == "--q-occ-frac":       # main.c:255 (-q alias)
            mo.q_occ_frac = float(oval())
        elif a == "--no-long-join":         # main.c:226
            mo.flag |= C.MM_F_NO_LJOIN
        elif a == "--splice":               # main.c:225
            mo.flag |= C.MM_F_SPLICE
        elif a == "--idx-no-seq":           # main.c:229
            io.flag |= C.MM_I_NO_SEQ
        elif a == "--no-pairing":           # main.c:228 (deprecated)
            mo.flag |= C.MM_F_INDEPEND_SEG
        elif abase == "--frag":             # main.c:281
            yes_no(C.MM_F_FRAG_MODE, yes_sets=True)
        elif abase == "--heap-sort":        # main.c:297
            yes_no(C.MM_F_HEAP_SORT, yes_sets=True)
        elif abase == "--dual":             # main.c:299
            yes_no(C.MM_F_NO_DUAL, yes_sets=False)
        elif abase == "--splice-flank":     # main.c:296
            yes_no(C.MM_F_SPLICE_FLANK, yes_sets=True)
        elif a.startswith("--rmq="):        # main.c:301 (bare --rmq below)
            yes_no(C.MM_F_RMQ, yes_sets=True)
        elif abase == "--sr":               # main.c:270-280
            v = a.split("=", 1)[1] if "=" in a else "dna"
            if v == "dna":
                mo.flag |= C.MM_F_SR
            elif v == "rna":
                mo.flag |= C.MM_F_SR_RNA
            elif v == "no":
                mo.flag &= ~(C.MM_F_SR | C.MM_F_SR_RNA)
            else:
                mo.flag |= C.MM_F_SR
                print("[WARNING] --sr only takes 'dna' or 'rna'. Invalid "
                      "values are assumed to be 'dna'.", file=sys.stderr)
        elif abase == "--pairing":          # main.c:303-310
            v = oval()
            if v == "no":
                mo.flag |= C.MM_F_INDEPEND_SEG
            elif v == "weak":
                mo.flag |= C.MM_F_WEAK_PAIRING
                mo.flag &= ~C.MM_F_INDEPEND_SEG
            else:
                if v != "strong":
                    print("[WARNING] unrecognized argument for --pairing; "
                          "assuming 'strong'.", file=sys.stderr)
                mo.flag &= ~(C.MM_F_INDEPEND_SEG | C.MM_F_WEAK_PAIRING)
        elif abase == "--lj-min-ratio":     # main.c:268 (deprecated)
            oval()
            print("[WARNING]  --lj-min-ratio has been deprecated.",
                  file=sys.stderr)
        elif abase == "--mask-level":       # alias of -M (main.c:96)
            mo.mask_level = float(oval())
        elif abase == "--min-count":        # alias of -n (main.c:94)
            mo.min_cnt = int(oval())
        elif abase == "--min-chain-score":  # alias of -m (main.c:95)
            mo.min_chain_score = int(oval())
        elif abase == "--min-dp-score":     # alias of -s (main.c:97)
            mo.min_dp_max = parse_num(oval())
        elif abase == "--mb-size":          # alias of -K (main.c:26)
            mo.mini_batch_size = parse_num(oval())
        elif abase == "--max-intron-len":   # alias of -G (main.c:92)
            viln = parse_num(oval())
            mo.max_gap_ref = mo.bw = mo.bw_long = viln
        elif a == "--all-chain":            # alias of -P (main.c:50)
            mo.flag |= C.MM_F_ALL_CHAINS | C.MM_F_NO_LJOIN
        elif a == "--no-self":              # alias of -D (main.c:30)
            mo.flag |= C.MM_F_NO_DIAG
        elif abase == "--cost-non-gt-ag":   # alias of -C (main.c:36)
            mo.noncan = int(oval())
        elif a == "-h" or a == "--help":
            print("Usage: minimap2_tpu [options] target.fa query.fq [...]")
            print("See docs/OPTIONS.md for the full option reference.")
            return 0
        elif a in LONG_FLAG_OPTS:
            LONG_FLAG_OPTS[a](io, mo, None)
            if a == "--MD" or a == "--ds":
                mo.flag |= C.MM_F_CIGAR
        elif a.startswith("--"):
            print(f"[WARNING] unhandled option '{a}' (ignored)", file=sys.stderr)
            # consume a value if the next token isn't a file
            if i + 1 < len(argv) and not argv[i + 1].startswith("-") \
                    and "=" not in a and not _looks_like_file(argv[i + 1]):
                i += 1
        elif a.startswith("-") and len(a) > 1:
            print(f"[ERROR] unknown option '{a}'", file=sys.stderr)
            return 1
        else:
            args.pos.append(a)
        i += 1

    if (mo.flag & C.MM_F_SPLICE_FOR) or (mo.flag & C.MM_F_SPLICE_REV):
        mo.flag |= C.MM_F_SPLICE
    if check_opt(io, mo) < 0:
        return 1
    if not args.pos:
        print("Usage: minimap2_tpu [options] target.fa query.fq [...]", file=sys.stderr)
        return 1

    # build/load index
    tgt = args.pos[0]
    queries = args.pos[1:]
    import os
    for f_ in [tgt] + queries:
        if not os.path.exists(f_):
            print(f"ERROR: failed to open file '{f_}'", file=sys.stderr)
            return 1
    out_fh = sys.stdout
    if args.out_file and args.out_file != "-":    # -o (main.c:208-215)
        try:
            out_fh = open(args.out_file, "w")
        except OSError as e:
            print(f"[ERROR] failed to write the output to file "
                  f"'{args.out_file}': {e.strerror}", file=sys.stderr)
            return 1

    def finish(rc: int) -> int:
        if out_fh is not sys.stdout:
            out_fh.close()
        return rc
    multipart = None
    with open(tgt, "rb") as _f:
        magic = _f.read(4)
    if tgt.endswith(".npz"):
        mi = MiniIndex.load(tgt)
    elif magic == b"MMI\x02":
        from .index.mmi import load_mmi
        mi = load_mmi(tgt)
    else:
        names, seqs = read_fasta(tgt)
        if sum(len(s_) for s_ in seqs) > io.batch_size and queries:
            multipart = (names, seqs)   # multi-part index (-I) split/merge
            mi = None
            if args.batch:
                print("[WARNING] genome exceeds -I "
                      f"({io.batch_size} bp): --batch is ignored and the "
                      "host multi-part split/merge path runs instead; "
                      "raise -I to keep the device path", file=sys.stderr)
        else:
            mi = MiniIndex.build(names, seqs, w=io.w, k=io.k,
                                 b=io.bucket_bits, flag=io.flag)
    if args.idx_out and mi is not None:
        if args.idx_out.endswith(".npz"):
            mi.save(args.idx_out)
        else:
            from .index.mmi import dump_mmi
            dump_mmi(mi, args.idx_out)
    if multipart is not None:
        from .map.driver import run_multipart
        out = out_fh

        def write_hdr(meta):
            if args.sam:
                cmdline = "minimap2 " + " ".join(orig_argv)
                out.write(fmt.write_sam_hdr(meta, args.rg, C.MM_VERSION,
                                            cmdline))
                out.write("\n")

        n_mapped = run_multipart(multipart[0], multipart[1], io, mo,
                                 queries, out, args.verbose, write_hdr)
        if args.verbose >= 3:
            el = time.time() - REALTIME0
            print(f"[M::worker_pipeline::{el:.3f}*1.00] mapped {n_mapped} "
                  "sequences", file=sys.stderr)
            print(f"[M::main] Version: {C.MM_VERSION}", file=sys.stderr)
            print(f"[M::main] CMD: minimap2 {' '.join(orig_argv)}",
                  file=sys.stderr)
            print(_perf_line(), file=sys.stderr)
        return 0

    if args.verbose >= 3:
        el = time.time() - REALTIME0
        print(f"[M::main::{el:.3f}*1.00] loaded/built the index for "
              f"{mi.n_seq} target sequence(s)", file=sys.stderr)
    mapopt_update(mo, mi)
    if args.verbose >= 3:
        el = time.time() - REALTIME0
        print(f"[M::mm_mapopt_update::{el:.3f}*1.00] mid_occ = {mo.mid_occ}",
              file=sys.stderr)
        print(mi.stat(REALTIME0), file=sys.stderr)
    if args.junc_bed:
        from .index.sidedata import read_bed_junc
        mi.intervals = read_bed_junc(args.junc_bed, mi)
    if args.jump_bed:
        from .index.sidedata import jjump_read
        jjump_read(args.jump_bed, mi, 0x1, -1)     # MM_JUNC_ANNO
    if args.pass1:
        from .index.sidedata import jjump_read
        jjump_read(args.pass1, mi, 0x2, 5)         # MM_JUNC_MISC
    if args.spsc:
        from .config import max_spsc_bonus
        from .index.sidedata import read_spsc
        n_spsc = read_spsc(args.spsc, mi, max_spsc_bonus(mo),
                           args.spsc_scale)
        if args.verbose >= 3:
            print(f"[M::mm_idx_spsc_read2] read {n_spsc} splice scores",
                  file=sys.stderr)
    if args.alt_list:
        from .index.sidedata import read_alt
        n_alt = read_alt(args.alt_list, mi)
        if args.verbose >= 3:
            print(f"[M::mm_idx_alt_read] found {n_alt} ALT contigs",
                  file=sys.stderr)

    out = out_fh
    if args.sam:
        rg_id = None  # threaded to SAM records via mo.rg_id
        if args.rg:
            for f_ in args.rg.replace("\\t", "\t").split("\t"):
                if f_.startswith("ID:"):
                    rg_id = f_[3:]
        mo.rg_id = rg_id
        cmdline = "minimap2 " + " ".join(orig_argv)
        out.write(fmt.write_sam_hdr(mi, args.rg, C.MM_VERSION, cmdline))
        out.write("\n")

    if args.batch:
        if len(queries) > 1 and (mo.flag & C.MM_F_FRAG_MODE):
            from .parallel.engine import run_batched_pe_cli
            run_batched_pe_cli(mi, mo, queries, out)
        elif mo.flag & (C.MM_F_CIGAR | C.MM_F_OUT_SAM):
            from .parallel.engine import run_batched_align_cli
            run_batched_align_cli(mi, mo, queries, out)
        else:
            from .parallel.engine import run_batched_cli
            run_batched_cli(mi, mo, queries, out)
        if args.verbose >= 3:
            el = time.time() - REALTIME0
            print(f"[M::main] Version: {C.MM_VERSION}", file=sys.stderr)
            print(f"[M::main] CMD: minimap2 {' '.join(orig_argv)}",
                  file=sys.stderr)
            print(_perf_line(), file=sys.stderr)
        return 0

    from .map.driver import iter_fragments, map_fragment, write_fragment

    n_mapped = 0
    frag_mode = len(queries) > 1 or bool(mo.flag & C.MM_F_FRAG_MODE)
    # kt_for analogue: fork-pool over fragment chunks when -t > 1 and no
    # debug printing interleaves with stdout (map.c:576, kthread.c:54)
    from .map import pipeline as _plmod
    use_pool = (args.n_threads > 1 and sys.platform.startswith("linux")
                and not (_plmod.DBG_PRINT_SEED or _plmod.DBG_PRINT_CHAIN
                         or _plmod.DBG_PRINT_ALN_SEQ
                         or _plmod.DBG_SEED_FREQ))
    if use_pool:
        from .map.parallel_host import run_parallel
        n_mapped = run_parallel(mi, mo, queries, out, frag_mode,
                                args.n_threads)
    else:
        for frag in iter_fragments(queries, frag_mode):
            results = map_fragment(mi, mo, frag)
            write_fragment(out, mi, mo, frag,
                           [res.regs for res in results],
                           [res.rep_len for res in results])
            n_mapped += len(frag)
    if args.verbose >= 3:
        el = time.time() - REALTIME0
        print(f"[M::worker_pipeline::{el:.3f}*1.00] mapped {n_mapped} sequences",
              file=sys.stderr)
        print(f"[M::main] Version: {C.MM_VERSION}", file=sys.stderr)
        print(f"[M::main] CMD: minimap2 {' '.join(orig_argv)}", file=sys.stderr)
        print(_perf_line(), file=sys.stderr)
    return 0


def _looks_like_file(s: str) -> bool:
    import os
    return os.path.exists(s)


if __name__ == "__main__":
    sys.exit(main())
